package graft.streaming

import org.apache.spark.sql.functions._
import graft.Q

/** Structured Streaming surface. The reference has no streaming
  * (SURVEY §2.8) — this is the scale extension: the same events aggregation
  * as a `readStream` → agg → `writeStream(memory)` pipeline, driven to
  * completion synchronously so the correctness gate can oracle-check the
  * final table. On a real cluster the memory sink becomes a kafka/delta
  * sink and the batch-complete drive becomes a continuous trigger.
  */
object StreamingQueries {

  val queries: Seq[Q] = Seq(
    Q("q70_stream_hourly",
      (s, d) => {
        import s.implicits._
        // file-source schema comes from the static footer (ts arrives as
        // nanosecond Long under the session's nanosAsLong, same as Tables)
        val staticDf = s.read.parquet(s"$d/events.parquet")
        val stream = s.readStream.schema(staticDf.schema)
          .parquet(Staging.stageTable(d, "events"))
        val withTs = stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        val agg = withTs
          .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
          .agg(count(lit(1)).as("n"), sum($"value").as("sv"))

        val name = "q70_stream_hourly_sink"
        val query = agg.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(name)
          .start()
        try query.processAllAvailable()
        finally query.stop()

        s.table(name)
          .select($"hour", $"event_type", $"n", round($"sv", 4).as("total_value"))
          .orderBy($"hour", $"event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |  count(*) AS n, round(sum(value), 4) AS total_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    // Streaming exact dedup — the ingest-time dedup step of a training-data
    // pipeline: dropDuplicates keeps per-key state so each (user_id,
    // event_type) pair is emitted exactly once in append mode, whatever its
    // arrival order or multiplicity. The emitted KEY SET is deterministic
    // (which physical row won is not — so only the keys are output), making
    // the query oracle-able as a batch DISTINCT. At 100 TB the state store
    // shards by key; the production variant is dropDuplicatesWithinWatermark,
    // which bounds state by event time once a watermark is declared.
    Q("q71_stream_dedup",
      (s, d) => {
        import s.implicits._
        val staticDf = s.read.parquet(s"$d/events.parquet")
        val stream = s.readStream.schema(staticDf.schema)
          .parquet(Staging.stageTable(d, "events"))
        val deduped = stream
          .select($"user_id", $"event_type")
          .dropDuplicates("user_id", "event_type")

        val name = "q71_stream_dedup_sink"
        val query = deduped.writeStream
          .outputMode("append")
          .format("memory")
          .queryName(name)
          .start()
        try query.processAllAvailable()
        finally query.stop()

        s.table(name).orderBy($"user_id", $"event_type")
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY 1, 2""".stripMargin))
  )
}
