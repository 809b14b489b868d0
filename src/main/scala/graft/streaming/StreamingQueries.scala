package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
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

  /** q72's stream-stream θ-join (errors ⋈ purchases within ±300 s), shared
    * by the correctness query (memory sink, below) and the Scale probe's
    * counting sink ([[q72CountRows]]): bin-bucketed equality key (width
    * 2×window so each error stores ≤2 state rows), watermarks on BOTH
    * sides so buffered state is prunable. See the q72 registration comment
    * for the full design argument. */
  def q72Joined(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val winUs = 300L * 1000000L
    val binUs = 2L * winUs
    val staticDf = s.read.parquet(s"$d/events.parquet")
    val dir = Staging.stageTable(d, "events")
    def src() = graft.Tables.normalizeTs(
      s.readStream.schema(staticDf.schema).parquet(dir))
    val errs = src().filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"ts".as("err_ts"))
      .withColumn("bin", explode(array_distinct(array(
        floor((unix_micros($"err_ts") - winUs) / binUs).cast("long"),
        floor((unix_micros($"err_ts") + winUs) / binUs).cast("long")))))
      .withWatermark("err_ts", "10 minutes")
    val purch = src().filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"ts".as("p_ts"),
        floor(unix_micros($"ts") / binUs).cast("long").as("p_bin"))
      .withWatermark("p_ts", "10 minutes")
    errs.join(purch,
      $"bin" === $"p_bin" &&
        $"p_ts" >= $"err_ts" - expr("INTERVAL 300 SECONDS") &&
        $"p_ts" <= $"err_ts" + expr("INTERVAL 300 SECONDS"))
  }

  /** Drive [[q72Joined]] to completion through a row-counting foreachBatch
    * sink and return the matched-pair count. The probe's harness for q72:
    * the join's OUTPUT is quadratic in per-window traffic density by its
    * own semantics, so a memory sink measures the driver's
    * materialization ceiling, not the join — counting inside each
    * micro-batch keeps the output distributed (production's files/Kafka
    * shape) while still exercising the full bin-keyed state machinery. */
  def q72CountRows(s: SparkSession, d: String): Long = {
    val acc = s.sparkContext.longAccumulator("q72_pairs")
    // foreachBatch is at-least-once: a retried micro-batch re-invokes the
    // function with the SAME batchId, so a bare accumulator would
    // double-count exactly the pairs StreamingSuite pins equal to the
    // memory sink. Same batch-id idempotence the q206 mview sink uses.
    // The id is marked seen only AFTER the count succeeded — marking on
    // entry would make the retry of a failed count skip the batch,
    // turning a possible double-count into silent loss. (Micro-batch
    // invocations are serialized by the stream execution thread, so
    // contains-then-add does not race.)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
    val query = q72Joined(s, d).writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        if (!seen.contains(batchId)) { acc.add(batch.count()); seen.add(batchId); () }
      }
      .start()
    try query.processAllAvailable()
    finally query.stop()
    acc.value
  }

  val queries: Seq[Q] = Seq(
    Q("q70_stream_hourly",
      (s, d) => {
        import s.implicits._
        // file-source schema comes from the static footer; ts lands as
        // whatever the fixture vintage stores (nanos-Long or NTZ) and the
        // shared loader normalization makes it LTZ, same as Tables.events
        val staticDf = s.read.parquet(s"$d/events.parquet")
        val stream = s.readStream.schema(staticDf.schema)
          .parquet(Staging.stageTable(d, "events"))
        val withTs = graft.Tables.normalizeTs(stream)
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
             |ORDER BY 1, 2""".stripMargin)),

    // Stream-stream interval join — the streaming analogue of q18: errors
    // matched to purchases within ±300 s of event time, both sides live
    // streams. Spark requires an EQUALITY predicate in stream-stream
    // joins, and the q18 bin-bucketing trick supplies exactly that: the
    // probe side explodes into the time bins its interval can touch, the
    // build side keys by its own bin, and the join becomes bin-equality
    // plus the exact range re-check — which also gives the state store a
    // shard key whose density is bounded by arrival rate. Bin width is
    // 2×window (600 s): an interval of length 2w spans AT MOST TWO bins
    // of width 2w, so each error stores ≤2 state rows instead of the 3
    // a w-wide binning costs — 33% less probe-side state and shuffle for
    // the same per-bin candidate bound. Watermarks on BOTH sides plus
    // the two-sided time bound make the buffered state PRUNABLE (each
    // side holds only rows younger than watermark − 300 s), the
    // requirement for a join that runs for months on a real cluster. A
    // purchase owns exactly one bin, so each matched pair is emitted
    // exactly once in append mode; the emitted pair SET is
    // deterministic, so the query oracles as the batch θ-join.
    Q("q72_stream_join",
      (s, d) => {
        import s.implicits._
        val joined = q72Joined(s, d)

        val name = "q72_stream_join_sink"
        val query = joined.writeStream
          .outputMode("append")
          .format("memory")
          .queryName(name)
          .start()
        try query.processAllAvailable()
        finally query.stop()

        s.table(name).select($"err_id", $"p_id").orderBy($"err_id", $"p_id")
      },
      Some("""SELECT e.event_id AS err_id, p.event_id AS p_id
             |FROM events e JOIN events p
             |  ON e.event_type = 'error' AND p.event_type = 'purchase'
             |  AND abs(epoch_us(p.ts) - epoch_us(e.ts)) <= 300000000
             |ORDER BY 1, 2""".stripMargin)),

    // Append-mode windowed aggregation — the production streaming shape
    // (complete mode, q70, re-emits the whole result every batch; a real
    // sink needs append). A window emits EXACTLY ONCE, when the watermark
    // passes its end — which is also what bounds the state store: closed
    // windows are evicted, so state holds only the open tail regardless
    // of stream age. After processAllAvailable the final watermark is
    // max(event time) − 10 min (the no-data micro-batch advances it and
    // flushes), so the emitted set is exactly the hour windows whose end
    // precedes that — a deterministic predicate DuckDB can mirror, which
    // is what puts watermark finalization semantics under the oracle gate
    // (StreamingSuite's late-event spec pins the behavioral side).
    Q("q74_stream_append_windows",
      (s, d) => {
        import s.implicits._
        val staticDf = s.read.parquet(s"$d/events.parquet")
        val stream = graft.Tables.normalizeTs(
          s.readStream.schema(staticDf.schema)
            .parquet(Staging.stageTable(d, "events")))
        val agg = stream
          .withWatermark("ts", "10 minutes")
          .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
          .agg(count(lit(1)).as("n"), sum($"value").as("sv"))

        val name = "q74_stream_append_windows_sink"
        val query = agg.writeStream
          .outputMode("append")
          .format("memory")
          .queryName(name)
          .start()
        try query.processAllAvailable()
        finally query.stop()

        s.table(name)
          .select($"w.start".as("hour"), $"event_type", $"n",
            round($"sv", 4).as("total_value"))
          .orderBy($"hour", $"event_type")
      },
      Some("""WITH b AS (
             |  SELECT date_trunc('hour', ts) AS hour, event_type,
             |    count(*) AS n, round(sum(value), 4) AS total_value
             |  FROM events GROUP BY 1, 2),
             |mx AS (SELECT max(ts) AS m FROM events)
             |SELECT hour, event_type, n, total_value
             |FROM b, mx
             |WHERE hour + INTERVAL 1 HOUR <= m - INTERVAL 10 MINUTE
             |ORDER BY hour, event_type""".stripMargin)),

    // Streaming session windows — q13's sessionization as a live stream:
    // `session_window(ts, 30 min)` merges a user's events whose gaps are
    // STRICTLY under the gap (Spark merges while the next event lands
    // before session end, so an exactly-1800 s gap starts a NEW session —
    // the oracle mirrors that with `>= 1800e6` µs, deliberately different
    // from batch q13's `> 1800` convention). A session closes — and is
    // emitted exactly once, its state evicted — when the watermark passes
    // its end (last event + gap), so the append-mode output after
    // draining is the set of sessions ending at or before
    // max(event time) − 10 min: per-key session state stays bounded by
    // the open tail at any stream age, and the whole thing oracles as
    // the batch islands computation plus that finalization predicate.
    Q("q75_stream_sessions",
      (s, d) => {
        import s.implicits._
        val staticDf = s.read.parquet(s"$d/events.parquet")
        val stream = graft.Tables.normalizeTs(
          s.readStream.schema(staticDf.schema)
            .parquet(Staging.stageTable(d, "events")))
        val agg = stream
          .withWatermark("ts", "10 minutes")
          .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
          .agg(count(lit(1)).as("n_events"))

        val name = "q75_stream_sessions_sink"
        val query = agg.writeStream
          .outputMode("append")
          .format("memory")
          .queryName(name)
          .start()
        try query.processAllAvailable()
        finally query.stop()

        s.table(name)
          .select($"user_id", $"w.start".as("s_start"), $"w.end".as("s_end"),
            $"n_events")
          .orderBy($"user_id", $"s_start")
      },
      Some("""WITH l AS (
             |  SELECT user_id, ts, epoch_us(ts) AS us,
             |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts)) AS prev
             |  FROM events),
             |f AS (
             |  SELECT user_id, ts, us,
             |    CASE WHEN prev IS NULL OR us - prev >= 1800000000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM l),
             |s AS (
             |  SELECT user_id, ts,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM f),
             |g AS (
             |  SELECT user_id, min(ts) AS s_start,
             |    max(ts) + INTERVAL 30 MINUTE AS s_end, count(*) AS n_events
             |  FROM s GROUP BY user_id, sid),
             |mx AS (SELECT max(ts) AS m FROM events)
             |SELECT user_id, s_start, s_end, n_events
             |FROM g, mx WHERE s_end <= m - INTERVAL 10 MINUTE
             |ORDER BY user_id, s_start""".stripMargin)),

    // Custom keyed state under the oracle gate: flatMapGroupsWithState
    // emits a row each time a user's running event count crosses a
    // multiple of 25. The emission rule is BATCH-BOUNDARY-INVARIANT — a
    // milestone is emitted exactly once whether the crossing happens
    // inside one micro-batch or across many (the state carries the
    // pre-batch count) — so the append-mode output set is deterministic
    // and oracles as a per-user count + series expansion. This is the
    // gate coverage for the 0..n-rows-per-group state surface that
    // StatefulSessionsSuite pins behaviorally.
    Q("q73_stream_milestones",
      (s, d) => {
        import s.implicits._
        StatefulSessions.countMilestones(s, d, "q73_stream_milestones_sink", 25L)
          .orderBy($"user_id", $"milestone")
      },
      Some("""WITH c AS (
             |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
             |SELECT user_id,
             |  unnest(generate_series(25, (n // 25) * 25, 25)) AS milestone
             |FROM c WHERE n >= 25
             |ORDER BY user_id, milestone""".stripMargin)),

    // Stream-static enrichment join — the dimension-lookup step of every
    // production ingest pipeline: a live event stream joined to a slowly-
    // changing static dim (customer segments). The static side is
    // broadcast, so the join is STATELESS — no state store, no watermark
    // required, each micro-batch joins against the executor-local hash
    // map — which is why this is the one streaming join shape that adds
    // zero memory pressure at 100 TB/day. The post-join aggregation runs
    // in complete mode over the bounded segment key space.
    Q("q77_stream_enrich",
      (s, d) => {
        import s.implicits._
        val staticDf = s.read.parquet(s"$d/events.parquet")
        val stream = s.readStream.schema(staticDf.schema)
          .parquet(Staging.stageTable(d, "events"))
        val dim = broadcast(
          graft.Tables.customer(s, d).select($"c_custkey", $"c_mktsegment"))
        val enriched = stream
          .filter($"event_type" === "purchase")
          .join(dim, $"user_id" === $"c_custkey")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n"), sum($"value").as("sv"))

        val name = "q77_stream_enrich_sink"
        val query = enriched.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(name)
          .start()
        try query.processAllAvailable()
        finally query.stop()

        s.table(name)
          .select($"c_mktsegment", $"n", round($"sv", 4).as("total_value"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  round(sum(value), 4) AS total_value
             |FROM events JOIN customer ON user_id = c_custkey
             |WHERE event_type = 'purchase'
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // Watermark-BOUNDED streaming dedup — the production form of q71:
    // dropDuplicatesWithinWatermark keeps per-key state only until the
    // watermark passes the key's event time + delay, so state is O(keys
    // seen per watermark horizon), not O(all keys ever) — the difference
    // between a dedup that runs for months and one that OOMs. Emission is
    // still exactly-once per key in append mode; with the corpus inside
    // one horizon the emitted KEY SET equals the batch DISTINCT, which is
    // what the oracle pins (q71 pins the unbounded-state variant).
    Q("q78_stream_dedup_wm",
      (s, d) => {
        import s.implicits._
        val staticDf = s.read.parquet(s"$d/events.parquet")
        val stream = s.readStream.schema(staticDf.schema)
          .parquet(Staging.stageTable(d, "events"))
        val deduped = graft.Tables.normalizeTs(stream)
          .withWatermark("ts", "90 days")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select($"user_id", $"event_type")

        val name = "q78_stream_dedup_wm_sink"
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
             |ORDER BY 1, 2""".stripMargin)),

    // Stream-static ANTI join — ingest-time benchmark decontamination:
    // incoming documents whose exact text matches the (broadcast) eval
    // set are dropped BEFORE they ever land in the training corpus.
    // Like q77 the static side broadcasts and the join is stateless —
    // no state store, no watermark — which is what lets a contamination
    // guard sit on a 100 TB/day firehose for free; the per-source
    // survivor counts aggregate in complete mode over the bounded
    // source key space. (q37 is the batch shingle-overlap audit; this
    // is the exact-match gate at the stream edge.)
    Q("q79_stream_decontaminate",
      (s, d) => {
        import s.implicits._
        val staticDf = s.read.parquet(s"$d/documents.parquet")
        val stream = s.readStream.schema(staticDf.schema)
          .parquet(Staging.stageTable(d, "documents"))
        val evalSet = broadcast(
          graft.Tables.documents(s, d).filter($"doc_id" < 20)
            .select($"text").distinct())
        val survivors = stream
          .join(evalSet, Seq("text"), "left_anti")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_clean"))

        val name = "q79_stream_decontaminate_sink"
        val query = survivors.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName(name)
          .start()
        try query.processAllAvailable()
        finally query.stop()

        s.table(name).orderBy($"source")
      },
      Some("""SELECT source, count(*) AS n_clean
             |FROM documents
             |WHERE text NOT IN (SELECT text FROM documents WHERE doc_id < 20)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // Durable-checkpoint RESTART under the oracle gate — StreamingSuite
    // pins the exactly-once mechanics (each drain reads only its phase's
    // files, on the default and RocksDB state stores); this pins the
    // RESULT: events land in two phases with a full query stop between
    // them, both drains commit offsets + state to the same checkpoint,
    // and the final complete-mode table — recovered state plus the second
    // phase — must equal the one-shot batch aggregation. This is the
    // deploy-restart path a perpetual 100 TB/day ingest actually runs.
    Q("q181_stream_restart",
      (s, d) => {
        import s.implicits._
        val events = graft.Tables.events(s, d)
        val land = java.nio.file.Files
          .createTempDirectory("graft_q181_land").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_q181_ckpt").toString
        val b1 = events.filter($"event_id" % 2 === 0)
        val b2 = events.filter($"event_id" % 2 === 1)
        def agg() = graft.Tables.normalizeTs(
            s.readStream.schema(s.read.parquet(land).schema).parquet(land))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"event_id").as("id_sum"))
        b1.write.mode("append").parquet(land)
        Restart.drain(agg(), "q181_stream_restart_sink", ckpt)
        b2.write.mode("append").parquet(land)
        val (tbl, _) = Restart.drain(agg(), "q181_stream_restart_sink", ckpt)
        tbl.select($"event_type", $"n", $"id_sum").orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(event_id) AS BIGINT) AS id_sum
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Stateful quota enforcement — ingest-time rate limiting: each
    // (user, hour) key admits at most 1 event, the rest are rejected;
    // flatMapGroupsWithState keeps one admitted-count per key (the state
    // store shards by key, so a 100 TB/day firehose costs one counter per
    // active user-hour, and an event-time timeout would retire idle keys).
    // Within a batch the group sorts by (ts, event_id) so admission is the
    // FIRST-BY-EVENT-TIME quota — deterministic whatever the arrival
    // order — which is what makes the gate oracle-able as a batch ranking.
    // Only user-hours that actually rejected something are emitted.
    Q("q172_stream_quota",
      (s, d) => {
        import s.implicits._
        val staticDf = s.read.parquet(s"$d/events.parquet")
        val stream = s.readStream.schema(staticDf.schema)
          .parquet(Staging.stageTable(d, "events"))
        val keyed = graft.Tables.normalizeTs(stream)
          .select($"user_id", expr("unix_micros(ts) div 3600000000").as("hr"),
            expr("unix_micros(ts)").as("us"), $"event_id")
          .as[(Long, Long, Long, Long)]
          .groupByKey(r => (r._1, r._2))
        val quotas = keyed.flatMapGroupsWithState(
          org.apache.spark.sql.streaming.OutputMode.Append,
          org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
          (key: (Long, Long), rows: Iterator[(Long, Long, Long, Long)],
              state: org.apache.spark.sql.streaming.GroupState[Long]) =>
            val admittedBefore = state.getOption.getOrElse(0L)
            val batch = rows.toSeq.sortBy(r => (r._3, r._4))
            val admitNow = math.min(math.max(1L - admittedBefore, 0L), batch.size.toLong)
            state.update(admittedBefore + admitNow)
            val rejected = batch.size - admitNow
            if (rejected > 0)
              Iterator((key._1, key._2, batch.size.toLong, admitNow, rejected))
            else Iterator.empty
        }.toDF("user_id", "hr", "n_events", "n_admitted", "n_rejected")

        val name = "q172_stream_quota_sink"
        val query = quotas.writeStream
          .outputMode("append")
          .format("memory")
          .queryName(name)
          .start()
        try query.processAllAvailable()
        finally query.stop()
        s.table(name).orderBy($"user_id", $"hr")
      },
      Some("""WITH r AS (
             |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS hr,
             |    row_number() OVER (PARTITION BY user_id, epoch_ns(ts) // 3600000000000
             |      ORDER BY ts, event_id) AS rk
             |  FROM events)
             |SELECT user_id, hr, count(*) AS n_events,
             |  CAST(sum(CASE WHEN rk <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
             |  CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected
             |FROM r GROUP BY 1, 2 HAVING count(*) > 1
             |ORDER BY user_id, hr""".stripMargin))
,

    // foreachBatch materialized view with an idempotent batch-id-
    // partitioned sink (see Materialize) — exactly-once on a store with
    // no transactional sink: at-least-once delivery + idempotent
    // partition overwrite. Four staged files → four micro-batches of
    // partials; the view folds them and must equal the batch aggregate.
    Q("q206_stream_mview",
      (s, d) => Materialize.run(s, d),
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |  count(*) AS n, round(sum(value), 4) AS total_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    // Spark 4 transformWithState (see TwsAccount): ValueState running
    // count+sum, ListState bounded top-2, MapState per-type counts, on
    // the RocksDB provider the API requires. One staged file → one
    // micro-batch → the update-mode sink equals the batch aggregation.
    Q("q211_stream_tws",
      (s, d) => TwsAccount.accountStats(s, d, "q211_stream_tws_sink"),
      Some("""WITH base AS (
             |  SELECT user_id, event_id, value, event_type FROM events),
             |agg AS (
             |  SELECT user_id, count(*) AS n, round(sum(value), 6) AS sum_value
             |  FROM base GROUP BY 1),
             |ranked AS (
             |  SELECT user_id, value,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY value DESC, event_id) AS rk
             |  FROM base),
             |tops AS (
             |  SELECT user_id,
             |    round(max(CASE WHEN rk = 1 THEN value END), 6) AS top1,
             |    round(max(CASE WHEN rk = 2 THEN value END), 6) AS top2
             |  FROM ranked WHERE rk <= 2 GROUP BY 1),
             |types AS (
             |  SELECT user_id, event_type, count(*) AS c
             |  FROM base GROUP BY 1, 2),
             |tstat AS (
             |  SELECT user_id, count(*) AS n_types, max(c) AS top_type_n
             |  FROM types GROUP BY 1),
             |argm AS (
             |  SELECT t.user_id, min(t.event_type) AS top_type
             |  FROM types t JOIN tstat s ON s.user_id = t.user_id
             |    AND t.c = s.top_type_n
             |  GROUP BY 1)
             |SELECT a.user_id, a.n, a.sum_value, p.top1, p.top2,
             |  s.n_types, m.top_type, CAST(s.top_type_n AS BIGINT) AS top_type_n
             |FROM agg a
             |JOIN tops p ON p.user_id = a.user_id
             |JOIN tstat s ON s.user_id = a.user_id
             |JOIN argm m ON m.user_id = a.user_id
             |WHERE a.n >= 2
             |ORDER BY a.user_id""".stripMargin)),

    // Event-time timers + state eviction on transformWithState (see
    // TwsTimers): per-user inactivity alerts fired by the WATERMARK
    // passing last_seen + 30 min — the no-data micro-batch after the
    // file batch fires them; the strict 31-min predicate makes the
    // result a pure function of the data.
    Q("q217_stream_timers",
      (s, d) => TwsTimers.inactiveUsers(s, d, "q217_stream_timers_sink"),
      Some("""WITH mx AS (SELECT max(ts) AS m FROM events),
             |u AS (SELECT user_id, max(ts) AS last_seen FROM events GROUP BY 1)
             |SELECT user_id, last_seen
             |FROM u, mx
             |WHERE last_seen + INTERVAL 31 MINUTE <= m - INTERVAL 10 MINUTE
             |ORDER BY user_id""".stripMargin))
  )
}
