package graft.streaming

import org.apache.spark.sql.DataFrame

/** Durable-checkpoint streaming drive — the production counterpart of the
  * one-shot temp-checkpoint queries in [[StreamingQueries]]: source offsets
  * AND operator state persist under `checkpointDir`, so calling [[drain]]
  * again after more data lands RESUMES exactly-once from the previous stop
  * instead of reprocessing history. At 100 TB/day this is the difference
  * between replaying weeks of input after every deploy and picking up at
  * the committed offset; StreamingSuite pins both halves of the contract
  * (the resumed result equals the batch answer, and the restart reads only
  * the newly-landed files).
  */
object Restart {

  /** Drain everything currently available through a memory sink named
    * `sinkName`, committing offsets and state under `checkpointDir`.
    * @return (final sink table, input rows read by THIS drain) */
  def drain(agg: DataFrame, sinkName: String, checkpointDir: String,
      outputMode: String = "complete"): (DataFrame, Long) = {
    val query = agg.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(sinkName)
      .option("checkpointLocation", checkpointDir)
      .start()
    try query.processAllAvailable()
    finally query.stop()
    val read = query.recentProgress.map(_.numInputRows).sum
    (agg.sparkSession.table(sinkName), read)
  }
}
