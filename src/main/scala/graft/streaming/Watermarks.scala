package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time watermarking (SURVEY §2.8 scale extension): hourly windowed
  * counts in APPEND mode with a bounded-lateness watermark. A window is
  * emitted exactly once — when the watermark passes its end — and events
  * arriving later than the watermark are dropped, which is what bounds the
  * state store at 100 TB: state size is (windows within the lateness
  * horizon) × (group cardinality), not unbounded history.
  */
object Watermarks {

  /** @param events streaming DataFrame with an event-time `ts` column
    * @param lateness watermark delay, e.g. "1 hour"
    * @return DataFrame(window_start timestamp, n long)
    */
  def hourlyWindowCounts(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))
}
