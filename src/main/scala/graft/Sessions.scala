package graft

import org.apache.spark.sql.SparkSession

/** One place to build sessions so every entry point (Verify, Bench, tests)
  * carries the same scale-relevant config.
  *
  * - shuffle.partitions sized to the local core count (not the 200 default);
  *   on a real cluster this would be tuned to ~2-3× total cores or left to AQE
  *   coalescing, which is enabled here and does the right thing at any SF.
  * - nanosAsLong: older vintages of the driver corpus stored `events.ts`
  *   as parquet TIMESTAMP(NANOS), which Spark 4 refuses by default; with
  *   the flag it reads as a nanosecond Long and the loader normalizes it
  *   (Tables.normalizeTs — which also handles the current MICROS-NTZ
  *   vintage, where the flag is simply inert).
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the library's optimizer extension (a cluster would set
    // spark.sql.extensions=graft.functions.GraftExtensions instead);
    // idempotent across getOrCreate-shared sessions
    if (!spark.experimental.extraOptimizations.contains(plans.RangeBinJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.RangeBinJoin
    // planner strategy for the native as-of join (plans.AsOfJoinPlan)
    if (!spark.experimental.extraStrategies.contains(plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ plans.AsOfJoinStrategy
    spark
  }
}
