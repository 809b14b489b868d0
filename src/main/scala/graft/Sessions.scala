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
  def local(cpus: String): SparkSession = forMaster(s"local[$cpus]", cpus)

  /** Same config surface as [[local]] for an arbitrary master URL — the
    * Scale cluster probe passes `local-cluster[n,cores,mem]` here to run
    * the same queries through REAL executor JVMs (separate processes,
    * serialized shuffle/broadcast over localhost) instead of local mode's
    * in-process shortcut. Executors are launched from SPARK_HOME and see
    * only its jars, so the library's own classes are shipped via
    * `spark.executor.extraClassPath` (the compiled classes dir — on a
    * real cluster this is the application jar `spark-submit` distributes). */
  def forMaster(master: String, shufflePartitions: String): SparkSession = {
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      // resolve the classes dir from this class's own code source, not the
      // CWD: launched from any other directory, a relative path would hand
      // executors a nonexistent classpath and every task would die in an
      // opaque ClassNotFoundException far from the cause
      val classes = Option(getClass.getProtectionDomain.getCodeSource)
        .map(cs => new java.io.File(cs.getLocation.toURI).getAbsolutePath)
        .getOrElse(new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      builder.config("spark.executor.extraClassPath", classes)
    }
    val spark = builder.getOrCreate()
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
