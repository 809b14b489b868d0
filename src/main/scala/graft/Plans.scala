package graft

import java.nio.file.{Files, Paths}

/** Dumps the formatted physical plan of each declared query —
  * `runMain graft.Plans <sfDir> <outFile>`. Used to audit that filters
  * reach the parquet scans (PushedFilters), small dims broadcast, and
  * whole-stage codegen spans stay wide.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val sb = new StringBuilder
    // same local-iteration filter as Verify: SPARK_GRAFT_ONLY=q194,q200
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    def keep(name: String): Boolean = only.forall(_.exists(name.startsWith))
    for (q <- SparkEntry.allQueries
         if q.name != "q70_stream_hourly" && keep(q.name)) {
      sb.append(s"\n========== ${q.name} ==========\n")
      try {
        val df = q.fn(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote $out")
  }
}
