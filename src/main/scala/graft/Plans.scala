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
    val perQuery = scala.collection.mutable.LinkedHashMap[String, PlanAudit.Counts]()
    for (q <- SparkEntry.allQueries
         if q.name != "q70_stream_hourly" && keep(q.name)) {
      sb.append(s"\n========== ${q.name} ==========\n")
      try {
        val df = q.fn(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        perQuery(q.name) = PlanAudit.scan(formatted)
        sb.append(formatted)
      } catch { case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n") }
    }
    // machine summary — the ONLY legitimate source for PLANS.md's headline
    // numbers (counted per detail-header node + per-node Arguments line,
    // never by grepping the raw text; see PlanAudit's scaladoc)
    val tot = perQuery.values.foldLeft(PlanAudit.Counts.zero)(_ + _)
    val sp = perQuery.filter(_._2.singlePartitionExchanges > 0)
    sb.append("\n========== SUMMARY ==========\n")
    sb.append(s"queries=${perQuery.size} exchanges=${tot.exchanges} " +
      s"singlePartitionExchanges=${tot.singlePartitionExchanges} " +
      s"(in ${sp.size} queries) sortMergeJoins=${tot.sortMergeJoins} " +
      s"broadcastHashJoins=${tot.broadcastHashJoins} " +
      s"broadcastNestedLoopJoins=${tot.broadcastNestedLoopJoins} " +
      s"cartesianProducts=${tot.cartesianProducts}\n")
    val spJson = sp.toSeq.sortBy(_._1)
      .map { case (n, c) => s""""$n": ${c.singlePartitionExchanges}""" }
      .mkString("{\n  ", ",\n  ", "\n}")
    sb.append(s"singlePartition per query:\n$spJson\n")
    Files.writeString(Paths.get(out), sb.toString)
    Files.writeString(Paths.get(out + ".sp.json"), spJson + "\n")
    println(s"[plans] wrote $out; summary: queries=${perQuery.size} " +
      s"SP=${tot.singlePartitionExchanges}/${sp.size}q SMJ=${tot.sortMergeJoins} " +
      s"BHJ=${tot.broadcastHashJoins} BNLJ=${tot.broadcastNestedLoopJoins} " +
      s"CP=${tot.cartesianProducts}")
  }
}
