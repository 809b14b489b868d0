package graft

import java.nio.file.Files

/** Pins the co-located-join contract of `io.Bucketed`: a join of two
  * tables bucketed on the join key must read the buckets directly — no
  * Exchange on either side — while the identical join over plain parquet
  * shuffles both. This is the persisted-pre-shuffle layout the 100 TB
  * fact⋈fact joins rely on (PLANS.md); the spec fails if a Spark upgrade
  * or session-config change silently re-introduces the shuffle.
  */
class BucketingSuite extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("bucketed join is exchange-free; plain-parquet control shuffles") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft_bucketed").toFile
    val li = Tables.lineitem(s, sf).select($"l_orderkey", $"l_quantity")
    val ord = Tables.orders(s, sf).select($"o_orderkey", $"o_totalprice")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      io.Bucketed.write(li, "li_b", s"$wh/li_b", 8, Seq("l_orderkey"))
      io.Bucketed.write(ord, "ord_b", s"$wh/ord_b", 8, Seq("o_orderkey"))
      // forbid broadcast so the join strategy question is SMJ-with-or-
      // without-Exchange, the thing bucketing decides
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
        df.collect() // let AQE finalize before reading the executed plan
        df.queryExecution.executedPlan.toString
      }
      val bucketed = io.Bucketed.table(s, "li_b")
        .join(io.Bucketed.table(s, "ord_b"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))
      val control = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))

      val bPlan = finalPlan(bucketed)
      val cPlan = finalPlan(control)
      assert(!bPlan.contains("Exchange"),
        s"bucketed join must be shuffle-free, got:\n$bPlan")
      assert(cPlan.contains("Exchange"),
        "control should shuffle — if not, the assertion above proves nothing")
      // same answer both ways
      assert(bucketed.orderBy($"l_orderkey").collect().map(_.toString).toSeq ===
        control.orderBy($"l_orderkey").collect().map(_.toString).toSeq)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS li_b")
      s.sql("DROP TABLE IF EXISTS ord_b")
      org.apache.commons.io.FileUtils.deleteQuietly(wh)
    }
  }

  test("hive-partitioned write prunes non-matching partitions at scan time") {
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_partitioned").toFile
    try {
      // the other half of the 100 TB layout story: directory partitioning
      // by a low-cardinality filter column means a lang='de' query never
      // OPENS the other languages' files — pruning happens in the driver
      // against the partition index, before any task launches
      Tables.documents(s, sf).write.partitionBy("lang")
        .mode("overwrite").parquet(s"$dir/docs")
      val back = s.read.parquet(s"$dir/docs").filter($"lang" === "de")
      val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("PartitionFilters") && scan.contains("lang"),
        s"lang filter must prune partitions, got scan:\n$scan")
      // pruned scan reads only the de directory's files
      val expected = Tables.documents(s, sf).filter($"lang" === "de").count()
      assert(back.count() === expected)
      val allParts = new java.io.File(s"$dir/docs").listFiles()
        .count(_.getName.startsWith("lang="))
      assert(allParts >= 2, "corpus should have produced multiple partitions")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
