package graft

import org.apache.spark.sql.functions._

/** Pins for the native TypedImperativeAggregate HLL sketch
  * (functions.HllRegisterAgg). */
class HllSuite extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("registers are partition-invariant: the merge path is exact") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf)
      .select($"source", explode(split($"text", " ")).as("w"))
    def regs(parts: Int) = toks.repartition(parts)
      .groupBy($"source")
      .agg(graft.functions.HllRegisterAgg.hllRegisters($"w").as("regs"))
      .collect().map(r => r.getAs[String]("source") ->
        r.getSeq[Int](1).toVector).toMap
    val one = regs(1)
    val many = regs(7)
    assert(one === many,
      "register maxima must not depend on how partials were merged")
    // and against a driver-side recomputation of the same sketch
    val rows = toks.as[(String, String)].collect()
    val expected = rows.groupBy(_._1).map { case (src, ws) =>
      val buf = new Array[Int](256)
      ws.map(_._2).distinct.foreach { w =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8"))
        val h = java.lang.Long.parseLong(
          d.take(7).map(b => f"$b%02x").mkString.take(13), 16)
        val bucket = (h % 256).toInt
        val rest = h >>> 8
        val rank = if (rest == 0L) 45
          else 45 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
        if (rank > buf(bucket)) buf(bucket) = rank
      }
      src -> buf.toVector
    }
    assert(one === expected)
  }

  test("q222 estimate lands within its declared envelope on every source") {
    val got = SparkEntry.queries("q222_hll_native")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("ok"),
        s"${r.getAs[String]("source")}: est ${r.getAs[Double]("hll_est")} " +
          s"vs exact ${r.getAs[Long]("n_exact")}")
    }
  }
}
