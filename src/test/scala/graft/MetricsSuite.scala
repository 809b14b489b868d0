package graft

import org.apache.spark.sql.functions._

/** Independent pins for the evaluation/governance metrics (ops.Metrics):
  * each test recomputes the metric a DIFFERENT way on the sf0.001 corpus
  * (driver-side brute force over collected rows) and compares against the
  * distributed formulation — so a shared algebra mistake cannot hide in
  * both the query and its DuckDB oracle.
  */
class MetricsSuite extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(7).map(b => f"$b%02x").mkString.take(13), 16)
  }

  test("q194 AUC equals the brute-force pairwise comparison count") {
    import spark.implicits._
    val rows = Tables.documents(spark, sf)
      .select($"n_chars", ($"lang" === "en").cast("int")).as[(Long, Int)].collect()
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    var u = 0.0
    for (p <- pos; n <- neg)
      u += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val expected = u / (pos.length.toLong * neg.length)
    val got = run("q194_auc").head()
    assert(got.getAs[Long]("n_pos") === pos.length.toLong)
    assert(got.getAs[Long]("n_neg") === neg.length.toLong)
    assert(fpEquals(got.getAs[Double]("auc"), expected, 1e-6))
  }

  test("q195 t-closeness equals a driver-side total-variation distance") {
    import spark.implicits._
    val bands = Tables.customer(spark, sf)
      .select($"c_mktsegment", floor($"c_acctbal" / 2000.0).cast("long"))
      .as[(String, Long)].collect()
    val global = bands.groupBy(_._2).view.mapValues(_.length.toDouble / bands.length).toMap
    val expected = bands.groupBy(_._1).map { case (seg, rs) =>
      val dist = rs.groupBy(_._2).view.mapValues(_.length.toDouble / rs.length).toMap
      seg -> global.keys.map(b =>
        math.abs(dist.getOrElse(b, 0.0) - global(b))).sum / 2.0
    }
    val got = run("q195_t_closeness").collect()
      .map(r => r.getAs[String]("seg") -> r.getAs[Double]("t")).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (seg, t) =>
      assert(fpEquals(t, expected(seg), 1e-6), seg)
      assert(t >= 0.0 && t <= 1.0)
    }
  }

  test("q196 sample is exactly the k smallest hashes per language") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"doc_id").as[(String, Long)].collect()
    val expected = docs.groupBy(_._1).view.mapValues { rs =>
      rs.map { case (_, id) => (md5Long(s"smp:$id"), id) }
        .sortBy(identity).take(8).map(_._2).toSeq
    }.toMap
    val got = run("q196_group_sample").collect()
      .groupBy(_.getAs[String]("lang")).view.mapValues(
        _.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq).toMap
    assert(got === expected)
  }

  test("q197 phrase hits equal a per-document token-walk recount") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = texts.map { case (id, t) =>
      val w = t.split(" ")
      id -> (0 until math.max(w.length - 1, 0))
        .count(i => w(i) == "fast" && w(i + 1) == "table")
    }.filter(_._2 > 0).toMap
    val got = run("q197_phrase_search").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits").toInt).toMap
    assert(got === expected)
  }

  test("q198 centroid cosines match a driver-side mean-vector computation") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf)
      .select($"label", $"embedding").as[(Int, Seq[Float])].collect()
    val cents = vecs.groupBy(_._1).view.mapValues { rs =>
      val dim = rs.head._2.length
      (0 until dim).map { i =>
        BigDecimal(rs.map(_._2(i).toDouble).sum / rs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = run("q198_centroid_sim").collect()
    assert(got.length === cents.size * (cents.size - 1) / 2)
    got.foreach { r =>
      val expect = cos(cents(r.getAs[Int]("la")), cents(r.getAs[Int]("lb")))
      assert(fpEquals(r.getAs[Double]("cosine"), expect, 1e-3))
    }
  }

  test("q199 calibration rates are exact train/test ratios per band") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", least(lit(7L), ($"n_chars" / 64).cast("long")),
        ($"lang" === "en").cast("int")).as[(Long, Long, Int)].collect()
    val got = run("q199_calibration").collect()
    got.foreach { r =>
      val band = r.getAs[Long]("band")
      val train = docs.filter(d => d._1 % 2 == 0 && d._2 == band)
      val test = docs.filter(d => d._1 % 2 == 1 && d._2 == band)
      assert(r.getAs[Long]("n_train") === train.length.toLong)
      assert(r.getAs[Long]("n_test") === test.length.toLong)
      assert(fpEquals(r.getAs[Double]("pred_p"),
        train.map(_._3).sum.toDouble / train.length, 1e-6))
      assert(fpEquals(r.getAs[Double]("obs_p"),
        test.map(_._3).sum.toDouble / test.length, 1e-6))
    }
  }

  test("q200 NDCG is in (0, 1] and 1 when quantization preserves the ranking") {
    val got = run("q200_quantized_ndcg").collect()
    assert(got.length === 8)
    got.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg")
      assert(r.getAs[Double]("idcg") > 0.0)
      // idcg ranks by the SAME gains dcg draws from, so dcg <= idcg up to
      // the 4-dp rounding of the two sums
      assert(ndcg > 0.0 && ndcg <= 1.0001, s"qid=${r.get(0)} ndcg=$ndcg")
    }
    // int8 over 64 dims preserves top-5 rankings nearly perfectly; a
    // mid-range NDCG would mean the codes, not the metric, broke
    assert(got.map(_.getAs[Double]("ndcg")).min > 0.8)
  }
}
