package graft

import org.apache.spark.sql.functions._

/** Independent pins for the aggregate-expressed model fitting (ops.Learn):
  * each test recomputes the model a DIFFERENT way on the sf0.001 corpus
  * (plain driver-side loops over collected rows, no Spark algebra), so a
  * shared mistake cannot hide in both the query and its DuckDB oracle.
  */
class LearnSuite extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def collectFeats(): Array[(Double, Double, Double, Double)] = {
    import spark.implicits._
    Tables.documents(spark, sf)
      .select(
        when($"lang" === "en", 1.0d).otherwise(0.0d),
        lit(1.0d),
        $"n_chars" / 256.0d,
        size(split($"text", " ")) / 64.0d)
      .as[(Double, Double, Double, Double)].collect()
  }

  test("q208 trace equals a driver-side gradient-descent loop and loss falls") {
    val rows = collectFeats()
    val n = rows.length.toDouble
    var w = Array(0.1, 0.01, 0.01)
    def r8(v: Double) =
      BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (1 to 3).map { _ =>
      var g0 = 0.0; var g1 = 0.0; var g2 = 0.0; var loss = 0.0
      rows.foreach { case (y, x0, x1, x2) =>
        val p = 1.0 / (1.0 + math.exp(-(w(0) * x0 + w(1) * x1 + w(2) * x2)))
        g0 += (p - y) * x0; g1 += (p - y) * x1; g2 += (p - y) * x2
        loss += -(y * math.log(p) + (1 - y) * math.log(1 - p))
      }
      w = Array(r8(w(0) - r8(g0 / n)), r8(w(1) - r8(g1 / n)), r8(w(2) - r8(g2 / n)))
      (w(0), w(1), w(2), loss / n)
    }
    val got = run("q208_logreg_gd").orderBy("step").collect()
    assert(got.length === 3)
    got.zip(expected).foreach { case (r, (w0, w1, w2, loss)) =>
      assert(fpEquals(r.getAs[Double]("w0"), w0, 1e-7))
      assert(fpEquals(r.getAs[Double]("w1"), w1, 1e-7))
      assert(fpEquals(r.getAs[Double]("w2"), w2, 1e-7))
      assert(fpEquals(r.getAs[Double]("loss_before"), loss, 1e-3))
    }
    // convergence certificate: at η = 1 on this data the loss must fall
    val losses = got.map(_.getAs[Double]("loss_before"))
    assert(losses(1) < losses(0) && losses(2) < losses(1))
  }

  test("q209 segmentation equals exhaustive enumeration over the same vocab") {
    import spark.implicits._
    // rebuild vocab + targets exactly as the query does, on the driver
    val words = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t"))
      .select(lower($"t").as("w")).filter($"w".rlike("^[a-z]+$"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val grams = scala.collection.mutable.Map.empty[String, Long]
    for ((w, _) <- words; n <- 1 to 3; i <- 0 to w.length - n)
      grams.updateWith(w.substring(i, i + n))(c => Some(c.getOrElse(0L) + 1L))
    val uni = grams.filter(_._1.length == 1).toMap
    val topNg = grams.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(24).toMap
    val vocab0 = uni ++ topNg
    val tot = vocab0.values.sum.toDouble
    val vocab = vocab0.map { case (p, c) =>
      p -> math.round(-1000000.0 * math.log(c / tot))
    }
    // exhaustive segmentations (words are ≤ 12 chars)
    def enumerate(word: String): Seq[(Long, Int)] = {
      if (word.isEmpty) Seq((0L, 0))
      else (1 to math.min(3, word.length)).flatMap { n =>
        vocab.get(word.take(n)).toSeq.flatMap { c =>
          enumerate(word.drop(n)).map { case (cc, np) => (c + cc, np + 1) }
        }
      }
    }
    val targets = words.filter(_._1.length <= 12)
      .sortBy { case (w, c) => (-c, w) }.take(200)
    val expected = targets.map { case (w, cnt) =>
      val segs = enumerate(w)
      val best = segs.map(_._1).min
      (w, cnt, best, segs.filter(_._1 == best).map(_._2).min.toLong)
    }.sortBy(_._1)
    val got = run("q209_unigram_segment").collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("cnt"),
        r.getAs[Long]("cost"), r.getAs[Long]("n_pieces")))
    assert(got.toSeq === expected.toSeq)
    // every word must cost at least one piece and decompose into ≥ 1 pieces
    got.foreach { case (w, _, cost, np) =>
      assert(cost > 0 && np >= 1 && np <= w.length)
    }
  }

  test("q210 ridge weights solve the driver-side normal equations") {
    import spark.implicits._
    val rows = Tables.documents(spark, sf)
      .select(
        $"n_chars" / 256.0d,
        lit(1.0d),
        size(split($"text", " ")) / 64.0d,
        length(regexp_replace($"text", "[^.!?,;]", "")) / 8.0d)
      .as[(Double, Double, Double, Double)].collect()
    // accumulate the Gram matrix without rounding, solve by Gaussian
    // elimination (a different algorithm than the query's Cramer rule)
    val a = Array.ofDim[Double](3, 4)
    rows.foreach { case (y, x0, x1, x2) =>
      val x = Array(x0, x1, x2)
      for (i <- 0 until 3) {
        for (j <- 0 until 3) a(i)(j) += x(i) * x(j)
        a(i)(3) += x(i) * y
      }
    }
    for (i <- 0 until 3) a(i)(i) += 1.0 // λ = 1
    for (i <- 0 until 3) {
      val piv = a(i)(i)
      for (j <- i to 3) a(i)(j) /= piv
      for (k <- 0 until 3 if k != i) {
        val f = a(k)(i)
        for (j <- i to 3) a(k)(j) -= f * a(i)(j)
      }
    }
    val got = run("q210_ridge_normal_eq").head()
    assert(fpEquals(got.getAs[Double]("w0"), a(0)(3), 1e-4))
    assert(fpEquals(got.getAs[Double]("w1"), a(1)(3), 1e-4))
    assert(fpEquals(got.getAs[Double]("w2"), a(2)(3), 1e-4))
  }
}
