package graft

import org.apache.spark.sql.functions._
import scala.math.{exp, log}
import scala.util.Random
import graft.calibrate.Tare
import graft.kmer.Kmers
import graft.utils.TranscriptGenerator

/** Port of the reference's TareSuite invariants
  * (rice-core/.../algorithms/TareSuite.scala), driven through columns.
  */
class TareSuite extends SparkSuite {
  import spark.implicits._

  private def featurize(kmer: String): Array[Double] =
    Seq(kmer).toDF("kmer").select(Kmers.dinucFeatures(col("kmer")))
      .head().getSeq[Double](0).toArray

  test("can't process illegal k-mers") { // TareSuite.scala:36-46
    for (bad <- Seq("AN", "A", "ANTNC")) {
      try {
        val r = featurize(bad)
        fail(s"no exception for $bad, got: ${r.mkString(",")}")
      } catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable =>
          assert(e.getMessage.contains("valid"), s"for $bad got: ${e.getClass} ${e.getMessage}")
      }
    }
  }

  test("chop a 2-mer into a feature") { // TareSuite.scala:48-58
    val featureAA = featurize("AA")
    assert(fpEquals(featureAA(0), 1.0))
    (1 to 15).foreach(i => assert(fpEquals(featureAA(i), 0.0)))
    val featureTT = featurize("TT")
    assert(fpEquals(featureTT(15), 1.0))
    (0 to 14).foreach(i => assert(fpEquals(featureTT(i), 0.0)))
  }

  test("chop an 5-mer with a bad base into a feature") { // TareSuite.scala:60-66
    val feature = featurize("AANTT")
    assert(fpEquals(feature(0), 0.5))
    assert(fpEquals(feature(15), 0.5))
    (1 to 14).foreach(i => assert(fpEquals(feature(i), 0.0)))
  }

  test("generate biased kmers and try correcting their counts") { // TareSuite.scala:68-94
    val sampleString = TranscriptGenerator.generateString(500, new Random(121212L))
    val kmerSamples = sampleString.sliding(15).map { s =>
      val gc = s.count(c => c == 'C' || c == 'G').toDouble / 15.0
      (s, (100.0 * exp(2.0 + 1.0 * (gc - 0.5))).toLong)
    }.toSeq

    val df = kmerSamples.toDF("kmer", "count")
    val Array(origMax, origMin) =
      df.agg(max("count"), min("count")).head().toSeq.map(_.asInstanceOf[Long]).toArray
    val cal = Tare.calibrateKmers(df).cache()
    val Array(newMax, newMin) =
      cal.agg(max("count"), min("count")).head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(origMax > newMax)
    assert(origMin < newMin)
  }

  test("calibrateKmersExact matches the spark.ml fit's predictions") {
    // all 256 DNA 4-mers with a GC-biased count — the explicit
    // normal-equation solve (raw integer dinuc counts, no intercept) must
    // reproduce spark.ml LinearRegression's predictions (normalized
    // features + intercept): the two designs span the same column space,
    // so the OLS projections coincide. calibrateKmers floors to Long;
    // the exact variant keeps the 6-dp double, hence the <1.01 bound.
    val bases = "ACGT"
    val kmers4 = for (a <- bases; b <- bases; c <- bases; d <- bases)
      yield s"$a$b$c$d"
    val fixture = kmers4.map { s =>
      val gc = s.count(ch => ch == 'C' || ch == 'G').toDouble / 4.0
      (s, (100.0 * exp(2.0 + 1.0 * (gc - 0.5))).toLong)
    }.toDF("kmer", "count")
    val ml = Tare.calibrateKmers(fixture)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tare.calibrateKmersExact(fixture, 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.size === 256)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - ml(k)) < 1.01,
        s"$k: exact=$v vs ml-floored=${ml(k)}")
    }
  }

  test("calibrateTxLenBias for 4 hand-picked values") { // TareSuite.scala:96-118
    val muHat = Seq(("a", 0.28), ("b", 0.17), ("c", 0.31), ("d", 0.24)).toDF("tid", "muHat")
    val tLen = Seq(("a", 28L), ("b", 17L), ("c", 31L), ("d", 24L)).toDF("tid", "len")
    val cal = Tare.calibrateTxLenBias(muHat, tLen)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(cal.size === 4)
    Seq("a", "b", "c", "d").foreach(t => assert(fpEquals(cal(t), 0.25), s"at $t"))
  }

  private def lengthOnlyVariation(dataSize: Int): Unit = { // TareSuite.scala:120-147
    val rand = new Random(113402062015L)
    val r = (0 to dataSize).map(i => (i.toString, 1L + rand.nextInt(10)))
    val sum = r.map(_._2).sum.toDouble
    val muHat = r.map(x => (x._1, x._2 / sum)).toDF("tid", "muHat")
    val tLen = r.toDF("tid", "len")
    val cal = Tare.calibrateTxLenBias(muHat, tLen).collect()
    cal.foreach(row => assert(fpEquals(row.getDouble(1), 1.0 / (dataSize + 1))))
  }

  test("randomized calibrateTxLenBias, small data size") { lengthOnlyVariation(10) }
  test("randomized calibrateTxLenBias, larger data size") { lengthOnlyVariation(10000) }
}
