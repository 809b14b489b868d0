package graft.calibrate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.ml.functions.array_to_vector
import graft.kmer.Kmers

/** Bias calibration — Spark-SQL/spark.ml re-expression of the reference's
  * Tare (rice-core .../algorithms/Tare.scala).
  *
  * Two corrections:
  *  - k-mer GC/sequence-context bias: regress log(count) on the 16-dim
  *    dinucleotide-context histogram, keep the residual (Tare.scala:110-136).
  *  - transcript length bias: driver-side OLS of log(µ̂) on log(len) over a
  *    collected sample — deliberately NOT distributed; the reference found
  *    MLlib SGD does not converge for 1-D features (Tare.scala:156-177 and
  *    the comment at :164-167), and the sample is tiny.
  */
object Tare {

  /** Recalibrate k-mer counts for sequence-context bias
    * (Tare.scala:110-136).
    *
    * calibrated = exp(sampleMeanLog + (log(count) − model(features))) as Long
    * where sampleMeanLog = log(Σ count / #kmers) — the reference computes it
    * with two accumulators (Tare.scala:112-117); here it is one two-aggregate
    * pass (SURVEY A10). The SGD regressor becomes spark.ml LinearRegression
    * (normal-equation/LBFGS solver — SGD was removed in Spark 2 and converged
    * poorly anyway).
    *
    * @param kmers DataFrame(kmer, count)
    * @return DataFrame(kmer, count) with calibrated counts
    */
  def calibrateKmers(kmers: DataFrame): DataFrame = {
    val featurized = kmers
      .withColumn("label", log(col("count").cast("double")))
      .withColumn("features", array_to_vector(Kmers.dinucFeatures(col("kmer"))))
      .cache()

    val Seq(nKmers, totalMult) =
      featurized.agg(count(lit(1)), sum("count")).head().toSeq.map(_.toString.toDouble)
    val mean = math.log(totalMult / nKmers)

    val model = new LinearRegression().setFitIntercept(true).fit(featurized)

    val predicted = model.transform(featurized) // adds "prediction"
    val out = predicted
      .select(col("kmer"),
        exp(lit(mean) + (col("label") - col("prediction"))).cast("long").as("count"))
    featurized.unpersist()
    out
  }

  /** Recalibrate transcript abundances for length bias
    * (Tare.scala:150-193). As-built semantics preserved exactly, including
    * the quirk that the fitted line is applied to the abundance µ̂ itself,
    * not to log-length (Tare.scala:187, SURVEY F6):
    *
    *   cal_i = exp(mean + slope·µ̂_i + intercept − µ̂_i),  mean = −log(n_sample)
    *
    * then renormalized to Σ = 1 (Tare.scala:189-192).
    *
    * @param muHat DataFrame(tid, muHat) — all abundances must be > 0
    * @param tLen  DataFrame(tid, len)
    * @return DataFrame(tid, muHat) calibrated
    */
  def calibrateTxLenBias(muHat: DataFrame, tLen: DataFrame,
      samplingRate: Double = 1.0): DataFrame = {
    // driver-side OLS on the (small, possibly sampled) (log µ̂, log len) pairs
    val local = muHat.join(broadcast(tLen), "tid")
      .select(col("muHat"), col("len").cast("double"))
      .sample(withReplacement = false, samplingRate)
      .collect()
      .map(r => (math.log(r.getDouble(0)), math.log(r.getDouble(1))))

    val n = local.length.toDouble
    val mean = -math.log(n)
    val sx = local.map(_._2).sum
    val sy = local.map(_._1).sum
    val sxx = local.map(p => p._2 * p._2).sum
    val sxy = local.map(p => p._1 * p._2).sum
    // closed-form normal equations for y = slope·x + intercept (the
    // reference solves the same 2×2 system with jblas, Tare.scala:168-176)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n

    val cal = muHat.withColumn("cal",
      exp(lit(mean) + (lit(slope) * col("muHat") + lit(intercept)) - col("muHat")))
    // Σ=1 renormalization (Tare.scala:189-192) via broadcast scalar agg
    cal.crossJoin(broadcast(cal.agg(sum("cal").as("totalCal"))))
      .select(col("tid"), (col("cal") / col("totalCal")).as("muHat"))
  }
}
