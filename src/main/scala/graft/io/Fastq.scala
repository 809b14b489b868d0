package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** FASTQ read source — the reference's `loadAlignments` dispatches FASTQ by
  * extension via ADAM (cli/Quantify.scala:73, SURVEY S1); only `.sequence`
  * is ever consumed downstream.
  *
  * FASTQ is 4 lines per record (public format): @name / sequence / + /
  * qualities. Line-order grouping needs a global line index, which a plain
  * DataFrame text scan does not expose — this is one of the rare genuine
  * per-partition imperative cases (SURVEY §7.1), so the RDD `zipWithIndex`
  * is used for exactly that one step and the result immediately returns to
  * DataFrame land. zipWithIndex costs one extra job to count partition
  * sizes, then the selection is narrow.
  */
object Fastq {

  /** DataFrame(sequence string) — one row per read. */
  def reads(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.textFile(path)
      .zipWithIndex()
      .filter { case (_, i) => i % 4 == 1 } // the sequence line of each record
      .map(_._1)
      .toDF("sequence")
  }

  /** Extension-dispatching read loader (SURVEY S1) — the reference's
    * three-format `loadAlignments` contract (cli/Quantify.scala:73):
    * parquet with a `sequence` column, FASTQ text, SAM text, or BAM. */
  def loadReads(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".fastq") || path.endsWith(".fq")) reads(spark, path)
    else if (path.endsWith(".sam")) Sam.reads(spark, path)
    else if (path.endsWith(".bam")) Bam.reads(spark, path)
    else spark.read.parquet(path).select("sequence")
}
