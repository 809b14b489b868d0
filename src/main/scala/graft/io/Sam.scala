package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SAM read source (public SAM spec v1.6 — samtools.github.io/hts-specs).
  * The reference's `loadAlignments` dispatches SAM/BAM via ADAM
  * (rice-cli/.../cli/Quantify.scala:73, SURVEY S1); only `.sequence` is ever
  * consumed downstream, which in SAM is column 11 of each alignment line.
  *
  * Pure column expressions over a distributed text scan — header lines
  * (leading '@') are filtered, '*' (sequence not stored) is dropped. Scales
  * like any text source: splittable, predicate/projection stay in codegen.
  */
object Sam {

  /** DataFrame(sequence string) — one row per alignment with a stored
    * sequence. */
  def reads(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(!col("value").startsWith("@"))
      .select(split(col("value"), "\t").getItem(9).as("sequence"))
      .filter(col("sequence").isNotNull && col("sequence") =!= "*")
}
