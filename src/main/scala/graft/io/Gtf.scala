package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GTF/GFF2 gene-annotation source — the rebuild of the reference's
  * `sc.loadGenes(path).flatMap(_.transcripts)` (cli/Index.scala:65-69,
  * cli/Quantify.scala:93-94, SURVEY S4), which the reference delegated to
  * ADAM. Implemented as a declarative text scan + column parsing so the
  * whole parse stays inside codegen and scales with the file.
  *
  * GTF is 9 tab-separated columns (seqname, source, feature, start, end,
  * score, strand, frame, attributes); exon features carry transcript_id /
  * gene_id in the attributes column (public format, per the Ensembl/UCSC
  * GTF2.2 spec).
  */
object Gtf {

  /** Exon-level relation: (tid, gene_id, seqname, start, end, strand).
    * GTF coordinates are 1-based inclusive; normalized here to the
    * half-open 0-based [start, end) the engine uses. */
  def exons(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
    raw
      .filter(!col("value").startsWith("#"))
      .select(split(col("value"), "\t").as("f"))
      .filter(size(col("f")) >= 9 && col("f").getItem(2) === "exon")
      .select(
        regexp_extract(col("f").getItem(8), """transcript_id "([^"]+)"""", 1).as("tid"),
        regexp_extract(col("f").getItem(8), """gene_id "([^"]+)"""", 1).as("gene_id"),
        col("f").getItem(0).as("seqname"),
        (col("f").getItem(3).cast("long") - 1).as("start"),
        col("f").getItem(4).cast("long").as("end"),
        (col("f").getItem(6) === "+").as("strand"))
      .filter(col("tid") =!= "")
  }

  /** Transcript-level relation matching the engine's Transcript shape:
    * (id, names, geneId, strand, exons array<struct<...>>). */
  def transcripts(spark: SparkSession, path: String): DataFrame =
    exons(spark, path)
      .groupBy(col("tid").as("id"))
      .agg(
        first("gene_id").as("geneId"),
        first("strand").as("strand"),
        sort_array(collect_list(struct(
          concat(col("tid"), lit(":"), col("start")).as("exonId"),
          col("tid").as("transcriptId"),
          col("strand").as("strand"),
          struct(col("seqname").as("referenceName"), col("start"), col("end")).as("region")
        ))).as("exons"))
      .select(col("id"), array(col("id")).as("names"), col("geneId"),
        col("strand"), col("exons"))
}
