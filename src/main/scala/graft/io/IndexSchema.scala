package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interop layer for the reference's on-disk index layout.
  *
  * The reference persists its index as Avro-record parquet
  * (rice-schemas/src/main/resources/avro/rice.avdl:21-33, written by
  * rice-cli/src/main/scala/org/bdgenomics/rice/cli/Index.scala:77-93
  * via `adamParquetSave`):
  *   OUTPUT_kmers:   record KmerToClass   { string kmer; long equivalenceClass; }
  *   OUTPUT_classes: record ClassContents { long equivalenceClass; array<string> kmers; }
  *
  * Avro-backed parquet read back through Spark's parquet reader surfaces
  * exactly those record field names as columns, so schema compatibility
  * here is a column-name contract: `equivalenceClass` on disk versus the
  * internal short name `ec`. Writers emit either layout; the reader
  * accepts both, so a user can point graft's `quantify` at an index
  * written by the reference (or hand a graft `-avro_compat` index back
  * to ADAM tooling) without a conversion pass.
  */
object IndexSchema {

  /** rice.avdl:23-26 field names. */
  val KmerField = "kmer"
  val ClassField = "equivalenceClass"
  /** rice.avdl:28-31 field names. */
  val KmersField = "kmers"

  /** Internal kmerToEc(kmer, ec) → on-disk KmerToClass layout. */
  def kmersToAvroCompat(kmerToEc: DataFrame): DataFrame =
    kmerToEc.withColumnRenamed("ec", ClassField)

  /** Internal ecToKmers(ec, kmers) → on-disk ClassContents layout
    * (field order matches the record declaration). */
  def classesToAvroCompat(ecToKmers: DataFrame): DataFrame =
    ecToKmers.withColumnRenamed("ec", ClassField)
      .select(ClassField, KmersField)

  /** Read an index side table written in EITHER layout, normalizing to
    * the internal `ec` name. Detection is by column name, not a flag —
    * a reference-written KmerToClass/ClassContents parquet and a graft
    * tuple parquet load identically. */
  def readNormalized(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    if (df.columns.contains(ClassField)) df.withColumnRenamed(ClassField, "ec")
    else df
  }
}
