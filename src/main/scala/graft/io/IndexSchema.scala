package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, explode}

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
  *
  * One asymmetry is deliberate. The reference layout has NO transcript
  * side table: its own CLI feeds the ClassContents strings straight
  * into `Quantify.apply`'s `equivalenceClassToTranscript` parameter
  * (rice-cli Quantify.scala:90-99 passes `classMap` — built from
  * `_classes` — as the third argument), even though the indexer wrote
  * k-mers into that field (algorithms/Index.scala:104-110 `idsToKmers`).
  * Graft instead persists the real (ec, tid) mapping as `OUTPUT_tx` and,
  * for a reference-written index that lacks it, [[readEcToTx]] either
  * fails with an explanation or — on explicit opt-in — reproduces the
  * reference CLI's wiring verbatim.
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

  /** The ec→transcript side table for `quantify`, layout-aware.
    *
    * - Graft-written index: reads `INDEX_tx(ec, tid)` directly.
    * - Reference-written index (no `_tx` on disk): the reference layout
    *   carries no transcript table, so by default this FAILS with a
    *   message saying exactly that (rather than a bare missing-path
    *   error deep in a parquet scan). With `classesAsTx = true` it
    *   instead reproduces the reference CLI's own wiring — the
    *   `_classes` contents exploded as transcript ids, exactly what
    *   rice-cli Quantify.scala:90-99 hands to `Quantify.apply` — for
    *   bit-compatible behavior with a reference `quantify` run. */
  def readEcToTx(spark: SparkSession, indexPath: String,
      classesAsTx: Boolean = false): DataFrame = {
    val tx = new org.apache.hadoop.fs.Path(indexPath + "_tx")
    val fs = tx.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tx)) readNormalized(spark, indexPath + "_tx")
    else if (classesAsTx)
      readNormalized(spark, indexPath + "_classes")
        .select(col("ec"), explode(col(KmersField)).as("tid"))
    else throw new IllegalArgumentException(
      s"$indexPath has no _tx side table: this index was written in the " +
        "reference layout, which persists no (equivalence class -> " +
        "transcript) mapping. Re-index with `graft index` to get one, or " +
        "pass -classes_as_tx to reproduce the reference CLI's behavior " +
        "of treating the ClassContents strings as transcript ids " +
        "(rice-cli Quantify.scala:90-99).")
  }
}
