package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kmer.Kmers

/** Equivalence-class index construction — the Spark-SQL re-expression of
  * `Index.findEquivalenceClasses` (reference Index.scala:72-113).
  *
  * Semantics preserved exactly (SURVEY §2.9 "Equivalence-class semantics"):
  * an equivalence class is the set of k-mers sharing the same multiplicity
  * within ONE transcript; a k-mer appearing in N transcripts lands in N
  * classes, which is what lets the EM split shared k-mer mass.
  *
  * Pipeline (all hash-aggregated with partial aggregation — the reference's
  * groupByKey at Index.scala:96 is upgraded for free):
  *   (tid, sequence) → explode k-mers → count per (tid, kmer)     [A1]
  *   → class key = (tid, multiplicity) → class id                 [A2]
  *   → invert to kmer→class and class→kmers                       [Index.scala:104-109]
  */
object Indexer {

  /** Index result as two flat relations + the class→transcript map:
    * kmerToEc(kmer, ec), ecToKmers(ec, kmers array), ecToTx(ec, tid).
    */
  final case class Result(kmerToEc: DataFrame, ecToKmers: DataFrame, ecToTx: DataFrame)

  /** @param transcriptSeqs DataFrame(id string, sequence string)
    * @param k k-mer length
    * @param deterministicIds class ids are a pure function of the class key
    *   (tid, multiplicity) in BOTH modes — no global sort, no id-assignment
    *   join, nothing to shuffle for numbering. This satisfies the reference's
    *   zipWithUniqueId contract (Index.scala:98; only distinctness is
    *   contractually tested, QuantifySuite.scala:467-471) while being
    *   narrow-computable on every row.
    *   - true  → 56-bit md5 hash of "tid:mult" — bit-identical in Spark and
    *     DuckDB (`conv(substring(md5(..),1,14),16,10)` ↔
    *     `('0x'||substr(md5(..),1,14))::BIGINT`), the oracle path.
    *   - false → xxhash64 of the same key — faster (no hex round-trip), the
    *     scale path. Collision odds at 10⁸ classes: ~n²/2⁶⁵ ≈ 3·10⁻⁴.
    */
  def apply(transcriptSeqs: DataFrame, k: Int, deterministicIds: Boolean = false): Result = {
    val kmerMult = transcriptSeqs
      .select(col("id").as("tid"), Kmers.kmerExplode(col("sequence"), k).as("kmer"))
      .groupBy("tid", "kmer")
      .agg(count(lit(1)).as("mult"))

    val ecId =
      if (deterministicIds)
        expr("cast(conv(substring(md5(concat(tid, ':', mult)), 1, 14), 16, 10) as bigint)")
      else
        xxhash64(concat(col("tid"), lit(":"), col("mult")))

    val withEc = kmerMult.withColumn("ec", ecId)
      .cache() // consumed by all three output relations

    Result(
      kmerToEc = withEc.select("kmer", "ec"),
      ecToKmers = withEc.groupBy("ec").agg(sort_array(collect_list("kmer")).as("kmers")),
      ecToTx = withEc.select("ec", "tid").distinct())
  }

  /** Convenience: index transcripts laid out on a reference genome.
    * The genome accessor mirrors the reference's broadcast TwoBitFile
    * (Index.scala:76-78, J5): the sequence string is broadcast and sliced
    * per transcript at the driver — transcript annotation sets are small
    * relative to read sets, and extraction is a narrow map.
    *
    * @param transcripts DataFrame(id string, exons array<struct<start long, end long>>)
    * @param genome      the reference sequence (test stub: plain string,
    *                    QuantifySuite.scala:31-37)
    */
  def fromGenome(spark: SparkSession, transcripts: DataFrame, genome: String, k: Int,
      deterministicIds: Boolean = false): Result = {
    val bc = spark.sparkContext.broadcast(genome)
    // the reference extracts the transcript's full region — the hull of its
    // exons (Index.scala:85 uses t.region) — not a per-exon splice
    val extract = udf { exons: Seq[org.apache.spark.sql.Row] =>
      val starts = exons.map(_.getLong(0))
      val ends = exons.map(_.getLong(1))
      bc.value.substring(starts.min.toInt, ends.max.toInt)
    }
    apply(transcripts.select(col("id"), extract(col("exons")).as("sequence")), k, deterministicIds)
  }
}
