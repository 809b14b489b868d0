package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
    * @param deterministicIds when true, class ids are assigned by a global
    *   dense_rank over (tid, multiplicity) — fully deterministic and
    *   oracle-friendly, at the cost of a single-partition sort of the
    *   (tid, mult) class keys (small: #classes ≪ #kmers). When false, ids
    *   come from monotonically_increasing_id(), the scale path — same
    *   unique+stable contract as the reference's zipWithUniqueId
    *   (Index.scala:98; only distinctness is contractually tested,
    *   QuantifySuite.scala:467-471).
    */
  def apply(transcriptSeqs: DataFrame, k: Int, deterministicIds: Boolean = false): Result = {
    val kmerMult = transcriptSeqs
      .select(col("id").as("tid"), Kmers.kmerExplode(col("sequence"), k).as("kmer"))
      .groupBy("tid", "kmer")
      .agg(count(lit(1)).as("mult"))
      .cache() // consumed twice: class-key derivation + the id join below

    // one row per equivalence class, keyed by (tid, mult)
    val classIds =
      if (deterministicIds)
        kmerMult.select("tid", "mult").distinct()
          .withColumn("ec", dense_rank().over(Window.orderBy("tid", "mult")).cast("long") - 1)
      else
        kmerMult.select("tid", "mult").distinct()
          .withColumn("ec", monotonically_increasing_id())

    val withEc = kmerMult.join(classIds, Seq("tid", "mult"))

    Result(
      kmerToEc = withEc.select("kmer", "ec"),
      ecToKmers = withEc.groupBy("ec").agg(sort_array(collect_list("kmer")).as("kmers")),
      ecToTx = classIds.select("ec", "tid"))
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
