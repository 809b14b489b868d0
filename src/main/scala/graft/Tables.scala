package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet corpus (see TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet file per table under the sf dir.
  * All access goes through `spark.read.parquet` so Catalyst gets full
  * predicate pushdown / column pruning on every query.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS); under
    * spark.sql.legacy.parquet.nanosAsLong it arrives as a Long of epoch
    * nanoseconds (see Sessions). Convert once, with integer division —
    * a double roundtrip would corrupt microseconds above 2^53.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = load(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")
}

/** A named query with an optional DuckDB oracle.
  *
  * `fn` is the Spark-side implementation; `oracle` is ANSI SQL that DuckDB
  * runs over views of the same parquet tables. Column names MUST match
  * between the two (the driver's comparator sorts columns by name before
  * hashing). Queries with no SQL-expressible semantics leave `oracle`
  * empty and get a rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
