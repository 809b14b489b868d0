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
  /** Normalize an `events`-shaped frame so `ts` is always TimestampType
    * (LTZ), whatever vintage of the driver corpus it came from:
    *  - parquet TIMESTAMP(NANOS) + spark.sql.legacy.parquet.nanosAsLong
    *    (see Sessions) arrives as a Long of epoch nanoseconds — convert
    *    with integer division (a double roundtrip would corrupt
    *    microseconds above 2^53);
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    *    TIMESTAMP_NTZ — reinterpret the wall clock in the session zone
    *    (pinned to UTC in Sessions, so epoch semantics match the oracle);
    *  - already-LTZ data passes through.
    * Works on batch and streaming frames alike — it is pure column algebra.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def events(s: SparkSession, dir: String): DataFrame =
    normalizeTs(load(s, dir, "events"))
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
