package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed parquet tables — the PERSISTED pre-shuffle layout that makes
  * repeated big-table joins and aggregations shuffle-free at 100 TB.
  *
  * A fact table bucketed (and sorted) by its join key pays its shuffle
  * ONCE at write time; every later join or aggregation on that key then
  * reads co-located buckets directly — Catalyst drops the Exchange on any
  * side whose `HashPartitioning(key, n)` already matches the bucket spec,
  * and the in-bucket sort order lets sort-merge skip its Sort too. At
  * 1000 executors that turns the nightly fact⋈fact join from a full
  * corpus shuffle into a purely local merge. The BucketingSuite spec pins
  * exactly this contract: the bucketed join plan contains NO Exchange,
  * the plain-parquet control plan does.
  *
  * Bucket-count choice at scale: fixed per table (it is part of the
  * layout, not the session), sized so one bucket ≈ one task's memory
  * budget at the target SF; both sides of a co-located join must agree
  * on it (Spark can also coalesce a 2×-ratio mismatch).
  */
object Bucketed {

  /** Writes `df` as a bucketed+sorted external parquet table. */
  def write(df: DataFrame, table: String, path: String, nBuckets: Int,
      cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, cols.head, cols.tail: _*)
      .sortBy(cols.head, cols.tail: _*)
      .saveAsTable(table)

  def table(s: SparkSession, name: String): DataFrame = s.table(name)
}
