package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the scale extensions)
  * is exposed as a named query over the driver corpus, each paired with a
  * DuckDB oracle where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All declared queries, in registration order. */
  def allQueries: Seq[Q] =
    relational.RelationalQueries.all ++
      relational.GenomicsQueries.queries ++
      ops.TextAnalysis.queries ++
      ops.Dedup.queries ++
      ops.Similarity.queries ++
      ops.Multimodal.queries ++
      ops.Audits.queries ++
      ops.Metrics.queries ++
      ops.Learn.queries ++
      streaming.StreamingQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case Q(n, _, Some(sql)) => n -> sql }.toMap
}
