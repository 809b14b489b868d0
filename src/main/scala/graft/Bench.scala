package graft

import java.nio.file.{Files, Paths}

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * emits ONE machine-readable JSON line. The line is (a) printed to stdout
  * and (b) written to BENCH.json (or SPARK_GRAFT_BENCH_OUT) so the driver
  * never has to scrape it out of sbt's log prefix.
  *
  * A query that throws is NOT timed-as-crashed-and-forgotten: it is excluded
  * from `queries`/total and its message lands in `errors`, and the process
  * exits non-zero so the failure is loud.
  */
object Bench {
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_ONLY (same prefix filter as Verify/Plans): local
    // iteration harness for timing a handful of queries under the exact
    // bench conditions (warm-up, best-of-2, inter-query hygiene). The
    // driver sets no filter, so official runs always cover everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    // a filtered run must never clobber the official artifact: its totals
    // are not comparable to a full-surface run, so it defaults to a
    // scratch path AND the JSON line records the filter either way
    val defaultOut =
      if (only.isEmpty) "/root/repo/BENCH.json" else "/tmp/BENCH_only.json"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    val spark = Sessions.local(cpus)
    // warm-up: pull every table's BYTES through the page cache (count()
    // alone reads only footers/metadata, leaving the first timed queries
    // to pay the cold read — observed as a 130 s vs 170+ s whole-run
    // spread depending on cache state) and run one cheap aggregation so
    // JIT/codegen startup doesn't land on the first timed query
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val p = Paths.get(s"$sfDir/$t.parquet")
      if (Files.isRegularFile(p)) {
        // stream through a fixed buffer: warms the page cache without
        // materializing the whole file in driver heap (a >heap-sized table
        // would OOM the bench before any query ran)
        val in = Files.newInputStream(p)
        try { val buf = new Array[Byte](1 << 20); while (in.read(buf) >= 0) () }
        finally in.close()
      }
      Tables.load(spark, sfDir, t).count()
    }
    SparkEntry.queries.get("q06_forecast_revenue").foreach(_(spark, sfDir).count())

    // context canary, first leg: a cheap streaming query timed against a
    // fresh session (its pair runs after the full surface, below). The
    // query runs once UNTIMED first: its first-ever execution pays
    // one-time streaming machinery (state-store init, staging dir,
    // codegen), which made round 9's ratio read 0.39 on a healthy run.
    // Each leg is then timed BEST-OF-2 — the bench's own per-query
    // methodology — because one warm-up execution doesn't fully warm the
    // first leg (round 10 still read first=1.41/last=1.08, ratio 0.77,
    // under which a mild mid-run degradation could hide). A baseline only
    // calibrates "ratio >> 1 means degradation" if both legs measure a
    // steady warm query: steady-context runs should now read ≈ 1.0.
    val canaryName = "q70_stream_hourly"
    def canaryLeg(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(canaryName)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    SparkEntry.queries(canaryName)(spark, sfDir).count()
    val canaryFirst = canaryLeg()

    def keep(name: String): Boolean = only.forall(_.exists(name.startsWith))
    val results = SparkEntry.queries.toSeq.filter(t => keep(t._1))
      .sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      // best-of-2: transient contention on a shared VM (e.g. an overlapping
      // oracle check) can multiply one run several-fold; the min of two runs
      // is a far more stable estimate of the code's cost. Failures are not
      // retried — a crash must stay loud.
      val (t1, e1) = once()
      val (t, e) = if (e1.isDefined) (t1, e1) else {
        val (t2, e2) = once(); (math.min(t1, t2), e2)
      }
      // Inter-query hygiene: queries cache/localCheckpoint frames internally
      // and nothing drops them once the query's DataFrames go out of scope
      // until a GC lets the ContextCleaner run. Across 89 queries the
      // accumulated blocks crowd the storage pool and the LATER queries pay
      // in GC/eviction — observed as q46 drifting 5.4 s → 11.6 s as the
      // surface grew. Each query is measured against an empty cache
      // (best-of-2 still captures its own internal reuse).
      spark.catalog.clearCache()
      System.gc()
      (name, t, e)
    }
    val ok = results.filter(_._3.isEmpty)
    val failed = results.collect { case (n, _, Some(m)) => n -> m }
    val qs = ok.map { case (k, v, _) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val errs = failed.map { case (k, m) => jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    // per-family subtotals: a run-context drift that taxes one family
    // (round 8: pinned memo blocks made the streaming family ~2× its
    // isolated cost) should be legible in the JSON, not require a
    // per-query diff against the previous round
    val fams = SparkEntry.familyOf
    val famTotals = ok.groupBy { case (n, _, _) => fams.getOrElse(n, "other") }
      .view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val famJson = famTotals.map { case (f, t) => jstr(f) + ":" + t }
      .mkString("{", ",", "}")
    // context canary: the same cheap query timed immediately after
    // warm-up (done above, canaryFirst) and again after the whole
    // surface has run. ratio >> 1 means the measuring context degraded
    // over the run — the per-query numbers tell you WHAT got slow, the
    // canary tells you whether to believe it was the code.
    val canaryLast = canaryLeg()
    val canaryJson = s"""{"query":${jstr(canaryName)},"first":$canaryFirst,""" +
      s""""last":$canaryLast,"ratio":${canaryLast / canaryFirst}}"""
    val onlyField =
      only.map(o => s""""only":${jstr(o.mkString(","))},""").getOrElse("")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec",$onlyField"queries":$qs,""" +
      s""""families":$famJson,"canary":$canaryJson,"errors":$errs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), line + "\n")
    println(line)
    // exercise the memo eviction hook (long-lived-session hygiene): all
    // shared-stage temp-parquet memos are dropped before shutdown
    ops.Memo.evictAll()
    spark.stop()
    if (failed.nonEmpty) {
      failed.foreach { case (n, m) => System.err.println(s"[bench] FAILED $n: $m") }
      sys.exit(1)
    }
  }
}
