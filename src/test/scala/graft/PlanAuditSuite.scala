package graft

/** Machine-checked versions of the PLANS.md audit claims — the plan
  * shapes the 100 TB story depends on, pinned so a refactor (or a Spark
  * upgrade) that silently regresses one fails the suite, not the next
  * manual audit.
  */
class PlanAuditSuite extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: filters reach the parquet scan and columns are pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate predicate must be pushed to the scan")
    assert(!p.contains("l_orderkey"),
      "unused lineitem columns must not survive pruning")
  }

  test("q08: per-group top-k runs through WindowGroupLimit, not a full sort+filter") {
    // Spark's rank-limit pushdown keeps only k rows per group per
    // partition BEFORE the window shuffle — the difference between
    // shuffling k·groups rows and shuffling the corpus at 100 TB
    assert(plan("q08_topk_per_group").contains("WindowGroupLimit"))
  }

  test("q05: star joins broadcast every dimension side") {
    val p = plan("q05_nation_revenue")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    assert(!p.contains("CartesianProduct"))
  }

  test("q84: the band theta-join is rewritten to a binned equi-join") {
    val p = plan("q84_auto_range_join")
    // the RangeBinJoin rule must leave no fact-sized nested loop: the
    // |Δt| <= w predicate becomes a Generate (bin explode) + hash join
    assert(p.contains("Generate"), "bin explode missing - rule did not fire")
    assert(!p.contains("CartesianProduct"))
  }

  test("q196: bounded group sampling uses the UDAF, never a window sort") {
    assert(!plan("q196_group_sample").contains("Window"),
      "top-k-per-group must aggregate, not rank the corpus")
  }

  test("q215: boundary sampling is TakeOrdered, not a global sort") {
    assert(plan("q215_uncertainty_sample").contains("TakeOrderedAndProject"))
  }

  test("surface-wide audit: SP exchanges match the allowlist, 0 cartesian, 0 errors") {
    // The whole-surface gate the earlier tests sample: run the SAME
    // scanner Plans.main uses over every declared query and require
    //  (a) no query throws during planning — a planning error silently
    //      shrinking the audited surface is how headline counts drift;
    //  (b) zero CartesianProduct anywhere;
    //  (c) per-query Exchange-SinglePartition counts EQUAL the audited
    //      allowlist — so a new data-sized single-partition shuffle (the
    //      100 TB serialization hazard) fails the build and must be fixed
    //      or consciously allowlisted with its boundedness argument.
    // Suites share one session; a frame another suite left cached gets
    // substituted into matching plans (InMemoryTableScan) and shifts
    // exchange counts — audit the cold-session plans Plans.main audits.
    spark.catalog.clearCache()
    val a = Plans.audit(spark, sf, collectText = false)
    assert(a.errors.isEmpty, s"planning errors: ${a.errors}")
    assert(a.total.cartesianProducts == 0,
      "CartesianProduct appeared in the batch surface")
    val got = a.singlePartitionPerQuery
    val want = PlanAudit.singlePartitionAllowlist
    val extra = got.toSet.diff(want.toSet)
    val missing = want.toSet.diff(got.toSet)
    assert(extra.isEmpty && missing.isEmpty,
      s"single-partition exchange drift — not in allowlist: $extra; " +
        s"allowlisted but absent: $missing. If the new exchange is a " +
        "bounded scalar combine, regenerate via `runMain graft.Plans` " +
        "and update PlanAudit.singlePartitionAllowlist with the argument.")

    // PLANS.md's fenced headline block must equal the fresh audit —
    // round 6/7's failure mode was exactly a committed doc drifting from
    // the tool's output. Parse the marker-anchored fence (same anchor
    // Plans.rewritePlansMd targets) and compare every key=value to the
    // live totals.
    val plansMd = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")))
    val fence =
      "(?s)<!-- plans-summary-fence -->\n```\n(.*?)```".r
        .findFirstMatchIn(plansMd).map(_.group(1))
        .getOrElse(fail("PLANS.md has no marker-anchored SUMMARY fence"))
    val kv = "(\\w+)=(\\d+)".r.findAllMatchIn(fence)
      .map(m => m.group(1) -> m.group(2).toInt).toMap
    val tot = a.total
    val live = Map(
      "queries" -> a.perQuery.size, "errors" -> a.errors.size,
      "exchanges" -> tot.exchanges,
      "singlePartitionExchanges" -> tot.singlePartitionExchanges,
      "sortMergeJoins" -> tot.sortMergeJoins,
      "broadcastHashJoins" -> tot.broadcastHashJoins,
      "broadcastNestedLoopJoins" -> tot.broadcastNestedLoopJoins,
      "cartesianProducts" -> tot.cartesianProducts)
    for ((k, v) <- live)
      assert(kv.get(k).contains(v),
        s"PLANS.md headline '$k=${kv.getOrElse(k, "?")}' != live audit " +
          s"'$k=$v' — regenerate the fenced block from `runMain graft.Plans`")
  }
}
