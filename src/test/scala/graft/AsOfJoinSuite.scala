package graft

import org.apache.spark.sql.functions._

/** Pins for the native as-of join operator (plans.AsOfJoinPlan →
  * SortMergeAsOfJoinExec): semantics on a hand-built fixture (ties,
  * no-match rows, multiple keys per partition), equivalence with the
  * window+join formulation (q16) on real data, and the physical plan
  * shape (one exchange per side, no window).
  */
class AsOfJoinSuite extends SparkSuite {

  test("as-of semantics: last right at-or-before, ties to sort order, null when none") {
    import spark.implicits._
    // left: (key, t) — right: (key, t, tag)
    val left = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 7L), (3L, 9L))
      .toDF("k", "t")
      .select($"k", $"t", struct($"t".as("t"), lit(Long.MaxValue).as("i")).as("lt"))
    val right = Seq(
      (1L, 10L, 100L, "a"), (1L, 10L, 101L, "b"), // tie at t=10: highest id wins
      (1L, 15L, 102L, "c"),
      (2L, 8L, 103L, "d") // after left's t=7 → no match for key 2
    ).toDF("rk", "rt0", "rid", "tag")
      .select($"rk", $"rt0", $"rid", $"tag",
        struct($"rt0".as("t"), $"rid".as("i")).as("rt"))
    val out = graft.plans.AsOf.join(spark, left, right,
        Seq("k"), Seq("rk"), "lt", "rt")
      .select($"k", $"t", $"rid", $"tag").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.getString(3))))
      .toSet
    assert(out === Set(
      (1L, 10L, Some(101L), Some("b")), // tie resolved to the later sort pos
      (1L, 20L, Some(102L), Some("c")),
      (1L, 5L, None, None),
      (2L, 7L, None, None), // right exists but only AFTER the left time
      (3L, 9L, None, None))) // key absent on the right
  }

  test("composite keys: the merge respects every key column") {
    import spark.implicits._
    val left = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("b", 1L, 10L))
      .toDF("k1", "k2", "t")
      .select($"k1", $"k2", $"t",
        struct($"t".as("t"), lit(Long.MaxValue).as("i")).as("lt"))
    val right = Seq(("a", 1L, 5L, "a1"), ("a", 2L, 7L, "a2"), ("b", 2L, 3L, "b2"))
      .toDF("rk1", "rk2", "rt0", "tag")
      .select($"rk1", $"rk2", $"rt0", $"tag",
        struct($"rt0".as("t"), lit(0L).as("i")).as("rt"))
    val out = graft.plans.AsOf.join(spark, left, right,
        Seq("k1", "k2"), Seq("rk1", "rk2"), "lt", "rt")
      .select($"k1", $"k2", $"tag").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out === Set(
      ("a", 1L, Some("a1")),
      ("a", 2L, Some("a2")),
      ("b", 1L, None))) // (b,2) exists on the right but key (b,1) must not match
  }

  test("q212 equals the q16 window formulation where matched") {
    val sf = "/root/testdata/sf0.001"
    val native = SparkEntry.queries("q212_asof_native")(spark, sf)
      .filter(col("p_id").isNotNull)
      .select("err_id", "p_id", "p_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val window = SparkEntry.queries("q16_asof_join")(spark, sf)
      .select("err_id", "p_id", "p_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(native === window)
    // and the native result additionally carries the unmatched errors
    val total = SparkEntry.queries("q212_asof_native")(spark, sf).count()
    assert(total >= window.size)
  }

  test("physical plan: one exchange per side, merge operator, no Window") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q212_asof_native")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeAsOfJoin"))
    assert(!plan.contains("Window"), "native operator must not fall back to a window")
  }
}
