package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Relational query surface over the driver corpus (TESTDATA.md).
  *
  * Each query maps one or more operators from SURVEY.md §2 (scan, filter,
  * projection, equi-join, broadcast join, semi/anti join, hash aggregation,
  * scalar aggregation, window partition-sum — the E-step shape A6 —, top-k,
  * distinct aggregation, rollup, time-window aggregation, sessionization,
  * JSON extraction) onto `org.apache.spark.sql` declarative plans so
  * Catalyst/AQE picks the physical strategy.
  *
  * Determinism contract with the DuckDB oracle: every floating-point
  * aggregate is rounded (sum→2–4 dp, avg→6 dp) so that engine-specific
  * summation order can't flip the hash; every output is totally ordered by
  * a unique key combination.
  */
object RelationalQueries {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  val all: Seq[Q] = Seq(
    Q("q01_pricing_summary",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_base_price"),
            round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
            round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
            round(avg($"l_quantity"), 6).as("avg_qty"),
            round(avg($"l_extendedprice"), 4).as("avg_price"),
            round(avg($"l_discount"), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q02_filter_project",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .filter($"l_returnflag" === "R" && $"l_quantity" >= 30 && $"l_quantity" <= 40 &&
            $"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
          .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity", $"l_extendedprice")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_returnflag = 'R' AND l_quantity BETWEEN 30 AND 40
             |  AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q03_shipping_priority",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        val o = Tables.orders(s, d).filter($"o_orderdate" < lit("1998-03-15").cast("timestamp"))
        val l = li(s, d).filter($"l_shipdate" > lit("1998-03-15").cast("timestamp"))
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-03-15'
             |  AND l_shipdate > TIMESTAMP '1998-03-15'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)),

    Q("q04_order_priority",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1997-07-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-10-01").cast("timestamp"))
        val l = li(s, d).filter($"l_quantity" > 45)
        o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
             |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    Q("q05_nation_revenue",
      (s, d) => {
        import s.implicits._
        val r = Tables.region(s, d).filter($"r_name" === "ASIA")
        val n = Tables.nation(s, d)
        val c = Tables.customer(s, d)
        val sup = Tables.supplier(s, d)
        val o = Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        li(s, d)
          .join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
          .join(c, $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some("""SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    Q("q06_forecast_revenue",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
            $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
          .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // A6's shape from SURVEY §2.4: ratio-to-partition-total window (the EM
    // E-step pattern), folded into a small aggregate so output stays bounded.
    Q("q07_window_share",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_orderkey")
        li(s, d)
          .withColumn("share", $"l_quantity" / sum($"l_quantity").over(w))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(round(sum($"share"), 4).as("sum_share"),
            round(avg($"share"), 6).as("avg_share"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(share), 4) AS sum_share,
             |  round(avg(share), 6) AS avg_share,
             |  count(*) AS n
             |FROM (
             |  SELECT l_returnflag, l_linestatus,
             |    l_quantity / sum(l_quantity) OVER (PARTITION BY l_orderkey) AS share
             |  FROM lineitem)
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q08_topk_per_group",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        li(s, d)
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_extendedprice")
          .withColumn("rnk", row_number().over(w))
          .filter($"rnk" <= 3)
          .orderBy($"l_suppkey", $"rnk")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rnk
             |FROM (
             |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             |    row_number() OVER (PARTITION BY l_suppkey
             |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
             |  FROM lineitem)
             |WHERE rnk <= 3
             |ORDER BY l_suppkey, rnk""".stripMargin)),

    Q("q09_semi_join",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter($"o_totalprice" > 400000)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    Q("q10_anti_join",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter($"o_totalprice" > 300000)
        val n = Tables.nation(s, d)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name, count(*) AS n_customers
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    Q("q11_distinct_agg",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .groupBy($"l_returnflag")
          .agg(countDistinct($"l_partkey").as("n_parts"),
            countDistinct($"l_suppkey").as("n_supps"),
            countDistinct($"l_orderkey").as("n_orders"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps,
             |  count(DISTINCT l_orderkey) AS n_orders
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    Q("q12_events_hourly",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
          .orderBy($"hour", $"event_type")
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
             |  count(*) AS n, round(sum(value), 4) AS total_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    Q("q13_sessionize",
      (s, d) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
        Tables.events(s, d)
          .select($"user_id", $"event_id", unix_timestamp($"ts").as("sec"))
          .withColumn("prev", lag($"sec", 1).over(byUser))
          .withColumn("new_s",
            when($"prev".isNull || $"sec" - $"prev" > 1800, 1).otherwise(0))
          .withColumn("sid", sum($"new_s").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id")
          .agg(max($"sid").as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy($"user_id")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, CAST(epoch(ts) AS BIGINT) AS sec FROM events),
             |l AS (
             |  SELECT user_id, event_id, sec,
             |    lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev
             |  FROM e),
             |f AS (
             |  SELECT user_id, event_id, sec,
             |    CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_s
             |  FROM l),
             |s AS (
             |  SELECT user_id,
             |    sum(new_s) OVER (PARTITION BY user_id ORDER BY sec, event_id
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM f)
             |SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions, count(*) AS n_events
             |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin)),

    Q("q14_rollup",
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .rollup($"r_name", $"n_name")
          .agg(round(sum($"c_acctbal"), 2).as("total_bal"), count(lit(1)).as("n"))
          .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
      },
      Some("""SELECT r_name, n_name, round(sum(c_acctbal), 2) AS total_bal, count(*) AS n
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name)
             |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)),

    Q("q15_json_extract",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy($"event_type")
          .agg(round(avg($"k"), 6).as("avg_k"), sum($"k").as("sum_k"), count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, round(avg(k), 6) AS avg_k, CAST(sum(k) AS BIGINT) AS sum_k, count(*) AS n
             |FROM (SELECT event_type, CAST(json_extract_string(props, 'k') AS BIGINT) AS k FROM events)
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // As-of (point-in-time) join — for every error event, the same user's
    // most recent purchase at or before it. Spark has no native AS OF
    // operator; the scalable formulation is a running window, not a range
    // join: one window shuffle on user_id computes the last purchase
    // timestamp visible at each row, then an equi-join on (user_id, ts)
    // recovers the purchase attributes. A range self-join would cost
    // |errors|·|purchases| per user; this costs one sort plus one hash
    // join regardless of per-user event counts. Ties (two purchases in
    // the same microsecond) resolve to the highest event_id via max_by.
    Q("q16_asof_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val errs = ev
          .withColumn("last_pts", max(when($"event_type" === "purchase", $"ts")).over(w))
          .filter($"event_type" === "error" && $"last_pts".isNotNull)
          .select($"event_id".as("err_id"), $"user_id", $"ts".as("err_ts"), $"last_pts")
        val purch = ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts".as("last_pts"), $"event_id".as("p_id"),
            $"value".as("p_value"))
        errs.join(purch, Seq("user_id", "last_pts"))
          .groupBy($"err_id", $"user_id", $"err_ts", $"last_pts")
          .agg(max($"p_id").as("p_id"),
            round(expr("max_by(p_value, p_id)"), 2).as("p_value"))
          .select($"err_id", $"user_id", $"err_ts", $"last_pts", $"p_id", $"p_value",
            round((unix_micros($"err_ts") - unix_micros($"last_pts")) / lit(1e6), 3)
              .as("gap_s"))
          .orderBy($"err_id")
      },
      Some("""WITH wl AS (
             |  SELECT event_id, ts, user_id, event_type, value,
             |    max(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_pts
             |  FROM events),
             |err AS (
             |  SELECT event_id AS err_id, user_id, ts AS err_ts, last_pts
             |  FROM wl WHERE event_type = 'error' AND last_pts IS NOT NULL),
             |p AS (
             |  SELECT user_id, ts AS last_pts, event_id AS p_id, value AS p_value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT err_id, user_id, err_ts, last_pts,
             |  CAST(max(p_id) AS BIGINT) AS p_id,
             |  round(max_by(p_value, p_id), 2) AS p_value,
             |  round((epoch_us(err_ts) - epoch_us(last_pts)) / 1e6, 3) AS gap_s
             |FROM err JOIN p USING (user_id, last_pts)
             |GROUP BY 1, 2, 3, 4
             |ORDER BY err_id""".stripMargin)),

    // Exact distributed quantiles — the dataset-card numbers (token-count
    // percentiles per source) a corpus release reports. NOT a per-group
    // sort: for an integer-valued metric the scalable exact form is a
    // VALUE HISTOGRAM — one partial-agg shuffle collapses the corpus to
    // (source, value, count), a running sum over the (tiny) histogram
    // assigns each value its rank interval [cum_start, cum_end], and the
    // target rank lo = floor(1 + (n−1)q) plus its successor are located
    // by interval lookup, then linearly interpolated (the same math as
    // NumPy / DuckDB `quantile_cont`). Per-source work after the shuffle
    // is O(distinct values), not O(rows) — a per-source `row_number`
    // (or Spark's exact `percentile` agg, which buffers every value)
    // would put a whole source on one task at 100 TB.
    Q("q17_token_quantiles",
      (s, d) => {
        import s.implicits._
        val hist = Tables.documents(s, d)
          .select($"source", size(split($"text", " ")).cast("long").as("v"))
          .groupBy($"source", $"v").agg(count(lit(1)).as("cnt"))
        val cum = hist
          .withColumn("cum_end", sum($"cnt").over(
            Window.partitionBy($"source").orderBy($"v")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum_start", $"cum_end" - $"cnt" + 1)
          .select($"source".as("hs"), $"v", $"cum_start", $"cum_end")
        val targets = hist.groupBy($"source").agg(sum($"cnt").as("n_docs"))
          .select($"source", $"n_docs",
            explode(array(Seq(0.25, 0.5, 0.9, 0.99).map(lit): _*)).as("q"))
          .withColumn("p", lit(1.0) + ($"n_docs" - 1).cast("double") * $"q")
          .withColumn("lo", floor($"p").cast("long"))
          .withColumn("hi", least($"lo" + 1, $"n_docs"))
          .withColumn("frac", $"p" - $"lo")
        targets
          .join(cum, $"source" === $"hs" &&
            $"lo".between($"cum_start", $"cum_end"))
          .withColumnRenamed("v", "v_lo")
          .drop("hs", "cum_start", "cum_end")
          .join(cum, $"source" === $"hs" &&
            $"hi".between($"cum_start", $"cum_end"))
          .withColumnRenamed("v", "v_hi")
          .select($"source", $"q", $"n_docs",
            round($"v_lo" + $"frac" * ($"v_hi" - $"v_lo"), 4).as("tok_quantile"))
          .orderBy($"source", $"q")
      },
      Some("""WITH hist AS (
             |  SELECT source, len(string_split(text, ' ')) AS v, count(*) AS cnt
             |  FROM documents GROUP BY 1, 2),
             |cum AS (
             |  SELECT source AS hs, v,
             |    sum(cnt) OVER (PARTITION BY source ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end,
             |    sum(cnt) OVER (PARTITION BY source ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt + 1 AS cum_start
             |  FROM hist),
             |t AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs FROM hist GROUP BY source),
             |targets AS (
             |  SELECT source, n_docs, qq.q AS q, 1.0 + (n_docs - 1) * qq.q AS p
             |  FROM t, (SELECT unnest(CAST([0.25, 0.5, 0.9, 0.99] AS DOUBLE[])) AS q) qq),
             |tt AS (
             |  SELECT source, q, n_docs, CAST(floor(p) AS BIGINT) AS lo,
             |    least(CAST(floor(p) AS BIGINT) + 1, n_docs) AS hi,
             |    p - floor(p) AS frac
             |  FROM targets)
             |SELECT tt.source, tt.q, tt.n_docs,
             |  round(cl.v + tt.frac * (ch.v - cl.v), 4) AS tok_quantile
             |FROM tt
             |JOIN cum cl ON cl.hs = tt.source AND tt.lo BETWEEN cl.cum_start AND cl.cum_end
             |JOIN cum ch ON ch.hs = tt.source AND tt.hi BETWEEN ch.cum_start AND ch.cum_end
             |ORDER BY 1, 2""".stripMargin)),

    // Pure (no-equi-key) time-range join: for each error event, aggregate
    // purchase events from ANY user within ±300 s. The naive plan is a
    // broadcast-nested-loop over the θ-predicate — quadratic at corpus
    // scale. The scale-correct shape is BIN BUCKETING: quantize time to
    // bin = floor(µs / 300e6); a ±300 s probe interval spans ≤ 3 adjacent
    // bins, so the probe side explodes ×3 and the join becomes an
    // EQUI-join on the bin id — shuffle-partitioned on a key whose
    // per-bin density is bounded by the arrival rate, never the corpus
    // size, and a hot bin is AQE-splittable. Exact containment is
    // re-checked after the bucket join.
    Q("q18_range_join",
      (s, d) => {
        import s.implicits._
        val winUs = 300L * 1000000L
        val ev = Tables.events(s, d)
        val err = ev.filter($"event_type" === "error")
          .select($"event_id".as("err_id"), unix_micros($"ts").as("err_us"))
          .withColumn("bin",
            explode(sequence(floor(($"err_us" - winUs) / winUs).cast("long"),
              floor(($"err_us" + winUs) / winUs).cast("long"))))
        val purch = ev.filter($"event_type" === "purchase")
          .select(floor(unix_micros($"ts") / winUs).cast("long").as("bin"),
            unix_micros($"ts").as("p_us"), $"value".as("p_value"))
        err.join(purch, "bin")
          .filter(abs($"p_us" - $"err_us") <= winUs)
          .groupBy($"err_id")
          .agg(count(lit(1)).as("n_purch"),
            round(sum($"p_value"), 2).as("purch_value"))
          .orderBy($"err_id")
      },
      Some("""WITH err AS (
             |  SELECT event_id AS err_id, epoch_us(ts) AS err_us
             |  FROM events WHERE event_type = 'error'),
             |purch AS (
             |  SELECT epoch_us(ts) AS p_us, value AS p_value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT err_id, count(*) AS n_purch,
             |  round(sum(p_value), 2) AS purch_value
             |FROM err JOIN purch ON abs(p_us - err_us) <= 300000000
             |GROUP BY err_id
             |ORDER BY err_id""".stripMargin)),

    // Pivot (wide conditional aggregation): per-source document counts by
    // language. Uses Spark's relational PIVOT with an EXPLICIT value list —
    // the scale-correct form: without it Spark first runs a driver-side
    // distinct over the pivot column, an extra corpus pass that also caps
    // cardinality. One hash-agg shuffle on `source`; the lang dimension is
    // bounded so the output row stays narrow.
    Q("q19_pivot",
      (s, d) => {
        import s.implicits._
        val langs = Seq("de", "en", "es", "fr", "zh")
        Tables.documents(s, d)
          .groupBy($"source")
          .pivot("lang", langs)
          .agg(count(lit(1)))
          .na.fill(0L, langs)
          .select($"source" +: langs.map(l => col(l).as(s"n_$l"))
            :+ langs.map(col).reduce(_ + _).as("n_docs"): _*)
          .orderBy($"source")
      },
      Some("""SELECT source,
             |  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
             |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
             |  CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
             |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
             |  CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
             |  count(*) AS n_docs
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Set operators — UNION / INTERSECT / EXCEPT as first-class logical
    // plans (Catalyst lowers intersect/except to semi/anti joins and
    // union+distinct to one hash agg; nothing here is a driver-side set).
    // The operand sets are the distinct token-count profiles of the en/de
    // language slices; the five scalar cardinalities combine through the
    // broadcast 1-row cross-join pattern, so the result is a single row
    // with no single-partition exchange on the data path.
    Q("q28_set_ops",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select($"lang", size(split($"text", " ")).cast("long").as("n_tok"))
        val en = docs.filter($"lang" === "en").select($"n_tok").distinct()
        val de = docs.filter($"lang" === "de").select($"n_tok").distinct()
        def n(df: DataFrame, as: String) = df.agg(count(lit(1)).as(as))
        n(en, "n_en")
          .crossJoin(broadcast(n(de, "n_de")))
          .crossJoin(broadcast(n(en.union(de).distinct(), "n_union")))
          .crossJoin(broadcast(n(en.intersect(de), "n_intersect")))
          .crossJoin(broadcast(n(en.except(de), "n_en_only")))
      },
      Some("""WITH en AS (
             |  SELECT DISTINCT len(string_split(text, ' ')) AS n_tok
             |  FROM documents WHERE lang = 'en'),
             |de AS (
             |  SELECT DISTINCT len(string_split(text, ' ')) AS n_tok
             |  FROM documents WHERE lang = 'de')
             |SELECT (SELECT count(*) FROM en) AS n_en,
             |  (SELECT count(*) FROM de) AS n_de,
             |  (SELECT count(*) FROM (SELECT n_tok FROM en UNION SELECT n_tok FROM de)) AS n_union,
             |  (SELECT count(*) FROM (SELECT n_tok FROM en INTERSECT SELECT n_tok FROM de)) AS n_intersect,
             |  (SELECT count(*) FROM (SELECT n_tok FROM en EXCEPT SELECT n_tok FROM de)) AS n_en_only""".stripMargin)),

    // CUBE aggregation — all four grouping sets of (status, priority) in
    // ONE pass: Catalyst lowers cube to an Expand (each input row fans out
    // to its grouping sets) feeding a single partial+final HashAggregate,
    // so the corpus is scanned once and the shuffle carries only the
    // (bounded) expanded key space — never one job per grouping set. The
    // same cube at 100 TB costs exactly one extra Expand over the plain
    // group-by. grouping_id() disambiguates genuine NULL keys from
    // subtotal rows; Spark and DuckDB agree on its bit order (first cube
    // column = MSB).
    Q("q27_cube",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(round(sum($"o_totalprice"), 2).as("total_price"),
            count(lit(1)).as("n"),
            grouping_id().as("gid"))
          .orderBy($"gid", $"o_orderstatus".asc_nulls_first,
            $"o_orderpriority".asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  round(sum(o_totalprice), 2) AS total_price, count(*) AS n,
             |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
             |FROM orders
             |GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
             |  o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Explicit GROUPING SETS — the general form rollup (q14) and cube
    // (q27) are sugar for: exactly the requested subtotal combinations
    // ((status), (priority), ()) with no (status, priority) pass. Same
    // physical shape as cube — one Expand feeding one partial+final
    // HashAggregate, one scan — but the Expand fans each row out to 3
    // rows, not 4: at 100 TB pruning an unneeded grouping set cuts the
    // shuffle by exactly that set's share.
    Q("q63_grouping_sets",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupingSets(
            Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
            $"o_orderstatus", $"o_orderpriority")
          .agg(round(sum($"o_totalprice"), 2).as("total_price"),
            count(lit(1)).as("n"),
            grouping_id().as("gid"))
          .orderBy($"gid", $"o_orderstatus".asc_nulls_first,
            $"o_orderpriority".asc_nulls_first)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  round(sum(o_totalprice), 2) AS total_price, count(*) AS n,
             |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY gid, o_orderstatus ASC NULLS FIRST,
             |  o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Skew-salted two-phase aggregation — the standard fix when a group-by
    // key is so low-cardinality (3 return flags here) that one reducer per
    // key would bottleneck a 1000-executor cluster: phase 1 aggregates by
    // (key, salt) where salt = hash(row-unique cols) mod 16, spreading each
    // hot key over 16 reducers; phase 2 merges the ≤16 partials per key.
    // Result is provably identical to the plain group-by (the oracle IS the
    // plain group-by) because sum/count are associative-decomposable. The
    // salt width is the knob: 16 × 3 keys = 48 partials — negligible — while
    // each phase-1 reducer handles 1/16th of a hot key's rows.
    Q("q64_salted_agg",
      (s, d) => {
        import s.implicits._
        li(s, d)
          .withColumn("salt", pmod(xxhash64($"l_orderkey", $"l_linenumber"), lit(16)))
          .groupBy($"l_returnflag", $"salt")
          .agg(sum($"l_quantity").as("p_qty"),
            sum($"l_extendedprice").as("p_price"),
            count(lit(1)).as("p_n"))
          .groupBy($"l_returnflag")
          .agg(round(sum($"p_qty"), 2).as("sum_qty"),
            round(sum($"p_price"), 2).as("sum_price"),
            sum($"p_n").as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_price,
             |  count(*) AS n
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // Time-RANGE window frame — a moving per-user average over the
    // trailing hour of EVENT TIME (not row count): the frame is defined by
    // the ORDER BY value (epoch seconds), so rows with equal timestamps
    // are peers and irregular event spacing is handled exactly. One
    // shuffle by user_id, then a single sorted pass per partition with a
    // sliding two-pointer frame — no self-join materializing the
    // O(rows × frame) pair blowup, which is what makes this form survive
    // 100 TB of events.
    Q("q65_moving_avg",
      (s, d) => {
        import s.implicits._
        val hour = Window.partitionBy($"user_id").orderBy($"sec")
          .rangeBetween(-3600, Window.currentRow)
        Tables.events(s, d)
          .select($"user_id", $"event_id", unix_timestamp($"ts").as("sec"), $"value")
          .withColumn("mavg", round(avg($"value").over(hour), 6))
          .select($"user_id", $"event_id", $"sec", $"mavg")
          .orderBy($"user_id", $"sec", $"event_id")
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
             |  round(avg(value) OVER (PARTITION BY user_id
             |    ORDER BY epoch_us(ts) // 1000000
             |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6) AS mavg
             |FROM events
             |ORDER BY user_id, sec, event_id""".stripMargin)),

    // FULL OUTER reconciliation — the cross-system audit shape: per-entity
    // totals from two independent fact tables, joined full-outer so
    // entities present in either side survive with NULLs marking the gap.
    // Both inputs are pre-aggregated BEFORE the join (partial aggregation
    // pushes the heavy reduction map-side), so the outer join itself only
    // sees one row per entity per side — at 100 TB the join input is the
    // entity count, not the fact count.
    Q("q67_full_outer",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d)
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            round(sum($"o_totalprice"), 2).as("order_total"))
        val e = Tables.events(s, d)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            round(sum($"value"), 4).as("event_value"))
        o.join(e, $"o_custkey" === $"user_id", "full_outer")
          .select(coalesce($"o_custkey", $"user_id").as("id"),
            $"n_orders", $"order_total", $"n_events", $"event_value")
          .orderBy($"id")
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, count(*) AS n_orders,
             |    round(sum(o_totalprice), 2) AS order_total
             |  FROM orders GROUP BY 1),
             |e AS (
             |  SELECT user_id, count(*) AS n_events,
             |    round(sum(value), 4) AS event_value
             |  FROM events GROUP BY 1)
             |SELECT coalesce(o_custkey, user_id) AS id,
             |  n_orders, order_total, n_events, event_value
             |FROM o FULL OUTER JOIN e ON o_custkey = user_id
             |ORDER BY id""".stripMargin)),

    // Z-order (Morton) clustering layout — the multi-dimensional
    // data-skipping layout audit. Events are clustered per type by the
    // native codegen'd z_value interleave of (user_id, hour bucket) and
    // cut into 16 z-runs ("files"); the output is each run's min/max
    // bounding box in BOTH dimensions — exactly the zone-map metadata a
    // 100 TB scan consults, tight on user AND time at once where a
    // single-column sort is tight on one. The dimensions are bucketed to
    // COMPARABLE VARYING BIT WIDTHS first (~150 users ≈ 8 bits, so time
    // is coarsened to 3-hour buckets ≈ 8 varying bits across the corpus
    // span; raw epoch seconds would occupy every high bit and degenerate
    // the z-order back into a time sort — the standard z-layout
    // pitfall). The ntile runs per event_type (the
    // table's natural partition), so no global single-partition sort
    // appears; at scale the same z key feeds repartitionByRange +
    // sortWithinPartitions and the "bins" are real files.
    Q("q68_zorder_layout",
      (s, d) => {
        import s.implicits._
        val byType = Window.partitionBy($"event_type").orderBy($"z", $"event_id")
        Tables.events(s, d)
          .select($"event_type", $"event_id", $"user_id",
            unix_timestamp($"ts").as("sec"))
          .withColumn("z",
            graft.functions.ZValue.z_value($"user_id", expr("sec div 10800")))
          .withColumn("bin", ntile(16).over(byType))
          .groupBy($"event_type", $"bin")
          .agg(count(lit(1)).as("n"),
            min($"user_id").as("u_min"), max($"user_id").as("u_max"),
            min($"sec").as("s_min"), max($"sec").as("s_max"))
          .orderBy($"event_type", $"bin")
      },
      Some(s"""WITH e AS (
              |  SELECT event_type, event_id, user_id,
              |    epoch_us(ts) // 1000000 AS sec,
              |    (epoch_us(ts) // 1000000) // 10800 AS hr
              |  FROM events),
              |z AS (
              |  SELECT *, ${ZOracle.zExpr} AS z FROM e),
              |b AS (
              |  SELECT *, ntile(16) OVER (PARTITION BY event_type
              |    ORDER BY z, event_id) AS bin
              |  FROM z)
              |SELECT event_type, bin, count(*) AS n,
              |  min(user_id) AS u_min, max(user_id) AS u_max,
              |  min(sec) AS s_min, max(sec) AS s_max
              |FROM b GROUP BY event_type, bin
              |ORDER BY event_type, bin""".stripMargin)),

    // Sliding (overlapping) time windows — `window(ts, 2h, 1h)`: every
    // event lands in exactly 2 hour-aligned windows. Catalyst lowers this
    // to an Expand (each row → its 2 window assignments) feeding one hash
    // aggregate — the same single-pass shape as cube/rollup, NOT one job
    // per offset; the shuffle carries (window, partial) pairs bounded by
    // the window count. The batch form here is bit-identical to the
    // streaming form (q74 uses the same expression under a watermark).
    Q("q69_sliding_windows",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select(window($"ts", "2 hours", "1 hour").as("w"), $"value")
          .groupBy($"w")
          .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
          .select($"w.start".as("ws"), $"w.end".as("we"), $"n", $"total_value")
          .orderBy($"ws")
      },
      Some("""WITH w AS (
             |  SELECT date_trunc('hour', ts) - to_hours(k.k) AS ws, value
             |  FROM events
             |  CROSS JOIN (SELECT unnest([0, 1]) AS k) k)
             |SELECT ws, ws + INTERVAL 2 HOUR AS we,
             |  count(*) AS n, round(sum(value), 4) AS total_value
             |FROM w GROUP BY ws ORDER BY ws""".stripMargin)),

    // Bloom-pruned join — the runtime-filter pattern as an explicit
    // operator (functions.BloomPrune): a distributed BloomFilterAggregate
    // over the dim side's keys prunes the fact scan with
    // BloomFilterMightContain BEFORE the shuffle, then the exact semi
    // join removes the false positives. No false negatives → the result
    // set is provably the plain join's (the oracle IS the plain join);
    // the bloom only cuts what the join would discard. At 100 TB the
    // fact shuffle shrinks to ~the matching fraction — the win AQE's
    // injected filter gets only for shuffle-join shapes it recognizes.
    Q("q80_bloom_join",
      (s, d) => {
        import s.implicits._
        val dim = Tables.customer(s, d)
          .filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey")
        val bloom = graft.functions.BloomPrune.buildBloom(dim, $"c_custkey", 4000L)
        Tables.orders(s, d)
          .filter(graft.functions.BloomPrune.mightContain(bloom, $"o_custkey"))
          .join(broadcast(dim), $"o_custkey" === $"c_custkey", "left_semi")
          .groupBy(date_trunc("month", $"o_orderdate").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum($"o_totalprice"), 2).as("revenue"))
          .orderBy($"month")
      },
      Some("""SELECT date_trunc('month', o_orderdate) AS month,
             |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
             |FROM orders
             |WHERE o_custkey IN (SELECT c_custkey FROM customer
             |                    WHERE c_mktsegment = 'BUILDING')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Time-series gap fill — densify the hourly per-type series so every
    // (hour, type) slot exists with an explicit zero, the precondition for
    // window/diff analytics downstream. The hour spine is generated with
    // `sequence()` off a 1-row min/max aggregate (no driver loop, no
    // collect), the type dim is a distinct scan, and both sides of the
    // final left join are bounded aggregates — at 100 TB the fact table is
    // touched exactly twice (bounds + hourly rollup), and everything the
    // join sees is already reduced, so spine × dims broadcasts.
    Q("q81_gap_fill",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val hourly = ev
          .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
          .agg(count(lit(1)).as("cnt"), sum($"value").as("sv"))
        val spine = ev
          .agg(min(date_trunc("hour", $"ts")).as("h0"),
            max(date_trunc("hour", $"ts")).as("h1"))
          .select(explode(sequence($"h0", $"h1", expr("interval 1 hour"))).as("hour"))
        val types = ev.select($"event_type").distinct()
        spine.crossJoin(broadcast(types))
          .join(broadcast(hourly), Seq("hour", "event_type"), "left")
          .select($"hour", $"event_type",
            coalesce($"cnt", lit(0L)).as("n"),
            round(coalesce($"sv", lit(0.0)), 4).as("total_value"))
          .orderBy($"hour", $"event_type")
      },
      Some("""WITH b AS (
             |  SELECT min(date_trunc('hour', ts)) AS h0,
             |    max(date_trunc('hour', ts)) AS h1 FROM events),
             |spine AS (
             |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
             |  FROM b),
             |types AS (SELECT DISTINCT event_type FROM events),
             |hourly AS (
             |  SELECT date_trunc('hour', ts) AS hour, event_type,
             |    count(*) AS cnt, sum(value) AS sv
             |  FROM events GROUP BY 1, 2)
             |SELECT s.hour, t.event_type,
             |  coalesce(h.cnt, 0) AS n,
             |  round(coalesce(h.sv, 0.0), 4) AS total_value
             |FROM spine s CROSS JOIN types t
             |LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
             |ORDER BY s.hour, t.event_type""".stripMargin)),

    // Correlated scalar subquery — the declarative form of "rows above
    // their own group's benchmark": orders priced over 1.5× their
    // customer's average. Catalyst DECORRELATES this (RewriteCorrelated
    // ScalarSubquery) into the per-customer aggregate + an equi-join —
    // the same plan the hand-written join would give, so the SQL surface
    // costs nothing over the DataFrame form at 100 TB. The oracle runs
    // the identical correlated SQL through DuckDB's own decorrelator.
    Q("q82_correlated_subquery",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderkey, o_custkey,
                |  round(o_totalprice, 2) AS price
                |FROM orders_v o1
                |WHERE o_totalprice > 1.5 * (
                |  SELECT avg(o2.o_totalprice) FROM orders_v o2
                |  WHERE o2.o_custkey = o1.o_custkey)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  round(o_totalprice, 2) AS price
             |FROM orders o1
             |WHERE o_totalprice > 1.5 * (
             |  SELECT avg(o2.o_totalprice) FROM orders o2
             |  WHERE o2.o_custkey = o1.o_custkey)
             |ORDER BY o_orderkey""".stripMargin)),

    // Declarative band join — q18's semantics written the NAIVE way
    // (`abs(p_us − err_us) <= w`, no hand-built bins) and left to the
    // injected plans.RangeBinJoin optimizer rule, which rewrites it into
    // the binned equi-join automatically (OpsSuite pins the rewrite and
    // the nested-loop plan it replaces). This is the library's Catalyst
    // extension tier earning its keep: user code states the predicate,
    // the rule supplies the 100 TB-safe physical shape. ±120 s window,
    // per-error nearby-purchase stats.
    Q("q84_auto_range_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val err = ev.filter($"event_type" === "error")
          .select($"event_id".as("err_id"), unix_micros($"ts").as("err_us"))
        val purch = ev.filter($"event_type" === "purchase")
          .select(unix_micros($"ts").as("p_us"), $"value".as("p_value"))
        err.join(purch, abs($"p_us" - $"err_us") <= lit(120L * 1000000L))
          .groupBy($"err_id")
          .agg(count(lit(1)).as("n_purch"),
            round(avg($"p_value"), 6).as("avg_value"))
          .orderBy($"err_id")
      },
      Some("""WITH err AS (
             |  SELECT event_id AS err_id, epoch_us(ts) AS err_us
             |  FROM events WHERE event_type = 'error'),
             |purch AS (
             |  SELECT epoch_us(ts) AS p_us, value AS p_value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT err_id, count(*) AS n_purch,
             |  round(avg(p_value), 6) AS avg_value
             |FROM err JOIN purch ON abs(p_us - err_us) <= 120000000
             |GROUP BY err_id
             |ORDER BY err_id""".stripMargin)),

    // Sequential conversion funnel — ORDERED stage progression per user
    // (signup → first view after it → first click after that → purchase
    // after that), not mere per-type existence: each stage's timestamp
    // must follow the previous stage's. Every stage is one filtered
    // aggregate joined to the previous stage's (user, ts) frame — four
    // bounded per-user frames, each shuffled once on user_id; the final
    // four scalars combine through the broadcast 1-row cross-join
    // pattern, so no single-partition exchange touches the event stream.
    Q("q86_funnel",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        def stage(tpe: String, prev: DataFrame, prevTs: String, out: String) =
          ev.filter($"event_type" === tpe)
            .join(prev, "user_id")
            .filter($"us" > col(prevTs))
            .groupBy($"user_id").agg(min($"us").as(out))
        val t1 = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"us").as("t1"))
        val t2 = stage("view", t1, "t1", "t2")
        val t3 = stage("click", t2, "t2", "t3")
        val t4 = stage("purchase", t3, "t3", "t4")
        def n(df: DataFrame, as: String) = df.agg(count(lit(1)).as(as))
        n(t1, "n_signup")
          .crossJoin(broadcast(n(t2, "n_view")))
          .crossJoin(broadcast(n(t3, "n_click")))
          .crossJoin(broadcast(n(t4, "n_purchase")))
      },
      Some("""WITH t1 AS (
             |  SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'signup' GROUP BY 1),
             |t2 AS (
             |  SELECT e.user_id, min(ts) AS t2 FROM events e
             |  JOIN t1 USING (user_id)
             |  WHERE event_type = 'view' AND ts > t1 GROUP BY 1),
             |t3 AS (
             |  SELECT e.user_id, min(ts) AS t3 FROM events e
             |  JOIN t2 USING (user_id)
             |  WHERE event_type = 'click' AND ts > t2 GROUP BY 1),
             |t4 AS (
             |  SELECT e.user_id, min(ts) AS t4 FROM events e
             |  JOIN t3 USING (user_id)
             |  WHERE event_type = 'purchase' AND ts > t3 GROUP BY 1)
             |SELECT (SELECT count(*) FROM t1) AS n_signup,
             |  (SELECT count(*) FROM t2) AS n_view,
             |  (SELECT count(*) FROM t3) AS n_click,
             |  (SELECT count(*) FROM t4) AS n_purchase""".stripMargin)),

    // Z-score outlier detection — per-type population stats (one partial+
    // final aggregate over the stream) broadcast-joined back onto the rows,
    // flagging |value − µ| > 3σ. The two-pass shape (aggregate, then join
    // the BOUNDED stats frame back) is the scale-correct alternative to a
    // per-row window over the whole population: the second pass streams
    // map-side against a broadcast of per-type scalars. Population σ
    // (stddev_pop) so both engines use the same estimator; z rounded for
    // the hash.
    Q("q89_outliers",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val stats = ev.groupBy($"event_type")
          .agg(avg($"value").as("mu"), stddev_pop($"value").as("sigma"))
        ev.join(broadcast(stats), "event_type")
          .filter(abs($"value" - $"mu") > lit(3.0) * $"sigma")
          .select($"event_type", $"event_id",
            round($"value", 4).as("value"),
            round(($"value" - $"mu") / $"sigma", 4).as("z"))
          .orderBy($"event_type", $"event_id")
      },
      Some("""WITH stats AS (
             |  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
             |  FROM events GROUP BY 1)
             |SELECT e.event_type, e.event_id,
             |  round(e.value, 4) AS value,
             |  round((e.value - s.mu) / s.sigma, 4) AS z
             |FROM events e JOIN stats s USING (event_type)
             |WHERE abs(e.value - s.mu) > 3.0 * s.sigma
             |ORDER BY e.event_type, e.event_id""".stripMargin)),

    // Exponential time-decay scoring — recency-weighted engagement
    // (half-life 7 days), the standard freshness feature: each event
    // contributes value · 2^(−age/half_life) against the corpus horizon
    // (max ts — a 1-row broadcast, not a driver constant). One aggregate
    // pass after a broadcast cross join; exp/log are codegen'd scalar
    // functions, so the whole map side fuses into one stage.
    Q("q92_decay_score",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", unix_micros($"ts").as("us"), $"value")
        val horizon = ev.agg(max($"us").as("h"))
        ev.crossJoin(broadcast(horizon))
          .withColumn("w", pow(lit(2.0),
            -($"h" - $"us").cast("double") / lit(7.0 * 86400 * 1000000L)))
          .groupBy($"user_id")
          .agg(round(sum($"value" * $"w"), 4).as("decayed_value"),
            round(sum($"w"), 4).as("decayed_n"),
            count(lit(1)).as("n"))
          .orderBy($"user_id")
      },
      Some("""WITH h AS (SELECT max(epoch_us(ts)) AS h FROM events)
             |SELECT user_id,
             |  round(sum(value * pow(2.0,
             |    -(h.h - epoch_us(ts)) / (7.0 * 86400 * 1000000))), 4)
             |    AS decayed_value,
             |  round(sum(pow(2.0,
             |    -(h.h - epoch_us(ts)) / (7.0 * 86400 * 1000000))), 4)
             |    AS decayed_n,
             |  count(*) AS n
             |FROM events, h
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin)),

    // Correlation / covariance matrix — the feature-screening pass over
    // the fact table's numeric columns: all pairwise Pearson r and one
    // covariance in ONE aggregate pass (every corr/covar is an
    // associative accumulator, so the whole matrix is a single
    // partial+final HashAggregate over one scan — no per-pair jobs).
    Q("q93_correlation",
      (s, d) => {
        import s.implicits._
        li(s, d).agg(
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("r_qty_price"),
          round(corr($"l_quantity", $"l_discount"), 6).as("r_qty_disc"),
          round(corr($"l_extendedprice", $"l_discount"), 6).as("r_price_disc"),
          round(corr($"l_extendedprice", $"l_tax"), 6).as("r_price_tax"),
          round(covar_pop($"l_quantity", $"l_discount"), 6).as("cov_qty_disc"),
          count(lit(1)).as("n"))
      },
      Some("""SELECT
             |  round(corr(l_quantity, l_extendedprice), 6) AS r_qty_price,
             |  round(corr(l_quantity, l_discount), 6) AS r_qty_disc,
             |  round(corr(l_extendedprice, l_discount), 6) AS r_price_disc,
             |  round(corr(l_extendedprice, l_tax), 6) AS r_price_tax,
             |  round(covar_pop(l_quantity, l_discount), 6) AS cov_qty_disc,
             |  count(*) AS n
             |FROM lineitem""".stripMargin)),

    // Equi-width histogram — the distribution-profiling pass: 20 buckets
    // over [min, max] computed from a 1-row bounds aggregate (broadcast,
    // never a driver constant), bucket = floor((v − lo) · 20 / span)
    // clamped so v = max lands in the last bucket. Two scans total
    // (bounds + binning), one bounded shuffle on the 20 bucket keys —
    // the same plan at 100 TB.
    Q("q94_histogram",
      (s, d) => {
        import s.implicits._
        val o = Tables.orders(s, d).select($"o_totalprice".as("v"))
        val bounds = o.agg(min($"v").as("lo"), max($"v").as("hi"))
        o.crossJoin(broadcast(bounds))
          .select(least(floor(($"v" - $"lo") * 20.0 / ($"hi" - $"lo")), lit(19.0))
            .cast("long").as("bucket"),
            $"v", $"lo", $"hi")
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"),
            round(min($"v"), 2).as("bucket_min"),
            round(max($"v"), 2).as("bucket_max"))
          .orderBy($"bucket")
      },
      Some("""WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
             |          FROM orders)
             |SELECT CAST(least(floor((o_totalprice - lo) * 20.0 / (hi - lo)), 19)
             |    AS BIGINT) AS bucket,
             |  count(*) AS n,
             |  round(min(o_totalprice), 2) AS bucket_min,
             |  round(max(o_totalprice), 2) AS bucket_max
             |FROM orders, b
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // One-pass column profile — the data-quality audit emitted before a
    // table enters a training pipeline: per column, nulls, distincts,
    // bounds. All accumulators ride ONE aggregate over one scan (exact
    // distincts share the pass; the sketched variant for ultra-wide
    // tables is q57's HLL form), emitted as one row per column via a
    // stack/unpivot so the profile table's schema is column-count
    // independent.
    Q("q95_profile",
      (s, d) => {
        import s.implicits._
        val row = Tables.orders(s, d).agg(
          count(lit(1)).as("n_rows"),
          sum($"o_custkey".isNull.cast("long")).as("nulls_custkey"),
          countDistinct($"o_custkey").as("nd_custkey"),
          sum($"o_orderstatus".isNull.cast("long")).as("nulls_status"),
          countDistinct($"o_orderstatus").as("nd_status"),
          sum($"o_totalprice".isNull.cast("long")).as("nulls_price"),
          countDistinct($"o_totalprice").as("nd_price"))
        row.select(expr(
          """stack(3,
            |  'o_custkey', nulls_custkey, nd_custkey,
            |  'o_orderstatus', nulls_status, nd_status,
            |  'o_totalprice', nulls_price, nd_price) AS (col_name, n_nulls, n_distinct)""".stripMargin),
          $"n_rows")
          .orderBy($"col_name")
      },
      Some("""WITH p AS (
             |  SELECT count(*) AS n_rows,
             |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_custkey,
             |    count(DISTINCT o_custkey) AS nd_custkey,
             |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_status,
             |    count(DISTINCT o_orderstatus) AS nd_status,
             |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_price,
             |    count(DISTINCT o_totalprice) AS nd_price
             |  FROM orders)
             |SELECT u.col_name, u.n_nulls, u.n_distinct, p.n_rows
             |FROM p, (
             |  SELECT 'o_custkey' AS col_name, nulls_custkey AS n_nulls,
             |    nd_custkey AS n_distinct FROM p
             |  UNION ALL SELECT 'o_orderstatus', nulls_status, nd_status FROM p
             |  UNION ALL SELECT 'o_totalprice', nulls_price, nd_price FROM p) u
             |ORDER BY u.col_name""".stripMargin)),

    // Latest-snapshot per key — the CDC/SCD collapse: of all events per
    // (user, type), keep exactly the newest (event-time, then event_id as
    // the deterministic tie-break). The argmax is a `max_by` AGGREGATE,
    // not a rank-1 window (r14, same replan as assignCells): the window
    // shuffles and SORTS the whole event log per key, while the aggregate
    // collapses each key to one row map-side — the shuffle carries one
    // row per (user, type) per map task, no sort anywhere. The ordering
    // struct (us, event_id) is strictly total (event_id unique), so the
    // kept row is the window's exact argmax; at 100 TB the upsert
    // compaction becomes a partial-agg pass instead of a full log sort.
    Q("q96_latest_snapshot",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"user_id", $"event_type", $"event_id",
            unix_micros($"ts").as("us"), $"value")
          .groupBy($"user_id", $"event_type")
          .agg(max_by(struct($"event_id", $"us", $"value"),
            struct($"us", $"event_id")).as("top"))
          .select($"user_id", $"event_type", $"top.event_id".as("event_id"),
            $"top.us".as("us"), round($"top.value", 4).as("value"))
          .orderBy($"user_id", $"event_type")
      },
      Some("""SELECT user_id, event_type, event_id, us, value FROM (
             |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
             |    round(value, 4) AS value,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk
             |  FROM events)
             |WHERE rk = 1
             |ORDER BY user_id, event_type""".stripMargin)),

    // Month-over-month growth — the trend shape: monthly revenue plus its
    // % change against the previous month. The previous-month lookup is a
    // SELF-JOIN ON THE CALENDAR KEY (month = prev + 1 month), not a
    // global lag window: an unpartitioned window plans an Exchange
    // SinglePartition — the one shape this codebase bans (PLANS.md) —
    // while the equi-join on the bounded month frame broadcasts. Same
    // result, no serialization point.
    Q("q97_mom_growth",
      (s, d) => {
        import s.implicits._
        val monthly = Tables.orders(s, d)
          .groupBy(date_trunc("month", $"o_orderdate").as("month"))
          .agg(round(sum($"o_totalprice"), 2).as("revenue"))
        val prev = monthly.select(
          ($"month" + expr("INTERVAL 1 MONTH")).as("month"),
          $"revenue".as("prev"))
        monthly.join(broadcast(prev), Seq("month"), "left")
          .select($"month", $"revenue",
            round(($"revenue" - $"prev") * 100.0 / $"prev", 4).as("mom_pct"))
          .orderBy($"month")
      },
      Some("""WITH m AS (
             |  SELECT date_trunc('month', o_orderdate) AS month,
             |    round(sum(o_totalprice), 2) AS revenue
             |  FROM orders GROUP BY 1)
             |SELECT a.month, a.revenue,
             |  round((a.revenue - b.revenue) * 100.0 / b.revenue, 4) AS mom_pct
             |FROM m a LEFT JOIN m b ON a.month = b.month + INTERVAL 1 MONTH
             |ORDER BY a.month""".stripMargin)),

    // Behavioral transition matrix — Markov structure of the event
    // stream: per user-ordered (previous type → type) bigram counts and
    // each row's share of its source state. One keyed window (lag) plus
    // two bounded aggregates — the 5×5 transition frame joins back
    // broadcast, so the fact stream is scanned once however large.
    Q("q99_transitions",
      (s, d) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        val bi = Tables.events(s, d)
          .select($"user_id", $"event_id", $"event_type",
            unix_micros($"ts").as("us"))
          .withColumn("prev", lag($"event_type", 1).over(byUser))
          .filter($"prev".isNotNull)
          .groupBy($"prev".as("from_type"), $"event_type".as("to_type"))
          .agg(count(lit(1)).as("n"))
        val totals = bi.groupBy($"from_type").agg(sum($"n").as("tot"))
        bi.join(broadcast(totals), "from_type")
          .select($"from_type", $"to_type", $"n",
            round($"n".cast("double") / $"tot", 6).as("p"))
          .orderBy($"from_type", $"to_type")
      },
      Some("""WITH b AS (
             |  SELECT prev AS from_type, event_type AS to_type, count(*) AS n
             |  FROM (
             |    SELECT user_id, event_type,
             |      lag(event_type) OVER (PARTITION BY user_id
             |        ORDER BY epoch_us(ts), event_id) AS prev
             |    FROM events)
             |  WHERE prev IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
             |      FROM b GROUP BY 1)
             |SELECT b.from_type, b.to_type, b.n,
             |  round(b.n * 1.0 / t.tot, 6) AS p
             |FROM b JOIN t USING (from_type)
             |ORDER BY b.from_type, b.to_type""".stripMargin)),

    // Weekly retention cohorts — the canonical product-analytics matrix:
    // users grouped by first-active week, tracked by distinct activity in
    // each later week, each cell normalized by its cohort's size. The
    // user-week activity set dedupes FIRST (one shuffle keyed on user —
    // at 100 TB this is the only pass over raw events; everything after
    // operates on the much smaller distinct set), the first-week lookup
    // is a partial-agg join back on user, and the matrix itself is a
    // bounded (weeks × weeks) aggregate with cohort sizes broadcast.
    // Monday-anchored date_trunc('week') agrees across both engines.
    Q("q112_retention",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", to_date(date_trunc("week", $"ts")).as("wk"))
          .distinct()
        val first = ev.groupBy($"user_id").agg(min($"wk").as("cohort"))
        val cells = ev.join(first, "user_id")
          .groupBy($"cohort", expr("datediff(wk, cohort) div 7").as("week_n"))
          .agg(count(lit(1)).as("n_active"))
        val sizes = cells.filter($"week_n" === 0L)
          .select($"cohort", $"n_active".as("cohort_size"))
        cells.join(broadcast(sizes), "cohort")
          .select($"cohort", $"week_n", $"n_active", $"cohort_size",
            round($"n_active".cast("double") / $"cohort_size", 6).as("retention"))
          .orderBy($"cohort", $"week_n")
      },
      Some("""WITH ev AS (
             |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
             |  FROM events),
             |f AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id),
             |r AS (
             |  SELECT cohort, CAST((wk - cohort) // 7 AS BIGINT) AS week_n,
             |    count(*) AS n_active
             |  FROM ev JOIN f USING (user_id) GROUP BY 1, 2),
             |c0 AS (SELECT cohort, n_active AS cohort_size FROM r WHERE week_n = 0)
             |SELECT r.cohort, r.week_n, r.n_active, c0.cohort_size,
             |  round(r.n_active * 1.0 / c0.cohort_size, 6) AS retention
             |FROM r JOIN c0 USING (cohort)
             |ORDER BY r.cohort, r.week_n""".stripMargin)),

    // 7-day RANGE-framed trailing average of daily order revenue per
    // nation — the value-based window frame (RANGE, not ROWS: calendar
    // gaps must widen the divisor's reach, so the frame is keyed on an
    // integer day offset, which both engines frame identically). Daily
    // totals aggregate FIRST — the window runs over nation × day rows,
    // already thousands of times smaller than orders — and each
    // nation's series is one hash-partition; at 100 TB the day grid per
    // nation is still bounded by the calendar, not the fact table.
    Q("q116_moving_avg",
      (s, d) => {
        import s.implicits._
        // daily totals quantize to integer cents BEFORE the window: the
        // frame's running sum is then exact integer math, immune to the
        // float-summation-order drift a double avg() would leak into the
        // 2-dp rounding on either engine
        val daily = Tables.orders(s, d)
          .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name", $"o_orderdate")
          .agg(round(sum($"o_totalprice") * 100).cast("long").as("day_cents"))
          .withColumn("day_off", datediff($"o_orderdate", lit("1992-01-01")))
        val w = Window.partitionBy($"n_name").orderBy($"day_off").rangeBetween(-6, 0)
        daily
          .withColumn("wsum", sum($"day_cents").over(w))
          .withColumn("wn", count(lit(1)).over(w))
          // half-up to whole cents in integer math — double round() breaks
          // ties differently across engines on exact .xx5 averages
          .select($"n_name", $"o_orderdate",
            round($"day_cents" / 100.0, 2).as("day_rev"),
            (expr("(2 * wsum + wn) div (2 * wn)") / 100.0).as("ma7"))
          .orderBy($"n_name", $"o_orderdate")
      },
      Some("""WITH daily AS (
             |  SELECT n_name, o_orderdate,
             |    CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS day_cents,
             |    CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS day_off
             |  FROM orders
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY n_name, o_orderdate)
             |SELECT n_name, o_orderdate, round(day_cents / 100.0, 2) AS day_rev,
             |  ((2 * sum(day_cents) OVER w + count(*) OVER w)
             |    // (2 * count(*) OVER w)) / 100.0 AS ma7
             |FROM daily
             |WINDOW w AS (PARTITION BY n_name ORDER BY day_off
             |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
             |ORDER BY n_name, o_orderdate""".stripMargin)),

    // Robust per-group outlier stats — median + MAD, the estimator pair
    // that survives the heavy tails that wreck mean/stddev z-scores.
    // Two passes by construction (MAD needs |v − median|): medians
    // broadcast back to the stream, then the second interpolated
    // percentile and the >3-robust-σ count aggregate per group. Spark's
    // exact `percentile` buffers per group here; at 100 TB swap in the
    // q17 sort-free interpolation machinery — the dataflow shape (two
    // bounded aggregates + one broadcast) is already the scalable one.
    Q("q121_mad_outliers",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"event_type", $"value")
        val med = ev.groupBy($"event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("adev", abs($"value" - $"med"))
        val mad = dev.groupBy($"event_type")
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy($"event_type")
          .agg(round(first($"med"), 6).as("median_v"),
            round(first($"mad"), 6).as("mad"),
            count(lit(1)).as("n"),
            sum(when($"adev" > $"mad" * 3 * 1.4826, 1L).otherwise(0L))
              .as("n_outliers"))
          .orderBy($"event_type")
      },
      Some("""WITH med AS (
             |  SELECT event_type, quantile_cont(value, 0.5) AS med
             |  FROM events GROUP BY event_type),
             |dev AS (
             |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
             |  FROM events e JOIN med m USING (event_type)),
             |md AS (
             |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
             |  FROM dev GROUP BY event_type)
             |SELECT event_type, round(any_value(dev.med), 6) AS median_v,
             |  round(any_value(md.mad), 6) AS mad,
             |  count(*) AS n,
             |  CAST(sum(CASE WHEN adev > md.mad * 3 * 1.4826 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers
             |FROM dev JOIN md USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Join-key heavy hitters — the skew diagnosis read before picking a
    // salting factor: the 20 hottest l_partkey values with each key's
    // share and the cumulative share of the hot set. The per-key count
    // is one partial-agg shuffle; the top-20 is a TakeOrdered (no global
    // sort materializes), and rank/cumulative-share come from a
    // triangular self-join over those 20 rows — bounded, no
    // single-partition window. If cum_share says 20 keys carry half the
    // table, the join they feed needs AQE skew handling or salt.
    Q("q126_skew_audit",
      (s, d) => {
        import s.implicits._
        val counts = Tables.lineitem(s, d)
          .groupBy($"l_partkey").agg(count(lit(1)).as("n_lines"))
        val tot = counts.agg(sum($"n_lines").as("tot"))
        val top = counts.orderBy($"n_lines".desc, $"l_partkey").limit(20)
        top.join(broadcast(top.toDF("pk2", "n2")),
            $"n2" > $"n_lines" || ($"n2" === $"n_lines" && $"pk2" <= $"l_partkey"))
          .groupBy($"l_partkey", $"n_lines")
          .agg(count(lit(1)).as("rnk"), sum($"n2").as("cum_n"))
          .crossJoin(broadcast(tot))
          .select($"rnk", $"l_partkey", $"n_lines",
            round($"n_lines" / $"tot", 6).as("share"),
            round($"cum_n" / $"tot", 6).as("cum_share"))
          .orderBy($"rnk")
      },
      Some("""WITH c AS (
             |  SELECT l_partkey, count(*) AS n_lines FROM lineitem GROUP BY l_partkey),
             |t AS (SELECT CAST(sum(n_lines) AS BIGINT) AS tot FROM c),
             |top AS (SELECT * FROM c ORDER BY n_lines DESC, l_partkey LIMIT 20)
             |SELECT count(*) AS rnk, x.l_partkey, x.n_lines,
             |  round(x.n_lines * 1.0 / any_value(t.tot), 6) AS share,
             |  round(sum(y.n_lines) * 1.0 / any_value(t.tot), 6) AS cum_share
             |FROM top x JOIN top y
             |  ON y.n_lines > x.n_lines
             |  OR (y.n_lines = x.n_lines AND y.l_partkey <= x.l_partkey), t
             |GROUP BY x.l_partkey, x.n_lines ORDER BY rnk""".stripMargin)),

    // DAU / trailing-28-day MAU stickiness — the engagement ratio every
    // growth dashboard tracks. The raw stream collapses to the distinct
    // user-day set FIRST (the only pass over full events); each user-day
    // then claims membership in the 28 window-days it supports via a
    // bounded 28-way offset explode, and both actives counts are
    // partial-agg shuffles on the day key. No distinct-over-window
    // gymnastics, no state proportional to anything but users × days.
    Q("q127_stickiness",
      (s, d) => {
        import s.implicits._
        val ud = Tables.events(s, d)
          .select($"user_id", to_date($"ts").as("day"))
          .distinct()
          .cache() // read twice: DAU + the window-membership explode
        val dau = ud.groupBy($"day").agg(count(lit(1)).as("n_dau"))
        val mau = ud
          .select($"user_id", explode(sequence(lit(0), lit(27))).as("i"),
            $"day")
          .select($"user_id", expr("date_add(day, i)").as("wday"))
          .distinct()
          .groupBy($"wday").agg(count(lit(1)).as("n_mau"))
        dau.join(mau, $"day" === $"wday")
          .select($"day", $"n_dau", $"n_mau",
            round($"n_dau".cast("double") / $"n_mau", 6).as("stickiness"))
          .orderBy($"day")
      },
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |dau AS (SELECT day, count(*) AS n_dau FROM ud GROUP BY day),
             |mau AS (
             |  SELECT wday, count(*) AS n_mau FROM (
             |    SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS wday
             |    FROM ud, (SELECT unnest(generate_series(0, 27)) AS i))
             |  GROUP BY wday)
             |SELECT day, n_dau, n_mau,
             |  round(n_dau * 1.0 / n_mau, 6) AS stickiness
             |FROM dau JOIN mau ON day = wday ORDER BY day""".stripMargin)),

    // Ranking-window completeness — ntile quartiles, percent_rank, and
    // cume_dist in one pass over source-partitioned windows (the length-
    // distribution placement of every document within its source). All
    // three are rank-family functions: one sort per partition serves the
    // whole select, partitions stay source-bounded, and the tie-break on
    // doc_id makes every rank value engine-reproducible.
    Q("q131_window_zoo",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"source").orderBy($"n_tok", $"doc_id")
        Tables.documents(s, d)
          .select($"source", $"doc_id",
            size(split($"text", " ")).cast("long").as("n_tok"))
          .select($"source", $"doc_id", $"n_tok",
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
          .orderBy($"source", $"n_tok", $"doc_id")
      },
      Some("""WITH d AS (
             |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
             |  FROM documents)
             |SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |  round(percent_rank() OVER w, 6) AS pct_rank,
             |  round(cume_dist() OVER w, 6) AS cume
             |FROM d
             |WINDOW w AS (PARTITION BY source ORDER BY n_tok, doc_id)
             |ORDER BY source, n_tok, doc_id""".stripMargin)),

    // Lag-k autocorrelation of daily revenue (k = 1…7) — the
    // seasonality probe run before fitting any forecast. The daily
    // series aggregates once (integer cents); each lag is an equi-join
    // of the bounded series against itself shifted k days, and the
    // correlation assembles from INTEGER moment sums (n, Σx, Σy, Σxy,
    // Σx², Σy²) — exact in any summation order on any engine; only the
    // final divide/sqrt touches floating point. The weekly TPC-H order
    // cadence shows up as the k=7 peak.
    Q("q132_autocorr",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .groupBy(datediff($"o_orderdate", lit("1992-01-01")).as("day_off"))
          .agg(round(sum($"o_totalprice") * 100).cast("long").as("cents"))
          .cache() // joined against itself once per lag
        // moments accumulate in decimal(38,0) (HUGEINT on the oracle
        // side): cents² × a century of days overflows a 64-bit sum long
        // before it overflows 38 digits
        val lags = (1 to 7).map { k =>
          daily.toDF("d1", "x0").join(daily.toDF("d2", "y0"),
              $"d2" === $"d1" - k)
            .select($"x0".cast("decimal(38,0)").as("x"),
              $"y0".cast("decimal(38,0)").as("y"))
            .agg(lit(k.toLong).as("lag_k"), count(lit(1)).as("n"),
              sum($"x").as("sx"), sum($"y").as("sy"),
              sum($"x" * $"y").as("sxy"),
              sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
        }.reduce(_ union _)
        lags.select($"lag_k", $"n",
            round(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double")) *
                sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double"))), 6).as("acf"))
          .orderBy($"lag_k")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS day_off,
             |    CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |lagged AS (
             |  SELECT k.lag_k, a.cents AS x, b.cents AS y
             |  FROM (SELECT unnest(generate_series(1, 7)) AS lag_k) k
             |  JOIN daily a ON true
             |  JOIN daily b ON b.day_off = a.day_off - k.lag_k),
             |m AS (
             |  SELECT lag_k, count(*) AS n,
             |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x AS HUGEINT) * y) AS sxy,
             |    sum(CAST(x AS HUGEINT) * x) AS sxx,
             |    sum(CAST(y AS HUGEINT) * y) AS syy
             |  FROM lagged GROUP BY lag_k)
             |SELECT lag_k, n,
             |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
             |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
             |      * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS acf
             |FROM m ORDER BY lag_k""".stripMargin)),

    // Burst detection — each user's hottest sliding hour: for every
    // event, the count of that user's events in [t, t+1h) — an interval
    // self-join made shuffle-bounded by the q72/q84 bin trick (anchor
    // probes its own and the next hour bin; each event lands in exactly
    // 2 candidate bins, so fan-out is a constant ×2, never a cross
    // join). The per-user max rolls up from the per-anchor counts; a
    // max_burst far above the user's hourly mean is the bot/incident
    // signature this probe exists for.
    Q("q134_bursts",
      (s, d) => {
        import s.implicits._
        val winUs = 3600L * 1000000L
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
          .cache() // anchors and probes both scan it
        val probes = ev
          .select($"user_id", $"us".as("p_us"),
            explode(array(expr(s"us div $winUs"), expr(s"us div $winUs - 1")))
              .as("bin"))
        val anchors = ev
          .select($"user_id", $"event_id", $"us",
            expr(s"us div $winUs").as("bin"))
        val bursts = anchors.join(probes, Seq("user_id", "bin"))
          .filter($"p_us" >= $"us" && $"p_us" < $"us" + winUs)
          .groupBy($"user_id", $"event_id").agg(count(lit(1)).as("burst"))
        bursts.groupBy($"user_id")
          .agg(max($"burst").as("max_burst"), count(lit(1)).as("n_events"))
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
             |b AS (
             |  SELECT a.user_id, a.event_id, count(*) AS burst
             |  FROM ev a JOIN ev p
             |    ON p.user_id = a.user_id
             |    AND p.us >= a.us AND p.us < a.us + 3600000000
             |  GROUP BY a.user_id, a.event_id)
             |SELECT user_id, CAST(max(burst) AS BIGINT) AS max_burst,
             |  count(*) AS n_events
             |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Incremental view maintenance — the 100 TB pattern for keeping a
    // rollup current without rescanning history: the day-partitioned
    // event stream splits into BASE (all closed days) and DELTA (the
    // newest day); each side aggregates independently and the rollup is
    // the pure partial-aggregate MERGE (counts and sums add; min/max
    // take extrema; avg is NOT mergeable, so the state carries (sum,
    // count) and the average derives after the merge — value sums ride
    // in integer cents so merge order cannot move a bit). In production
    // the base side is the stored aggregate state, so per refresh only
    // the delta partition is ever read; here both sides compute from the
    // corpus and the oracle checks the merged result equals the direct
    // full-history rollup.
    Q("q140_incremental_agg",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"event_type", to_date($"ts").as("day"),
            round($"value" * 100).cast("long").as("cents"))
        val split = ev.crossJoin(broadcast(ev.agg(max($"day").as("maxDay"))))
        def rollup(side: DataFrame) = side
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"cents").as("sc"),
            min($"cents").as("mn"), max($"cents").as("mx"))
        val base  = rollup(split.filter($"day" < $"maxDay"))
        val delta = rollup(split.filter($"day" === $"maxDay"))
        // the merge: outer-join the two states, add/extremize columnwise
        base.as("b").join(delta.as("d"), Seq("event_type"), "full_outer")
          .select($"event_type",
            (coalesce($"b.n", lit(0L)) + coalesce($"d.n", lit(0L))).as("n_events"),
            (coalesce($"b.sc", lit(0L)) + coalesce($"d.sc", lit(0L))).as("sum_cents"),
            least($"b.mn", $"d.mn").as("min_cents"),
            greatest($"b.mx", $"d.mx").as("max_cents"))
          // half-up average in exact integer 1e-4-dollar units (the q125
          // trick) — a double division could land on a rounding boundary
          .withColumn("avg_value",
            expr("(2 * sum_cents * 100 + n_events) div (2 * n_events)") / 10000.0)
          .orderBy($"event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events)
             |SELECT event_type, count(*) AS n_events,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  min(cents) AS min_cents, max(cents) AS max_cents,
             |  ((2 * CAST(sum(cents) AS BIGINT) * 100 + count(*))
             |    // (2 * count(*))) / 10000.0 AS avg_value
             |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Frequent-pair mining (association rules, the a-priori first pass):
    // part pairs that co-occur in the same order, scored by support and
    // LIFT = P(a,b)/(P(a)·P(b)). The a-priori pruning step is the scale
    // lever: items below the per-item support floor are dropped BEFORE
    // the pair join, so the inverted-index self-join on the order key
    // only ever sees frequent items and a basket of m frequent items
    // contributes m² pairs with m already bounded in practice (baskets
    // are small; a pathological hot order is AQE-skew-splittable). Lift
    // is a ratio of exact integers (rounded at 4 dp identically on both
    // engines); the output is the deterministic top-50.
    Q("q143_market_basket",
      (s, d) => {
        import s.implicits._
        val b = Tables.lineitem(s, d)
          .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
          .cache() // read three times: item supports, both pair sides
        val f = b.groupBy($"p").agg(count(lit(1)).as("supp"))
          .filter($"supp" >= 3)
        val fp = b.join(f, "p")
        val nOrders = b.select($"o").distinct().agg(count(lit(1)).as("n"))
        fp.select($"o", $"p".as("pa"), $"supp".as("sa"))
          .join(fp.select($"o", $"p".as("pb"), $"supp".as("sb")), "o")
          .filter($"pa" < $"pb")
          .groupBy($"pa", $"pb", $"sa", $"sb")
          .agg(count(lit(1)).as("n_both"))
          .crossJoin(broadcast(nOrders))
          .select($"pa", $"pb", $"n_both", $"sa", $"sb",
            round($"n_both" * $"n" / ($"sa" * $"sb").cast("double"), 4).as("lift"))
          .orderBy($"n_both".desc, $"lift".desc, $"pa", $"pb")
          .limit(50)
      },
      Some("""WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |f AS (SELECT p, count(*) AS supp FROM b GROUP BY p HAVING count(*) >= 3),
             |fp AS (SELECT b.o, b.p, f.supp FROM b JOIN f USING (p)),
             |n AS (SELECT count(DISTINCT o) AS n FROM b),
             |pairs AS (
             |  SELECT x.p AS pa, y.p AS pb, x.supp AS sa, y.supp AS sb,
             |    count(*) AS n_both
             |  FROM fp x JOIN fp y ON x.o = y.o AND x.p < y.p
             |  GROUP BY 1, 2, 3, 4)
             |SELECT pa, pb, n_both, CAST(sa AS BIGINT) AS sa,
             |  CAST(sb AS BIGINT) AS sb,
             |  round(n_both * n.n / CAST(sa * sb AS DOUBLE), 4) AS lift
             |FROM pairs, n
             |ORDER BY n_both DESC, lift DESC, pa, pb LIMIT 50""".stripMargin)),

    // Conversion latency — the event-sequence timing read every growth
    // dashboard needs: per user, seconds from first signup to the first
    // purchase at or after it, bucketed into hour/day/later bands. Two
    // per-user min-aggregates (map-side partial) and one join — the
    // purchase scan's event_type filter is pushed to parquet; timestamps
    // compare in exact integer microseconds so no float ever enters.
    Q("q144_conversion_latency",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
        val su = ev.filter($"event_type" === "signup")
          .groupBy($"user_id").agg(min($"us").as("t0"))
        val pu = ev.filter($"event_type" === "purchase")
          .join(su, "user_id")
          .filter($"us" >= $"t0")
          .groupBy($"user_id", $"t0").agg(min($"us").as("t1"))
        pu.select($"user_id",
            expr("(t1 - t0) div 1000000").as("latency_sec"))
          .withColumn("band",
            when($"latency_sec" < 3600, "within_hour")
              .when($"latency_sec" < 86400, "within_day").otherwise("later"))
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
             |su AS (SELECT user_id, min(us) AS t0 FROM ev
             |       WHERE event_type = 'signup' GROUP BY 1),
             |pu AS (
             |  SELECT e.user_id, su.t0, min(e.us) AS t1
             |  FROM ev e JOIN su USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.us >= su.t0
             |  GROUP BY 1, 2)
             |SELECT user_id, (t1 - t0) // 1000000 AS latency_sec,
             |  CASE WHEN (t1 - t0) // 1000000 < 3600 THEN 'within_hour'
             |       WHEN (t1 - t0) // 1000000 < 86400 THEN 'within_day'
             |       ELSE 'later' END AS band
             |FROM pu ORDER BY user_id""".stripMargin)),

    // Slowly-changing-dimension type-2 history build — the warehouse
    // pattern for turning an event log into validity periods: per user,
    // collapse consecutive same-type events and emit one row per state
    // change with [valid_from, valid_to) microsecond bounds (open periods
    // carry valid_to = -1 and is_current = true). Two windows over the
    // SAME (user_id → us, event_id) partitioning, so Spark plans one
    // shuffle and sorts once; event_id breaks timestamp ties so lag/lead
    // are total orders on both engines. At 100 TB this partitions by the
    // natural entity key — no global sort, state per user bounded.
    Q("q147_scd2_history",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        val ev = Tables.events(s, d)
          .select($"user_id", $"event_type",
            unix_micros($"ts").as("us"), $"event_id")
          .withColumn("prev", lag($"event_type", 1).over(w))
          .filter($"prev".isNull || $"prev" =!= $"event_type")
        val w2 = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        ev.withColumn("nxt", lead($"us", 1).over(w2))
          .select($"user_id", $"event_type".as("state"),
            $"us".as("valid_from"),
            coalesce($"nxt", lit(-1L)).as("valid_to"),
            $"nxt".isNull.as("is_current"))
          .orderBy($"user_id", $"valid_from", $"state")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
             |ch AS (
             |  SELECT user_id, event_type, us, event_id,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
             |  FROM ev)
             |SELECT user_id, event_type AS state, us AS valid_from,
             |  coalesce(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id),
             |           -1) AS valid_to,
             |  lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
             |    AS is_current
             |FROM ch WHERE prev IS NULL OR prev <> event_type
             |ORDER BY user_id, valid_from, state""".stripMargin)),

    // A/B experiment read-out — deterministic variant assignment
    // (user_id parity stands in for the salted-hash bucketer), per-variant
    // user and converter counts (converter = ≥ 15 purchase events; a
    // plain "any purchase" is degenerate on this corpus — every user
    // buys), conversion rates, lift, and the pooled two-proportion z
    // statistic. The whole query reduces to two per-user aggregates and
    // ONE row of driver-scale arithmetic; every count is exact and the
    // z-score's float ops run on identical integer inputs in both engines
    // so 4-dp rounding is stable. Divisors are greatest(·, 1e-12)-guarded
    // on both sides: a degenerate assignment (all or no converters) must
    // yield 0/∞, not an ANSI divide-by-zero. The only shuffle is the
    // per-user aggregate.
    Q("q148_ab_lift",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).select($"user_id", $"event_type")
        val users = ev.groupBy($"user_id")
          .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
            .as("np"))
          .select($"user_id", ($"user_id" % 2).cast("int").as("variant"),
            when($"np" >= 15, 1L).otherwise(0L).as("cv"))
        users
          .agg(
            sum(when($"variant" === 0, 1L).otherwise(0L)).as("n0"),
            sum(when($"variant" === 1, 1L).otherwise(0L)).as("n1"),
            sum(when($"variant" === 0, $"cv").otherwise(0L)).as("c0"),
            sum(when($"variant" === 1, $"cv").otherwise(0L)).as("c1"))
          .select($"n0", $"n1", $"c0", $"c1",
            round($"c0" / $"n0".cast("double"), 6).as("rate0"),
            round($"c1" / $"n1".cast("double"), 6).as("rate1"),
            round(($"c1" * $"n0") /
              greatest(($"c0" * $"n1").cast("double"), lit(1e-12)), 4).as("lift"),
            round(($"c1" / $"n1".cast("double") - $"c0" / $"n0".cast("double")) /
              greatest(sqrt((($"c0" + $"c1") / ($"n0" + $"n1").cast("double")) *
                (lit(1.0) - ($"c0" + $"c1") / ($"n0" + $"n1").cast("double")) *
                (lit(1.0) / $"n0" + lit(1.0) / $"n1")), lit(1e-12)), 4).as("z"))
      },
      Some("""WITH users AS (
             |  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
             |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
             |         THEN 1 ELSE 0 END AS cv
             |  FROM events GROUP BY 1, 2),
             |agg AS (
             |  SELECT
             |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN variant = 0 THEN cv ELSE 0 END) AS BIGINT) AS c0,
             |    CAST(sum(CASE WHEN variant = 1 THEN cv ELSE 0 END) AS BIGINT) AS c1
             |  FROM users)
             |SELECT n0, n1, c0, c1,
             |  round(c0 / CAST(n0 AS DOUBLE), 6) AS rate0,
             |  round(c1 / CAST(n1 AS DOUBLE), 6) AS rate1,
             |  round((c1 * n0) / greatest(CAST(c0 * n1 AS DOUBLE), 1e-12), 4) AS lift,
             |  round((c1 / CAST(n1 AS DOUBLE) - c0 / CAST(n0 AS DOUBLE)) /
             |    greatest(sqrt(((c0 + c1) / CAST(n0 + n1 AS DOUBLE)) *
             |      (1.0 - (c0 + c1) / CAST(n0 + n1 AS DOUBLE)) *
             |      (1.0 / n0 + 1.0 / n1)), 1e-12), 4) AS z
             |FROM agg""".stripMargin)),

    // Benford first-digit audit — the forensic-accounting check for
    // fabricated or synthetic numeric columns: the observed first
    // significant digit distribution of line-item prices vs the Benford
    // expectation log10(1 + 1/d), with the per-digit χ² contribution.
    // (This corpus is synthetic-uniform, so the audit correctly screams —
    // digit 1 at ~15% instead of 30%.) The digit is taken from the exact
    // integer cents (no float parse); one 9-row aggregate after a
    // map-side partial, the normalizer a broadcast 1-row frame. log10 of
    // the nine rationals agrees across engines to ~1 ulp, far below the
    // 6/4-dp rounding.
    Q("q150_benford",
      (s, d) => {
        import s.implicits._
        val digits = Tables.lineitem(s, d)
          .select(expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
          .select(substring($"cents".cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy($"digit").agg(count(lit(1)).as("cnt"))
        val bp = log(10.0, lit(1.0) + lit(1.0) / $"digit")
        digits.crossJoin(broadcast(digits.agg(sum($"cnt").as("n"))))
          .select($"digit", $"cnt",
            round($"cnt" / $"n".cast("double"), 6).as("obs_frac"),
            round(bp, 6).as("benford_p"),
            round(pow($"cnt" - $"n" * bp, 2) / ($"n" * bp), 4).as("chi2_term"))
          .orderBy($"digit")
      },
      Some("""WITH digits AS (
             |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
             |      AS VARCHAR), 1, 1) AS INTEGER) AS digit, count(*) AS cnt
             |  FROM lineitem GROUP BY 1),
             |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM digits)
             |SELECT digit, cnt,
             |  round(cnt / CAST(n.n AS DOUBLE), 6) AS obs_frac,
             |  round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
             |  round(pow(cnt - n.n * log10(1.0 + 1.0 / digit), 2)
             |    / (n.n * log10(1.0 + 1.0 / digit)), 4) AS chi2_term
             |FROM digits, n ORDER BY digit""".stripMargin)),

    // HyperLogLog distinct-count audit — the mergeable cardinality sketch
    // built from first principles and checked against the exact count:
    // 256 registers, bucket = low 8 bits of a 48-bit md5 fingerprint,
    // register value = leading-zero rank of the remaining 40 bits (via
    // the length of the binary string — pure integer/string ops, so both
    // engines agree bit-for-bit), estimate = α·m²/Σ2^(−M_j). The harmonic
    // sum adds dyadic rationals whose exponent span (≤ 41 bits) fits one
    // double mantissa, so even that float sum is EXACT in any order. The
    // sketch is what survives at 100 TB: registers partial-agg to ≤ 256
    // rows per task and merge by max, while the exact side needs a full
    // distinct shuffle — the audit row reports both and the relative
    // error (~1.04/√256 ≈ 6.5% expected).
    Q("q152_hll_audit",
      (s, d) => {
        import s.implicits._
        val fp = Tables.lineitem(s, d).select($"l_partkey").distinct()
          .select(expr(
            "cast(conv(substring(md5(cast(l_partkey as string)), 1, 12), 16, 10) as bigint)")
            .as("fp"))
        val reg = fp
          .select(($"fp" % 256).as("bucket"),
            expr("41 - length(bin(fp div 256))").as("rho"))
          .groupBy($"bucket").agg(max($"rho").as("mr"))
        val regs = s.range(256).select($"id".as("bucket"))
          .join(reg, Seq("bucket"), "left")
          .select(coalesce($"mr", lit(0)).as("mr"))
        val est = regs.agg(
          sum(pow(lit(2.0), -$"mr")).as("z"),
          sum(when($"mr" === 0, 1L).otherwise(0L)).as("empty_regs"),
          max($"mr").as("max_rho"))
        val exact = Tables.lineitem(s, d)
          .agg(countDistinct($"l_partkey").as("exact"))
        est.crossJoin(broadcast(exact))
          .select($"exact",
            round(lit(0.7123) * 65536 / $"z", 1).as("hll_est"),
            round(abs(lit(0.7123) * 65536 / $"z" - $"exact") /
              $"exact".cast("double"), 4).as("rel_err"),
            (lit(256L) - $"empty_regs").as("regs_used"), $"max_rho")
      },
      Some("""WITH k AS (SELECT DISTINCT l_partkey AS pk FROM lineitem),
             |fp AS (SELECT ('0x' || substr(md5(CAST(pk AS VARCHAR)), 1, 12))::BIGINT AS fp
             |       FROM k),
             |rg AS (SELECT fp % 256 AS bucket, max(41 - length(bin(fp // 256))) AS mr
             |       FROM fp GROUP BY 1),
             |grid AS (SELECT range AS bucket FROM range(256)),
             |regs AS (SELECT COALESCE(rg.mr, 0) AS mr
             |         FROM grid LEFT JOIN rg USING (bucket)),
             |est AS (
             |  SELECT sum(pow(2.0, -mr)) AS z,
             |    CAST(sum(CASE WHEN mr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_regs,
             |    max(mr) AS max_rho
             |  FROM regs),
             |ex AS (SELECT count(DISTINCT l_partkey) AS exact FROM lineitem)
             |SELECT ex.exact, round(0.7123 * 65536 / z, 1) AS hll_est,
             |  round(abs(0.7123 * 65536 / z - ex.exact) / CAST(ex.exact AS DOUBLE), 4)
             |    AS rel_err,
             |  256 - empty_regs AS regs_used, max_rho
             |FROM est, ex""".stripMargin)),

    // Last-touch attribution — the marketing-analytics read over the
    // event stream: every purchase is credited to the user's most recent
    // PRECEDING click or view (an as-of lookup expressed as one
    // ignore-nulls window with a rows-preceding frame — no join at all),
    // then rolled up per touch type with the average touch→purchase gap
    // in exact half-up integer seconds. One shuffle on the natural
    // entity key; per-user window state is one carried value, so the
    // pass is memory-bounded at any corpus size.
    Q("q153_attribution",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .select($"user_id", $"event_type",
            unix_micros($"ts").as("us"), $"event_id")
          .withColumn("touch",
            last(when($"event_type".isin("click", "view"), $"event_type"),
              ignoreNulls = true).over(w))
          .withColumn("touch_us",
            last(when($"event_type".isin("click", "view"), $"us"),
              ignoreNulls = true).over(w))
          .filter($"event_type" === "purchase" && $"touch".isNotNull)
          .groupBy($"touch")
          .agg(count(lit(1)).as("purchases"),
            expr("(2 * sum((us - touch_us) div 1000000) + count(*)) div (2 * count(*))")
              .as("avg_gap_sec"))
          .orderBy($"touch")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
             |tagged AS (
             |  SELECT user_id, event_type, us,
             |    last_value(CASE WHEN event_type IN ('click', 'view')
             |                    THEN event_type END IGNORE NULLS)
             |      OVER w AS touch,
             |    last_value(CASE WHEN event_type IN ('click', 'view')
             |                    THEN us END IGNORE NULLS)
             |      OVER w AS touch_us
             |  FROM ev
             |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT touch, count(*) AS purchases,
             |  (2 * CAST(sum((us - touch_us) // 1000000) AS BIGINT) + count(*))
             |    // (2 * count(*)) AS avg_gap_sec
             |FROM tagged WHERE event_type = 'purchase' AND touch IS NOT NULL
             |GROUP BY touch ORDER BY touch""".stripMargin)),

    // Revenue concentration (Pareto/ABC) — cumulative revenue share of
    // the top-k parts, reported at k ∈ {10, 50, 100, 250, 500}. Revenue
    // quantizes to exact 1e-4 fixed-point BEFORE any aggregation, so the
    // cumulative sums are integers. The report only ever reads ranks
    // ≤ 500, so the part-level aggregate is reduced to its top 500 via
    // limit — planned as TakeOrderedAndProject, a per-partition top-k
    // merge — BEFORE the ordered window, which then sorts 500 rows
    // instead of the whole part dimension. (The r12 shuffle-bytes probe
    // measured the unreduced version moving |parts| rows — 200k at sf1 —
    // through its SinglePartition exchange; part cardinality grows with
    // the corpus, so that window was data-sized, not dimension-bounded.)
    // Ties rank deterministically by part key.
    Q("q154_pareto",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val rev = Tables.lineitem(s, d)
          .select($"l_partkey", expr(
            "cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint)")
            .as("cents"))
          .groupBy($"l_partkey").agg(sum($"cents").as("cents"))
        val top = rev.orderBy($"cents".desc, $"l_partkey").limit(500)
        val w = Window.orderBy($"cents".desc, $"l_partkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        top
          .withColumn("rk", row_number().over(
            Window.orderBy($"cents".desc, $"l_partkey")))
          .withColumn("cum", sum($"cents").over(w))
          .filter($"rk".isin(10, 50, 100, 250, 500))
          .crossJoin(broadcast(rev.agg(sum($"cents").as("tot"))))
          .select($"rk".as("top_k"),
            round($"cum" / $"tot".cast("double"), 6).as("rev_share"))
          .orderBy($"top_k")
      },
      Some("""WITH rev AS (
             |  SELECT l_partkey,
             |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
             |      AS BIGINT)) AS BIGINT) AS cents
             |  FROM lineitem GROUP BY 1),
             |ranked AS (
             |  SELECT cents,
             |    row_number() OVER (ORDER BY cents DESC, l_partkey) AS rk,
             |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM rev),
             |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM rev)
             |SELECT rk AS top_k, round(cum / CAST(tot.tot AS DOUBLE), 6) AS rev_share
             |FROM ranked, tot WHERE rk IN (10, 50, 100, 250, 500)
             |ORDER BY top_k""".stripMargin)),

    // Snapshot diff (CDC-style) — compare each user's state (their latest
    // event type) at two cutoffs over the append-only log and classify
    // the drift: added (new user between snapshots), changed, unchanged.
    // Cutoffs compare in exact epoch microseconds, so no timezone or
    // parse semantics can diverge between engines. Each snapshot's
    // latest-state lookup is a `max_by` aggregate over the strictly-total
    // (us, event_id) ordering (r14 — the q96 replan: map-side argmax, no
    // per-key sort of the log); the diff is a full outer join on the same
    // key the aggregates hash on (co-partitioned, no extra shuffle)
    // rolled up into a bounded (status, state_a, state_b) grid.
    Q("q155_snapshot_diff",
      (s, d) => {
        import s.implicits._
        def stateAt(cutUs: Long): DataFrame =
          Tables.events(s, d)
            .select($"user_id", $"event_type",
              unix_micros($"ts").as("us"), $"event_id")
            .filter($"us" <= cutUs)
            .groupBy($"user_id")
            .agg(max_by($"event_type", struct($"us", $"event_id"))
              .as("event_type"))
        val a = stateAt(1704844800000000L).withColumnRenamed("event_type", "state_a")
        val b = stateAt(1705708800000000L).withColumnRenamed("event_type", "state_b")
        a.join(b, Seq("user_id"), "full_outer")
          .select(
            when($"state_a".isNull, "added")
              .when($"state_a" === $"state_b", "unchanged")
              .otherwise("changed").as("status"),
            coalesce($"state_a", lit("-")).as("state_a"),
            coalesce($"state_b", lit("-")).as("state_b"))
          .groupBy($"status", $"state_a", $"state_b")
          .agg(count(lit(1)).as("n_users"))
          .orderBy($"status", $"state_a", $"state_b")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
             |a AS (
             |  SELECT user_id, event_type AS state_a FROM (
             |    SELECT user_id, event_type, row_number() OVER (
             |      PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
             |    FROM ev WHERE us <= 1704844800000000) WHERE rn = 1),
             |b AS (
             |  SELECT user_id, event_type AS state_b FROM (
             |    SELECT user_id, event_type, row_number() OVER (
             |      PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
             |    FROM ev WHERE us <= 1705708800000000) WHERE rn = 1)
             |SELECT
             |  CASE WHEN a.state_a IS NULL THEN 'added'
             |       WHEN a.state_a = b.state_b THEN 'unchanged'
             |       ELSE 'changed' END AS status,
             |  COALESCE(a.state_a, '-') AS state_a,
             |  COALESCE(b.state_b, '-') AS state_b,
             |  count(*) AS n_users
             |FROM a FULL OUTER JOIN b USING (user_id)
             |GROUP BY 1, 2, 3 ORDER BY status, state_a, state_b""".stripMargin)),

    // SAX (symbolic aggregate approximation) of the daily-revenue series —
    // the time-series compression that turns 100 TB of per-day metrics into
    // motif-searchable strings: PAA segments of 8 days, z-normalized, then
    // a 4-letter alphabet via the standard N(0,1) quartile breakpoints
    // (±0.6745, 0). EVERY aggregate is an exact integer sum (per-order
    // dollars, segment sums, segment sum-of-squares), so μ, σ and the z
    // scores derive from identical integers in both engines — no float
    // summation order anywhere. The day series is orders-of-magnitude
    // smaller than the fact table; the single ranking window runs over
    // that day-level frame, not the corpus.
    Q("q166_sax",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val days = Tables.orders(s, d)
          .select($"o_orderdate".as("day"),
            expr("cast(round(o_totalprice) as bigint)").as("rev"))
          .groupBy($"day").agg(sum($"rev").as("rev"))
          .withColumn("rk", row_number().over(Window.orderBy($"day")))
        val nseg = days.agg((count(lit(1)) / 8).cast("long").as("k"))
        val segs = days.crossJoin(broadcast(nseg))
          .filter($"rk" <= $"k" * 8)
          .select(expr("(rk - 1) div 8").as("seg"), $"rev", $"k")
          .groupBy($"seg", $"k")
          .agg(sum($"rev").as("ss"), count(lit(1)).as("n_days"))
        // s2 must be exact AND unbounded: sum(ss*ss) over long reads
        // 4.69e18 at sf0.1 — HALF of Long.MaxValue — and overflows ANSI
        // long summation at 10× data (found by the r12 materialization
        // probe; count()-pruned benches never evaluate the column).
        // decimal(38,0) keeps the sum exact to 38 digits, mirroring the
        // oracle's HUGEINT: both engines then convert the same exact
        // integer to double at the σ division, so 4dp-rounded z stays
        // hash-identical.
        val mom = segs.groupBy($"k")
          .agg(sum($"ss").as("s1"),
            sum($"ss".cast("decimal(38,0)") * $"ss").as("s2"))
          .select($"k", ($"s1" / ($"k" * 8.0)).as("mu"),
            sqrt(($"s2" / ($"k" * 64.0)) - pow($"s1" / ($"k" * 8.0), 2)).as("sigma"))
        segs.join(broadcast(mom), "k")
          .select($"seg", $"n_days", ($"ss" / 8.0).as("seg_mean"),
            round((($"ss" / 8.0) - $"mu") / $"sigma", 4).as("z"))
          .withColumn("symbol",
            when($"z" < -0.6745, "a").when($"z" < 0.0, "b")
              .when($"z" < 0.6745, "c").otherwise("d"))
          .select($"seg", $"n_days", round($"seg_mean", 2).as("seg_mean"),
            $"z", $"symbol")
          .orderBy($"seg")
      },
      Some("""WITH days AS (
             |  SELECT o_orderdate AS day,
             |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
             |  FROM orders GROUP BY 1),
             |rk AS (SELECT rev, row_number() OVER (ORDER BY day) AS rk FROM days),
             |k AS (SELECT count(*) // 8 AS k FROM rk),
             |segs AS (
             |  SELECT (rk - 1) // 8 AS seg, CAST(sum(rev) AS BIGINT) AS ss,
             |    count(*) AS n_days
             |  FROM rk, k WHERE rk <= k.k * 8 GROUP BY 1),
             |mom AS (
             |  SELECT k.k, CAST(sum(ss) AS BIGINT) / (k.k * 8.0) AS mu,
             |    sqrt(sum(CAST(ss AS HUGEINT) * ss) / (k.k * 64.0)
             |      - pow(CAST(sum(ss) AS BIGINT) / (k.k * 8.0), 2)) AS sigma
             |  FROM segs, k GROUP BY k.k)
             |SELECT seg, n_days, round(ss / 8.0, 2) AS seg_mean,
             |  round((ss / 8.0 - mu) / sigma, 4) AS z,
             |  CASE WHEN (ss / 8.0 - mu) / sigma < -0.6745 THEN 'a'
             |       WHEN (ss / 8.0 - mu) / sigma < 0.0 THEN 'b'
             |       WHEN (ss / 8.0 - mu) / sigma < 0.6745 THEN 'c'
             |       ELSE 'd' END AS symbol
             |FROM segs, mom ORDER BY seg""".stripMargin)),

    // Rank-based winsorization — robust per-group means where the clip
    // thresholds are exact ORDER STATISTICS (the ceil(p·n)-th value by
    // row_number), not interpolated percentiles, so both engines pick the
    // identical threshold element and the clipped sum stays exact integer
    // arithmetic end to end. The ranking window partitions by the group
    // key (source-bounded state); the clip + re-aggregate is one more
    // partial-agg pass. The audit reports raw vs winsorized mean and the
    // clip counts — the standard tail-taming step before any mean-based
    // quality gate at corpus scale.
    Q("q167_winsorize",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"source").orderBy($"n_chars", $"doc_id")
        val ranked = Tables.documents(s, d)
          .select($"source", $"doc_id", $"n_chars")
          .withColumn("rk", row_number().over(w))
        val n = ranked.groupBy($"source").agg(count(lit(1)).as("n"))
        val cuts = ranked.join(n, "source")
          .groupBy($"source")
          .agg(max(when($"rk" === expr("cast(ceil(0.05 * n) as bigint)"),
              $"n_chars")).as("lo_cut"),
            max(when($"rk" === expr("cast(ceil(0.95 * n) as bigint)"),
              $"n_chars")).as("hi_cut"))
        ranked.join(broadcast(cuts), "source")
          .select($"source", $"n_chars", $"lo_cut", $"hi_cut",
            greatest(least($"n_chars", $"hi_cut"), $"lo_cut").as("clipped"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            max($"lo_cut").as("lo_cut"), max($"hi_cut").as("hi_cut"),
            round(sum($"n_chars") / count(lit(1)).cast("double"), 4).as("raw_mean"),
            round(sum($"clipped") / count(lit(1)).cast("double"), 4).as("wins_mean"),
            sum(when($"n_chars" < $"lo_cut" || $"n_chars" > $"hi_cut", 1L)
              .otherwise(0L)).as("n_clipped"))
          .orderBy($"source")
      },
      Some("""WITH ranked AS (
             |  SELECT source, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) AS rk,
             |    count(*) OVER (PARTITION BY source) AS n
             |  FROM documents),
             |cuts AS (
             |  SELECT source,
             |    max(CASE WHEN rk = CAST(ceil(0.05 * n) AS BIGINT)
             |        THEN n_chars END) AS lo_cut,
             |    max(CASE WHEN rk = CAST(ceil(0.95 * n) AS BIGINT)
             |        THEN n_chars END) AS hi_cut
             |  FROM ranked GROUP BY source)
             |SELECT r.source, count(*) AS n_docs,
             |  max(c.lo_cut) AS lo_cut, max(c.hi_cut) AS hi_cut,
             |  round(CAST(sum(r.n_chars) AS BIGINT)
             |    / CAST(count(*) AS DOUBLE), 4) AS raw_mean,
             |  round(CAST(sum(greatest(least(r.n_chars, c.hi_cut), c.lo_cut))
             |    AS BIGINT) / CAST(count(*) AS DOUBLE), 4) AS wins_mean,
             |  CAST(sum(CASE WHEN r.n_chars < c.lo_cut OR r.n_chars > c.hi_cut
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
             |FROM ranked r JOIN cuts c USING (source)
             |GROUP BY r.source ORDER BY r.source""".stripMargin)),

    // Relative-error quantile sketch (DDSketch-style log buckets, γ = 1.02)
    // audited against exact percentiles — the mergeable quantile structure
    // that replaces a global sort at 100 TB: every value maps to bucket
    // ⌊ln x / ln γ⌋, buckets partial-agg and MERGE BY SUM across any
    // partitioning, and a quantile reads off the cumulative bucket walk
    // with ≤ 2% relative error by construction. The audit reports the
    // sketch estimate, the exact percentile, and the realized relative
    // error at p50/p90/p99 — the certificate that the 2%-bound holds
    // before the sketch replaces the exact path in dashboards.
    Q("q170_quantile_sketch",
      (s, d) => {
        import s.implicits._
        val buckets = Tables.orders(s, d)
          .select(expr("cast(floor(ln(o_totalprice) / ln(1.02)) as bigint)")
            .as("b"))
          .groupBy($"b").agg(count(lit(1)).as("n"))
        val tot = buckets.agg(sum($"n").as("tot"))
        val cum = buckets.crossJoin(broadcast(tot))
          .withColumn("cum", sum($"n").over(
            org.apache.spark.sql.expressions.Window.orderBy($"b")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        def est(p: Double): org.apache.spark.sql.Column =
          round(min(when($"cum" >= $"tot" * p,
            pow(lit(1.02), $"b") * 2.0 / 2.02)), 2)
        val sketch = cum.agg(
          est(0.5).as("est_p50"), est(0.9).as("est_p90"), est(0.99).as("est_p99"))
        val exact = Tables.orders(s, d).agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("ex_p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("ex_p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 2).as("ex_p99"))
        sketch.crossJoin(broadcast(exact))
          .select($"est_p50", $"ex_p50",
            round(abs($"est_p50" - $"ex_p50") / $"ex_p50", 4).as("err_p50"),
            $"est_p90", $"ex_p90",
            round(abs($"est_p90" - $"ex_p90") / $"ex_p90", 4).as("err_p90"),
            $"est_p99", $"ex_p99",
            round(abs($"est_p99" - $"ex_p99") / $"ex_p99", 4).as("err_p99"))
      },
      Some("""WITH bk AS (
             |  SELECT CAST(floor(ln(o_totalprice) / ln(1.02)) AS BIGINT) AS b,
             |    count(*) AS n
             |  FROM orders GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM bk),
             |cum AS (
             |  SELECT b, n, tot,
             |    sum(n) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS cum
             |  FROM bk, tot),
             |sk AS (
             |  SELECT
             |    round(min(CASE WHEN cum >= tot * 0.5
             |      THEN pow(1.02, b) * 2.0 / 2.02 END), 2) AS est_p50,
             |    round(min(CASE WHEN cum >= tot * 0.9
             |      THEN pow(1.02, b) * 2.0 / 2.02 END), 2) AS est_p90,
             |    round(min(CASE WHEN cum >= tot * 0.99
             |      THEN pow(1.02, b) * 2.0 / 2.02 END), 2) AS est_p99
             |  FROM cum),
             |ex AS (
             |  SELECT round(quantile_cont(o_totalprice, 0.5), 2) AS ex_p50,
             |    round(quantile_cont(o_totalprice, 0.9), 2) AS ex_p90,
             |    round(quantile_cont(o_totalprice, 0.99), 2) AS ex_p99
             |  FROM orders)
             |SELECT est_p50, ex_p50,
             |  round(abs(est_p50 - ex_p50) / ex_p50, 4) AS err_p50,
             |  est_p90, ex_p90,
             |  round(abs(est_p90 - ex_p90) / ex_p90, 4) AS err_p90,
             |  est_p99, ex_p99,
             |  round(abs(est_p99 - ex_p99) / ex_p99, 4) AS err_p99
             |FROM sk, ex""".stripMargin)),

    // k-anonymity audit — the privacy read a curation pipeline runs before
    // releasing joined user data: group by the quasi-identifier tuple
    // (nation, market segment, account-balance band), measure every
    // equivalence class's size k, and report the class-size distribution
    // plus the re-identification exposure (records in classes with k < 5,
    // the records that would need suppression or coarser banding). One
    // partial-agg shuffle on the QI tuple, then a bounded k-histogram —
    // nothing row-level leaves the aggregates at any corpus size.
    Q("q171_k_anonymity",
      (s, d) => {
        import s.implicits._
        val classes = Tables.customer(s, d)
          .select($"c_nationkey", $"c_mktsegment",
            expr("cast(floor(c_acctbal / 2000) as bigint)").as("bal_band"))
          .groupBy($"c_nationkey", $"c_mktsegment", $"bal_band")
          .agg(count(lit(1)).as("k"))
        classes.groupBy($"k")
          .agg(count(lit(1)).as("n_classes"), sum($"k").as("n_records"))
          .withColumn("at_risk", $"k" < 5)
          .orderBy($"k")
      },
      Some("""WITH classes AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
             |    count(*) AS k
             |  FROM customer GROUP BY 1, 2, 3)
             |SELECT k, count(*) AS n_classes,
             |  CAST(sum(k) AS BIGINT) AS n_records, k < 5 AS at_risk
             |FROM classes GROUP BY k ORDER BY k""".stripMargin)),

    // Data-layout pruning audit — the quantitative case for Z-ORDER (q68)
    // over single-column sorts: lay each event_type partition out as 32
    // files under three orderings (by user, by time, by interleaved
    // z-value), record each file's min/max envelope on BOTH dimensions, and
    // score the expected fraction of files a random point query must open
    // (avg over files of normalized-range(user) × normalized-range(time) —
    // the min/max-index pruning model). Sort-by-user prunes user probes and
    // nothing else; z-order is the only layout whose BOTH-dims score stays
    // small — the number that justifies the layout job before rewriting
    // 100 TB. The ranking windows partition by event_type (the production
    // layout job is a per-partition repartitionByRange — no global sort),
    // deterministic with the event_id tiebreak; envelopes are integer math.
    Q("q173_layout_pruning",
      (s, d) => {
        import s.implicits._
        val base = Tables.events(s, d)
          .select($"event_type", $"event_id", $"user_id",
            unix_timestamp($"ts").as("sec"))
          .withColumn("z",
            graft.functions.ZValue.z_value($"user_id", expr("sec div 10800")))
        val dom = base.groupBy($"event_type").agg(
          (max($"user_id") - min($"user_id") + 1).as("uw"),
          (max($"sec") - min($"sec") + 1).as("sw"))
        def audit(layout: String, key: org.apache.spark.sql.Column) = {
          val w = Window.partitionBy($"event_type").orderBy(key, $"event_id")
          base
            .withColumn("f", ntile(32).over(w))
            .groupBy($"event_type", $"f")
            .agg(min($"user_id").as("ulo"), max($"user_id").as("uhi"),
              min($"sec").as("slo"), max($"sec").as("shi"))
            .join(broadcast(dom), "event_type")
            .select($"event_type",
              (($"uhi" - $"ulo" + 1) / $"uw".cast("double")).as("cu"),
              (($"shi" - $"slo" + 1) / $"sw".cast("double")).as("cs"))
            .groupBy($"event_type")
            .agg(round(avg($"cu"), 6).as("cov_user"),
              round(avg($"cs"), 6).as("cov_time"),
              round(avg($"cu" * $"cs"), 6).as("cov_both"))
            .select(lit(layout).as("layout"), $"event_type", $"cov_user",
              $"cov_time", $"cov_both")
        }
        audit("by_user", $"user_id")
          .unionAll(audit("by_time", $"sec"))
          .unionAll(audit("zorder", $"z"))
          .orderBy($"layout", $"event_type")
      },
      Some(s"""WITH e AS (
              |  SELECT event_type, event_id, user_id,
              |    epoch_us(ts) // 1000000 AS sec,
              |    (epoch_us(ts) // 1000000) // 10800 AS hr
              |  FROM events),
              |z AS (SELECT *, ${ZOracle.zExpr} AS z FROM e),
              |dom AS (SELECT event_type, max(user_id) - min(user_id) + 1 AS uw,
              |               max(sec) - min(sec) + 1 AS sw
              |        FROM e GROUP BY 1),
              |lay AS (
              |  SELECT 'by_user' AS layout, event_type,
              |    ntile(32) OVER (PARTITION BY event_type
              |      ORDER BY user_id, event_id) AS f,
              |    user_id, sec FROM z
              |  UNION ALL
              |  SELECT 'by_time', event_type,
              |    ntile(32) OVER (PARTITION BY event_type
              |      ORDER BY sec, event_id), user_id, sec FROM z
              |  UNION ALL
              |  SELECT 'zorder', event_type,
              |    ntile(32) OVER (PARTITION BY event_type
              |      ORDER BY z, event_id), user_id, sec FROM z),
              |files AS (
              |  SELECT layout, event_type, f,
              |    min(user_id) AS ulo, max(user_id) AS uhi,
              |    min(sec) AS slo, max(sec) AS shi
              |  FROM lay GROUP BY 1, 2, 3)
              |SELECT layout, event_type,
              |  round(avg((uhi - ulo + 1) / CAST(uw AS DOUBLE)), 6) AS cov_user,
              |  round(avg((shi - slo + 1) / CAST(sw AS DOUBLE)), 6) AS cov_time,
              |  round(avg(((uhi - ulo + 1) / CAST(uw AS DOUBLE))
              |    * ((shi - slo + 1) / CAST(sw AS DOUBLE))), 6) AS cov_both
              |FROM files JOIN dom USING (event_type)
              |GROUP BY layout, event_type ORDER BY layout, event_type""".stripMargin)),

    // JSONL round trip — the interchange format LLM corpora actually ship
    // in: write the documents table as line-delimited JSON, read it back
    // with an EXPLICIT schema (inference at 100 TB is a full extra scan),
    // and prove the trip lossless. The proof is an order-free content
    // fingerprint — per-row md5 prefix of (id, lang, text), summed per
    // source — so any field corrupted anywhere in the round trip moves a
    // 56-bit sum the oracle computes from the original parquet. JSON
    // string escaping may differ between writers; hashing AFTER the parse
    // makes the check encoding-independent, which is the contract that
    // matters.
    Q("q182_jsonl_roundtrip",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val dir = java.nio.file.Files
          .createTempDirectory("graft_q182_jsonl").toString
        docs.write.mode("overwrite").json(dir)
        s.read.schema(docs.schema).json(dir)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").as("n_chars"),
            // modular content checksum: the md5₅₆ prefixes are summed in
            // exact decimal(38,0) and reduced mod 10¹⁵ — a naive long sum
            // overflows ANSI once a source holds ~128k rows (found by the
            // r12 sf1 materialization probe; count()-pruned runs never
            // evaluated the column). Order-free and corruption-sensitive
            // exactly like the full sum; DuckDB mirrors via HUGEINT.
            (sum(expr("cast(conv(substring(md5(concat(cast(doc_id as string), " +
              "':', lang, ':', text)), 1, 14), 16, 10) as decimal(38,0))"))
              % lit(1000000000000000L)).cast("long").as("fp_sum"))
          .orderBy($"source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
             |  CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
             |    lang || ':' || text), 1, 14))::BIGINT) % 1000000000000000
             |    AS BIGINT) AS fp_sum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Schema drift across parquet vintages — the lakehouse reality of a
    // corpus written over months by evolving jobs: an old vintage missing
    // a column and a new vintage carrying it must still read as ONE table.
    // The query writes the two vintages itself (even doc_ids without
    // `lang`, odd with it, under v=1/v=2 partition dirs), reads the root
    // with mergeSchema (footer union; the missing column nulls — at scale
    // this is a footer-only planning cost, not a data rewrite), and rolls
    // up per source: total rows, bytes, rows that carry the new column,
    // and vintages seen. The oracle reproduces every number from the
    // original table via the parity rule.
    Q("q183_schema_drift",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val dir = java.nio.file.Files
          .createTempDirectory("graft_q183_drift").toString
        docs.filter($"doc_id" % 2 === 0)
          .select($"doc_id", $"source", $"n_chars")
          .write.mode("overwrite").parquet(s"$dir/v=1")
        docs.filter($"doc_id" % 2 === 1)
          .select($"doc_id", $"source", $"n_chars", $"lang")
          .write.mode("overwrite").parquet(s"$dir/v=2")
        s.read.option("mergeSchema", "true").parquet(dir)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").as("n_chars"),
            count($"lang").as("n_with_lang"),
            countDistinct($"v").as("n_vintages"))
          .orderBy($"source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
             |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_with_lang,
             |  CAST(count(DISTINCT doc_id % 2) AS BIGINT) AS n_vintages
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // Count-min-sketch JOIN-SIZE estimation — the optimizer-side use of the
    // q149 sketch: |A ⋈ B| on a key equals the inner product of the two
    // key-frequency vectors, and the CMS estimate min_d Σ_w a_dw·b_dw
    // overestimates it by a bounded ε·|A|·|B|/width. Each side's sketch is
    // a (depth × width) integer grid built with one partial-agg pass and
    // mergeable by cell-wise sum — at 100 TB the sketches (4×512 longs) are
    // what planners exchange instead of scanning either table, and the
    // audit row (estimate vs exact vs theoretical slack) is the trust
    // check. md5 double hashing keeps every cell engine-identical.
    Q("q174_cms_join_size",
      (s, d) => {
        import s.implicits._
        val w = 512
        def sketch(df: DataFrame, key: String, tag: String): DataFrame =
          df.select(col(key).as("k"),
              expr(s"cast(conv(substring(md5(concat('cms:', cast($key as string))), 1, 14), 16, 10) as bigint)").as("a"),
              expr(s"cast(conv(substring(md5(concat('cms:', cast($key as string))), 15, 14), 16, 10) as bigint)").as("b"))
            .select(explode(expr(
              s"transform(sequence(0, 3), i -> struct(i as dep, pmod(a + i * b, $w) as cell))")).as("p"))
            .groupBy($"p.dep".as("dep"), $"p.cell".as("cell"))
            .agg(count(lit(1)).as(tag))
        val lhs = Tables.lineitem(s, d).select($"l_partkey")
        val rhs = Tables.part(s, d).filter($"p_size" > 25).select($"p_partkey")
        val est = sketch(lhs, "l_partkey", "ca")
          .join(sketch(rhs, "p_partkey", "cb"), Seq("dep", "cell"))
          .groupBy($"dep").agg(sum($"ca" * $"cb").as("ip"))
          .agg(min($"ip").as("cms_est"))
        val exact = lhs.join(rhs, $"l_partkey" === $"p_partkey")
          .agg(count(lit(1)).as("exact"))
        val sizes = lhs.agg(count(lit(1)).as("na"))
          .crossJoin(broadcast(rhs.agg(count(lit(1)).as("nb"))))
        est.crossJoin(broadcast(exact)).crossJoin(broadcast(sizes))
          .select($"exact", $"cms_est",
            round(($"cms_est" - $"exact") / $"exact".cast("double"), 4)
              .as("rel_overshoot"),
            round(($"na" * $"nb") / (lit(w) * $"exact".cast("double")), 4)
              .as("theo_slack"))
      },
      Some("""WITH lhs AS (SELECT l_partkey AS k FROM lineitem),
             |rhs AS (SELECT p_partkey AS k FROM part WHERE p_size > 25),
             |ha AS (
             |  SELECT k,
             |    ('0x' || substr(md5('cms:' || CAST(k AS VARCHAR)), 1, 14))::BIGINT AS a,
             |    ('0x' || substr(md5('cms:' || CAST(k AS VARCHAR)), 15, 14))::BIGINT AS b
             |  FROM lhs),
             |hb AS (
             |  SELECT k,
             |    ('0x' || substr(md5('cms:' || CAST(k AS VARCHAR)), 1, 14))::BIGINT AS a,
             |    ('0x' || substr(md5('cms:' || CAST(k AS VARCHAR)), 15, 14))::BIGINT AS b
             |  FROM rhs),
             |sa AS (
             |  SELECT t.i AS dep, (a + t.i * b) % 512 AS cell, count(*) AS ca
             |  FROM ha, generate_series(0, 3) AS t(i) GROUP BY 1, 2),
             |sb AS (
             |  SELECT t.i AS dep, (a + t.i * b) % 512 AS cell, count(*) AS cb
             |  FROM hb, generate_series(0, 3) AS t(i) GROUP BY 1, 2),
             |est AS (
             |  SELECT CAST(min(ip) AS BIGINT) AS cms_est FROM (
             |    SELECT sa.dep, CAST(sum(sa.ca * sb.cb) AS BIGINT) AS ip
             |    FROM sa JOIN sb USING (dep, cell) GROUP BY sa.dep)),
             |ex AS (
             |  SELECT count(*) AS exact FROM lhs JOIN rhs USING (k)),
             |sz AS (
             |  SELECT (SELECT count(*) FROM lhs) AS na,
             |         (SELECT count(*) FROM rhs) AS nb)
             |SELECT exact, cms_est,
             |  round((cms_est - exact) / CAST(exact AS DOUBLE), 4) AS rel_overshoot,
             |  round((na * nb) / (512 * CAST(exact AS DOUBLE)), 4) AS theo_slack
             |FROM est, ex, sz""".stripMargin)),

    // Ordered-sequence pattern matching (the MATCH_RECOGNIZE shape Spark
    // lacks natively): find view→click→purchase runs per user where EACH
    // consecutive step lands within one hour of the previous. Two lead()
    // columns over one (user_id, ts)-sorted window turn the pattern into a
    // per-row predicate — one shuffle on user_id, no self-joins, and the
    // window frame is O(1) per row regardless of per-user event counts.
    // Ties in ts order deterministically by event_id on both engines.
    Q("q188_event_pattern",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        val seq3 = Tables.events(s, d)
          .filter($"event_type".isin("view", "click", "purchase"))
          .select($"user_id", $"event_id", $"event_type",
            expr("unix_micros(ts)").as("us"))
          .select($"user_id", $"event_type", $"us",
            lead($"event_type", 1).over(w).as("t2"),
            lead($"us", 1).over(w).as("us2"),
            lead($"event_type", 2).over(w).as("t3"),
            lead($"us", 2).over(w).as("us3"))
        val matches = seq3.filter(
          $"event_type" === "view" && $"t2" === "click" && $"t3" === "purchase" &&
            $"us2" - $"us" <= 3600000000L && $"us3" - $"us2" <= 3600000000L)
        matches.agg(
          count(lit(1)).as("n_matches"),
          countDistinct($"user_id").as("n_users"),
          coalesce(round(avg(($"us3" - $"us") / lit(1000000.0)), 4), lit(-1.0))
            .as("avg_span_s"))
      },
      Some("""WITH seq3 AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS us,
             |    lead(event_type, 1) OVER w AS t2, lead(epoch_us(ts), 1) OVER w AS us2,
             |    lead(event_type, 2) OVER w AS t3, lead(epoch_us(ts), 2) OVER w AS us3
             |  FROM events
             |  WHERE event_type IN ('view', 'click', 'purchase')
             |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
             |m AS (
             |  SELECT * FROM seq3
             |  WHERE event_type = 'view' AND t2 = 'click' AND t3 = 'purchase'
             |    AND us2 - us <= 3600000000 AND us3 - us2 <= 3600000000)
             |SELECT count(*) AS n_matches,
             |  count(DISTINCT user_id) AS n_users,
             |  coalesce(round(avg((us3 - us) / 1000000.0), 4), -1.0) AS avg_span_s
             |FROM m""".stripMargin)),

    // CSV round trip — the ingest-format gate for delimited corpora: write
    // the documents table as headered CSV, read it back under the declared
    // schema, and prove losslessness by matching a per-source content
    // fingerprint (md5 over id:lang:text) computed by the oracle on the
    // ORIGINAL parquet. Quoting/escaping defaults must survive arbitrary
    // text bytes for the sums to agree.
    Q("q189_csv_roundtrip",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val dir = java.nio.file.Files
          .createTempDirectory("graft_q189_csv").toString
        docs.write.mode("overwrite").option("header", "true").csv(dir)
        s.read.schema(docs.schema).option("header", "true").csv(dir)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").as("n_chars"),
            // modular content checksum — see the q182 fp_sum comment
            (sum(expr("cast(conv(substring(md5(concat(cast(doc_id as string), " +
              "':', lang, ':', text)), 1, 14), 16, 10) as decimal(38,0))"))
              % lit(1000000000000000L)).cast("long").as("fp_sum"))
          .orderBy($"source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
             |  CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
             |    lang || ':' || text), 1, 14))::BIGINT) % 1000000000000000
             |    AS BIGINT) AS fp_sum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ORC round trip — same losslessness gate through the columnar ORC
    // codec (schema + stats preserved, splittable at scale like parquet).
    Q("q190_orc_roundtrip",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val dir = java.nio.file.Files
          .createTempDirectory("graft_q190_orc").toString
        docs.write.mode("overwrite").orc(dir)
        s.read.schema(docs.schema).orc(dir)
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").as("n_chars"),
            // modular content checksum — see the q182 fp_sum comment
            (sum(expr("cast(conv(substring(md5(concat(cast(doc_id as string), " +
              "':', lang, ':', text)), 1, 14), 16, 10) as decimal(38,0))"))
              % lit(1000000000000000L)).cast("long").as("fp_sum"))
          .orderBy($"source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
             |  CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
             |    lang || ':' || text), 1, 14))::BIGINT) % 1000000000000000
             |    AS BIGINT) AS fp_sum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // l-diversity — k-anonymity's complement: a quasi-identifier class can
    // be large (k-safe, q171) and still leak when every member shares one
    // sensitive value. Sensitive attribute = the order priorities reached
    // through the customer⋈orders join; classes are q171's
    // (nation, segment, balance-band). Two nested aggregations: distinct
    // sensitive values per class, then the histogram of class diversity l
    // with the l=1 classes flagged. The join shuffles on the customer key
    // once; everything after runs on class cardinality.
    Q("q192_l_diversity",
      (s, d) => {
        import s.implicits._
        val qi = Tables.customer(s, d)
          .select($"c_custkey", $"c_nationkey", $"c_mktsegment",
            expr("cast(floor(c_acctbal / 2000) as bigint)").as("bal_band"))
        val joined = Tables.orders(s, d)
          .select($"o_custkey", $"o_orderpriority")
          .join(qi, $"o_custkey" === $"c_custkey")
        val classes = joined
          .groupBy($"c_nationkey", $"c_mktsegment", $"bal_band")
          .agg(countDistinct($"o_orderpriority").as("l"),
            countDistinct($"c_custkey").as("k"),
            count(lit(1)).as("n_orders"))
        classes.groupBy($"l")
          .agg(count(lit(1)).as("n_classes"), sum($"k").as("n_customers"),
            sum($"n_orders").as("n_orders"))
          .withColumn("at_risk", $"l" < 2)
          .orderBy($"l")
      },
      Some("""WITH classes AS (
             |  SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
             |    count(DISTINCT o_orderpriority) AS l,
             |    count(DISTINCT c_custkey) AS k,
             |    count(*) AS n_orders
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2, 3)
             |SELECT l, count(*) AS n_classes,
             |  CAST(sum(k) AS BIGINT) AS n_customers,
             |  CAST(sum(n_orders) AS BIGINT) AS n_orders,
             |  l < 2 AS at_risk
             |FROM classes GROUP BY l ORDER BY l""".stripMargin)),

    // Hilbert-curve layout (functions.HilbertValue, the native codegen'd
    // expression) — q68's z-order audit re-run on the locality-preserving
    // curve: sort events by hilbert_value(user_id, 3h-bucket), cut 16
    // equal files per type, report each file's per-dimension min/max zone
    // map. The Hilbert walk has no Morton seams (consecutive positions
    // are always adjacent cells), so worst-case spans are tighter — this
    // query IS the measurement a table-layout job runs before choosing
    // its clustering key. The oracle replays the 16-step rotate/flip
    // recurrence as an unrolled CTE chain (HilbertValue.hilbertCte).
    Q("q201_hilbert_layout",
      (s, d) => {
        import s.implicits._
        val byType = Window.partitionBy($"event_type").orderBy($"h", $"event_id")
        Tables.events(s, d)
          .select($"event_type", $"event_id", $"user_id",
            unix_timestamp($"ts").as("sec"))
          .withColumn("h", graft.functions.HilbertValue.hilbert_value(
            $"user_id", expr("sec div 10800")))
          .withColumn("bin", ntile(16).over(byType))
          .groupBy($"event_type", $"bin")
          .agg(count(lit(1)).as("n"),
            min($"user_id").as("u_min"), max($"user_id").as("u_max"),
            min($"sec").as("s_min"), max($"sec").as("s_max"))
          .orderBy($"event_type", $"bin")
      },
      Some(s"""WITH e AS (
              |  SELECT event_type, event_id, user_id,
              |    epoch_us(ts) // 1000000 AS sec,
              |    (epoch_us(ts) // 1000000) // 10800 AS hr
              |  FROM events),
              |${graft.functions.HilbertValue.hilbertCte("e", "user_id", "hr")},
              |b AS (
              |  SELECT *, ntile(16) OVER (PARTITION BY event_type
              |    ORDER BY hd, event_id) AS bin
              |  FROM h16)
              |SELECT event_type, bin, count(*) AS n,
              |  min(user_id) AS u_min, max(user_id) AS u_max,
              |  min(sec) AS s_min, max(sec) AS s_max
              |FROM b GROUP BY event_type, bin
              |ORDER BY event_type, bin""".stripMargin)),

    // Native unpivot (melt) — the wide→long reshape feeding any metrics
    // store: one row per (source, metric). Catalyst lowers `unpivot` to a
    // single Expand over the already-aggregated wide frame (|sources|
    // rows), so the reshape is free at any scale — the one groupBy scan
    // dominates. The oracle is the textbook UNION ALL stack.
    Q("q207_unpivot",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .groupBy($"source")
          .agg(count(lit(1)).cast("double").as("n_docs"),
            sum($"n_chars").cast("double").as("tot_chars"),
            countDistinct($"lang").cast("double").as("n_langs"))
          .unpivot(Array($"source"),
            Array($"n_docs", $"tot_chars", $"n_langs"), "metric", "value")
          .orderBy($"source", $"metric")
      },
      Some("""WITH w AS (
             |  SELECT source, CAST(count(*) AS DOUBLE) AS n_docs,
             |    CAST(sum(n_chars) AS DOUBLE) AS tot_chars,
             |    CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs
             |  FROM documents GROUP BY 1)
             |SELECT source, metric, value FROM (
             |  SELECT source, 'n_docs' AS metric, n_docs AS value FROM w
             |  UNION ALL SELECT source, 'tot_chars', tot_chars FROM w
             |  UNION ALL SELECT source, 'n_langs', n_langs FROM w)
             |ORDER BY source, metric""".stripMargin)),

    // The NATIVE as-of join (plans.AsOfJoinPlan → SortMergeAsOfJoinExec):
    // q16's point-in-time semantics, but as a whole custom Catalyst
    // operator — one hash exchange per side, (key, time) sort, and a
    // single O(n+m) forward-merge per co-partition; no window
    // materialization, no join-back (the window formulation shuffles the
    // whole events table TWICE). Left-outer: errors with no preceding
    // purchase keep nulls. Tie-break inside a microsecond: the left's
    // sentinel pairs ts with Long.MAX so EVERY same-instant purchase
    // sorts ≤ it regardless of event_id; the oracle's id-insensitive
    // RANGE frame (ordered by ts alone, as q216's) matches that, and
    // max_by picks the same highest-event_id purchase on both sides.
    Q("q212_asof_native",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val errs = ev.filter($"event_type" === "error")
          .select($"event_id".as("err_id"), $"user_id", $"ts".as("err_ts"),
            struct($"ts".as("t"), lit(Long.MaxValue).as("i")).as("lt"))
        val purch = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_uid"), $"ts".as("p_ts"),
            $"event_id".as("p_id"), $"value".as("p_value"),
            struct($"ts".as("t"), $"event_id".as("i")).as("rt"))
        graft.plans.AsOf.join(s, errs, purch,
            Seq("user_id"), Seq("p_uid"), "lt", "rt")
          .select($"err_id", $"user_id", $"err_ts", $"p_ts", $"p_id",
            round($"p_value", 2).as("p_value"),
            round((unix_micros($"err_ts") - unix_micros($"p_ts")) / lit(1e6), 3)
              .as("gap_s"))
          .orderBy($"err_id")
      },
      Some("""WITH wl AS (
             |  SELECT event_id, ts, user_id, event_type, value,
             |    max(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
             |      PARTITION BY user_id ORDER BY ts
             |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_pts
             |  FROM events),
             |err AS (
             |  SELECT event_id AS err_id, user_id, ts AS err_ts, last_pts
             |  FROM wl WHERE event_type = 'error'),
             |p AS (
             |  SELECT user_id, ts AS last_pts, event_id AS p_id, value AS p_value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT e.err_id, e.user_id, e.err_ts, e.last_pts AS p_ts,
             |  CAST(max(p.p_id) AS BIGINT) AS p_id,
             |  round(max_by(p.p_value, p.p_id), 2) AS p_value,
             |  round((epoch_us(e.err_ts) - epoch_us(e.last_pts)) / 1e6, 3) AS gap_s
             |FROM err e LEFT JOIN p
             |  ON p.user_id = e.user_id AND p.last_pts = e.last_pts
             |GROUP BY 1, 2, 3, 4
             |ORDER BY err_id""".stripMargin)),

    // Spark's NATIVE session_window (batch form): per-user sessions with a
    // 30-minute inactivity gap, computed by the built-in merging session
    // aggregation — one shuffle on the user key, sessions merged inside
    // the aggregation operator; no window-function sort-the-world pass.
    // Semantics pinned against the gaps-and-islands SQL: a session ends
    // at last_event + gap (end-exclusive), so a gap of EXACTLY 30 min
    // starts a new session — hence `>=` in the oracle's break predicate.
    Q("q213_session_window",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sv"))
          .select($"user_id", $"w.start".as("session_start"),
            $"w.end".as("session_end"), $"n", $"sv")
          .orderBy($"user_id", $"session_start")
      },
      Some("""WITH o AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
             |      THEN 1 ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (
             |  SELECT user_id, ts, value,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM o)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 30 MINUTE AS session_end,
             |  count(*) AS n, round(sum(value), 4) AS sv
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // Spark 4 VARIANT ingestion: props parses once into the binary
    // variant encoding (`parse_json`), typed access via `variant_get`
    // path extraction — the semi-structured fast path that replaces
    // per-query string re-parsing; at 100 TB the parse cost is paid once
    // per row and every downstream access is a binary field read. Output
    // mirrors q15's JSON-string extraction so the two ingestion paths are
    // mutually pinned.
    Q("q214_variant",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_type",
            expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
            round(avg($"k"), 6).as("avg_k"),
            count_distinct($"k").as("n_distinct_k"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(k) AS BIGINT) AS sum_k, round(avg(k), 6) AS avg_k,
             |  count(DISTINCT k) AS n_distinct_k
             |FROM (SELECT event_type,
             |  CAST(json_extract_string(props, 'k') AS BIGINT) AS k FROM events)
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // FORWARD as-of through the same native operator — the backward merge
    // composes into "first purchase AT OR AFTER each error" by negating
    // the time axis (last right with −t_r ≤ −t_l ⇔ first right with
    // t_r ≥ t_l); the tie-break negates event_id, so equal-instant
    // purchases resolve to the LOWEST id, mirrored by min_by in the
    // oracle. Same plan: one exchange per side + one forward-merge pass.
    Q("q216_asof_forward",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val errs = ev.filter($"event_type" === "error")
          .select($"event_id".as("err_id"), $"user_id", $"ts".as("err_ts"),
            struct((-unix_micros($"ts")).as("t"), lit(Long.MaxValue).as("i")).as("lt"))
        val purch = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("p_uid"), $"ts".as("p_ts"),
            $"event_id".as("p_id"), $"value".as("p_value"),
            struct((-unix_micros($"ts")).as("t"), (-$"event_id").as("i")).as("rt"))
        graft.plans.AsOf.join(s, errs, purch,
            Seq("user_id"), Seq("p_uid"), "lt", "rt")
          .select($"err_id", $"user_id", $"err_ts", $"p_ts", $"p_id",
            round($"p_value", 2).as("p_value"),
            round((unix_micros($"p_ts") - unix_micros($"err_ts")) / lit(1e6), 3)
              .as("wait_s"))
          .orderBy($"err_id")
      },
      Some("""WITH wl AS (
             |  SELECT event_id, ts, user_id, event_type,
             |    min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
             |      PARTITION BY user_id ORDER BY ts
             |      RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_pts
             |  FROM events),
             |err AS (
             |  SELECT event_id AS err_id, user_id, ts AS err_ts, next_pts
             |  FROM wl WHERE event_type = 'error'),
             |p AS (
             |  SELECT user_id, ts AS next_pts, event_id AS p_id, value AS p_value
             |  FROM events WHERE event_type = 'purchase')
             |SELECT e.err_id, e.user_id, e.err_ts, e.next_pts AS p_ts,
             |  CAST(min(p.p_id) AS BIGINT) AS p_id,
             |  round(min_by(p.p_value, p.p_id), 2) AS p_value,
             |  round((epoch_us(e.next_pts) - epoch_us(e.err_ts)) / 1e6, 3) AS wait_s
             |FROM err e LEFT JOIN p
             |  ON p.user_id = e.user_id AND p.next_pts = e.next_pts
             |GROUP BY 1, 2, 3, 4
             |ORDER BY err_id""".stripMargin))
  )

  /** The z_value interleave as portable SQL, shared by the q68 oracle. */
  private object ZOracle {
    val zExpr: String = graft.functions.ZValue.oracleSql("user_id", "hr")
  }
}
