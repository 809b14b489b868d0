package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Production-pipeline audit operators: data-contract validation,
  * bootstrap uncertainty for corpus metrics, leakage-proof split
  * construction, and time-series drift detection.
  *
  * Shared scale discipline: every audit is either a single conditional-
  * aggregation pass per table (map-side combine reduces each partition to
  * one row before the shuffle), a pre-aggregated fan-out (the row
  * multiplication happens AFTER a groupBy has collapsed the fact table to
  * key cardinality), or an anti-join whose build side Catalyst/AQE is free
  * to broadcast. Nothing here scans a fact table more than once per
  * reported metric family.
  */
object Audits {

  /** Deterministic uniform in [0,1) from md5 — 13 hex digits = 52 bits,
    * exactly representable in a double, mirrored verbatim by DuckDB's
    * `('0x' || substr(md5(x),1,13))::BIGINT / 2^52`. */
  private def mdUniform(seedCol: String): Column =
    expr(s"conv(substring(md5($seedCol), 1, 13), 16, 10)")
      .cast("double") / lit(4503599627370496.0)

  /** Inverse-CDF thresholds for Poisson(1): cumulative e^-1 / k!.
    * Written as full-precision literals so Spark and DuckDB compare the
    * SAME constants — both engines parse these decimal strings to
    * identical doubles. */
  private val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253)

  private def poissonCase(u: String): String =
    poissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN $u < $c THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** EWMA weight for lag i, scaled to an EXACT integer: 0.3·0.7^i =
    * 3·7^i/10^(i+1), so ·10^13 gives 3·7^i·10^(12−i) — an integer for
    * every lag ≤ 12. Integer sums are order-independent, so the
    * normalized ratio Σw·x / Σw is the division of two identical exact
    * values in Spark and DuckDB — no summation-order ulp drift (a float
    * formulation of this query flipped a round-to-4dp boundary). The
    * 10^13 scale cancels in the ratio. */
  private def ewmaW(i: Int): String =
    (BigInt(3) * BigInt(7).pow(i) * BigInt(10).pow(12 - i)).toString
  private val EwmaLags = 1 to 12

  val queries: Seq[Q] = Seq(

    // Data-contract audit: one report row per (table, check) with the
    // violation count and the population it was measured over. The range
    // and null checks for a table share a single scan (one conditional
    // aggregation collapses to one row per partition before the shuffle);
    // the two referential checks are anti-joins on the foreign key, which
    // at 100 TB is a shuffle join on exactly the key columns (AQE
    // broadcasts the build side when the dim fits). An audit that reports
    // zeros is still an audit — the totals prove what was checked.
    Q("q184_dq_audit",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
        val lin = Tables.lineitem(s, d)
        val docs = Tables.documents(s, d)

        def pass(df: DataFrame, table: String, checks: (String, Column)*): DataFrame = {
          val aggs = checks.map { case (n, c) =>
            sum(when(c, 1L).otherwise(0L)).as(n)
          } :+ count(lit(1)).as("total")
          val row = df.agg(aggs.head, aggs.tail: _*)
          val stackArgs = checks
            .map { case (n, _) => s"'$n', $n" }
            .mkString(s"stack(${checks.size}, ", ", ", ")")
          row.select(lit(table).as("tbl"), expr(s"$stackArgs as (chk, violations)"), $"total")
        }

        val custChecks = pass(cust, "customer",
          "null_name" -> $"c_name".isNull,
          "neg_acctbal_extreme" -> ($"c_acctbal" < -1000.0))
        val ordChecks = pass(ord, "orders",
          "nonpos_totalprice" -> ($"o_totalprice" <= 0.0),
          "null_orderdate" -> $"o_orderdate".isNull)
        val linChecks = pass(lin, "lineitem",
          "range_discount" -> ($"l_discount" < 0.0 || $"l_discount" > 0.1),
          "range_quantity" -> ($"l_quantity" < 1.0 || $"l_quantity" > 50.0),
          "range_tax" -> ($"l_tax" < 0.0 || $"l_tax" > 0.08),
          "null_shipdate" -> $"l_shipdate".isNull)
        val docChecks = pass(docs, "documents",
          "nchars_mismatch" -> ($"n_chars" =!= length($"text")),
          "empty_text" -> (length($"text") === 0))

        // PK uniqueness via distinct-count against total — no self-join.
        // l_linenumber is 1..7, so key packing *1000 cannot collide.
        val linPk = lin
          .agg((count(lit(1)) - countDistinct($"l_orderkey" * 1000 + $"l_linenumber"))
            .as("violations"), count(lit(1)).as("total"))
          .select(lit("lineitem").as("tbl"), lit("pk_dup").as("chk"), $"violations", $"total")
        val custPk = cust
          .agg((count(lit(1)) - countDistinct($"c_custkey")).as("violations"),
            count(lit(1)).as("total"))
          .select(lit("customer").as("tbl"), lit("pk_dup").as("chk"), $"violations", $"total")

        // Referential integrity: orphan FK rows via LEFT ANTI.
        def orphans(fact: DataFrame, fk: Column, dim: DataFrame, pk: Column,
                    table: String, chk: String) = {
          val n = fact.join(dim, fk === pk, "left_anti")
            .agg(count(lit(1)).as("violations"))
          n.crossJoin(broadcast(fact.agg(count(lit(1)).as("total"))))
            .select(lit(table).as("tbl"), lit(chk).as("chk"), $"violations", $"total")
        }
        val ordFk = orphans(ord, $"o_custkey", cust, $"c_custkey", "orders", "fk_custkey_orphan")
        val linFk = orphans(lin, $"l_orderkey", ord.select($"o_orderkey"), $"o_orderkey",
          "lineitem", "fk_orderkey_orphan")

        custChecks.union(ordChecks).union(linChecks).union(docChecks)
          .union(linPk).union(custPk).union(ordFk).union(linFk)
          .orderBy($"tbl", $"chk")
      },
      Some("""WITH checks AS (
             |  SELECT 'customer' AS tbl, 'null_name' AS chk,
             |    sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS violations,
             |    count(*) AS total FROM customer
             |  UNION ALL SELECT 'customer', 'neg_acctbal_extreme',
             |    sum(CASE WHEN c_acctbal < -1000.0 THEN 1 ELSE 0 END), count(*) FROM customer
             |  UNION ALL SELECT 'orders', 'nonpos_totalprice',
             |    sum(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END), count(*) FROM orders
             |  UNION ALL SELECT 'orders', 'null_orderdate',
             |    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), count(*) FROM orders
             |  UNION ALL SELECT 'lineitem', 'range_discount',
             |    sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END), count(*) FROM lineitem
             |  UNION ALL SELECT 'lineitem', 'range_quantity',
             |    sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END), count(*) FROM lineitem
             |  UNION ALL SELECT 'lineitem', 'range_tax',
             |    sum(CASE WHEN l_tax < 0.0 OR l_tax > 0.08 THEN 1 ELSE 0 END), count(*) FROM lineitem
             |  UNION ALL SELECT 'lineitem', 'null_shipdate',
             |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END), count(*) FROM lineitem
             |  UNION ALL SELECT 'documents', 'nchars_mismatch',
             |    sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END), count(*) FROM documents
             |  UNION ALL SELECT 'documents', 'empty_text',
             |    sum(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END), count(*) FROM documents
             |  UNION ALL SELECT 'lineitem', 'pk_dup',
             |    count(*) - count(DISTINCT l_orderkey * 1000 + l_linenumber), count(*) FROM lineitem
             |  UNION ALL SELECT 'customer', 'pk_dup',
             |    count(*) - count(DISTINCT c_custkey), count(*) FROM customer
             |  UNION ALL SELECT 'orders', 'fk_custkey_orphan',
             |    (SELECT count(*) FROM orders o
             |     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
             |    count(*) FROM orders
             |  UNION ALL SELECT 'lineitem', 'fk_orderkey_orphan',
             |    (SELECT count(*) FROM lineitem l
             |     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
             |    count(*) FROM lineitem)
             |SELECT tbl, chk, CAST(violations AS BIGINT) AS violations, total
             |FROM checks ORDER BY tbl, chk""".stripMargin)),

    // Poisson(1) bootstrap: distribution-free uncertainty for per-source
    // corpus metrics WITHOUT resampling rows through the driver. Each doc
    // contributes to each of 24 replicates with an i.i.d.-Poisson weight
    // derived from a hash — the classic "Poisson bootstrap" that makes
    // resampling embarrassingly parallel at 100 TB: the fan-out is a
    // sequence explode whose output feeds straight into a map-side-combined
    // aggregation, so the shuffle carries |sources| * 24 rows, not
    // |docs| * 24. Replicate means are exact-integer ratios (weights and
    // n_chars are integers), so both engines compute identical doubles.
    Q("q185_bootstrap_ci",
      (s, d) => {
        import s.implicits._
        val R = 24
        val rep = Tables.documents(s, d)
          .select($"doc_id", $"source", $"n_chars",
            explode(expr(s"sequence(0, ${R - 1})")).as("r"))
          .withColumn("u_seed", concat(lit("boot:"), $"doc_id", lit(":"), $"r"))
          .withColumn("u", mdUniform("u_seed"))
          .withColumn("w", expr(poissonCase("u")))
        val repMeans = rep.groupBy($"source", $"r")
          .agg((sum($"w" * $"n_chars") / sum($"w")).as("m"))
        val base = Tables.documents(s, d).groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), round(avg($"n_chars"), 4).as("mean_chars"))
        repMeans.groupBy($"source")
          .agg(round(min($"m"), 4).as("boot_lo"), round(max($"m"), 4).as("boot_hi"),
            round(stddev_samp($"m"), 4).as("boot_se"))
          .join(base, "source")
          .select($"source", $"n_docs", $"mean_chars", $"boot_lo", $"boot_hi", $"boot_se")
          .orderBy($"source")
      },
      Some(s"""WITH rep AS (
             |  SELECT doc_id, source, n_chars, t.r,
             |    ('0x' || substr(md5('boot:' || doc_id || ':' || t.r), 1, 13))::BIGINT
             |      / 4503599627370496.0 AS u
             |  FROM documents, generate_series(0, 23) AS t(r)),
             |w AS (SELECT source, r, n_chars, ${poissonCase("u")} AS w FROM rep),
             |means AS (
             |  SELECT source, r, sum(w * n_chars) / CAST(sum(w) AS DOUBLE) AS m
             |  FROM w GROUP BY 1, 2),
             |base AS (
             |  SELECT source, count(*) AS n_docs, round(avg(n_chars), 4) AS mean_chars
             |  FROM documents GROUP BY 1)
             |SELECT source, n_docs, mean_chars,
             |  round(min(m), 4) AS boot_lo, round(max(m), 4) AS boot_hi,
             |  round(stddev_samp(m), 4) AS boot_se
             |FROM means JOIN base USING (source)
             |GROUP BY source, n_docs, mean_chars
             |ORDER BY source""".stripMargin)),

    // Leakage-proof k-fold construction: near-duplicate documents MUST land
    // in the same fold or held-out evaluation leaks training data. Fold
    // assignment hashes the near-dup CLUSTER label (connected components
    // over the banded-LSH pair graph), not the doc id — every member of a
    // cluster moves as a unit; singletons hash their own id. The report is
    // the per-fold balance audit: docs, distinct clusters, and total chars.
    // At scale this is the same bucketed LSH + pointer-jumping CC machinery
    // as q46 (never all-pairs), plus one md5 per cluster label.
    Q("q186_cluster_kfold",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val comp = Dedup.documentComponents(s, d)
        val labeled = docs
          .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .withColumn("cluster", coalesce($"component", $"doc_id"))
        labeled
          .withColumn("fold",
            expr("conv(substring(md5(concat('fold:', cluster)), 1, 13), 16, 10)")
              .cast("long") % 5)
          .groupBy($"fold")
          .agg(count(lit(1)).as("n_docs"), countDistinct($"cluster").as("n_clusters"),
            sum($"n_chars").as("tot_chars"))
          .orderBy($"fold")
      },
      Some(s"""WITH RECURSIVE ${Dedup.minhashPairsSql},
             |sym AS (SELECT a AS src, b AS dst FROM pairs
             |        UNION ALL SELECT b, a FROM pairs),
             |reach(id, r) AS (
             |  SELECT DISTINCT src, src FROM sym
             |  UNION
             |  SELECT x.id, e.dst FROM reach x JOIN sym e ON e.src = x.r),
             |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
             |labeled AS (
             |  SELECT d.doc_id, d.n_chars,
             |    coalesce(c.component, d.doc_id) AS cluster
             |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
             |folded AS (
             |  SELECT n_chars, cluster,
             |    ('0x' || substr(md5('fold:' || cluster), 1, 13))::BIGINT % 5 AS fold
             |  FROM labeled)
             |SELECT fold, count(*) AS n_docs, count(DISTINCT cluster) AS n_clusters,
             |  CAST(sum(n_chars) AS BIGINT) AS tot_chars
             |FROM folded GROUP BY fold ORDER BY fold""".stripMargin)),

    // EWMA drift detector over the hourly event-volume series. The fact
    // table collapses to (event_type, hour) counts FIRST; only then does
    // each observation fan out to the 12 future hours whose EWMA it feeds
    // (weight 0.3 * 0.7^lag as an exact scaled INTEGER — see ewmaW — so
    // the weighted sums are order-independent in both engines). The
    // smoothed baseline excludes the
    // current hour, so drift_ratio = observed / EWMA(prior 12h) flags
    // bursts. Fan-out ×12 on the AGGREGATED series is O(|types|·|hours|),
    // independent of event volume — the 100 TB cost is one groupBy scan.
    Q("q187_ewma_drift",
      (s, d) => {
        import s.implicits._
        val hourly = Tables.events(s, d)
          .select($"event_type", (expr("unix_micros(ts)") / lit(3600000000L))
            .cast("long").as("hr"))
          .groupBy($"event_type", $"hr").agg(count(lit(1)).as("cnt"))
        val wCase = EwmaLags.map(i => s"WHEN $i THEN ${ewmaW(i)}")
          .mkString("CASE lg ", " ", " ELSE 0 END")
        val contrib = hourly
          .select($"event_type", $"hr", $"cnt",
            explode(expr(s"sequence(1, ${EwmaLags.last})")).as("lg"))
          .select($"event_type", ($"hr" + $"lg").as("hr"),
            (expr(wCase) * $"cnt").as("wc"), expr(wCase).as("w"))
          .groupBy($"event_type", $"hr")
          .agg((sum($"wc") / sum($"w")).as("ewma"))
        hourly.join(contrib, Seq("event_type", "hr"))
          .select($"event_type", $"hr", $"cnt",
            round($"ewma", 4).as("ewma"),
            round($"cnt" / $"ewma", 4).as("drift_ratio"))
          .orderBy($"drift_ratio".desc, $"event_type", $"hr")
          .limit(20)
      },
      Some {
        val wCase = EwmaLags.map(i => s"WHEN $i THEN ${ewmaW(i)}")
          .mkString("CASE t.lag ", " ", " ELSE 0 END")
        s"""WITH hourly AS (
           |  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
           |    count(*) AS cnt
           |  FROM events GROUP BY 1, 2),
           |contrib AS (
           |  SELECT event_type, hr + t.lag AS hr,
           |    ($wCase) * cnt AS wc, ($wCase) AS w
           |  FROM hourly, generate_series(1, ${EwmaLags.last}) AS t(lag)),
           |ewma AS (
           |  SELECT event_type, hr,
           |    CAST(sum(wc) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS ewma
           |  FROM contrib GROUP BY 1, 2)
           |SELECT h.event_type, h.hr, h.cnt,
           |  round(e.ewma, 4) AS ewma, round(h.cnt / e.ewma, 4) AS drift_ratio
           |FROM hourly h JOIN ewma e USING (event_type, hr)
           |ORDER BY drift_ratio DESC, event_type, hr
           |LIMIT 20""".stripMargin
      }),

    // The native mergeable-HLL aggregate (functions.HllRegisterAgg, a
    // Catalyst TypedImperativeAggregate — 256-byte register buffer per
    // group, map-side partials, binary shuffle, O(1) merge) counting
    // distinct tokens per source. Because the registers hash with the
    // engine-portable 52-bit md5 prefix, the ORACLE REPLAYS THE SKETCH
    // ITSELF register-by-register (not just an error bound): DuckDB
    // computes the same bucket maxima from generate_series(0,255) and
    // the same harmonic-mean estimate with linear-counting correction,
    // and the rounded estimate must hash-match. exact is the true
    // distinct count; ok pins the ±15% envelope.
    Q("q222_hll_native",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select($"source", explode(split($"text", " ")).as("w"))
          .distinct()
        toks.groupBy($"source")
          .agg(count(lit(1)).as("n_exact"),
            graft.functions.HllRegisterAgg.hllRegisters($"w").as("regs"))
          .withColumn("sum_inv", expr(
            "aggregate(regs, cast(0.0 as double), (a, x) -> a + 1.0d / cast(shiftleft(1L, x) as double))"))
          .withColumn("zeros", expr("size(filter(regs, x -> x = 0))").cast("long"))
          .withColumn("raw_est",
            lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0d) / $"sum_inv")
          .withColumn("hll_est", round(
            when($"raw_est" <= 640.0d && $"zeros" > 0,
              lit(256.0d) * log(lit(256.0d) / $"zeros")).otherwise($"raw_est"), 4))
          .select($"source", $"n_exact", $"zeros", $"hll_est",
            (abs($"hll_est" - $"n_exact") <= $"n_exact" * 0.15d).as("ok"))
          .orderBy($"source")
      },
      Some("""WITH toks AS (
             |  SELECT DISTINCT source, w FROM (
             |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)),
             |h AS (
             |  SELECT source, ('0x' || substr(md5(w), 1, 13))::BIGINT AS h FROM toks),
             |ranked AS (
             |  SELECT source, h % 256 AS bucket,
             |    CASE WHEN h // 256 = 0 THEN 45
             |      ELSE 44 - CAST(floor(log2(h // 256)) AS INTEGER) END AS rank
             |  FROM h),
             |maxima AS (
             |  SELECT source, bucket, max(rank) AS r FROM ranked GROUP BY 1, 2),
             |srcs AS (SELECT DISTINCT source FROM toks),
             |full_regs AS (
             |  SELECT s.source, g.b AS bucket, coalesce(m.r, 0) AS r
             |  FROM srcs s
             |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS b) g
             |  LEFT JOIN maxima m ON m.source = s.source AND m.bucket = g.b),
             |agg AS (
             |  SELECT source,
             |    sum(1.0 / CAST(1::BIGINT << r AS DOUBLE)) AS sum_inv,
             |    CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
             |  FROM full_regs GROUP BY 1),
             |exact AS (SELECT source, count(*) AS n_exact FROM toks GROUP BY 1),
             |est AS (
             |  SELECT a.source, e.n_exact, a.zeros,
             |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 / a.sum_inv AS raw_est
             |  FROM agg a JOIN exact e USING (source))
             |SELECT source, n_exact, zeros,
             |  round(CASE WHEN raw_est <= 640.0 AND zeros > 0
             |    THEN 256.0 * ln(256.0 / zeros) ELSE raw_est END, 4) AS hll_est,
             |  abs(round(CASE WHEN raw_est <= 640.0 AND zeros > 0
             |    THEN 256.0 * ln(256.0 / zeros) ELSE raw_est END, 4) - n_exact)
             |    <= n_exact * 0.15 AS ok
             |FROM est ORDER BY source""".stripMargin)),

    // Order-invariant dataset fingerprint — the content-addressed version
    // id a pipeline cache/lineage layer keys on: per source, XOR of a
    // canonical per-row hash (md5 over a delimited projection of every
    // column, text itself pre-hashed). XOR is commutative/associative, so
    // the fingerprint is independent of partitioning, row order, and
    // merge order — one partial-agg scan at any scale, and any single
    // changed/added/dropped row flips it.
    Q("q224_dataset_fingerprint",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"source",
            expr("""cast(conv(substring(md5(concat_ws('|',
                   |  cast(doc_id as string), lang, cast(n_chars as string),
                   |  md5(text))), 1, 13), 16, 10) as bigint)""".stripMargin)
              .as("h"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("fingerprint"))
          .orderBy($"source")
      },
      Some("""WITH h AS (
             |  SELECT source,
             |    ('0x' || substr(md5(concat_ws('|',
             |      CAST(doc_id AS VARCHAR), lang, CAST(n_chars AS VARCHAR),
             |      md5(text))), 1, 13))::BIGINT AS h
             |  FROM documents)
             |SELECT source, count(*) AS n_rows,
             |  CAST(bit_xor(h) AS BIGINT) AS fingerprint
             |FROM h GROUP BY source ORDER BY source""".stripMargin)),

    // χ² independence audit of the (source, lang) contingency table — is
    // language mix actually independent of source, or is a crawl slice
    // skewed? The statistic is assembled from EXACT integer cross
    // products (o·N − r·c over a common denominator), summed before the
    // one division, so rounding sees stable doubles. One (source, lang)
    // count scan; the χ² epilogue is |sources|·|langs|.
    Q("q226_chisq_independence",
      (s, d) => {
        import s.implicits._
        val o = Tables.documents(s, d)
          .groupBy($"source", $"lang").agg(count(lit(1)).as("o"))
        val rs = o.groupBy($"source").agg(sum($"o").as("r"))
        val cs = o.groupBy($"lang").agg(sum($"o").as("c"))
        val n = o.agg(sum($"o").as("n"))
        rs.crossJoin(broadcast(cs))
          .join(o, Seq("source", "lang"), "left")
          .crossJoin(broadcast(n))
          .select($"source", $"lang", $"r", $"c", $"n",
            // num² overflows BIGINT once N² terms appear (N ≥ ~1e5), so
            // the square happens in double space as (num/N)²·N/(r·c) —
            // identical formula text in the oracle
            ((coalesce($"o", lit(0L)) * $"n" - $"r" * $"c") / ($"n" * 1.0d)).as("x"))
          .agg(
            (countDistinct($"source") - 1).as("dof_r"),
            (countDistinct($"lang") - 1).as("dof_c"),
            round(sum($"x" * $"x" * $"n" / ($"r" * $"c" * 1.0d)), 6)
              .as("chi2_scaled"))
          .select(($"dof_r" * $"dof_c").as("dof"), $"chi2_scaled".as("chi2"))
      },
      Some("""WITH o AS (
             |  SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2),
             |rs AS (SELECT source, CAST(sum(o) AS BIGINT) AS r FROM o GROUP BY 1),
             |cs AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c FROM o GROUP BY 1),
             |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
             |cells AS (
             |  SELECT rs.source, cs.lang, rs.r, cs.c, n.n,
             |    (coalesce(o.o, 0) * n.n - rs.r * cs.c) / (n.n * 1.0) AS x
             |  FROM rs CROSS JOIN cs CROSS JOIN n
             |  LEFT JOIN o ON o.source = rs.source AND o.lang = cs.lang)
             |SELECT CAST((count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1)
             |    AS BIGINT) AS dof,
             |  round(sum(x * x * n / (r * c * 1.0)), 6) AS chi2
             |FROM cells""".stripMargin)),

    // Largest-remainder apportionment of a sampling budget: split a
    // 1000-doc budget across sources proportionally to size, with the
    // floor quotas topped up in order of the EXACT integer remainders
    // (B·nᵢ mod N) — no floats anywhere near the allocation decision,
    // so both engines hand out identical +1s; Σalloc = B is certified in
    // the output. One count scan; the apportionment is |sources| rows.
    Q("q234_budget_apportion",
      (s, d) => {
        import s.implicits._
        val b = 1000L
        val counts = Tables.documents(s, d)
          .groupBy($"source").agg(count(lit(1)).as("n_docs"))
        val tot = counts.agg(sum($"n_docs").as("n")).head().getLong(0)
        val base = counts
          .withColumn("fl", expr(s"(n_docs * $b) div $tot"))
          .withColumn("rem", ($"n_docs" * b) % tot)
        val leftover = b - base.agg(sum($"fl")).head().getLong(0)
        val ranked = base.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"rem".desc, $"source")))
        ranked
          .withColumn("alloc", $"fl" + when($"rk" <= leftover, 1L).otherwise(0L))
          .select($"source", $"n_docs",
            round($"n_docs" * b / (tot * 1.0d), 4).as("quota"),
            $"alloc")
          .orderBy($"source")
      },
      Some("""WITH counts AS (
             |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM counts),
             |base AS (
             |  SELECT c.source, c.n_docs,
             |    (c.n_docs * 1000) // t.n AS fl,
             |    (c.n_docs * 1000) % t.n AS rem,
             |    t.n
             |  FROM counts c, tot t),
             |lo AS (SELECT 1000 - CAST(sum(fl) AS BIGINT) AS leftover FROM base),
             |ranked AS (
             |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
             |  FROM base)
             |SELECT r.source, r.n_docs,
             |  round(r.n_docs * 1000 / (r.n * 1.0), 4) AS quota,
             |  CAST(r.fl + CASE WHEN r.rk <= lo.leftover THEN 1 ELSE 0 END AS BIGINT)
             |    AS alloc
             |FROM ranked r, lo
             |ORDER BY source""".stripMargin))

,
    // Out-of-orderness audit — the number a streaming deployment needs
    // BEFORE picking its watermark delay: how many events arrive more
    // than δ behind the maximum event time already seen in their own
    // user's stream (arrival order = event_id). Keyed by user, so the
    // running max is a per-user window (one shuffle on user_id), never
    // a global sequence; reported for three candidate delays as exact
    // integer counts.
    Q("q240_out_of_order",
      (s, d) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val lagged = Tables.events(s, d)
          .select($"user_id", $"event_id", expr("unix_micros(ts)").as("us"))
          .withColumn("prior_max", max($"us").over(w))
          .filter($"prior_max".isNotNull)
          .withColumn("late_us", greatest($"prior_max" - $"us", lit(0L)))
        lagged.agg(
            count(lit(1)).as("n_sequenced"),
            sum(when($"late_us" > 60L * 1000000L, 1L).otherwise(0L)).as("late_1m"),
            sum(when($"late_us" > 600L * 1000000L, 1L).otherwise(0L)).as("late_10m"),
            sum(when($"late_us" > 3600L * 1000000L, 1L).otherwise(0L)).as("late_1h"),
            max($"late_us").as("max_late_us"))
          .withColumn("pct_late_10m",
            round($"late_10m" / ($"n_sequenced" * 1.0d) * 100.0d, 4))
      },
      Some("""WITH seq AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS us,
             |    max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
             |  FROM events),
             |late AS (
             |  SELECT greatest(prior_max - us, 0) AS late_us
             |  FROM seq WHERE prior_max IS NOT NULL)
             |SELECT count(*) AS n_sequenced,
             |  CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_1m,
             |  CAST(sum(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_10m,
             |  CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_1h,
             |  CAST(max(late_us) AS BIGINT) AS max_late_us,
             |  round(sum(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END)
             |    / (count(*) * 1.0) * 100.0, 4) AS pct_late_10m
             |FROM late""".stripMargin)),

    // Poisson dispersion audit — is each event type's arrival process
    // actually Poisson-like, or bursty? The index of dispersion
    // var/mean of the HOURLY counts is ≈1 under Poisson and >1 under
    // burstiness; computed entirely on the (type, hour) aggregation, so
    // the fact table is scanned once and the statistics run on
    // |types|·|hours| rows. The 1.5 burstiness verdict is compared on
    // the 6-dp rounded ratio so the boolean is engine-stable.
    Q("q239_dispersion",
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .select($"event_type",
            expr("unix_micros(ts) div 3600000000").as("hr"))
          .groupBy($"event_type", $"hr").agg(count(lit(1)).as("n"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_hours"),
            round(avg($"n"), 6).as("mean_n"),
            round(var_pop($"n" * 1.0d), 6).as("var_n"))
          .withColumn("dispersion", round($"var_n" / $"mean_n", 6))
          .withColumn("bursty", $"dispersion" > 1.5d)
          .orderBy($"event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |stats AS (
             |  SELECT event_type, count(*) AS n_hours,
             |    round(avg(n), 6) AS mean_n,
             |    round(var_pop(n * 1.0), 6) AS var_n
             |  FROM hourly GROUP BY 1)
             |SELECT event_type, n_hours, mean_n, var_n,
             |  round(var_n / mean_n, 6) AS dispersion,
             |  round(var_n / mean_n, 6) > 1.5 AS bursty
             |FROM stats ORDER BY event_type""".stripMargin)),

    // Seasonal decomposition of event volume: collapse to (type, hour)
    // counts, extract the hour-of-day profile (the seasonal component),
    // and report how much variance the season explains —
    // var(residual)/var(series) per type. Everything runs on the
    // aggregated hourly series (|types|·|hours| rows), so the 100 TB
    // cost is the one groupBy scan; the decomposition is an epilogue.
    Q("q227_seasonal_profile",
      (s, d) => {
        import s.implicits._
        val hourly = Tables.events(s, d)
          .select($"event_type",
            expr("unix_micros(ts) div 3600000000").as("hr"))
          .groupBy($"event_type", $"hr").agg(count(lit(1)).as("n"))
        val prof = hourly.withColumn("hod", pmod($"hr", lit(24L)))
          .groupBy($"event_type", $"hod").agg(avg($"n").as("p"))
        val amp = prof.groupBy($"event_type")
          .agg(round(max($"p") - min($"p"), 4).as("amplitude"))
        hourly.withColumn("hod", pmod($"hr", lit(24L)))
          .join(prof, Seq("event_type", "hod"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_hours"),
            round(avg($"n"), 4).as("mean_n"),
            round(var_pop($"n" - $"p") / var_pop($"n" * 1.0d), 4)
              .as("resid_var_ratio"))
          .join(amp, "event_type")
          .select($"event_type", $"n_hours", $"mean_n", $"amplitude",
            $"resid_var_ratio")
          .orderBy($"event_type")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |prof AS (
             |  SELECT event_type, hr % 24 AS hod, avg(n) AS p
             |  FROM hourly GROUP BY 1, 2),
             |amp AS (
             |  SELECT event_type, round(max(p) - min(p), 4) AS amplitude
             |  FROM prof GROUP BY 1),
             |dec AS (
             |  SELECT h.event_type, count(*) AS n_hours,
             |    round(avg(h.n), 4) AS mean_n,
             |    round(var_pop(h.n - p.p) / var_pop(h.n * 1.0), 4) AS resid_var_ratio
             |  FROM hourly h JOIN prof p
             |    ON p.event_type = h.event_type AND p.hod = h.hr % 24
             |  GROUP BY 1)
             |SELECT d.event_type, d.n_hours, d.mean_n, a.amplitude,
             |  d.resid_var_ratio
             |FROM dec d JOIN amp a USING (event_type)
             |ORDER BY event_type""".stripMargin))
  )
}
