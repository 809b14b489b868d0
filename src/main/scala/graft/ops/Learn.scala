package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Distributed model fitting expressed as whole-data aggregates — the
  * "iterative ML over a 100 TB corpus" shapes a training-data pipeline
  * runs to score, weigh, and audit its own data: batch-gradient-descent
  * logistic regression, closed-form ridge regression via the normal
  * equations, and a unigram-LM (SentencePiece-style) Viterbi tokenizer.
  *
  * Shared scale discipline (same as the EM loop in
  * `quantify/Quantify.scala`, cf. reference `Quantify.scala:231-280`):
  * every training iteration is ONE map-side-combinable aggregation over
  * the fact table producing O(d) scalars; the driver holds only the d-dim
  * model between iterations. Nothing quadratic, nothing collected but the
  * model itself. Determinism discipline: the model is re-rounded on the
  * driver after every iteration, so float summation-order noise (~1e-13)
  * cannot compound across iterations and both engines re-enter each step
  * from bit-identical coefficients.
  */
object Learn {

  /** Feature frame shared by q208/q210: intercept, scaled char count,
    * scaled whitespace-token count, with y = 1[lang = 'en']. */
  private def feats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(
      when($"lang" === "en", 1.0d).otherwise(0.0d).as("y"),
      lit(1.0d).as("x0"),
      ($"n_chars" / 256.0d).as("x1"),
      (size(split($"text", " ")) / 64.0d).as("x2"))
  }

  private val featsSql =
    """SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
      |  1.0 AS x0, n_chars / 256.0 AS x1,
      |  len(string_split(text, ' ')) / 64.0 AS x2 FROM documents""".stripMargin

  private def r8(v: Double): Double =
    BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** 52-bit md5 uniform hash as BIGINT (engine-portable; mirrors the
    * oracle's ('0x' || substr(md5(x),1,13))::BIGINT). */
  private def mdLongExpr(seedSql: String): String =
    s"cast(conv(substring(md5($seedSql), 1, 13), 16, 10) as bigint)"

  /** The 3-step GD weight chain as oracle CTE text over the `feat` CTE
    * named `$feat`, with CTE names prefixed `$pfx` — shared verbatim by
    * q208/q215/q220/q229 so the oracles cannot drift apart. */
  private def gdChain(feat: String, pfx: String): String = {
    def g(i: Int) =
      s"""${pfx}g$i AS (
         |  SELECT round(avg((1/(1+exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2))) - y) * x0), 8) AS g0,
         |    round(avg((1/(1+exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2))) - y) * x1), 8) AS g1,
         |    round(avg((1/(1+exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2))) - y) * x2), 8) AS g2,
         |    round(avg(-(y * ln(1/(1+exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2))))
         |      + (1 - y) * ln(1 - 1/(1+exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2)))))), 4) AS loss
         |  FROM $feat, ${pfx}w${i - 1} w)""".stripMargin
    def w(i: Int) =
      s"""${pfx}w$i AS (SELECT round(w.w0 - g.g0, 8) AS w0, round(w.w1 - g.g1, 8) AS w1,
         |    round(w.w2 - g.g2, 8) AS w2, g.loss FROM ${pfx}w${i - 1} w, ${pfx}g$i g)""".stripMargin
    (Seq(s"${pfx}w0 AS (SELECT 0.1 AS w0, 0.01 AS w1, 0.01 AS w2)") ++
      (1 to 3).flatMap(i => Seq(g(i), w(i))))
      .mkString(",\n")
  }

  private val gdChainSql: String = gdChain("feat", "")

  /** Run the same 3 GD steps on a feature frame; returns w3 (each step
    * re-rounded to 8 dp exactly like the oracle chain). */
  private def trainW3(s: SparkSession, f: DataFrame): Array[Double] = {
    import s.implicits._
    var w = Array(0.1d, 0.01d, 0.01d)
    (1 to 3).foreach { _ =>
      val p = lit(1.0d) / (lit(1.0d) +
        exp(-(lit(w(0)) * $"x0" + lit(w(1)) * $"x1" + lit(w(2)) * $"x2")))
      val g = f.agg(avg((p - $"y") * $"x0"), avg((p - $"y") * $"x1"),
        avg((p - $"y") * $"x2")).head()
      w = Array(r8(w(0) - r8(g.getDouble(0))), r8(w(1) - r8(g.getDouble(1))),
        r8(w(2) - r8(g.getDouble(2))))
    }
    w
  }

  val queries: Seq[Q] = Seq(

    // Logistic regression by full-batch gradient descent, 3 unrolled
    // steps from w⁰ = (0.1, 0.01, 0.01) with η = 1 (a w⁰ = 0 start makes
    // σ = 0.5 EXACTLY, turning step-1 gradients into lattice rationals
    // that can land exactly on the 8-dp rounding half-boundary where
    // DuckDB's float round and BigDecimal HALF_UP disagree — observed at
    // sf0.001; a non-zero start keeps every σ transcendental and the
    // boundary probability at the codebase-standard ~1e-9): each step is
    // a single conditional-
    // aggregation scan producing the 3-component mean gradient
    //   g = avg((σ(w·x) − y)·x)
    // which the driver rounds to 8 dp (so both engines re-enter step k+1
    // from identical doubles) and applies. The emitted trace — per step:
    // weights and mean log-loss AT those weights — is the convergence
    // certificate (loss must fall monotonically at this η). At 100 TB
    // each step is one scan with partial aggregation; the "model state"
    // crossing the driver is 3 doubles, never data.
    Q("q208_logreg_gd",
      (s, d) => {
        import s.implicits._
        val f = feats(s, d).cache()
        try {
          var w = Array(0.1d, 0.01d, 0.01d)
          val rows = (1 to 3).map { step =>
            val p = lit(1.0d) / (lit(1.0d) +
              exp(-(lit(w(0)) * $"x0" + lit(w(1)) * $"x1" + lit(w(2)) * $"x2")))
            val g = f.agg(
              avg((p - $"y") * $"x0"), avg((p - $"y") * $"x1"),
              avg((p - $"y") * $"x2"),
              avg(-($"y" * log(p) + (lit(1.0d) - $"y") * log(lit(1.0d) - p))))
              .head()
            val loss = g.getDouble(3)
            // round the gradient FIRST (matching the oracle's round(g, 8)),
            // then round the difference — round(w − round(g)) ≠ round(w − g)
            w = Array(r8(w(0) - r8(g.getDouble(0))), r8(w(1) - r8(g.getDouble(1))),
              r8(w(2) - r8(g.getDouble(2))))
            (step.toLong, w(0), w(1), w(2),
              BigDecimal(loss).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
          s.createDataFrame(rows).toDF("step", "w0", "w1", "w2", "loss_before")
            .orderBy($"step")
        } finally f.unpersist()
      },
      Some(s"""WITH feat AS ($featsSql),
             |$gdChainSql
             |SELECT 1 AS step, w0, w1, w2, loss AS loss_before FROM w1
             |UNION ALL SELECT 2, w0, w1, w2, loss FROM w2
             |UNION ALL SELECT 3, w0, w1, w2, loss FROM w3
             |ORDER BY step""".stripMargin)),

    // Uncertainty sampling — the active-learning read of the q208 model:
    // score every document with the trained weights and keep the 16 docs
    // nearest the decision boundary (the ones a labeling pass would
    // target next). p is rounded to 6 dp BEFORE ranking so both engines
    // rank identical values; ties break on doc_id. The selection is
    // orderBy+limit — Spark plans TakeOrderedAndProject (per-partition
    // top-16, then a 16-row driver merge), never a global sort.
    Q("q215_uncertainty_sample",
      (s, d) => {
        import s.implicits._
        val f2 = Tables.documents(s, d).select(
          $"doc_id",
          when($"lang" === "en", 1.0d).otherwise(0.0d).as("y"),
          lit(1.0d).as("x0"),
          ($"n_chars" / 256.0d).as("x1"),
          (size(split($"text", " ")) / 64.0d).as("x2")).cache()
        try {
          val w = trainW3(s, f2)
          f2.select($"doc_id", $"y",
              round(lit(1.0d) / (lit(1.0d) + exp(-(lit(w(0)) * $"x0" +
                lit(w(1)) * $"x1" + lit(w(2)) * $"x2"))), 6).as("p"))
            .withColumn("dist", abs($"p" - 0.5d))
            .orderBy($"dist", $"doc_id")
            .limit(16)
        } finally f2.unpersist()
      },
      Some(s"""WITH feat2 AS (
             |  SELECT doc_id,
             |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y,
             |    1.0 AS x0, n_chars / 256.0 AS x1,
             |    len(string_split(text, ' ')) / 64.0 AS x2
             |  FROM documents),
             |feat AS (SELECT y, x0, x1, x2 FROM feat2),
             |$gdChainSql,
             |scored AS (
             |  SELECT f.doc_id, f.y,
             |    round(1/(1+exp(-(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2))), 6) AS p
             |  FROM feat2 f, w3 w)
             |SELECT doc_id, y, p, abs(p - 0.5) AS dist
             |FROM scored
             |ORDER BY dist, doc_id
             |LIMIT 16""".stripMargin)),

    // Unigram-LM (SentencePiece-style) tokenizer: build a piece vocab
    // (every single character + the 24 most frequent 2/3-grams over the
    // distinct-word table) with integer costs −10⁶·ln(c/total) — integer
    // so the DP below is EXACT and engine-portable, no float-min ties —
    // then Viterbi-segment the 200 most frequent words: minimize
    // (total cost, piece count) lexicographically. The DP runs as a
    // scalar kernel over a broadcast vocab (the same broadcast-dictionary
    // shape as the reference's genome UDF, `Index.scala:76-84`): per row
    // O(len·3) work, no shuffle beyond the word histogram. The oracle
    // replays it by exhaustively enumerating segmentations with a
    // recursive CTE (bounded: ≤927 compositions of a 12-char word into
    // 1–3-char pieces) and taking the same lexicographic min. At 100 TB
    // the corpus collapses to its word histogram first — piece stats and
    // segmentation both run on the vocab-bounded table, never the corpus.
    Q("q209_unigram_segment",
      (s, d) => {
        import s.implicits._
        val words = Tables.documents(s, d)
          .select(explode(split($"text", " ")).as("t"))
          .select(lower($"t").as("w"))
          .filter($"w".rlike("^[a-z]+$"))
          .groupBy($"w").agg(count(lit(1)).as("cnt"))
          .cache()
        try {
          def grams(n: Int): DataFrame = words
            .filter(length($"w") >= n)
            .select(explode(expr(
              s"transform(sequence(1, length(w) - ${n - 1}), i -> substring(w, i, $n))"))
              .as("piece"))
            .groupBy($"piece").agg(count(lit(1)).as("c"))
          val topNg = grams(2).unionAll(grams(3))
            .withColumn("r", row_number().over(
              org.apache.spark.sql.expressions.Window.orderBy($"c".desc, $"piece")))
            .filter($"r" <= 24).drop("r")
          val vocab0 = grams(1).unionAll(topNg)
          val tot = vocab0.agg(sum($"c")).head().getLong(0).toDouble
          val vocab = vocab0.select($"piece",
            expr(s"cast(round(-1000000.0 * ln(cast(c as double) / ${tot}d)) as bigint)")
              .as("negl"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val vb = s.sparkContext.broadcast(vocab)
          val viterbi = udf { (word: String) =>
            val n = word.length
            val inf = Long.MaxValue / 4
            val cost = Array.fill(n + 1)(inf)
            val np = Array.fill(n + 1)(Int.MaxValue)
            cost(0) = 0L; np(0) = 0
            for (j <- 1 to n; k <- math.max(0, j - 3) until j if cost(k) < inf)
              vb.value.get(word.substring(k, j)).foreach { c =>
                val nc = cost(k) + c
                val nn = np(k) + 1
                if (nc < cost(j) || (nc == cost(j) && nn < np(j))) {
                  cost(j) = nc; np(j) = nn
                }
              }
            (cost(n), np(n))
          }
          val targets = words.filter(length($"w") <= 12)
            .withColumn("r", row_number().over(
              org.apache.spark.sql.expressions.Window.orderBy($"cnt".desc, $"w")))
            .filter($"r" <= 200).drop("r")
          targets
            .withColumn("seg", viterbi($"w"))
            .select($"w".as("word"), $"cnt",
              $"seg._1".as("cost"), $"seg._2".cast("long").as("n_pieces"))
            .orderBy($"word")
        } finally words.unpersist()
      },
      Some("""WITH RECURSIVE toks AS (
             |  SELECT lower(t.tk) AS w FROM (
             |    SELECT unnest(string_split(text, ' ')) AS tk FROM documents) t
             |  WHERE regexp_matches(lower(t.tk), '^[a-z]+$')),
             |words AS (SELECT w, count(*) AS cnt FROM toks GROUP BY 1),
             |pos1 AS (SELECT w, unnest(generate_series(1, length(w))) AS i FROM words),
             |uni AS (SELECT substr(w, i, 1) AS piece, count(*) AS c
             |        FROM pos1 GROUP BY 1),
             |pos2 AS (SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
             |         FROM words WHERE length(w) >= 2),
             |bi AS (SELECT substr(w, i, 2) AS piece, count(*) AS c
             |       FROM pos2 GROUP BY 1),
             |pos3 AS (SELECT w, unnest(generate_series(1, length(w) - 2)) AS i
             |         FROM words WHERE length(w) >= 3),
             |tri AS (SELECT substr(w, i, 3) AS piece, count(*) AS c
             |        FROM pos3 GROUP BY 1),
             |ng AS (SELECT piece, c FROM (
             |    SELECT piece, c, row_number() OVER (ORDER BY c DESC, piece) AS r
             |    FROM (SELECT * FROM bi UNION ALL SELECT * FROM tri))
             |  WHERE r <= 24),
             |vocab0 AS (SELECT piece, c FROM uni UNION ALL SELECT piece, c FROM ng),
             |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM vocab0),
             |vocab AS (SELECT piece, length(piece) AS plen,
             |    CAST(round(-1000000.0 * ln(CAST(c AS DOUBLE) / tot.tot)) AS BIGINT) AS negl
             |  FROM vocab0, tot),
             |targets AS (SELECT w AS word, cnt FROM (
             |    SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w) AS r
             |    FROM words WHERE length(w) <= 12)
             |  WHERE r <= 200),
             |seg AS (
             |  SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost, 0 AS np
             |  FROM targets
             |  UNION ALL
             |  SELECT s.word, s.pos + v.plen, s.cost + v.negl, s.np + 1
             |  FROM seg s JOIN vocab v
             |    ON substr(s.word, s.pos + 1, v.plen) = v.piece
             |  WHERE s.pos < length(s.word)),
             |done AS (SELECT word, cost, np FROM seg WHERE pos = length(word)),
             |best AS (SELECT word, min(cost) AS cost FROM done GROUP BY 1)
             |SELECT t.word, t.cnt, b.cost, CAST(min(d.np) AS BIGINT) AS n_pieces
             |FROM targets t
             |JOIN best b USING (word)
             |JOIN done d ON d.word = t.word AND d.cost = b.cost
             |GROUP BY t.word, t.cnt, b.cost
             |ORDER BY t.word""".stripMargin)),

    // 3-fold cross-validation of the GD classifier — the out-of-sample
    // honesty check q208's in-sample trace cannot give: fold f trains on
    // doc_id % 3 ≠ f (the same 3 aggregate-scan steps) and reports
    // held-out mean log-loss and accuracy on doc_id % 3 = f. Per fold:
    // 3 training scans + 1 eval scan; the driver carries only 3 doubles.
    // The oracle unrolls THREE weight chains via the shared generator
    // (prefix f0_/f1_/f2_), so all four oracles of this model family are
    // generated from one text.
    Q("q229_logreg_cv",
      (s, d) => {
        import s.implicits._
        val all = Tables.documents(s, d).select(
          $"doc_id",
          when($"lang" === "en", 1.0d).otherwise(0.0d).as("y"),
          lit(1.0d).as("x0"),
          ($"n_chars" / 256.0d).as("x1"),
          (size(split($"text", " ")) / 64.0d).as("x2")).cache()
        try {
          val rows = (0 to 2).map { f =>
            val w = trainW3(s, all.filter($"doc_id" % 3 =!= f))
            val p = round(lit(1.0d) / (lit(1.0d) + exp(-(lit(w(0)) * $"x0" +
              lit(w(1)) * $"x1" + lit(w(2)) * $"x2"))), 6)
            val m = all.filter($"doc_id" % 3 === f)
              .select($"y", p.as("p"))
              .agg(count(lit(1)),
                avg(-($"y" * log($"p") + (lit(1.0d) - $"y") * log(lit(1.0d) - $"p"))),
                sum(when(($"p" >= 0.5d) === ($"y" === 1.0d), 1L).otherwise(0L)))
              .head()
            (f.toLong, w(0), w(1), w(2), m.getLong(0),
              BigDecimal(m.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
              m.getLong(2))
          }
          s.createDataFrame(rows)
            .toDF("fold", "w0", "w1", "w2", "n_test", "holdout_loss", "n_correct")
            .orderBy($"fold")
        } finally all.unpersist()
      },
      Some {
        val feat2 =
          """SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
            |  1.0 AS x0, n_chars / 256.0 AS x1,
            |  len(string_split(text, ' ')) / 64.0 AS x2 FROM documents""".stripMargin
        val folds = (0 to 2).map { f =>
          s"""f${f}_feat AS (SELECT y, x0, x1, x2 FROM base WHERE doc_id % 3 != $f),
             |${gdChain(s"f${f}_feat", s"f${f}_")},
             |f${f}_eval AS (
             |  SELECT $f AS fold, w.w0, w.w1, w.w2, count(*) AS n_test,
             |    round(avg(-(b.y * ln(p) + (1 - b.y) * ln(1 - p))), 4) AS holdout_loss,
             |    CAST(sum(CASE WHEN (p >= 0.5) = (b.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_correct
             |  FROM (SELECT *, round(1/(1+exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2))), 6) AS p
             |        FROM base, f${f}_w3 w WHERE doc_id % 3 = $f) b, f${f}_w3 w
             |  GROUP BY 1, 2, 3, 4)""".stripMargin
        }.mkString(",\n")
        s"""WITH base AS ($feat2),
           |$folds
           |SELECT fold, w0, w1, w2, n_test, holdout_loss, n_correct FROM f0_eval
           |UNION ALL SELECT fold, w0, w1, w2, n_test, holdout_loss, n_correct FROM f1_eval
           |UNION ALL SELECT fold, w0, w1, w2, n_test, holdout_loss, n_correct FROM f2_eval
           |ORDER BY fold""".stripMargin
      }),

    // Loss-based data pruning (the EL2N/forgetting-score shape): score
    // every doc with its per-example log-loss under the trained model,
    // split the corpus at the per-source 80th loss percentile (exact,
    // via the value-histogram rank method — no per-source sort), and
    // report what the pruned fifth looks like vs the kept bulk. The
    // decision threshold comes from exact integer ranks over 6-dp
    // losses, so membership is engine-stable. One training pass + two
    // aggregation scans at any scale.
    Q("q230_loss_pruning",
      (s, d) => {
        import s.implicits._
        val f2 = Tables.documents(s, d).select(
          $"doc_id", $"source", $"n_chars",
          when($"lang" === "en", 1.0d).otherwise(0.0d).as("y"),
          lit(1.0d).as("x0"),
          ($"n_chars" / 256.0d).as("x1"),
          (size(split($"text", " ")) / 64.0d).as("x2")).cache()
        try {
          val w = trainW3(s, f2.select($"y", $"x0", $"x1", $"x2"))
          val p = round(lit(1.0d) / (lit(1.0d) + exp(-(lit(w(0)) * $"x0" +
            lit(w(1)) * $"x1" + lit(w(2)) * $"x2"))), 6)
          val scored = f2.select($"doc_id", $"source", $"n_chars", $"y",
            round(-($"y" * log(p) + (lit(1.0d) - $"y") * log(lit(1.0d) - p)), 6)
              .as("loss"))
          // exact per-source 80th percentile threshold via the loss
          // histogram: the smallest loss value whose cumulative count
          // reaches ceil(0.8·n) — rank arithmetic, not a sort of docs
          val hist = scored.groupBy($"source", $"loss").agg(count(lit(1)).as("c"))
          val cum = hist.withColumn("cum", sum($"c").over(
            org.apache.spark.sql.expressions.Window.partitionBy($"source")
              .orderBy($"loss")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          val n = hist.groupBy($"source").agg(sum($"c").as("n"))
          val thr = cum.join(n, "source")
            .filter($"cum" >= ceil($"n" * 0.8d))
            .groupBy($"source").agg(min($"loss").as("thr"))
          scored.join(thr, "source")
            .withColumn("bucket",
              when($"loss" <= $"thr", lit("kept")).otherwise(lit("pruned")))
            .groupBy($"source", $"bucket")
            .agg(count(lit(1)).as("n_docs"),
              round(avg($"n_chars"), 4).as("mean_chars"),
              round(avg($"y"), 6).as("en_rate"),
              round(avg($"loss"), 4).as("mean_loss"))
            .orderBy($"source", $"bucket")
        } finally f2.unpersist()
      },
      Some {
        val feat2 =
          """SELECT doc_id, source, n_chars,
            |  CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y,
            |  1.0 AS x0, n_chars / 256.0 AS x1,
            |  len(string_split(text, ' ')) / 64.0 AS x2 FROM documents""".stripMargin
        s"""WITH base AS ($feat2),
           |feat AS (SELECT y, x0, x1, x2 FROM base),
           |$gdChainSql,
           |scored AS (
           |  SELECT b.doc_id, b.source, b.n_chars, b.y,
           |    round(-(b.y * ln(p) + (1 - b.y) * ln(1 - p)), 6) AS loss
           |  FROM (SELECT *, round(1/(1+exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2))), 6) AS p
           |        FROM base, w3 w) b),
           |hist AS (SELECT source, loss, count(*) AS c FROM scored GROUP BY 1, 2),
           |cum AS (
           |  SELECT source, loss, c,
           |    sum(c) OVER (PARTITION BY source ORDER BY loss
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM hist),
           |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1),
           |thr AS (
           |  SELECT c.source, min(c.loss) AS thr
           |  FROM cum c JOIN n ON n.source = c.source
           |  WHERE c.cum >= ceil(n.n * 0.8) GROUP BY 1)
           |SELECT s.source,
           |  CASE WHEN s.loss <= t.thr THEN 'kept' ELSE 'pruned' END AS bucket,
           |  count(*) AS n_docs, round(avg(s.n_chars), 4) AS mean_chars,
           |  round(avg(s.y), 6) AS en_rate, round(avg(s.loss), 4) AS mean_loss
           |FROM scored s JOIN thr t USING (source)
           |GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin
      }),

    // Learning curve — the "will more data help" audit run before
    // scaling a labeling/curation budget: hold out a fixed md5 fifth of
    // the corpus, train the same 3-step GD model on growing md5-quarter
    // fractions of the rest, and report held-out loss/accuracy per
    // fraction. Membership comes from integer md5 buckets, so train
    // sets are nested and engine-identical; each fraction costs 3
    // aggregate scans + 1 eval scan.
    Q("q235_learning_curve",
      (s, d) => {
        import s.implicits._
        val bucket = expr(s"${mdLongExpr("concat('lc:', doc_id)")} % 20")
        val all = Tables.documents(s, d).select(
          $"doc_id", bucket.as("b"),
          when($"lang" === "en", 1.0d).otherwise(0.0d).as("y"),
          lit(1.0d).as("x0"),
          ($"n_chars" / 256.0d).as("x1"),
          (size(split($"text", " ")) / 64.0d).as("x2")).cache()
        try {
          val holdout = all.filter($"b" >= 16) // fixed 4/20 = 20% holdout
          val pool = all.filter($"b" < 16)
          val rows = (1 to 4).map { f =>
            val train = pool.filter($"b" < f * 4)
            val nTrain = train.count()
            val w = trainW3(s, train)
            val p = round(lit(1.0d) / (lit(1.0d) + exp(-(lit(w(0)) * $"x0" +
              lit(w(1)) * $"x1" + lit(w(2)) * $"x2"))), 6)
            val m = holdout.select($"y", p.as("p"))
              .agg(count(lit(1)),
                avg(-($"y" * log($"p") + (lit(1.0d) - $"y") * log(lit(1.0d) - $"p"))),
                sum(when(($"p" >= 0.5d) === ($"y" === 1.0d), 1L).otherwise(0L)))
              .head()
            (f.toLong * 25L, nTrain, m.getLong(0),
              BigDecimal(m.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
              m.getLong(2))
          }
          s.createDataFrame(rows)
            .toDF("train_pct", "n_train", "n_test", "holdout_loss", "n_correct")
            .orderBy($"train_pct")
        } finally all.unpersist()
      },
      Some {
        val feat2 =
          s"""SELECT doc_id,
             |  ('0x' || substr(md5('lc:' || doc_id), 1, 13))::BIGINT % 20 AS b,
             |  CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y,
             |  1.0 AS x0, n_chars / 256.0 AS x1,
             |  len(string_split(text, ' ')) / 64.0 AS x2 FROM documents""".stripMargin
        val fracs = (1 to 4).map { f =>
          s"""p${f}_feat AS (SELECT y, x0, x1, x2 FROM base WHERE b < ${f * 4}),
             |${gdChain(s"p${f}_feat", s"p${f}_")},
             |p${f}_eval AS (
             |  SELECT CAST(${f * 25} AS BIGINT) AS train_pct,
             |    (SELECT count(*) FROM p${f}_feat) AS n_train,
             |    count(*) AS n_test,
             |    round(avg(-(h.y * ln(h.p) + (1 - h.y) * ln(1 - h.p))), 4) AS holdout_loss,
             |    CAST(sum(CASE WHEN (h.p >= 0.5) = (h.y = 1.0) THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_correct
             |  FROM (SELECT b.y,
             |          round(1/(1+exp(-(w.w0*b.x0 + w.w1*b.x1 + w.w2*b.x2))), 6) AS p
             |        FROM base b, p${f}_w3 w WHERE b.b >= 16) h)""".stripMargin
        }.mkString(",\n")
        s"""WITH base AS ($feat2),
           |$fracs
           |SELECT train_pct, CAST(n_train AS BIGINT) AS n_train, n_test,
           |  holdout_loss, n_correct FROM p1_eval
           |UNION ALL SELECT train_pct, CAST(n_train AS BIGINT), n_test, holdout_loss, n_correct FROM p2_eval
           |UNION ALL SELECT train_pct, CAST(n_train AS BIGINT), n_test, holdout_loss, n_correct FROM p3_eval
           |UNION ALL SELECT train_pct, CAST(n_train AS BIGINT), n_test, holdout_loss, n_correct FROM p4_eval
           |ORDER BY train_pct""".stripMargin
      }),

    // Feature-ablation importance: retrain the same model with each
    // feature zeroed out and report the in-sample loss penalty vs the
    // full model — the "what does each signal buy" attribution a
    // feature pipeline justifies its columns with. Zeroing (not
    // dropping) keeps the weight chain shape identical, so the oracle
    // is three more instances of the shared generator over feat CTEs
    // that null one column. 3 scans per variant.
    Q("q236_feature_ablation",
      (s, d) => {
        import s.implicits._
        val all = Tables.documents(s, d).select(
          when($"lang" === "en", 1.0d).otherwise(0.0d).as("y"),
          lit(1.0d).as("x0"),
          ($"n_chars" / 256.0d).as("x1"),
          (size(split($"text", " ")) / 64.0d).as("x2")).cache()
        try {
          def lossAt(f: DataFrame): Double = {
            val w = trainW3(s, f)
            val p = round(lit(1.0d) / (lit(1.0d) + exp(-(lit(w(0)) * $"x0" +
              lit(w(1)) * $"x1" + lit(w(2)) * $"x2"))), 6)
            val l = f.select($"y", p.as("p"))
              .agg(avg(-($"y" * log($"p") + (lit(1.0d) - $"y") * log(lit(1.0d) - $"p"))))
              .head().getDouble(0)
            BigDecimal(l).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          val full = lossAt(all)
          val rows = Seq(
            ("full", full),
            ("no_chars", lossAt(all.withColumn("x1", lit(0.0d)))),
            ("no_tokens", lossAt(all.withColumn("x2", lit(0.0d)))))
            .map { case (v, l) =>
              (v, l, BigDecimal(l - full).setScale(4,
                BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          s.createDataFrame(rows).toDF("variant", "loss", "penalty")
            .orderBy($"variant")
        } finally all.unpersist()
      },
      Some {
        def evalSql(pfx: String, feat: String) =
          s"""${pfx}loss AS (
             |  SELECT round(avg(-(h.y * ln(h.p) + (1 - h.y) * ln(1 - h.p))), 4) AS loss
             |  FROM (SELECT f.y,
             |          round(1/(1+exp(-(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2))), 6) AS p
             |        FROM $feat f, ${pfx}w3 w) h)""".stripMargin
        s"""WITH feat AS ($featsSql),
           |nc_feat AS (SELECT y, x0, 0.0 AS x1, x2 FROM feat),
           |nt_feat AS (SELECT y, x0, x1, 0.0 AS x2 FROM feat),
           |${gdChain("feat", "fu_")},
           |${evalSql("fu_", "feat")},
           |${gdChain("nc_feat", "nc_")},
           |${evalSql("nc_", "nc_feat")},
           |${gdChain("nt_feat", "nt_")},
           |${evalSql("nt_", "nt_feat")}
           |SELECT 'full' AS variant, l.loss, round(l.loss - f.loss, 4) AS penalty
           |  FROM fu_loss l, fu_loss f
           |UNION ALL SELECT 'no_chars', l.loss, round(l.loss - f.loss, 4)
           |  FROM nc_loss l, fu_loss f
           |UNION ALL SELECT 'no_tokens', l.loss, round(l.loss - f.loss, 4)
           |  FROM nt_loss l, fu_loss f
           |ORDER BY variant""".stripMargin
      }),

    // Confident-learning label suspects — the OPPOSITE tail of q215's
    // uncertainty sample: docs where the model CONFIDENTLY contradicts
    // the label (|p − y| ≥ 0.55 — the 3-step model is deliberately
    // mild, so "confident" is calibrated to its probability range) are the mislabel candidates a cleaning
    // pass reviews first. Selection is TakeOrdered top-8 by extremity
    // (6-dp p, doc_id tie-break) — per-partition top-k, 8-row driver
    // merge, never a global sort.
    Q("q231_label_suspects",
      (s, d) => {
        import s.implicits._
        val f2 = Tables.documents(s, d).select(
          $"doc_id", $"source",
          when($"lang" === "en", 1.0d).otherwise(0.0d).as("y"),
          lit(1.0d).as("x0"),
          ($"n_chars" / 256.0d).as("x1"),
          (size(split($"text", " ")) / 64.0d).as("x2")).cache()
        try {
          val w = trainW3(s, f2.select($"y", $"x0", $"x1", $"x2"))
          f2.select($"doc_id", $"source", $"y",
              round(lit(1.0d) / (lit(1.0d) + exp(-(lit(w(0)) * $"x0" +
                lit(w(1)) * $"x1" + lit(w(2)) * $"x2"))), 6).as("p"))
            .withColumn("extremity", abs($"p" - $"y"))
            .filter($"extremity" >= 0.55d)
            .orderBy($"extremity".desc, $"doc_id")
            .limit(8)
        } finally f2.unpersist()
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id, source,
             |    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS DOUBLE) AS y,
             |    1.0 AS x0, n_chars / 256.0 AS x1,
             |    len(string_split(text, ' ')) / 64.0 AS x2
             |  FROM documents),
             |feat AS (SELECT y, x0, x1, x2 FROM base),
             |$gdChainSql,
             |scored AS (
             |  SELECT b.doc_id, b.source, b.y,
             |    round(1/(1+exp(-(w.w0*b.x0 + w.w1*b.x1 + w.w2*b.x2))), 6) AS p
             |  FROM base b, w3 w)
             |SELECT doc_id, source, y, p, abs(p - y) AS extremity
             |FROM scored
             |WHERE abs(p - y) >= 0.55
             |ORDER BY extremity DESC, doc_id
             |LIMIT 8""".stripMargin))

,
    // Inter-rater agreement (Cohen's κ) between the rule label
    // (lang = 'en') and the trained q208 classifier at threshold 0.5 —
    // the "do my two labelers actually agree beyond chance" audit run
    // before trusting silver labels. Confusion counts are exact integers
    // from one conditional-aggregation scan (predictions use the 6-dp
    // rounded p, so the threshold comparison is engine-identical); κ is
    // one closed-form expression over the four counts.
    Q("q220_cohens_kappa",
      (s, d) => {
        import s.implicits._
        val f2 = Tables.documents(s, d).select(
          when($"lang" === "en", 1.0d).otherwise(0.0d).as("y"),
          lit(1.0d).as("x0"),
          ($"n_chars" / 256.0d).as("x1"),
          (size(split($"text", " ")) / 64.0d).as("x2")).cache()
        try {
          val w = trainW3(s, f2)
          val scored = f2.select($"y",
            when(round(lit(1.0d) / (lit(1.0d) + exp(-(lit(w(0)) * $"x0" +
              lit(w(1)) * $"x1" + lit(w(2)) * $"x2"))), 6) >= 0.5d, 1.0d)
              .otherwise(0.0d).as("yhat"))
          scored.agg(
              sum(when($"y" === 1.0d && $"yhat" === 1.0d, 1L).otherwise(0L)).as("tp"),
              sum(when($"y" === 0.0d && $"yhat" === 1.0d, 1L).otherwise(0L)).as("fp"),
              sum(when($"y" === 1.0d && $"yhat" === 0.0d, 1L).otherwise(0L)).as("fn"),
              sum(when($"y" === 0.0d && $"yhat" === 0.0d, 1L).otherwise(0L)).as("tn"))
            .select($"tp", $"fp", $"fn", $"tn",
              round(($"tp" + $"tn") / ($"tp" + $"fp" + $"fn" + $"tn").cast("double"), 6)
                .as("po"),
              round((($"tp" + $"fn") * ($"tp" + $"fp") + ($"fp" + $"tn") * ($"fn" + $"tn"))
                / (($"tp" + $"fp" + $"fn" + $"tn") * ($"tp" + $"fp" + $"fn" + $"tn"))
                  .cast("double"), 6).as("pe"))
            .withColumn("kappa", round(($"po" - $"pe") / (lit(1.0d) - $"pe"), 6))
        } finally f2.unpersist()
      },
      Some(s"""WITH feat AS ($featsSql),
             |$gdChainSql,
             |scored AS (
             |  SELECT f.y,
             |    CASE WHEN round(1/(1+exp(-(w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2))), 6)
             |      >= 0.5 THEN 1.0 ELSE 0.0 END AS yhat
             |  FROM feat f, w3 w),
             |cm AS (
             |  SELECT
             |    CAST(sum(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             |    CAST(sum(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             |    CAST(sum(CASE WHEN y = 1 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             |    CAST(sum(CASE WHEN y = 0 AND yhat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
             |  FROM scored),
             |rates AS (
             |  SELECT tp, fp, fn, tn,
             |    round((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS po,
             |    round(((tp + fn) * (tp + fp) + (fp + tn) * (fn + tn))
             |      / CAST((tp + fp + fn + tn) * (tp + fp + fn + tn) AS DOUBLE), 6) AS pe
             |  FROM cm)
             |SELECT tp, fp, fn, tn, po, pe,
             |  round((po - pe) / (1.0 - pe), 6) AS kappa
             |FROM rates""".stripMargin)),

    // Ridge regression in closed form: ŷ = n_chars/256 from the token
    // count and the sentence-punctuation count, solved from the normal
    // equations (XᵀX + λI)w = Xᵀy with λ = 1. ONE aggregation scan
    // yields the 6 distinct XᵀX entries + 3 Xᵀy entries (d=3; the Gram
    // matrix is d², never n²); each is rounded to 6 dp so both engines
    // run Cramer's rule on bit-identical inputs, making the division
    // chain itself deterministic. This is the degree-bounded sibling of
    // the reference's driver-side OLS (`Tare.scala:119-160`), with the
    // sample-and-solve replaced by an exact full-data Gram aggregate.
    Q("q210_ridge_normal_eq",
      (s, d) => {
        import s.implicits._
        val f = Tables.documents(s, d).select(
          ($"n_chars" / 256.0d).as("y"),
          lit(1.0d).as("x0"),
          (size(split($"text", " ")) / 64.0d).as("x1"),
          (length(regexp_replace($"text", "[^.!?,;]", "")) / 8.0d).as("x2"))
        val m = f.agg(
          round(sum($"x0" * $"x0"), 6), round(sum($"x0" * $"x1"), 6),
          round(sum($"x0" * $"x2"), 6), round(sum($"x1" * $"x1"), 6),
          round(sum($"x1" * $"x2"), 6), round(sum($"x2" * $"x2"), 6),
          round(sum($"x0" * $"y"), 6), round(sum($"x1" * $"y"), 6),
          round(sum($"x2" * $"y"), 6)).head()
        val lam = 1.0d
        val (a00, a01, a02) = (m.getDouble(0) + lam, m.getDouble(1), m.getDouble(2))
        val (a11, a12, a22) = (m.getDouble(3) + lam, m.getDouble(4), m.getDouble(5) + lam)
        val (b0, b1, b2) = (m.getDouble(6), m.getDouble(7), m.getDouble(8))
        // Cramer's rule on the symmetric 3×3 system — identical formula
        // text in the oracle, so identical IEEE operation tree.
        val det = a00 * (a11 * a22 - a12 * a12) - a01 * (a01 * a22 - a12 * a02) +
          a02 * (a01 * a12 - a11 * a02)
        val w0 = (b0 * (a11 * a22 - a12 * a12) - a01 * (b1 * a22 - a12 * b2) +
          a02 * (b1 * a12 - a11 * b2)) / det
        val w1 = (a00 * (b1 * a22 - b2 * a12) - b0 * (a01 * a22 - a12 * a02) +
          a02 * (a01 * b2 - b1 * a02)) / det
        val w2 = (a00 * (a11 * b2 - a12 * b1) - a01 * (a01 * b2 - b1 * a02) +
          b0 * (a01 * a12 - a11 * a02)) / det
        val rnd = (v: Double) =>
          BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        import s.implicits._
        Seq((rnd(w0), rnd(w1), rnd(w2))).toDF("w0", "w1", "w2")
      },
      Some("""WITH f AS (
             |  SELECT n_chars / 256.0 AS y, 1.0 AS x0,
             |    len(string_split(text, ' ')) / 64.0 AS x1,
             |    length(regexp_replace(text, '[^.!?,;]', '', 'g')) / 8.0 AS x2
             |  FROM documents),
             |m AS (
             |  SELECT round(sum(x0*x0), 6) + 1.0 AS a00, round(sum(x0*x1), 6) AS a01,
             |    round(sum(x0*x2), 6) AS a02, round(sum(x1*x1), 6) + 1.0 AS a11,
             |    round(sum(x1*x2), 6) AS a12, round(sum(x2*x2), 6) + 1.0 AS a22,
             |    round(sum(x0*y), 6) AS b0, round(sum(x1*y), 6) AS b1,
             |    round(sum(x2*y), 6) AS b2
             |  FROM f),
             |sol AS (
             |  SELECT
             |    a00 * (a11*a22 - a12*a12) - a01 * (a01*a22 - a12*a02)
             |      + a02 * (a01*a12 - a11*a02) AS det,
             |    b0 * (a11*a22 - a12*a12) - a01 * (b1*a22 - a12*b2)
             |      + a02 * (b1*a12 - a11*b2) AS n0,
             |    a00 * (b1*a22 - b2*a12) - b0 * (a01*a22 - a12*a02)
             |      + a02 * (a01*b2 - b1*a02) AS n1,
             |    a00 * (a11*b2 - a12*b1) - a01 * (a01*b2 - b1*a02)
             |      + b0 * (a01*a12 - a11*a02) AS n2
             |  FROM m)
             |SELECT round(n0 / det, 6) AS w0, round(n1 / det, 6) AS w1,
             |  round(n2 / det, 6) AS w2 FROM sol""".stripMargin))
  )
}
