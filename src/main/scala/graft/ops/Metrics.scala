package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Model-evaluation and governance metrics for a training-data pipeline:
  * ranking quality (AUC, NDCG), probability calibration, distributional
  * privacy (t-closeness), consistent sampling, and phrase retrieval.
  *
  * Shared scale discipline: every metric aggregates the fact table to a
  * bounded summary FIRST (a score histogram, a per-bin contingency table,
  * a per-group k-entry state) and only then runs the windowed/quadratic
  * part on that summary — the 100 TB cost is always one scan plus a
  * histogram-sized epilogue, never a global per-row sort.
  */
object Metrics {

  /** 52-bit md5 uniform hash as a BIGINT — deterministic, engine-portable
    * (DuckDB mirror: `('0x' || substr(md5(x),1,13))::BIGINT`). */
  private def mdLong(seedSql: String): String =
    s"cast(conv(substring(md5($seedSql), 1, 13), 16, 10) as bigint)"

  val queries: Seq[Q] = Seq(

    // Exact ROC AUC of a quality predictor (doc length) for a binary
    // label (lang = 'en'), via the tie-corrected Mann–Whitney rank-sum —
    // WITHOUT ranking individual rows. The corpus collapses to a score
    // histogram (one groupBy scan; at 100 TB the histogram is |distinct
    // scores|, and an unbounded score domain would be bucketed first),
    // then a running sum over the ORDERED HISTOGRAM supplies the
    // below-score negative mass: 2·U = Σ_s pos_s·(2·cumneg_<s + neg_s).
    // All terms are exact integers, so both engines divide the same
    // numerator — no summation-order drift inside the rounded value.
    Q("q194_auc",
      (s, d) => {
        import s.implicits._
        val hist = Tables.documents(s, d)
          .select($"n_chars".as("score"),
            when($"lang" === "en", 1L).otherwise(0L).as("y"))
          .groupBy($"score")
          .agg(sum($"y").as("pos"), (count(lit(1)) - sum($"y")).as("neg"))
        val w = Window.orderBy($"score")
          .rowsBetween(Window.unboundedPreceding, -1)
        hist
          .withColumn("cumneg", coalesce(sum($"neg").over(w), lit(0L)))
          .agg(sum($"pos").as("n_pos"), sum($"neg").as("n_neg"),
            sum($"pos" * ($"cumneg" * 2 + $"neg")).as("u2"))
          .select($"n_pos", $"n_neg",
            round($"u2" / ($"n_pos" * $"n_neg" * 2.0), 6).as("auc"))
      },
      Some("""WITH lab AS (
             |  SELECT n_chars AS score,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |hist AS (
             |  SELECT score, sum(y) AS pos, count(*) - sum(y) AS neg
             |  FROM lab GROUP BY 1),
             |cum AS (
             |  SELECT pos, neg,
             |    coalesce(sum(neg) OVER (ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
             |  FROM hist)
             |SELECT CAST(sum(pos) AS BIGINT) AS n_pos,
             |  CAST(sum(neg) AS BIGINT) AS n_neg,
             |  round(sum(pos * (2 * cumneg + neg))
             |    / (sum(pos) * sum(neg) * 2.0), 6) AS auc
             |FROM cum""".stripMargin)),

    // t-closeness — the distributional upgrade of k-anonymity (q171) /
    // l-diversity (q192): for each quasi-identifier group, the total
    // variation distance between its sensitive-attribute distribution
    // (account-balance band) and the global one. TVD is computed on
    // EXACT integer cross products — |n_gb·N − n_b·n_g| — summed before
    // the single division, so the 6-dp rounding sees bit-identical
    // doubles in both engines. Cost at 100 TB: one (group, band) count
    // scan; the TVD epilogue is |groups|·|bands|.
    Q("q195_t_closeness",
      (s, d) => {
        import s.implicits._
        val bands = Tables.customer(s, d)
          .select($"c_mktsegment".as("seg"),
            floor($"c_acctbal" / 2000.0).cast("long").as("band"))
        val gb = bands.groupBy($"seg", $"band").agg(count(lit(1)).as("n_gb"))
        val g = bands.groupBy($"seg").agg(count(lit(1)).as("n_g"))
        val b = bands.groupBy($"band").agg(count(lit(1)).as("n_b"))
        val n = bands.agg(count(lit(1)).as("n_all"))
        g.crossJoin(broadcast(b))
          .join(gb, Seq("seg", "band"), "left")
          .crossJoin(broadcast(n))
          .select($"seg", $"n_g", $"n_all",
            abs(coalesce($"n_gb", lit(0L)) * $"n_all" - $"n_b" * $"n_g").as("num"))
          .groupBy($"seg", $"n_g", $"n_all")
          .agg(sum($"num").as("num_sum"))
          .select($"seg", $"n_g".as("group_size"),
            round($"num_sum" / ($"n_g" * $"n_all" * 2.0), 6).as("t"))
          .orderBy($"seg")
      },
      Some("""WITH bands AS (
             |  SELECT c_mktsegment AS seg,
             |    CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band
             |  FROM customer),
             |gb AS (SELECT seg, band, count(*) AS n_gb FROM bands GROUP BY 1, 2),
             |g AS (SELECT seg, count(*) AS n_g FROM bands GROUP BY 1),
             |b AS (SELECT band, count(*) AS n_b FROM bands GROUP BY 1),
             |n AS (SELECT count(*) AS n_all FROM bands),
             |tv AS (
             |  SELECT g.seg, g.n_g, n.n_all,
             |    abs(coalesce(gb.n_gb, 0) * n.n_all - b.n_b * g.n_g) AS num
             |  FROM g CROSS JOIN b CROSS JOIN n
             |  LEFT JOIN gb ON gb.seg = g.seg AND gb.band = b.band)
             |SELECT seg, n_g AS group_size,
             |  round(sum(num) / (n_g * n_all * 2.0), 6) AS t
             |FROM tv GROUP BY seg, n_g, n_all ORDER BY seg""".stripMargin)),

    // Consistent per-group sampling with BOUNDED state: the k docs per
    // language with the smallest md5 hash — the reproducible "same docs
    // every run, every engine" sample a curation pipeline pins its eval
    // sets with. Uses the TopKAggregator UDAF (score = negated hash), so
    // the shuffle carries at most k entries per (partition, language)
    // instead of sorting the corpus inside 5 giant hash partitions — the
    // window formulation the oracle uses IS the expensive shape this
    // replaces.
    Q("q196_group_sample",
      (s, d) => {
        import s.implicits._
        val top8 = udaf(new graft.functions.TopKAggregator(8))
        Tables.documents(s, d)
          .select($"lang",
            (-expr(mdLong("concat('smp:', doc_id)"))).as("score"), $"doc_id")
          .groupBy($"lang")
          .agg(top8($"score", $"doc_id").as("top"))
          .select($"lang", posexplode(arrays_zip($"top.scores", $"top.ids")))
          .select($"lang", ($"pos" + 1).cast("long").as("rank"),
            $"col.ids".as("doc_id"), (-$"col.scores").as("h"))
          .orderBy($"lang", $"rank")
      },
      Some("""WITH h AS (
             |  SELECT lang, doc_id,
             |    ('0x' || substr(md5('smp:' || doc_id), 1, 13))::BIGINT AS h
             |  FROM documents),
             |r AS (
             |  SELECT lang, doc_id, h,
             |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rank
             |  FROM h)
             |SELECT lang, rank, doc_id, h
             |FROM r WHERE rank <= 8 ORDER BY lang, rank""".stripMargin)),

    // Positional phrase search — exact "fast table" retrieval through an
    // inverted POSITIONAL index, the retrieval shape RAG/eval tooling
    // runs over a corpus: tokenize once to (doc, pos, term), keep only
    // the two query terms' posting lists (predicate pushdown prunes the
    // token stream before any shuffle), and equi-join them on
    // (doc, pos+1). At 100 TB the join touches two posting lists, not
    // the corpus — never a scan-squared.
    Q("q197_phrase_search",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
        val first = toks.filter($"w" === "fast").select($"doc_id", $"pos")
        val second = toks.filter($"w" === "table")
          .select($"doc_id", ($"pos" - 1).as("pos"))
        first.join(second, Seq("doc_id", "pos"))
          .groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
          .join(Tables.documents(s, d).select($"doc_id", $"lang", $"source"), "doc_id")
          .select($"doc_id", $"lang", $"source", $"n_hits")
          .orderBy($"n_hits".desc, $"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             |    generate_subscripts(string_split(text, ' '), 1) AS pos
             |  FROM documents),
             |hits AS (
             |  SELECT a.doc_id, count(*) AS n_hits
             |  FROM t a JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
             |  WHERE a.w = 'fast' AND b.w = 'table'
             |  GROUP BY 1)
             |SELECT h.doc_id, d.lang, d.source, h.n_hits
             |FROM hits h JOIN documents d USING (doc_id)
             |ORDER BY n_hits DESC, doc_id""".stripMargin)),

    // Label-centroid similarity matrix — the corpus-level "which classes
    // overlap in embedding space" map that guides cluster merging and
    // hard-negative mining. The 100 TB reduction is one partial-agg mean
    // per (label, dim); the pairwise part runs on |labels|² centroid
    // rows. Centroid components are rounded to 6 dp BEFORE the pairwise
    // dot so partial-sum order cannot leak into the compared value.
    Q("q198_centroid_sim",
      (s, d) => {
        import s.implicits._
        val cent = Tables.embeddings(s, d)
          .select($"label", posexplode($"embedding").as(Seq("i", "v")))
          .groupBy($"label", $"i")
          .agg(round(avg($"v".cast("double")), 6).as("c"))
        val nrm = cent.groupBy($"label")
          .agg(sqrt(sum($"c" * $"c")).as("nrm"))
        val a = cent.select($"label".as("la"), $"i", $"c".as("ca"))
        val b = cent.select($"label".as("lb"), $"i", $"c".as("cb"))
        a.join(b, "i").filter($"la" < $"lb")
          .groupBy($"la", $"lb").agg(sum($"ca" * $"cb").as("dot"))
          .join(nrm.select($"label".as("la"), $"nrm".as("na")), "la")
          .join(nrm.select($"label".as("lb"), $"nrm".as("nb")), "lb")
          .select($"la", $"lb", round($"dot" / ($"na" * $"nb"), 4).as("cosine"))
          .orderBy($"la", $"lb")
      },
      Some("""WITH e AS (
             |  SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
             |    generate_subscripts(embedding, 1) AS i
             |  FROM embeddings),
             |cent AS (
             |  SELECT label, i, round(avg(v), 6) AS c FROM e GROUP BY 1, 2),
             |nrm AS (SELECT label, sqrt(sum(c * c)) AS nrm FROM cent GROUP BY 1),
             |dots AS (
             |  SELECT a.label AS la, b.label AS lb, sum(a.c * b.c) AS dot
             |  FROM cent a JOIN cent b USING (i) WHERE a.label < b.label
             |  GROUP BY 1, 2)
             |SELECT la, lb, round(dot / (na.nrm * nb.nrm), 4) AS cosine
             |FROM dots JOIN nrm na ON na.label = la JOIN nrm nb ON nb.label = lb
             |ORDER BY la, lb""".stripMargin)),

    // Calibration audit (reliability diagram) of a histogram classifier:
    // train on even doc_ids the per-length-band empirical P(lang='en'),
    // evaluate on odd doc_ids — per band: predicted vs observed rate and
    // the gap. Every reported value is a ratio of exact integer counts
    // (then a subtraction of two already-rounded doubles), so no
    // summation-order sensitivity anywhere. One conditional-aggregation
    // scan per split at any scale.
    Q("q199_calibration",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select($"doc_id", least(lit(7L), ($"n_chars" / 64).cast("long")).as("band"),
            when($"lang" === "en", 1L).otherwise(0L).as("y"))
        val train = docs.filter($"doc_id" % 2 === 0)
          .groupBy($"band")
          .agg(count(lit(1)).as("n_train"), sum($"y").as("pos_train"))
        val test = docs.filter($"doc_id" % 2 === 1)
          .groupBy($"band")
          .agg(count(lit(1)).as("n_test"), sum($"y").as("pos_test"))
        train.join(test, Seq("band"))
          .select($"band", $"n_train", $"n_test",
            round($"pos_train" / $"n_train".cast("double"), 6).as("pred_p"),
            round($"pos_test" / $"n_test".cast("double"), 6).as("obs_p"))
          .withColumn("gap", round($"pred_p" - $"obs_p", 6))
          .orderBy($"band")
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, least(7, n_chars // 64) AS band,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             |  FROM documents),
             |train AS (
             |  SELECT band, count(*) AS n_train, sum(y) AS pos_train
             |  FROM docs WHERE doc_id % 2 = 0 GROUP BY 1),
             |test AS (
             |  SELECT band, count(*) AS n_test, sum(y) AS pos_test
             |  FROM docs WHERE doc_id % 2 = 1 GROUP BY 1),
             |j AS (
             |  SELECT band, n_train, n_test,
             |    round(pos_train / CAST(n_train AS DOUBLE), 6) AS pred_p,
             |    round(pos_test / CAST(n_test AS DOUBLE), 6) AS obs_p
             |  FROM train JOIN test USING (band))
             |SELECT band, n_train, n_test, pred_p, obs_p,
             |  round(pred_p - obs_p, 6) AS gap
             |FROM j ORDER BY band""".stripMargin)),

    // NDCG@5 ranking fidelity of int8 quantization (q52's absmax codes):
    // does the compressed form a 100 TB serving tier actually stores
    // preserve the float ranking? Per query-panel vector: rank neighbors
    // by QUANTIZED cosine, score each position by the EXACT cosine's
    // graded gain ((c+1)/2 ∈ [0,1]), discount by 1/log2(rank+1), and
    // normalize by the ideal (exact-ranking) DCG. Both rankings come
    // from the same one-pass dot products against the broadcast 8-query
    // panel — the quadratic part is |panel|·|corpus|, never corpus².
    Q("q200_quantized_ndcg",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        val coded = e.select($"vec_id", $"embedding",
          expr("""transform(embedding, x ->
                 |  cast(floor(cast(x as double) * 127 /
                 |    greatest(aggregate(embedding, cast(0.0 as double),
                 |      (a, v) -> greatest(a, abs(cast(v as double)))), 1e-30d)
                 |    + 0.5) as bigint))""".stripMargin).as("codes"))
          .withColumn("fn", Similarity.norm($"embedding"))
          .withColumn("qn", sqrt(expr(
            "aggregate(codes, 0L, (a, x) -> a + x * x)").cast("double")))
          .cache()
        val q = coded.filter($"vec_id" < 8)
          .select($"vec_id".as("qid"), $"embedding".as("qe"), $"codes".as("qc"),
            $"fn".as("qfn"), $"qn".as("qqn"))
        val pairs = coded
          .select($"vec_id".as("did"), $"embedding".as("de"), $"codes".as("dc"),
            $"fn".as("dfn"), $"qn".as("dqn"))
          .crossJoin(broadcast(q))
          .filter($"did" =!= $"qid")
          .select($"qid", $"did",
            round(Similarity.dot($"qe", $"de") / ($"qfn" * $"dfn"), 4).as("c"),
            round(expr("aggregate(zip_with(qc, dc, (x, y) -> x * y), 0L, (a, v) -> a + v)")
              .cast("double") / ($"qqn" * $"dqn"), 4).as("cq"))
        val exactW = Window.partitionBy($"qid").orderBy($"c".desc, $"did")
        val quantW = Window.partitionBy($"qid").orderBy($"cq".desc, $"did")
        val ranked = pairs
          .withColumn("er", row_number().over(exactW))
          .withColumn("qr", row_number().over(quantW))
          .withColumn("gain", ($"c" + 1.0) / 2.0)
        // both discounted sums in ONE grouped pass (conditional agg) —
        // a dcg⋈idcg self-join would recompute the whole ranked subtree
        ranked
          .groupBy($"qid")
          .agg(sum(when($"qr" <= 5, $"gain" / log2($"qr" + 1.0))).as("dcg"),
            sum(when($"er" <= 5, $"gain" / log2($"er" + 1.0))).as("idcg"))
          .select($"qid", round($"dcg", 4).as("dcg"), round($"idcg", 4).as("idcg"),
            round($"dcg" / $"idcg", 4).as("ndcg"))
          .orderBy($"qid")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             |    generate_subscripts(embedding, 1) AS i
             |  FROM embeddings),
             |scl AS (SELECT vec_id, greatest(max(abs(v)), 1e-30) AS scale
             |        FROM e GROUP BY 1),
             |codes AS (
             |  SELECT e.vec_id, e.i,
             |    CAST(floor(e.v * 127 / s.scale + 0.5) AS BIGINT) AS cd
             |  FROM e JOIN scl s USING (vec_id)),
             |fn AS (SELECT vec_id, sqrt(sum(v * v)) AS fn FROM e GROUP BY 1),
             |qn AS (SELECT vec_id, sqrt(CAST(sum(cd * cd) AS DOUBLE)) AS qn
             |       FROM codes GROUP BY 1),
             |fdots AS (
             |  SELECT q.vec_id AS qid, x.vec_id AS did, sum(q.v * x.v) AS dot
             |  FROM e q JOIN e x USING (i)
             |  WHERE q.vec_id < 8 AND x.vec_id != q.vec_id GROUP BY 1, 2),
             |qdots AS (
             |  SELECT q.vec_id AS qid, x.vec_id AS did,
             |    CAST(sum(q.cd * x.cd) AS DOUBLE) AS qdot
             |  FROM codes q JOIN codes x USING (i)
             |  WHERE q.vec_id < 8 AND x.vec_id != q.vec_id GROUP BY 1, 2),
             |pairs AS (
             |  SELECT f.qid, f.did,
             |    round(f.dot / (fq.fn * fd.fn), 4) AS c,
             |    round(qd.qdot / (nq.qn * nd.qn), 4) AS cq
             |  FROM fdots f
             |  JOIN qdots qd ON qd.qid = f.qid AND qd.did = f.did
             |  JOIN fn fq ON fq.vec_id = f.qid JOIN fn fd ON fd.vec_id = f.did
             |  JOIN qn nq ON nq.vec_id = f.qid JOIN qn nd ON nd.vec_id = f.did),
             |ranked AS (
             |  SELECT qid, did, c, cq,
             |    row_number() OVER (PARTITION BY qid ORDER BY c DESC, did) AS er,
             |    row_number() OVER (PARTITION BY qid ORDER BY cq DESC, did) AS qr,
             |    (c + 1.0) / 2.0 AS gain
             |  FROM pairs),
             |dcg AS (
             |  SELECT qid, sum(gain / log2(qr + 1.0)) AS dcg
             |  FROM ranked WHERE qr <= 5 GROUP BY 1),
             |idcg AS (
             |  SELECT qid, sum(gain / log2(er + 1.0)) AS idcg
             |  FROM ranked WHERE er <= 5 GROUP BY 1)
             |SELECT qid, round(dcg, 4) AS dcg, round(idcg, 4) AS idcg,
             |  round(dcg / idcg, 4) AS ndcg
             |FROM dcg JOIN idcg USING (qid) ORDER BY qid""".stripMargin)),

    // Matryoshka truncation audit — MRL-style embeddings are stored full
    // width but SERVED truncated; this measures what a 100 TB serving
    // tier loses by reading only the first 16/32 of 64 dims: top-5
    // overlap between the truncated-cosine and full-cosine rankings per
    // panel query. One pass computes all three dot products against the
    // broadcast 8-query panel (|panel|·|corpus|, never corpus²);
    // cosines round to 4 dp BEFORE ranking, ties break on did.
    Q("q218_matryoshka",
      (s, d) => {
        import s.implicits._
        def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          round(Similarity.dot(a, b) / (Similarity.norm(a) * Similarity.norm(b)), 4)
        val e = Tables.embeddings(s, d).select($"vec_id", $"embedding")
        val q = e.filter($"vec_id" < 8)
          .select($"vec_id".as("qid"), $"embedding".as("qe"))
        val pairs = e.select($"vec_id".as("did"), $"embedding".as("de"))
          .crossJoin(broadcast(q))
          .filter($"did" =!= $"qid")
          .select($"qid", $"did",
            cos($"qe", $"de").as("c"),
            cos(expr("slice(qe, 1, 32)"), expr("slice(de, 1, 32)")).as("c32"),
            cos(expr("slice(qe, 1, 16)"), expr("slice(de, 1, 16)")).as("c16"))
        def rk(c: org.apache.spark.sql.Column) = row_number().over(
          Window.partitionBy($"qid").orderBy(c.desc, $"did"))
        pairs
          .withColumn("er", rk($"c"))
          .withColumn("r32", rk($"c32"))
          .withColumn("r16", rk($"c16"))
          .groupBy($"qid")
          .agg(sum(when($"er" <= 5 && $"r32" <= 5, 1L).otherwise(0L)).as("overlap32"),
            sum(when($"er" <= 5 && $"r16" <= 5, 1L).otherwise(0L)).as("overlap16"))
          .orderBy($"qid")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             |    generate_subscripts(embedding, 1) AS i
             |  FROM embeddings),
             |nf AS (SELECT vec_id, sqrt(sum(v * v)) AS nn FROM e GROUP BY 1),
             |n32 AS (SELECT vec_id, sqrt(sum(v * v)) AS nn FROM e WHERE i <= 32 GROUP BY 1),
             |n16 AS (SELECT vec_id, sqrt(sum(v * v)) AS nn FROM e WHERE i <= 16 GROUP BY 1),
             |df AS (
             |  SELECT q.vec_id AS qid, x.vec_id AS did, sum(q.v * x.v) AS dot
             |  FROM e q JOIN e x USING (i)
             |  WHERE q.vec_id < 8 AND x.vec_id != q.vec_id GROUP BY 1, 2),
             |d32 AS (
             |  SELECT q.vec_id AS qid, x.vec_id AS did, sum(q.v * x.v) AS dot
             |  FROM e q JOIN e x USING (i)
             |  WHERE q.vec_id < 8 AND x.vec_id != q.vec_id AND q.i <= 32 AND x.i <= 32
             |  GROUP BY 1, 2),
             |d16 AS (
             |  SELECT q.vec_id AS qid, x.vec_id AS did, sum(q.v * x.v) AS dot
             |  FROM e q JOIN e x USING (i)
             |  WHERE q.vec_id < 8 AND x.vec_id != q.vec_id AND q.i <= 16 AND x.i <= 16
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT f.qid, f.did,
             |    round(f.dot / (qa.nn * qb.nn), 4) AS c,
             |    round(a32.dot / (pa.nn * pb.nn), 4) AS c32,
             |    round(a16.dot / (sa.nn * sb.nn), 4) AS c16
             |  FROM df f
             |  JOIN d32 a32 ON a32.qid = f.qid AND a32.did = f.did
             |  JOIN d16 a16 ON a16.qid = f.qid AND a16.did = f.did
             |  JOIN nf qa ON qa.vec_id = f.qid JOIN nf qb ON qb.vec_id = f.did
             |  JOIN n32 pa ON pa.vec_id = f.qid JOIN n32 pb ON pb.vec_id = f.did
             |  JOIN n16 sa ON sa.vec_id = f.qid JOIN n16 sb ON sb.vec_id = f.did),
             |ranked AS (
             |  SELECT qid, did,
             |    row_number() OVER (PARTITION BY qid ORDER BY c DESC, did) AS er,
             |    row_number() OVER (PARTITION BY qid ORDER BY c32 DESC, did) AS r32,
             |    row_number() OVER (PARTITION BY qid ORDER BY c16 DESC, did) AS r16
             |  FROM pairs)
             |SELECT qid,
             |  CAST(sum(CASE WHEN er <= 5 AND r32 <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS overlap32,
             |  CAST(sum(CASE WHEN er <= 5 AND r16 <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS overlap16
             |FROM ranked GROUP BY qid ORDER BY qid""".stripMargin)),

    // Single-linkage dendrogram over the label centroids — hierarchical
    // clustering's merge order equals Prim's MST edge order, so the
    // "which classes fuse first" map comes out as 9 greedy edge picks
    // over the 45-entry centroid distance matrix. The 100 TB reduction
    // is the same one as q198 (one partial-agg mean per (label, dim));
    // the MST runs driver-side on the |labels|² matrix — bounded data,
    // the q210/Tare driver-solve pattern. The oracle unrolls Prim: one
    // CTE pair per step, tree membership as a growing list, ties broken
    // (w, la, lb). Distances are Euclidean over 6-dp centroids, rounded
    // to 6 dp, so both engines pick among identical doubles.
    Q("q225_centroid_mst",
      (s, d) => {
        import s.implicits._
        val cent = Tables.embeddings(s, d)
          .select($"label", posexplode($"embedding").as(Seq("i", "v")))
          .groupBy($"label", $"i")
          .agg(round(avg($"v".cast("double")), 6).as("c"))
        val a = cent.select($"label".as("la"), $"i", $"c".as("ca"))
        val b = cent.select($"label".as("lb"), $"i", $"c".as("cb"))
        val dist = a.join(b, "i").filter($"la" < $"lb")
          .groupBy($"la", $"lb")
          .agg(round(sqrt(sum(($"ca" - $"cb") * ($"ca" - $"cb"))), 6).as("w"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        val nodes = dist.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        var tree = Set(nodes.min)
        val picks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
        var step = 1L
        while (tree.size < nodes.length) {
          val cand = dist.filter(e => tree.contains(e._1) != tree.contains(e._2))
          val (la, lb, w) = cand.minBy(e => (e._3, e._1, e._2))
          picks += ((step, la.toLong, lb.toLong, w))
          tree += (if (tree.contains(la)) lb else la)
          step += 1
        }
        s.createDataFrame(picks.toSeq).toDF("step", "la", "lb", "w")
          .orderBy($"step")
      },
      Some {
        val steps = (1 to 9).map { k =>
          s"""s$k AS (
             |  SELECT d.la, d.lb, d.w FROM dist d, t${k - 1}
             |  WHERE list_contains(t${k - 1}.t, d.la) != list_contains(t${k - 1}.t, d.lb)
             |  ORDER BY d.w, d.la, d.lb LIMIT 1),
             |t$k AS (
             |  SELECT list_append(t${k - 1}.t,
             |    CASE WHEN list_contains(t${k - 1}.t, s$k.la) THEN s$k.lb ELSE s$k.la END) AS t
             |  FROM t${k - 1}, s$k)""".stripMargin
        }.mkString(",\n")
        val union = (1 to 9).map(k =>
          s"SELECT $k AS step, CAST(la AS BIGINT) AS la, CAST(lb AS BIGINT) AS lb, w FROM s$k")
          .mkString("\nUNION ALL ")
        s"""WITH e AS (
           |  SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
           |    generate_subscripts(embedding, 1) AS i
           |  FROM embeddings),
           |cent AS (SELECT label, i, round(avg(v), 6) AS c FROM e GROUP BY 1, 2),
           |dist AS (
           |  SELECT a.label AS la, b.label AS lb,
           |    round(sqrt(sum((a.c - b.c) * (a.c - b.c))), 6) AS w
           |  FROM cent a JOIN cent b USING (i) WHERE a.label < b.label
           |  GROUP BY 1, 2),
           |t0 AS (SELECT [(SELECT min(label) FROM cent)] AS t),
           |$steps
           |$union
           |ORDER BY step""".stripMargin
      }),

    // Per-dimension standardization (whitening-lite) and its effect on
    // similarity: anisotropic embeddings make cosine concentrate (the
    // "all vectors look alike" failure); standardizing each dim to
    // zero-mean/unit-variance is the one-pass fix a 100 TB pipeline can
    // afford (diagonal whitening — no covariance matrix, no eigen
    // decomposition; stats are one partial-agg scan over (dim, value)).
    // Reported per panel query: mean cosine to the corpus before vs
    // after, and the concentration drop. Stats round to 6 dp before the
    // rescale so both engines standardize with identical constants.
    Q("q228_whitening",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
          .select($"vec_id", posexplode($"embedding").as(Seq("i", "v")))
          .select($"vec_id", $"i", $"v".cast("double").as("v"))
        val stats = e.groupBy($"i").agg(
          round(avg($"v"), 6).as("mu"),
          round(greatest(stddev_pop($"v"), lit(1e-9d)), 6).as("sd"))
        val w = e.join(broadcast(stats), "i")
          .select($"vec_id", $"i", $"v", (($"v" - $"mu") / $"sd").as("z"))
        val norms = w.groupBy($"vec_id").agg(
          sqrt(sum($"v" * $"v")).as("nv"), sqrt(sum($"z" * $"z")).as("nz"))
        val q = w.filter($"vec_id" < 8)
          .select($"vec_id".as("qid"), $"i", $"v".as("qv"), $"z".as("qz"))
        val dots = w.join(q, "i")
          .filter($"vec_id" =!= $"qid")
          .groupBy($"qid", $"vec_id")
          .agg(sum($"qv" * $"v").as("dv"), sum($"qz" * $"z").as("dz"))
        dots
          .join(norms, "vec_id")
          .join(norms.select($"vec_id".as("qid"), $"nv".as("qnv"), $"nz".as("qnz")),
            "qid")
          .groupBy($"qid")
          .agg(round(avg($"dv" / ($"qnv" * $"nv")), 4).as("mean_cos_raw"),
            round(avg($"dz" / ($"qnz" * $"nz")), 4).as("mean_cos_white"))
          .withColumn("concentration_drop",
            round($"mean_cos_raw" - $"mean_cos_white", 4))
          .orderBy($"qid")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
             |    generate_subscripts(embedding, 1) AS i
             |  FROM embeddings),
             |stats AS (
             |  SELECT i, round(avg(v), 6) AS mu,
             |    round(greatest(stddev_pop(v), 1e-9), 6) AS sd
             |  FROM e GROUP BY 1),
             |w AS (
             |  SELECT e.vec_id, e.i, e.v, (e.v - s.mu) / s.sd AS z
             |  FROM e JOIN stats s USING (i)),
             |norms AS (
             |  SELECT vec_id, sqrt(sum(v * v)) AS nv, sqrt(sum(z * z)) AS nz
             |  FROM w GROUP BY 1),
             |dots AS (
             |  SELECT q.vec_id AS qid, x.vec_id, sum(q.v * x.v) AS dv,
             |    sum(q.z * x.z) AS dz
             |  FROM w q JOIN w x USING (i)
             |  WHERE q.vec_id < 8 AND x.vec_id != q.vec_id
             |  GROUP BY 1, 2),
             |cos AS (
             |  SELECT d.qid,
             |    d.dv / (qn.nv * xn.nv) AS cr, d.dz / (qn.nz * xn.nz) AS cw
             |  FROM dots d
             |  JOIN norms qn ON qn.vec_id = d.qid
             |  JOIN norms xn ON xn.vec_id = d.vec_id)
             |SELECT qid, round(avg(cr), 4) AS mean_cos_raw,
             |  round(avg(cw), 4) AS mean_cos_white,
             |  round(round(avg(cr), 4) - round(avg(cw), 4), 4) AS concentration_drop
             |FROM cos GROUP BY qid ORDER BY qid""".stripMargin)),

    // Embedding drift per label — split each label's vectors into two
    // deterministic halves (vec_id parity, standing in for two ingest
    // epochs) and report the cosine between the half-centroids: a
    // retrained or drifted encoder shows up as sub-1 self-similarity
    // before any downstream index degrades. One partial-agg mean per
    // (label, half, dim); the comparison is |labels| rows.
    Q("q237_embed_drift",
      (s, d) => {
        import s.implicits._
        val cent = Tables.embeddings(s, d)
          .select($"label", ($"vec_id" % 2).as("half"),
            posexplode($"embedding").as(Seq("i", "v")))
          .groupBy($"label", $"half", $"i")
          .agg(round(avg($"v".cast("double")), 6).as("c"))
        val a = cent.filter($"half" === 0)
          .select($"label", $"i", $"c".as("ca"))
        val b = cent.filter($"half" === 1)
          .select($"label", $"i", $"c".as("cb"))
        a.join(b, Seq("label", "i"))
          .groupBy($"label")
          .agg(sum($"ca" * $"cb").as("dot"),
            sqrt(sum($"ca" * $"ca")).as("na"), sqrt(sum($"cb" * $"cb")).as("nb"))
          .select($"label",
            round($"dot" / ($"na" * $"nb"), 6).as("self_cosine"))
          .orderBy($"label")
      },
      Some("""WITH e AS (
             |  SELECT label, vec_id % 2 AS half,
             |    CAST(unnest(embedding) AS DOUBLE) AS v,
             |    generate_subscripts(embedding, 1) AS i
             |  FROM embeddings),
             |cent AS (
             |  SELECT label, half, i, round(avg(v), 6) AS c
             |  FROM e GROUP BY 1, 2, 3),
             |j AS (
             |  SELECT a.label, sum(a.c * b.c) AS dot,
             |    sqrt(sum(a.c * a.c)) AS na, sqrt(sum(b.c * b.c)) AS nb
             |  FROM cent a JOIN cent b
             |    ON b.label = a.label AND b.i = a.i AND a.half = 0 AND b.half = 1
             |  GROUP BY 1)
             |SELECT label, round(dot / (na * nb), 6) AS self_cosine
             |FROM j ORDER BY label""".stripMargin)),

    // Gini coefficient of doc-length contribution per source — how
    // concentrated is each slice's byte mass in its longest documents?
    // Computed EXACTLY from the length histogram with rank arithmetic
    // (G = Σ(2·rank − n − 1)·x over the sorted values, ranks from
    // cumulative counts — never a per-doc sort): per source the
    // post-shuffle work is O(distinct lengths). Integer numerators
    // throughout; one division at the end.
    Q("q238_gini",
      (s, d) => {
        import s.implicits._
        val hist = Tables.documents(s, d)
          .groupBy($"source", $"n_chars").agg(count(lit(1)).as("c"))
        val w = Window.partitionBy($"source").orderBy($"n_chars")
          .rowsBetween(Window.unboundedPreceding, 0)
        // docs with this length occupy ranks (cum-c+1)..cum; their total
        // Σ(2i−n−1) over that run is c·(cum−c+cum+1) − c·(n+1)
        val cum = hist.withColumn("cum", sum($"c").over(w))
        val tot = hist.groupBy($"source")
          .agg(sum($"c").as("n"), sum($"c" * $"n_chars").as("sx"))
        cum.join(tot, "source")
          .select($"source", $"n", $"sx",
            ($"n_chars" * ($"c" * ($"cum" * 2 - $"c" + 1) - $"c" * ($"n" + 1)))
              .as("num"))
          .groupBy($"source", $"n", $"sx")
          .agg(sum($"num").as("num_sum"))
          .select($"source", $"n".as("n_docs"),
            round($"num_sum" / ($"n" * $"sx" * 1.0d), 6).as("gini"))
          .orderBy($"source")
      },
      Some("""WITH hist AS (
             |  SELECT source, n_chars, count(*) AS c
             |  FROM documents GROUP BY 1, 2),
             |cum AS (
             |  SELECT source, n_chars, c,
             |    sum(c) OVER (PARTITION BY source ORDER BY n_chars
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM hist),
             |tot AS (
             |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
             |    CAST(sum(c * n_chars) AS BIGINT) AS sx
             |  FROM hist GROUP BY 1)
             |SELECT h.source, t.n AS n_docs,
             |  round(sum(h.n_chars * (h.c * (h.cum * 2 - h.c + 1) - h.c * (t.n + 1)))
             |    / (t.n * t.sx * 1.0), 6) AS gini
             |FROM cum h JOIN tot t USING (source)
             |GROUP BY 1, 2, t.sx
             |ORDER BY source""".stripMargin)),

    // Weighted consistent sampling (Efraimidis–Spirakis): the top-4 docs
    // per source by u^(1/w) with u = md5-uniform and w = n_chars — the
    // reproducible LENGTH-PROPORTIONAL sample (long docs more likely)
    // that complements q196's uniform one. Ranking uses the monotone
    // integer surrogate round(1e9·ln(u)/w) so both engines order
    // identical BIGINTs; the TopKAggregator keeps shuffle state at 4
    // entries per (partition, source) — the oracle's window sort IS the
    // shape this replaces at 100 TB.
    Q("q223_weighted_sample",
      (s, d) => {
        import s.implicits._
        val top4 = udaf(new graft.functions.TopKAggregator(4))
        val scored = Tables.documents(s, d)
          .select($"source", $"doc_id", $"n_chars",
            expr(s"""cast(round(1e9 * ln(${mdLong("concat('wsmp:', doc_id)")}
                    | / 4503599627370496.0d) / n_chars) as bigint)""".stripMargin)
              .as("score"))
        scored
          .groupBy($"source")
          .agg(top4($"score", $"doc_id").as("top"))
          .select($"source", posexplode(arrays_zip($"top.scores", $"top.ids")))
          .select($"source", ($"pos" + 1).cast("long").as("rank"),
            $"col.ids".as("doc_id"), $"col.scores".as("score"))
          .join(Tables.documents(s, d).select($"doc_id", $"n_chars"), "doc_id")
          .select($"source", $"rank", $"doc_id", $"n_chars", $"score")
          .orderBy($"source", $"rank")
      },
      Some("""WITH h AS (
             |  SELECT source, doc_id, n_chars,
             |    CAST(round(1e9 * ln((('0x' || substr(md5('wsmp:' || doc_id), 1, 13))::BIGINT)
             |      / 4503599627370496.0) / n_chars) AS BIGINT) AS score
             |  FROM documents),
             |r AS (
             |  SELECT source, doc_id, n_chars, score,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY score DESC, doc_id) AS rank
             |  FROM h)
             |SELECT source, rank, doc_id, n_chars, score
             |FROM r WHERE rank <= 4 ORDER BY source, rank""".stripMargin)),

    // Character-entropy quality signal — low-entropy docs are the
    // boilerplate/garbage a filter pass drops. Per doc: Shannon entropy
    // of the character distribution, from (doc, char) counts (the
    // corpus collapses to ≤|alphabet| rows per doc in one partial-agg
    // scan); reported as per-source histogram stats plus the count
    // under the 3.5-bit gate. Entropy rounds to 6 dp per doc before the
    // source aggregate so both engines average identical values.
    Q("q233_char_entropy",
      (s, d) => {
        import s.implicits._
        val chars = Tables.documents(s, d)
          .select($"doc_id", $"source", explode(split($"text", "")).as("ch"))
          .filter(length($"ch") === 1)
          .groupBy($"doc_id", $"source", $"ch").agg(count(lit(1)).as("c"))
        val ent = chars
          .withColumn("n", sum($"c").over(
            Window.partitionBy($"doc_id")))
          .groupBy($"doc_id", $"source")
          .agg(round(-sum(($"c" / $"n") * log2($"c" / $"n")), 6).as("h"))
        ent.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            round(avg($"h"), 4).as("mean_entropy"),
            round(min($"h"), 4).as("min_entropy"),
            round(max($"h"), 4).as("max_entropy"),
            sum(when($"h" < 3.5d, 1L).otherwise(0L)).as("n_low"))
          .orderBy($"source")
      },
      Some("""WITH chars AS (
             |  SELECT doc_id, source, unnest(string_split_regex(text, '')) AS ch
             |  FROM documents),
             |cc AS (
             |  SELECT doc_id, source, ch, count(*) AS c
             |  FROM chars WHERE length(ch) = 1 GROUP BY 1, 2, 3),
             |ent AS (
             |  SELECT doc_id, source,
             |    round(-sum((c / n) * log2(c / n)), 6) AS h
             |  FROM (SELECT *, CAST(sum(c) OVER (PARTITION BY doc_id) AS DOUBLE) AS n
             |        FROM cc)
             |  GROUP BY 1, 2)
             |SELECT source, count(*) AS n_docs,
             |  round(avg(h), 4) AS mean_entropy,
             |  round(min(h), 4) AS min_entropy,
             |  round(max(h), 4) AS max_entropy,
             |  CAST(sum(CASE WHEN h < 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
             |FROM ent GROUP BY source ORDER BY source""".stripMargin)),

    // Normalization idempotence audit — the precondition every dedup /
    // fingerprint stage silently assumes: normalize(normalize(x)) ==
    // normalize(x). One conditional-aggregation scan per source reports
    // how much the normalizer (lowercase + whitespace collapse + trim)
    // changes, and n_nonidem MUST be 0 — a normalizer that isn't a
    // projection would make every downstream content hash unstable.
    Q("q219_normalize_idempotent",
      (s, d) => {
        import s.implicits._
        val norm1 = trim(regexp_replace(lower($"text"), "\\s+", " "))
        val norm2 = trim(regexp_replace(lower(norm1), "\\s+", " "))
        Tables.documents(s, d)
          .select($"source", $"text", norm1.as("n1"), norm2.as("n2"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"text" =!= $"n1", 1L).otherwise(0L)).as("n_changed"),
            sum(length($"text") - length($"n1")).as("tot_delta"),
            sum(when($"n1" =!= $"n2", 1L).otherwise(0L)).as("n_nonidem"))
          .orderBy($"source")
      },
      Some("""WITH n AS (
             |  SELECT source, text,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS n1,
             |    trim(regexp_replace(lower(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))),
             |      '\s+', ' ', 'g')) AS n2
             |  FROM documents)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN text != n1 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
             |  CAST(sum(length(text) - length(n1)) AS BIGINT) AS tot_delta,
             |  CAST(sum(CASE WHEN n1 != n2 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonidem
             |FROM n GROUP BY source ORDER BY source""".stripMargin))
  )
}
