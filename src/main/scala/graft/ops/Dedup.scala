package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Deduplication operators over `documents` — exact, MinHash+LSH, SimHash,
  * and n-gram Jaccard. The hash primitive everywhere is md5 (identical in
  * Spark and DuckDB, so every variant has a full value-level oracle).
  *
  * Scale design:
  *  - exact dedup: hash-groupBy on the fingerprint — one shuffle of
  *    (hash, id), never the text itself;
  *  - MinHash/LSH: signatures are a per-doc aggregate (map-side partial),
  *    the candidate join runs on (band, bucket) keys so only near-dup
  *    candidates ever meet — no O(n²) pair enumeration;
  *  - SimHash: per-doc 16-bit signature, groupable/bucketable;
  *  - n-gram Jaccard: self-join on shared shingles (inverted-index join),
  *    again avoiding the quadratic cross join.
  */
object Dedup {

  /** Character shingles of length `k`, distinct per doc:
    * DataFrame(doc_id, s). */
  private def shingles(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.kmer.Kmers.kmers(col("text"), k)).as("s"))
      .distinct()

  /** MinHash signatures: for hash function i (0..h-1), the minimum of
    * md5(i:shingle) over the doc's shingle set. DataFrame(doc_id, i, mh). */
  def minhash(docs: DataFrame, k: Int, h: Int): DataFrame =
    shingles(docs, k)
      .select(col("doc_id"), explode(sequence(lit(0), lit(h - 1))).as("i"), col("s"))
      .select(col("doc_id"), col("i"),
        md5(concat(col("i").cast("string"), lit(":"), col("s"))).as("hv"))
      .groupBy("doc_id", "i")
      .agg(min("hv").as("mh"))

  val queries: Seq[Q] = Seq(
    Q("q40_dedup_exact",
      (s, d) => {
        import s.implicits._
        val fp = Tables.documents(s, d)
          .select($"doc_id", md5(lower($"text")).as("fp"))
        fp.groupBy($"fp")
          .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("keeper"))
          .agg(count(lit(1)).as("n_unique"),
            sum($"n_copies").as("n_docs"),
            sum(when($"n_copies" > 1, $"n_copies" - 1).otherwise(0)).as("n_dropped"))
      },
      Some("""WITH fp AS (SELECT doc_id, md5(lower(text)) AS fp FROM documents),
             |g AS (SELECT fp, count(*) AS n_copies, min(doc_id) AS keeper
             |      FROM fp GROUP BY fp)
             |SELECT count(*) AS n_unique, CAST(sum(n_copies) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END) AS BIGINT) AS n_dropped
             |FROM g""".stripMargin)),

    Q("q41_minhash_lsh",
      (s, d) => {
        import s.implicits._
        val mh = minhash(Tables.documents(s, d), 12, 16).cache()
        // LSH: bands of 2 rows → bucket id = md5(band || mh_even || mh_odd)
        val even = mh.filter($"i" % 2 === 0)
          .select($"doc_id", ($"i" / 2).cast("int").as("band"), $"mh".as("mh0"))
        val odd = mh.filter($"i" % 2 === 1)
          .select($"doc_id", (($"i" - 1) / 2).cast("int").as("band"), $"mh".as("mh1"))
        val bands = even.join(odd, Seq("doc_id", "band"))
          .select($"doc_id", $"band",
            md5(concat($"band".cast("string"), lit("|"), $"mh0", lit("|"), $"mh1")).as("bucket"))
        val cand = bands.as("x").join(bands.as("y"),
            $"x.bucket" === $"y.bucket" && $"x.band" === $"y.band" &&
              $"x.doc_id" < $"y.doc_id")
          .select($"x.doc_id".as("a"), $"y.doc_id".as("b"))
          .distinct()
        val sim = cand
          .join(mh.select($"doc_id".as("a"), $"i", $"mh".as("ma")), Seq("a"))
          .join(mh.select($"doc_id".as("b"), $"i", $"mh".as("mb")), Seq("b", "i"))
          .groupBy($"a", $"b")
          .agg((sum(when($"ma" === $"mb", 1).otherwise(0)) / 16.0).as("est_j"))
        sim.filter($"est_j" >= 0.25)
          .select($"a", $"b", round($"est_j", 4).as("est_jaccard"))
          .orderBy($"a", $"b")
      },
      Some("""WITH sh AS (
             |  SELECT DISTINCT doc_id, substr(text, i, 12) AS s
             |  FROM (SELECT doc_id, text,
             |          unnest(generate_series(1, length(text) - 11)) AS i
             |        FROM documents)),
             |mh AS (
             |  SELECT doc_id, h.i AS i, min(md5(h.i || ':' || s)) AS mh
             |  FROM sh, generate_series(0, 15) AS h(i) GROUP BY doc_id, h.i),
             |bands AS (
             |  SELECT e.doc_id, e.i // 2 AS band,
             |    md5((e.i // 2) || '|' || e.mh || '|' || o.mh) AS bucket
             |  FROM mh e JOIN mh o ON e.doc_id = o.doc_id AND o.i = e.i + 1
             |  WHERE e.i % 2 = 0),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             |  FROM bands x JOIN bands y
             |    ON x.bucket = y.bucket AND x.band = y.band AND x.doc_id < y.doc_id),
             |sim AS (
             |  SELECT c.a, c.b,
             |    sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) / 16.0 AS est_j
             |  FROM cand c
             |  JOIN mh ma ON ma.doc_id = c.a
             |  JOIN mh mb ON mb.doc_id = c.b AND mb.i = ma.i
             |  GROUP BY c.a, c.b)
             |SELECT a, b, round(est_j, 4) AS est_jaccard
             |FROM sim WHERE est_j >= 0.25 ORDER BY a, b""".stripMargin)),

    Q("q42_simhash",
      (s, d) => {
        import s.implicits._
        val sh = Tables.documents(s, d)
          .select($"doc_id", explode(graft.kmer.Kmers.kmers($"text", 12)).as("s"))
        val bits = sh
          .select($"doc_id", explode(sequence(lit(0), lit(15))).as("bit"), md5($"s").as("h"))
          .withColumn("nib",
            expr("instr('0123456789abcdef', substring(h, bit + 1, 1)) - 1"))
          .groupBy($"doc_id", $"bit")
          .agg(sum(when($"nib" % 2 === 1, 1).otherwise(-1)).as("v"))
        bits
          .groupBy($"doc_id")
          .agg(sum(when($"v" > 0, pow(lit(2), $"bit")).otherwise(0)).cast("long").as("simhash"))
          .groupBy($"simhash")
          .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"))
          .orderBy($"simhash")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id, substr(text, i, 12) AS s
             |  FROM (SELECT doc_id, text,
             |          unnest(generate_series(1, length(text) - 11)) AS i
             |        FROM documents)),
             |bits AS (
             |  SELECT doc_id, b.i AS bit,
             |    sum(CASE WHEN (strpos('0123456789abcdef', substr(md5(s), b.i + 1, 1)) - 1) % 2 = 1
             |        THEN 1 ELSE -1 END) AS v
             |  FROM sh, generate_series(0, 15) AS b(i) GROUP BY doc_id, b.i),
             |simhash AS (
             |  SELECT doc_id,
             |    CAST(sum(CASE WHEN v > 0 THEN power(2, bit) ELSE 0 END) AS BIGINT) AS simhash
             |  FROM bits GROUP BY doc_id)
             |SELECT simhash, count(*) AS n_docs, min(doc_id) AS first_doc
             |FROM simhash GROUP BY simhash ORDER BY simhash""".stripMargin)),

    Q("q43_ngram_jaccard",
      (s, d) => {
        import s.implicits._
        val toks = Tables.documents(s, d)
          .select($"doc_id", split($"text", " ").as("w"))
        val sh = toks
          .select($"doc_id", explode(expr(
            "transform(sequence(1, size(w) - 2), i -> concat(w[i-1], ' ', w[i], ' ', w[i+1]))")).as("s"))
          .distinct()
          .cache()
        val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
        val common = sh.as("x").join(sh.as("y"),
            $"x.s" === $"y.s" && $"x.doc_id" < $"y.doc_id")
          .groupBy($"x.doc_id".as("a"), $"y.doc_id".as("b"))
          .agg(count(lit(1)).as("c"))
        common
          .join(sizes.select($"doc_id".as("a"), $"n".as("na")), "a")
          .join(sizes.select($"doc_id".as("b"), $"n".as("nb")), "b")
          .withColumn("jac", $"c" / ($"na" + $"nb" - $"c"))
          .filter($"jac" >= 0.12)
          .select($"a", $"b", round($"jac", 4).as("jaccard"))
          .orderBy($"a", $"b")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             |sh AS (
             |  SELECT DISTINCT doc_id, concat(w[i], ' ', w[i+1], ' ', w[i+2]) AS s
             |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i
             |        FROM toks)),
             |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             |common AS (
             |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
             |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
             |  GROUP BY 1, 2)
             |SELECT a, b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
             |FROM common JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
             |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.12
             |ORDER BY a, b""".stripMargin))
  )
}
