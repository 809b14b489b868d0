package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Similarity search over the `embeddings` table (vec_id, embedding
  * array<float>, label).
  *
  *  - q50: brute-force cosine top-k — the exactness baseline. Query side is
  *    tiny and broadcast; the dot product is a codegen'd
  *    `aggregate(zip_with(...))` over the arrays, no explode of the
  *    database side.
  *  - q51: IVF-style ANN — deterministic coarse centroids, every vector
  *    assigned to its nearest centroid (one broadcast join), queries probe
  *    only their own cell. At 100 TB the cell assignment is the partition
  *    key, so a probe touches 1/C of the data.
  *
  * Cosines are rounded to 4 dp on BOTH engines before ranking so that
  * float-summation order can't flip the oracle hash; ties break on vec_id.
  */
object Similarity {

  /** Σ xᵢ·yᵢ over two float arrays, accumulated in double, sequential
    * left-to-right (deterministic per pair). */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(x: Column): Column = sqrt(dot(x, x))

  val queries: Seq[Q] = Seq(
    Q("q50_knn_brute",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
        val q = e.filter($"vec_id" < 8)
          .select($"vec_id".as("qid"), $"embedding".as("qe"))
        val pairs = e.select($"vec_id".as("did"), $"embedding".as("de"))
          .crossJoin(broadcast(q))
          .filter($"did" =!= $"qid")
          .select($"qid", $"did",
            (dot($"qe", $"de") / (norm($"qe") * norm($"de"))).as("c"))
        pairs
          .withColumn("rnk", row_number().over(
            Window.partitionBy($"qid").orderBy(round($"c", 4).desc, $"did")))
          .filter($"rnk" <= 5)
          .select($"qid", $"did", round($"c", 4).as("cosine"), $"rnk")
          .orderBy($"qid", $"rnk")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
             |  FROM embeddings),
             |q AS (SELECT * FROM e WHERE vec_id < 8),
             |dots AS (
             |  SELECT q.vec_id AS qid, e.vec_id AS did,
             |    sum(CAST(q.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS dot
             |  FROM q JOIN e USING (i) WHERE e.vec_id != q.vec_id
             |  GROUP BY 1, 2),
             |nrm AS (
             |  SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
             |  FROM e GROUP BY vec_id),
             |cos AS (
             |  SELECT qid, did, dot / (nq.nrm * nd.nrm) AS c
             |  FROM dots JOIN nrm nq ON nq.vec_id = qid JOIN nrm nd ON nd.vec_id = did),
             |topk AS (
             |  SELECT qid, did, c,
             |    row_number() OVER (PARTITION BY qid ORDER BY round(c, 4) DESC, did) AS rnk
             |  FROM cos)
             |SELECT qid, did, round(c, 4) AS cosine, rnk
             |FROM topk WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin)),

    // IVF-style: centroids = vectors whose vec_id % 100 == 0 (deterministic
    // stand-in for k-means at this corpus size); probe only the query's cell.
    Q("q51_knn_ivf",
      (s, d) => {
        import s.implicits._
        val e = Tables.embeddings(s, d)
        val cent = e.filter($"vec_id" % 100 === 0)
          .select($"vec_id".as("cid"), $"embedding".as("ce"))
        // nearest centroid per vector (rounded cosine, cid tiebreak)
        val assign = e.select($"vec_id", $"embedding")
          .crossJoin(broadcast(cent))
          .select($"vec_id", $"embedding", $"cid",
            round(dot($"embedding", $"ce") / (norm($"embedding") * norm($"ce")), 4).as("cc"))
          .withColumn("rn", row_number().over(
            Window.partitionBy($"vec_id").orderBy($"cc".desc, $"cid")))
          .filter($"rn" === 1)
          .select($"vec_id", $"embedding", $"cid")
          .cache()
        val q = assign.filter($"vec_id" < 8)
          .select($"vec_id".as("qid"), $"embedding".as("qe"), $"cid")
        val probe = assign
          .select($"vec_id".as("did"), $"embedding".as("de"), $"cid")
          .join(broadcast(q), "cid")
          .filter($"did" =!= $"qid")
          .select($"qid", $"did",
            (dot($"qe", $"de") / (norm($"qe") * norm($"de"))).as("c"))
        probe
          .withColumn("rnk", row_number().over(
            Window.partitionBy($"qid").orderBy(round($"c", 4).desc, $"did")))
          .filter($"rnk" <= 3)
          .select($"qid", $"did", round($"c", 4).as("cosine"), $"rnk")
          .orderBy($"qid", $"rnk")
      },
      Some("""WITH e AS (
             |  SELECT vec_id, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i
             |  FROM embeddings),
             |nrm AS (
             |  SELECT vec_id, sqrt(sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
             |  FROM e GROUP BY vec_id),
             |cent AS (SELECT * FROM e WHERE vec_id % 100 = 0),
             |cc AS (
             |  SELECT e.vec_id, c.vec_id AS cid,
             |    round(sum(CAST(e.v AS DOUBLE) * CAST(c.v AS DOUBLE))
             |      / (ne.nrm * nc.nrm), 4) AS cc
             |  FROM e JOIN cent c USING (i)
             |  JOIN nrm ne ON ne.vec_id = e.vec_id JOIN nrm nc ON nc.vec_id = c.vec_id
             |  GROUP BY e.vec_id, c.vec_id, ne.nrm, nc.nrm),
             |assign AS (
             |  SELECT vec_id, cid FROM (
             |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY cc DESC, cid) AS rn
             |    FROM cc) WHERE rn = 1),
             |q AS (SELECT vec_id AS qid, cid FROM assign WHERE vec_id < 8),
             |cand AS (
             |  SELECT q.qid, a.vec_id AS did
             |  FROM q JOIN assign a USING (cid) WHERE a.vec_id != q.qid),
             |dots AS (
             |  SELECT c.qid, c.did, sum(CAST(eq.v AS DOUBLE) * CAST(ed.v AS DOUBLE)) AS dot
             |  FROM cand c
             |  JOIN e eq ON eq.vec_id = c.qid
             |  JOIN e ed ON ed.vec_id = c.did AND ed.i = eq.i
             |  GROUP BY c.qid, c.did),
             |cos AS (
             |  SELECT qid, did, dot / (nq.nrm * nd.nrm) AS c
             |  FROM dots JOIN nrm nq ON nq.vec_id = qid JOIN nrm nd ON nd.vec_id = did),
             |topk AS (
             |  SELECT qid, did, c,
             |    row_number() OVER (PARTITION BY qid ORDER BY round(c, 4) DESC, did) AS rnk
             |  FROM cos)
             |SELECT qid, did, round(c, 4) AS cosine, rnk
             |FROM topk WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin))
  )
}
