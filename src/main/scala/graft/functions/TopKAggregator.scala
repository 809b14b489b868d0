package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input row for the top-k aggregator: a score and the id that carries it. */
case class ScoredId(score: Long, id: Long)

/** Aggregation state/result: parallel arrays sorted by (score desc, id asc),
  * capped at k entries. */
case class TopKState(scores: Seq[Long], ids: Seq[Long])

/** Typed `Aggregator` (the UDAF surface, completing the custom-function
  * trio next to the KmerGenerator UDTF and the DotProduct scalar
  * expression): grouped top-k with BOUNDED state.
  *
  * The usual top-k-per-group formulation — `row_number() over
  * (partition by g order by score)` then `filter rank <= k` — shuffles
  * EVERY row to its group's partition and sorts it, just to throw almost
  * all of it away. This aggregator's state is a k-entry list with a
  * map-side `reduce`/`merge`, so the shuffle carries at most k entries
  * per (partition, group): at 100 TB that's the difference between
  * shuffling the corpus and shuffling k rows per group. Total order
  * (score desc, id asc) makes the result deterministic and
  * oracle-checkable against the window formulation it replaces.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, TopKState, TopKState] {

  override def zero: TopKState = TopKState(Vector.empty, Vector.empty)

  override def reduce(b: TopKState, a: ScoredId): TopKState = insert(b, a.score, a.id)

  override def merge(x: TopKState, y: TopKState): TopKState = {
    var acc = x
    var i = 0
    while (i < y.scores.length) {
      acc = insert(acc, y.scores(i), y.ids(i))
      i += 1
    }
    acc
  }

  override def finish(b: TopKState): TopKState = b

  /** Keeps the buffer sorted by (score desc, id asc) and capped at k. */
  private def insert(b: TopKState, score: Long, id: Long): TopKState = {
    // early reject: full buffer and the candidate sorts below the floor
    if (b.scores.length == k) {
      val ls = b.scores(k - 1)
      if (score < ls || (score == ls && id > b.ids(k - 1))) return b
    }
    var pos = 0
    while (pos < b.scores.length &&
      (b.scores(pos) > score || (b.scores(pos) == score && b.ids(pos) < id)))
      pos += 1
    TopKState(
      (b.scores.take(pos) :+ score) ++ b.scores.drop(pos).take(k - pos - 1),
      (b.ids.take(pos) :+ id) ++ b.ids.drop(pos).take(k - pos - 1))
  }

  override def bufferEncoder: Encoder[TopKState] = Encoders.product[TopKState]
  override def outputEncoder: Encoder[TopKState] = Encoders.product[TopKState]
}
