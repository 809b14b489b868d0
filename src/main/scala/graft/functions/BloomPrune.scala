package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter join pruning — the "runtime filter" pattern made
  * a first-class library operation. Build a bloom over the dim side's join
  * keys with Spark's own distributed `BloomFilterAggregate` (partial blooms
  * are OR-merged executor-side; only the final ~KB–MB bitset reaches the
  * driver), then prune the fact scan with `BloomFilterMightContain` BEFORE
  * the shuffle/join. No false negatives, so `prune → exact join` returns
  * exactly the plain join's rows — the bloom only removes rows the join
  * would drop anyway. At 100 TB this is the difference between shuffling
  * the whole fact table and shuffling the ~matching fraction; Spark's AQE
  * injects the same filter only for favorable shuffle-join shapes, while
  * this form applies it unconditionally (e.g. ahead of an aggregation or
  * a multi-stage pipeline AQE can't see through).
  *
  * Uses the same internal expressions AQE's InjectRuntimeFilter composes
  * (`BloomFilterAggregate` over `xxhash64`, `BloomFilterMightContain`),
  * surfaced through GraftColumnBridge like the other native expressions.
  */
object BloomPrune {

  /** Distributed bloom build over `key`, collected to the driver as the
    * serialized bitset (what a scalar subquery carries in AQE's form). */
  def buildBloom(dim: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(key)), expectedItems)
    dim.select(GraftColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Predicate column: `might_contain(bloom, xxhash64(key))`. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(
      new BloomFilterMightContain(
        Literal(bloom, BinaryType),
        GraftColumnBridge.expression(xxhash64(key))))
}
