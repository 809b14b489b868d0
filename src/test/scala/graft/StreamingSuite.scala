package graft

import org.apache.spark.sql.functions._
import graft.streaming.StatefulSessions

/** Structured Streaming specs: the stateful per-user counter must converge
  * to the same totals as the batch aggregation over the same events table.
  */
class StreamingSuite extends SparkSuite {
  import spark.implicits._

  test("mapGroupsWithState running counts match batch per-user counts") {
    val d = "/root/testdata/sf0.001"
    val sink = StatefulSessions.runningUserCounts(spark, d, "stateful_counts_test")
    // update-mode sink holds every intermediate state row; the final state
    // per user is the max
    val streamed = sink.groupBy($"user_id").agg(max($"n").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Tables.events(spark, d)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }
}
