package graft.ops

import java.nio.file.{Files, Path}
import java.util.Comparator

import org.apache.spark.sql.DataFrame

/** Materialization backend for the per-session shared-stage memos
  * (LSH pairs, connected components, word trigrams, the BPE training
  * frames).
  *
  * Round 8 materialized these through `localCheckpoint`, which pins the
  * result as RDD blocks in the block manager for the lifetime of the
  * memo entry — storage `spark.catalog.clearCache()` cannot see. In a
  * long benchmark run every query AFTER the first memo build then pays
  * the pinned blocks in storage/GC pressure (the round-8 streaming
  * family ran ~2× its isolated cost from exactly this).
  *
  * Temp-parquet materialization is the local analogue of what the memo
  * IS at production scale — a persisted table the consumers fan out
  * from: nothing stays pinned in executor memory (the OS page cache
  * serves re-reads), every consumer's plan is a plain parquet scan
  * (history-independent by construction, no CacheManager substitution),
  * and the scan carries FILE STATISTICS, so joins against a memoized
  * table plan size-aware (broadcast when small) instead of defaulting
  * to conservative sort-merge as the stats-free checkpoint RDDs did.
  */
object Memo {

  private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private val clearHooks =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()
  // Per-label wall-clock spent building memoized stages (r14 verdict #3:
  // with best-of-2 timing and end-of-run eviction, a memo's one-time build
  // cost lands in NO recorded bench number — leg 1 of the first consumer
  // pays it, leg 2 wins the min, and the total sums the mins. Charging the
  // builds here lets Bench emit a `memoBuildSec` map so recorded total +
  // memo builds reconstructs the actual wall work of a pass.)
  private val buildSecs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  // builds can nest (documentComponents builds documentPairs on a cold
  // memo); each label is charged its EXCLUSIVE time so the map's values
  // sum to the true combined build wall-clock instead of double-counting
  private val nestedSec = new ThreadLocal[java.lang.Double] {
    override def initialValue: java.lang.Double = 0.0
  }

  /** Wrap a memoized stage's WHOLE build (derivation + materialization) so
    * its wall cost is attributed to `label`. Costs accumulate across
    * rebuilds (e.g. the bench rerun pass after [[evictAll]]). */
  def timedBuild[T](label: String)(build: => T): T = {
    val saved = nestedSec.get.doubleValue
    nestedSec.set(0.0)
    val t0 = System.nanoTime()
    try build finally {
      val wall = (System.nanoTime() - t0) / 1e9
      val self = wall - nestedSec.get.doubleValue
      buildSecs.merge(label, self, (a, b) => Double.box(a + b))
      nestedSec.set(saved + wall)
    }
  }

  /** Cumulative per-label build seconds since JVM start (or snapshot
    * deltas caller-side for per-pass attribution). */
  def buildSecSnapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
  }

  // temp dirs are JVM-scratch: reclaim them at exit so repeated
  // Verify/Bench/test runs don't accumulate parquet junk under /tmp
  Runtime.getRuntime.addShutdownHook(new Thread(() => evictAll(),
    "graft-memo-cleanup"))

  /** Owners of memo maps register how to drop their entries so
    * [[evictAll]] can clear every memo without reverse dependencies. */
  def registerClearHook(f: () => Unit): Unit = clearHooks.add(f)

  /** Write `df` once to a session-temp parquet dir and return a reader
    * over it. The returned frame's plan is a parquet scan with file
    * statistics; the write is the one-time cost the memo exists to pay. */
  def materialize(df: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("graft-memo-")
    dirs.add(dir)
    val path = dir.toString
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Drop every memo entry and delete the backing temp-parquet dirs —
    * the eviction hook for long-lived sessions that touch many data
    * dirs (unbounded (session, dir)-keyed growth otherwise). Callers
    * must not hold DataFrames read from a memo across an evict: their
    * backing files are gone.
    *
    * The dir set is SNAPSHOTTED-AND-DRAINED before any deletion: a memo
    * rebuilt concurrently with the evict materializes into a new dir
    * that is either in the snapshot (drained, deleted — the rebuilder's
    * map entry was already cleared by the hooks) or added after the
    * drain (kept, tracked for the next evict) — never deleted out from
    * under a live reader while still registered. */
  def evictAll(): Unit = {
    clearHooks.forEach(h => h())
    val snapshot = new java.util.ArrayList[Path]()
    dirs.forEach { d => if (dirs.remove(d)) snapshot.add(d) }
    snapshot.forEach { d =>
      if (Files.exists(d)) {
        val walk = Files.walk(d)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
    }
  }
}
