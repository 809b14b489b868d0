package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-partition sizing for the self-driving harness streams.
  *
  * A streaming query's shuffle/state partition count is pinned into its
  * checkpoint at FIRST start (`spark.sql.shuffle.partitions` at that
  * moment) — it is a deployment-sized knob, not an optimizer decision:
  * sized to sustained state volume and throughput on a cluster
  * (hundreds+ at 100 TB rates), and to the data on a harness corpus.
  * Leaving the batch session's core-count default (32 here) makes every
  * micro-batch pay fixed per-store commit overhead on 32 × (up to 4
  * state stores per stateful operator) mostly-empty stores — measured
  * on q72: 5.69 s → 2.64 s by sizing to 8 (A/B under
  * `SPARK_GRAFT_ONLY=q72 runMain graft.Bench`, canary ≈ 1.0 both runs);
  * the whole family fell 32.4 s → 17.5 s. Re-swept in r14 over the whole
  * 16-query family (isolated family bench, back-to-back legs, canary
  * firsts quoted): p=8 → 34.3 s (1.75/0.76), p=6 → 27.3 s (1.94/0.87),
  * p=4 → 23.0 s (1.13/0.73), p=2 → 48.2 s (q72 9.2 s, q74 6.3 s —
  * under-parallelized within batches). That sweep ran on the contended
  * r14 host; re-swept in r15 behind the bench's pre-flight load gate
  * (ADVICE r14): p=4 → {31.5, 45.2} s across two reps, p=6 → {27.5,
  * 29.6} s, p=8 → 37.3 s — p=6 is both fastest and far more stable on
  * a quiet host (the transformWithState pair q211/q217 and the canary
  * q70 read uniformly lower at 6 in every rep; p=4's r14 floor was an
  * artifact of the loud window it was measured in), so the harness
  * default is 6: per-store fixed commit cost still dominates at 8 on
  * these mostly-empty stores, and 4 under-parallelizes the stateful
  * batches. This is a DEPLOYMENT knob
  * sized to the harness corpus, not a constant for production — a
  * cluster sizes it to sustained state volume/throughput (hundreds+ at
  * 100 TB rates) via the conf override below. The RocksDB provider was
  * A/B-tested at the same sizing and is uniformly SLOWER for these
  * one-shot small-state runs (q72 2.98 vs 2.49 s, q75 1.93 vs 1.70,
  * q74 1.42 vs 1.23 — per-store native init with nothing to amortize
  * it), so the in-memory default stays; q211/q217 keep RocksDB because
  * transformWithState requires it.
  *
  * Every registered streaming query runs inside [[withStatePartitions]]
  * (wrapped once at registration, `SparkEntry.sources`): the conf is set
  * while the query function runs — which is when its streams start and
  * complete — and restored before the returned batch frame is planned,
  * so batch tails keep the session's sizing. Deployments override with
  * `spark.graft.streaming.statePartitions`.
  */
object StreamTuning {

  /** Run `body` with `spark.sql.shuffle.partitions` set for stream
    * starts (default 6 — the r15 quiet-window family-sweep floor, see
    * above; override `spark.graft.streaming.statePartitions`); always
    * restores the previous value. */
  def withStatePartitions[T](s: SparkSession)(body: => T): T = {
    val n = s.conf.getOption("spark.graft.streaming.statePartitions")
      .getOrElse("6")
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n)
    try body
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
