package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: turns the 100 TB posture from an argued property into a
  * measured one (round-9 verdict, next-round item #1).
  *
  * Two subcommands:
  *
  * `synth <srcDir> <dstDir> <copies>` — synthesize an N× corpus from an
  * existing SF dir by unioning N re-keyed copies of every fact table
  * (dims `region`/`nation` stay single, as TPC-H scaling does). Keys are
  * interleaved (`key·N + copy`) so FK joins stay consistent within a
  * copy and key ranges/density scale uniformly. Copy 0 is byte-identical
  * to the source; the transforms that keep copies>0 from being
  * DEGENERATE duplicates (which would turn the dedup/LSH family's
  * group sizes quadratic — a data pathology, not an engine cost) are:
  *
  *  - `documents.text`: deterministic per-copy word shuffle — word at
  *    position p sorts to rank xxhash64(copy, p). Token histograms (and
  *    so language-ID, quality, vocab, BPE statistics) are EXACTLY
  *    preserved per copy, while word-trigram shingle sets across copies
  *    are near-disjoint, so MinHash/LSH group sizes stay realistic.
  *    Because the permutation depends only on (copy, position), a
  *    generator-planted near-dup pair stays a near-dup pair within every
  *    copy — the shared positions order identically.
  *  - `embeddings.embedding`: rotate the 64-dim vector by `copy`
  *    positions — norms and within-copy geometry are exactly preserved,
  *    cross-copy vectors decorrelate (no 10× exact-duplicate ANN hits).
  *  - `events.ts` is kept as-is: N× events per hour window is precisely
  *    the traffic-growth shape the streaming state design must absorb.
  *
  * `time <dirA> <dirB> <q1,q2,...> <outJson>` — time the named queries
  * at both dirs under the Bench methodology (byte-level page-cache
  * warm-up, best-of-2, clearCache+GC between queries, memo eviction
  * between dirs) and emit one JSON line with per-query seconds and the
  * B/A wall-time ratio. With dirB = 10× dirA, `ratio` ≫ 10 (the verdict
  * set the flag at >13, leaving headroom for fixed per-query overhead)
  * means the query's cost curve is super-linear in data — the exact
  * failure the 100 TB claims must exclude.
  *
  * Plan-shape invariance at the synthesized SF is checked with the
  * existing tool (`runMain graft.Plans <dstDir> <out>`) — Scale does not
  * duplicate the audit. Findings land in SCALE.md.
  */
object Scale {

  def main(args: Array[String]): Unit = args.toList match {
    case "synth" :: src :: dst :: copies :: Nil =>
      val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      try synth(spark, src, dst, copies.toInt) finally spark.stop()
    case "time" :: dirA :: dirB :: names :: out :: Nil =>
      // `all` = the full declared surface (round-10 verdict #1: the
      // expensive-15 filter misses scale bugs hiding in cheap queries —
      // q133 was 1.3 s at sf0.1 and 132× super-linear)
      val resolved =
        if (names == "all") SparkEntry.queries.keys.toSeq.sorted
        else names.split(',').toSeq
      time(dirA, dirB, resolved, out)
    case "shuffle" :: rankDir :: runDir :: sel :: out :: Nil =>
      shuffleProbe(rankDir, runDir, sel, out)
    case "cluster" :: dir :: master :: sel :: out :: Nil =>
      clusterProbe(dir, master, sel, out)
    case "skew" :: dir :: out :: Nil =>
      skewProbe(dir, out)
    case "straggler" :: dir :: master :: baseTaskMs :: out :: Nil =>
      stragglerProbe(dir, master, baseTaskMs.toLong, out)
    case _ =>
      System.err.println(
        "usage: graft.Scale synth <srcDir> <dstDir> <copies>\n" +
        "       graft.Scale time <dirA> <dirB> <all|q1,q2,...> <outJson>\n" +
        "       graft.Scale shuffle <rankDir> <runDir> <all|topN|q1,q2,...> <outJson>\n" +
        "       graft.Scale cluster <dir> <masterUrl> <all|q1,q2,...> <outJson>\n" +
        "       graft.Scale skew <dir> <outJson>\n" +
        "       graft.Scale straggler <dir> <masterUrl> <baseTaskMs> <outJson>")
      sys.exit(2)
  }

  /** key·copies + copy: interleaved re-keying, FK-consistent per copy. */
  private def rekey(c: Column, copies: Int, copy: Column): Column =
    c * copies + copy

  def synth(spark: SparkSession, src: String, dst: String,
      copies: Int): Unit = {
    require(copies >= 2, "copies must be >= 2")
    new java.io.File(dst).mkdirs()

    // dims: single copy, verbatim
    Seq("region", "nation").foreach { t =>
      Tables.load(spark, src, t).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    }

    /** fan a table to `copies` copies (column `c` = copy index), apply
      * per-copy column rewrites, write. Rewrites apply IN ORDER, each
      * seeing its predecessors' columns; `__`-prefixed names are scratch
      * columns (dropped with `c` before the write) so a rewrite can be
      * computed once and referenced by later rewrites instead of being
      * re-resolved against an already-rewritten column. */
    def fan(t: String, base: DataFrame)(rewrites: (String, Column)*): Unit = {
      val fanned = base
        .withColumn("c", explode(sequence(lit(0), lit(copies - 1))))
      val out = rewrites.foldLeft(fanned) { case (df, (name, e)) =>
        df.withColumn(name, e)
      }
      val dropped = out.drop(
        out.columns.filter(n => n == "c" || n.startsWith("__")).toIndexedSeq: _*)
      dropped.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scale] $t: ${base.count()} x $copies rows -> $dst")
    }

    val cp = col("c")
    fan("customer", Tables.customer(spark, src))(
      "c_custkey" -> rekey(col("c_custkey"), copies, cp))
    fan("supplier", Tables.supplier(spark, src))(
      "s_suppkey" -> rekey(col("s_suppkey"), copies, cp))
    fan("part", Tables.part(spark, src))(
      "p_partkey" -> rekey(col("p_partkey"), copies, cp))
    fan("orders", Tables.orders(spark, src))(
      "o_orderkey" -> rekey(col("o_orderkey"), copies, cp),
      "o_custkey" -> rekey(col("o_custkey"), copies, cp))
    fan("lineitem", Tables.lineitem(spark, src))(
      "l_orderkey" -> rekey(col("l_orderkey"), copies, cp),
      "l_partkey" -> rekey(col("l_partkey"), copies, cp),
      "l_suppkey" -> rekey(col("l_suppkey"), copies, cp))
    // events: N× the users and N× the per-window traffic (ts unchanged)
    fan("events", Tables.events(spark, src))(
      "event_id" -> rekey(col("event_id"), copies, cp),
      "user_id" -> rekey(col("user_id"), copies, cp))

    // documents: per-copy ALPHABET PERMUTATION — copy c>0 maps every
    // letter through a copy-seeded permutation of a–z (ranked by
    // xxhash64(c, letterIndex); case preserved via the uppercase twin).
    // A character bijection maps every 12-char window bijectively, so
    // within each copy the shingle-set RELATIONSHIPS between documents
    // are exactly the source's (planted near-dups stay near-dups, LSH
    // pair structure is isomorphic), while copies with different
    // permutations share essentially no shingle strings. Three designs
    // were measured before this one, each failing the anti-degeneracy
    // goal a different way (ScaleSuite now pins the outcome):
    //  - word-position SHUFFLE: word-trigram sets decorrelate but the
    //    CHARACTER-shingle sets (what MinHash/SimHash actually hash) stay
    //    ~fully shared — every doc's N copies formed a real near-dup
    //    clique; pair graph quadratic in N (q87 exhausted 78 GB of spill
    //    at copies=100);
    //  - per-copy VOCABULARY permutation: surface strings change but all
    //    copies still draw from the same closed 31-word universe —
    //    coincidental cross-copy collisions kept growth super-linear
    //    (3.9x pairs at 2 copies);
    //  - per-copy word SUFFIX: cross-copy sets disjoint, but longer words
    //    mean each 12-char window spans fewer words, inflating WITHIN-copy
    //    window sharing (4.1x pairs at 2 copies, est_j~0.9 cluster).
    // The alphabet permutation is length-preserving, so neither failure
    // mode exists: token count-multisets, doc lengths, and within-copy
    // similarity structure are all exactly preserved.
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val permSql =
      s"""concat_ws('', transform(
         |  array_sort(transform(sequence(0, 25),
         |    i -> struct(xxhash64(c, i) AS k, substring('$alpha', i + 1, 1) AS v))),
         |  s -> s.v))""".stripMargin
    val substText = expr(
      s"CASE WHEN c = 0 THEN text ELSE translate(text, " +
        s"'$alpha${alpha.toUpperCase}', concat($permSql, upper($permSql))) END")
    // the substituted text is computed ONCE into a scratch column and both
    // `text` and `n_chars` derive from it — deriving n_chars from substText
    // AFTER the text rewrite would re-resolve the CASE/translate against the
    // already-substituted text (value-correct only because the permutation
    // is length-preserving — a fragile ordering dependency, advisor flag)
    fan("documents", Tables.documents(spark, src))(
      "__t" -> substText,
      "doc_id" -> rekey(col("doc_id"), copies, cp),
      "text" -> col("__t"),
      // the permutation is length-preserving; recompute rather than assume
      "n_chars" -> length(col("__t")).cast("long"))

    // embeddings: rotate dims by copy % dims, then flip signs by a
    // per-copy deterministic ±1 pattern. Both are orthogonal transforms
    // (a cyclic permutation and a diagonal reflection), so norms AND
    // within-copy dot products are preserved EXACTLY, while every pair
    // of copies decorrelates — pure rotation alone collides with period
    // = dims (copy 64 of a 64-dim vector would duplicate copy 0, which
    // is exactly the ANN-group pathology the transform exists to avoid),
    // so the sign pattern carries the copy identity for any copy count.
    val emb = col("embedding")
    val dims = size(emb)
    val rot = cp % dims
    val rotated = when(rot === 0, emb).otherwise(
      concat(slice(emb, rot + 1, dims - rot), slice(emb, lit(1), rot)))
    fan("embeddings", Tables.embeddings(spark, src))(
      "vec_id" -> rekey(col("vec_id"), copies, cp),
      "embedding" -> when(cp === 0, emb).otherwise(
        zip_with(rotated, sequence(lit(0), dims - 1),
          (x, i) => when(xxhash64(cp, i) % 2 === 0, x).otherwise(-x))))
  }

  // --- timing -------------------------------------------------------------

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Bench-methodology warm-up for one dir: pull table bytes through the
    * page cache, run one cheap query for codegen/JIT. */
  private def warm(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val p = Paths.get(s"$dir/$t.parquet")
      val files =
        if (Files.isRegularFile(p)) Seq(p)
        else if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          finally s.close()
        } else Seq.empty
      files.filter(Files.isRegularFile(_)).foreach { f =>
        val in = Files.newInputStream(f)
        try { val buf = new Array[Byte](1 << 20); while (in.read(buf) >= 0) () }
        finally in.close()
      }
      Tables.load(spark, dir, t).count()
    }
    SparkEntry.queries("q06_forecast_revenue")(spark, dir).count()
  }

  /** Probe-only substitutions, built per run because q178's needs the
    * probe's own baseline dir. Both swap a harness/geometry artifact for
    * what production data actually does, and both are recorded in the
    * output JSON's `substituted` object so the artifact declares them:
    *
    *  - q72: the θ-join's OUTPUT is quadratic in per-window traffic
    *    density by the query's own semantics (pairs/bin ≈ errors ×
    *    purchases); the correctness harness materializes it in a memory
    *    sink, which at sf1+ dies in `spark.driver.maxResultSize` —
    *    measuring the DRIVER's materialization limit, not the join. The
    *    probe drives the same join through the counting foreachBatch sink
    *    (production's files/Kafka shape: output streams out, never
    *    driver-resident), so the timing measures the join's state
    *    scaling. The correctness gate keeps the memory sink — the oracle
    *    needs rows.
    *  - q178: the interval join densifies a FIXED 64×20 kb genome, so its
    *    semantic output grows quadratically in SF (SCALE.md §4.3 — DuckDB-
    *    measured 100× pairs for 10× data); real genomics growth adds
    *    contigs/samples, keeping per-(contig, bin) density bounded. The
    *    probe scales the genome with the corpus (contigs = 64 × the
    *    documents-count ratio vs the probe's OWN dirA, so dirA runs the
    *    registered query exactly), measuring the engine at bounded
    *    density; the fixed-genome run is kept in SCALE.md §4.3 as the
    *    documented output-geometry boundary.
    */
  private def probeSubstitutions(spark: SparkSession, dirs: Seq[String],
      names: Seq[String])
      : (Map[String, (SparkSession, String) => Unit], Map[String, String]) = {
    val q72 = Map[String, (SparkSession, String) => Unit](
      "q72_stream_join" -> ((s, d) =>
        streaming.StreamTuning.withStatePartitions(s)(
          streaming.StreamingQueries.q72CountRows(s, d): Unit)))
    val q72Note = Map(
      "q72_stream_join" -> ("counting foreachBatch sink - the memory sink " +
        "measures driver materialization of a semantically quadratic " +
        "output, not the join (SCALE.md 4.2)"))
    // the q178 contig ratio costs a documents.count() per dir and the
    // q135 cell ratio an embeddings.count() per dir (cold, before
    // warm-up) — only pay each when its query is actually in the selection
    val withQ178 =
      if (!names.contains("q178_region_join")) (q72, q72Note)
      else {
        val docCounts =
          dirs.map(d => d -> Tables.load(spark, d, "documents").count()).toMap
        val base = docCounts(dirs.head).toDouble
        val contigsFor: Map[String, Long] =
          docCounts.view.mapValues(n => 64L * math.max(1L, math.round(n / base))).toMap
        val subs = q72 + ("q178_region_join" ->
          ((s: SparkSession, d: String) =>
            relational.GenomicsQueries.regionJoinFrame(s, d, contigsFor(d)).count(): Unit))
        val notes = q72Note + ("q178_region_join" ->
          ("contig-scaled genome, density bounded at " +
            "dirA's level: " + dirs.map(d => s"$d -> ${contigsFor(d)} contigs")
              .mkString("; ") + " (fixed 64-contig genome = quadratic output " +
            "geometry, SCALE.md 4.3)"))
        (subs, notes)
      }
    // q135/q45: both registered queries use a FIXED CoarseCells quantizer
    // (the oracles unroll it, so C must be constant there), which makes
    // cell-local pair volume N²/C — the §4.4 output-geometry boundary
    // (q135 measured 19.2× at sf1→sf10; q45's top-2 blocking variant
    // filled the disk with SMJ spill on its (2N)²/C candidates). The
    // SemDeDup paper's own operating regime scales k ∝ N (per-cell
    // density constant, pair volume linear); the probe measures the
    // operators THERE: cells = CoarseCells × the embeddings-count ratio
    // vs the probe's own dirA, so dirA runs the registered cell count
    // exactly and the legs stay comparable. The fixed-C runs stay
    // documented as the boundary.
    val cellScaled = Seq("q135_semdedup", "q45_embed_neardup")
      .filter(names.contains)
    if (cellScaled.isEmpty) withQ178
    else {
      val vecCounts =
        dirs.map(d => d -> Tables.load(spark, d, "embeddings").count()).toMap
      val base = vecCounts(dirs.head).toDouble
      val cellsFor: Map[String, Int] =
        vecCounts.view.mapValues(n => ops.Similarity.CoarseCells *
          math.max(1L, math.round(n / base)).toInt).toMap
      val note = "cell-scaled quantizer (k prop. to N, the SemDeDup " +
        "paper's regime; per-cell density bounded at dirA's level): " +
        dirs.map(d => s"$d -> ${cellsFor(d)} cells").mkString("; ") +
        " (fixed CoarseCells = N^2/C pair-volume geometry, SCALE.md 4.4)"
      val frameFor: Map[String, (SparkSession, String, Int) => DataFrame] = Map(
        "q135_semdedup" -> (ops.Dedup.semDedupFrame _),
        "q45_embed_neardup" -> (ops.Dedup.embedNearDupFrame _))
      val (subs, notes) = withQ178
      (subs ++ cellScaled.map(q => q ->
        ((s: SparkSession, d: String) =>
          frameFor(q)(s, d, cellsFor(d)).count(): Unit)),
       notes ++ cellScaled.map(q => q -> note))
    }
  }

  /** best-of-2 seconds for one query at one dir (Bench methodology);
    * Left(error) instead of dying so one scale-broken query (e.g. a
    * driver-collected sink outgrowing maxResultSize) doesn't void the
    * rest of the probe. */
  private def bestOf2(spark: SparkSession, dir: String, name: String,
      subs: Map[String, (SparkSession, String) => Unit]): Either[String, Double] = {
    def once(): Either[String, Double] =
      try {
        val t0 = System.nanoTime()
        subs.get(name) match {
          case Some(run) => run(spark, dir)
          case None => SparkEntry.queries(name)(spark, dir).count()
        }
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    val t = once() match {
      case Right(t1) => once() match {
        case Right(t2) => Right(math.min(t1, t2))
        case l => l
      }
      case l => l
    }
    spark.catalog.clearCache()
    System.gc()
    t
  }

  def time(dirA: String, dirB: String, names: Seq[String], out: String): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
    val (subs, subNotes) = probeSubstitutions(spark, Seq(dirA, dirB), names)

    // per-query progress on stdout: a full-surface run is an hour-plus of
    // wall-clock — the log must show where it is and what each leg cost
    def runDir(dir: String): Map[String, Either[String, Double]] =
      names.zipWithIndex.map { case (n, i) =>
        val r = bestOf2(spark, dir, n, subs)
        val shown = r.fold(e => s"ERROR $e", t => f"$t%.3f s")
        println(s"[scale] ${i + 1}/${names.size} $dir $n: $shown")
        n -> r
      }.toMap
    warm(spark, dirA)
    val a = runDir(dirA)
    // memos are keyed per (session, dir); evict so dirB's runs build their
    // own at dirB's scale instead of inheriting dirA residue
    ops.Memo.evictAll()
    spark.catalog.clearCache()
    warm(spark, dirB)
    val b = runDir(dirB)
    ops.Memo.evictAll()

    val rows = names.map { n =>
      (a(n), b(n)) match {
        case (Right(ta), Right(tb)) =>
          f"${jstr(n)}:{" + f""""a":$ta%.3f,"b":$tb%.3f,"ratio":${tb / ta}%.2f}"""
        case (ea, eb) =>
          val msg = Seq(ea.left.toOption.map("A: " + _),
            eb.left.toOption.map("B: " + _)).flatten.mkString("; ")
          s"${jstr(n)}:{" + s""""error":${jstr(msg)}}"""
      }
    }
    val okBoth = names.filter(n => a(n).isRight && b(n).isRight)
    val totalA = okBoth.map(n => a(n).toOption.get).sum
    val totalB = okBoth.map(n => b(n).toOption.get).sum
    val subJson = subNotes.filter { case (n, _) => names.contains(n) }
      .toSeq.sortBy(_._1)
      .map { case (n, note) => s"${jstr(n)}:${jstr(note)}" }
      .mkString("{", ",", "}")
    val line =
      s"""{"dirA":${jstr(dirA)},"dirB":${jstr(dirB)},""" +
      f""""totalA":$totalA%.3f,"totalB":$totalB%.3f,""" +
      f""""totalRatio":${totalB / totalA}%.2f,""" +
      s""""substituted":$subJson,""" +
      s""""queries":{${rows.mkString(",")}}}"""
    Files.writeString(Paths.get(out), line + "\n")
    println(line)
    spark.stop()
  }

  // --- multi-executor probe (cluster effects, measured) --------------------

  /** Run the selected queries under an arbitrary master URL — the point is
    * `local-cluster[n,cores,mem]`, Spark's multi-process test master: REAL
    * executor JVMs launched from SPARK_HOME, so shuffles serialize and
    * cross process boundaries over localhost TCP, broadcasts actually
    * transfer (torrent blocks, not a same-process reference), task binaries
    * and our custom expressions/plans deserialize on executors, and the
    * driver schedules over RPC. Everything the single-JVM probes
    * structurally CANNOT exercise — until now the repo's one argued-only
    * scale claim (SCALE.md §8's caveat). Run the same selection twice —
    * once with `local[32]`, once with `local-cluster[4,8,4096]` (same 32
    * total cores, same shuffle.partitions, same page cache) — and the
    * per-query delta isolates the process-boundary cost. What this still
    * does not measure (stated in SCALE.md §10): real network latency
    * (localhost loopback ≠ datacenter fabric) and stragglers from
    * heterogeneous nodes.
    *
    * Methodology is the bench's: byte-level page-cache warm-up, best-of-2
    * per query, clearCache+GC between queries, errors recorded not fatal. */
  def clusterProbe(dir: String, master: String, sel: String,
      out: String): Unit = {
    val names =
      if (sel == "all") SparkEntry.queries.keys.toSeq.sorted
      else sel.split(',').toSeq
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
    val spark = Sessions.forMaster(master, "32")
    // executor JVMs register asynchronously after session start; wait for
    // the advertised count so the first queries aren't timed on a
    // partially-provisioned cluster (on local[*] this passes immediately:
    // the map holds exactly the driver)
    val wantExecs = "local-cluster\\[(\\d+)".r.findFirstMatchIn(master)
      .map(_.group(1).toInt).getOrElse(0)
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (spark.sparkContext.getExecutorMemoryStatus.size < wantExecs + 1 &&
           System.nanoTime() < deadline) Thread.sleep(200)
    val execs = spark.sparkContext.getExecutorMemoryStatus.size
    println(s"[cluster] master=$master executors(incl driver)=$execs " +
      s"defaultParallelism=${spark.sparkContext.defaultParallelism}")
    // same probe substitutions as time(): q72's memory sink measures the
    // driver's materialization ceiling and dies in maxResultSize at sf1+
    // — which would also fail the probe's errs>0 exit — so it runs the
    // counting sink on BOTH legs of the A/B. With one dir the q178
    // substitution degenerates to the registered 64-contig query (its
    // contig ratio vs itself is 1), so the A/B legs stay comparable.
    // (The committed sf0.1 §10 run predates this and timed q72's memory
    // sink; the artifact's `substituted` field disambiguates.)
    val (subs, subNotes) = probeSubstitutions(spark, Seq(dir), names)
    warm(spark, dir)
    val results = names.zipWithIndex.map { case (n, i) =>
      val r = bestOf2(spark, dir, n, subs)
      println(s"[cluster] ${i + 1}/${names.size} $n: " +
        r.fold(e => s"ERROR $e", t => f"$t%.3f s"))
      n -> r
    }
    ops.Memo.evictAll()
    val fams = SparkEntry.familyOf
    val famTotals = results.collect { case (n, Right(t)) =>
      fams.getOrElse(n, "other") -> t }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val qJson = results.map {
      case (n, Right(t)) => f"${jstr(n)}:$t%.3f"
      case (n, Left(e)) => s"${jstr(n)}:${jstr("ERROR " + e)}"
    }
    val total = results.collect { case (_, Right(t)) => t }.sum
    val errs = results.count(_._2.isLeft)
    val line =
      s"""{"dir":${jstr(dir)},"master":${jstr(master)},""" +
      s""""executorsInclDriver":$execs,""" +
      s""""defaultParallelism":${spark.sparkContext.defaultParallelism},""" +
      f""""total":$total%.3f,"errors":$errs,""" +
      s""""substituted":${subNotes.filter { case (n, _) => names.contains(n) }
        .toSeq.sortBy(_._1)
        .map { case (n, note) => s"${jstr(n)}:${jstr(note)}" }
        .mkString("{", ",", "}")},""" +
      s""""families":{${famTotals.map { case (f, t) =>
        f"${jstr(f)}:$t%.3f" }.mkString(",")}},""" +
      s""""queries":{${qJson.mkString(",")}}}"""
    Files.writeString(Paths.get(out), line + "\n")
    println(line)
    spark.stop()
    if (errs > 0) sys.exit(1)
  }

  // --- measured shuffle bytes (round-11 verdict #3) -----------------------

  /** Recursively collect every executed ShuffleExchangeExec reachable from
    * `p`, descending through the wrappers a post-execution AQE plan
    * interposes (AdaptiveSparkPlanExec → final plan, QueryStageExec →
    * materialized stage, ReusedExchangeExec → the original exchange,
    * InMemoryTableScanExec → the plan that built the cache) and into
    * subquery expressions (scalar-aggregate combines live there). Reuse
    * means one exchange instance can be reached twice — deduped by
    * identity, so bytes are counted once per physical shuffle. */
  private def collectShuffles(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
    val self = p match { case s: ShuffleExchangeExec => Seq(s); case _ => Nil }
    val wrapped = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case i: InMemoryTableScanExec => Seq(i.relation.cachedPlan)
      case _ => Nil
    }
    val subq = p.expressions.flatMap(_.collect {
      case e: org.apache.spark.sql.execution.ExecSubqueryExpression => e.plan
    })
    self ++ (p.children ++ wrapped ++ subq).flatMap(collectShuffles)
  }

  /** Execute queries at `runDir` and read each executed plan's REAL
    * shuffle-write metrics — the step past plan-shape auditing: PLANS.md
    * proves every SinglePartition exchange is bounded BY CONSTRUCTION;
    * this probe shows the bytes each one actually moved at scale.
    * Selection `topN` is machine-derived, not hand-picked: rank every
    * batch query by the plan audit at `rankDir` (plan shapes are
    * SF-invariant up to the enumerated stats flips, SCALE.md §2; ranking
    * at sf0.001 keeps selection cheap), union of the top N/2 by
    * single-partition-exchange count (the claim under test) and top N/2
    * by total exchange count (the shuffle-heavy set). Streaming queries
    * are out of scope: their returned frame is the memory-sink tail, and
    * their state movement is measured by the §3 probe instead.
    *
    * Caveat recorded here rather than hidden: metrics come from the
    * RETURNED frame's executed plan, which covers cache-building plans
    * (InMemoryTableScan descent) but not jobs a query ran and discarded
    * driver-side (e.g. EM-loop localCheckpoints). */
  def shuffleProbe(rankDir: String, runDir: String, sel: String,
      out: String): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val fams = SparkEntry.familyOf
    val chosen: Seq[String] =
      // `all` = every batch query: because the probe executes via toRdd,
      // it EVALUATES every output column — a materialization audit the
      // count()-based bench/time probes structurally cannot be (Catalyst
      // prunes unreferenced columns under count(), which hid q166's
      // sum-of-squares long overflow until this probe ran at sf1).
      // Streaming queries stay out of scope: their returned frame is the
      // memory-sink tail, fully materialized by the fn itself.
      if (sel == "all")
        SparkEntry.queries.keys.toSeq.sorted
          .filterNot(n => fams.get(n).contains("streaming"))
      else if (sel.startsWith("top")) {
        val nStr = sel.stripPrefix("top")
        require(nStr.nonEmpty && nStr.forall(_.isDigit),
          s"selection '$sel' — expected topN (e.g. top20), 'all', or a " +
            "comma-separated query list")
        val n = nStr.toInt
        val ranked = audit0(spark, rankDir)
          .filterNot { case (name, _) => fams.get(name).contains("streaming") }
        val bySp = ranked.sortBy { case (n0, c) =>
          (-c.singlePartitionExchanges, -c.exchanges, n0) }.map(_._1)
        val byEx = ranked.sortBy { case (n0, c) =>
          (-c.exchanges, n0) }.map(_._1)
        (bySp.take(n / 2) ++ byEx).distinct.take(n)
      } else {
        // fail fast on a typo, like time()/clusterProbe — otherwise it
        // surfaces only as a per-query error row after the warm-up ran
        val explicit = sel.split(',').toSeq
        val missing = explicit.filterNot(SparkEntry.queries.contains)
        require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
        explicit
      }
    warm(spark, runDir)
    val rows = chosen.zipWithIndex.map { case (name, i) =>
      val r = try {
        // q146 substitutes its distributed scatter frame: the registered
        // fn collects driver-side, so its returned frame is a local
        // relation that would read 0 shuffle bytes while the real work
        // ran in driver-discarded jobs (see Plans.auditSubstitutes)
        val df = Plans.auditSubstitutes.get(name)
          .map(_(spark, runDir))
          .getOrElse(SparkEntry.queries(name)(spark, runDir))
        // execute the frame itself (df.count() would execute a DIFFERENT
        // plan — the count aggregate — leaving this plan's metrics empty)
        val nRows = df.queryExecution.toRdd.count()
        val shuffles = collectShuffles(df.queryExecution.executedPlan)
        val seen = java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
        val uniq = shuffles.filter(seen.add(_))
        val exJson = uniq.map { s =>
          val single = s.outputPartitioning ==
            org.apache.spark.sql.catalyst.plans.physical.SinglePartition
          val bytes = s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(-1L)
          val recs = s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(-1L)
          s"""{"partitioning":${jstr(s.outputPartitioning.toString.take(120))},""" +
          s""""numPartitions":${s.outputPartitioning.numPartitions},""" +
          s""""bytesWritten":$bytes,"recordsWritten":$recs,"single":$single}"""
        }
        val totB = uniq.flatMap(_.metrics.get("shuffleBytesWritten").map(_.value)).sum
        val spB = uniq.filter(_.outputPartitioning ==
            org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
          .flatMap(_.metrics.get("shuffleBytesWritten").map(_.value))
        Right((nRows, totB, spB, exJson))
      } catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      System.gc()
      val shown = r.fold(e => s"ERROR $e", { case (nr, tb, spb, ex) =>
        s"rows=$nr shuffles=${ex.size} bytes=$tb " +
          s"singlePartitionBytes=[${spb.mkString(",")}]" })
      println(s"[shuffle] ${i + 1}/${chosen.size} $name: $shown")
      name -> r
    }
    val qJson = rows.map {
      case (n, Right((nr, tb, spb, ex))) =>
        s"${jstr(n)}:{" + s""""rows":$nr,"totalShuffleBytes":$tb,""" +
        s""""maxSinglePartitionBytes":${if (spb.isEmpty) 0 else spb.max},""" +
        s""""exchanges":[${ex.mkString(",")}]}"""
      case (n, Left(e)) => s"${jstr(n)}:{" + s""""error":${jstr(e)}}"""
    }
    val line = s"""{"rankDir":${jstr(rankDir)},"runDir":${jstr(runDir)},""" +
      s""""queries":{${qJson.mkString(",")}}}"""
    Files.writeString(Paths.get(out), line + "\n")
    println(line)
    spark.stop()
  }

  /** Plan-audit counts per batch query at `dir` (selection helper). */
  private def audit0(spark: SparkSession, dir: String)
      : Seq[(String, PlanAudit.Counts)] =
    Plans.audit(spark, dir, collectText = false).perQuery.toSeq

  // --- skew mitigation, measured (round 12) --------------------------------

  /** Per-stage task-duration capture for the skew/straggler probes: the
    * skew claim is about the LONGEST task in the join stage (wall time
    * alone can hide a straggler task overlapped by other stages). */
  private final class TaskDurations extends org.apache.spark.scheduler.SparkListener {
    val byStage = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    val tasksByExecutor = scala.collection.mutable.Map[String, Int]()
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      synchronized {
        byStage.getOrElseUpdate(te.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += te.taskInfo.duration
        tasksByExecutor(te.taskInfo.executorId) =
          tasksByExecutor.getOrElse(te.taskInfo.executorId, 0) + 1
      }
    /** (maxMs, medianMs, nTasks) of the stage holding the longest task. */
    def worstStage: (Long, Long, Int) = synchronized {
      if (byStage.isEmpty) (0L, 0L, 0)
      else {
        val ds = byStage.values.maxBy(_.max).sorted
        (ds.max, ds(ds.size / 2), ds.size)
      }
    }
  }

  /** AQE skew-split A/B on a DELIBERATELY skewed join —
    * `runMain graft.Scale skew <dir> <outJson>`. PLANS.md's skew story is
    * twofold. Per-class normalizations are aggregates + join-backs whose
    * hot key collapses MAP-SIDE and whose small side broadcasts (never
    * unsplittable windows — spec-pinned by QuantifySuite's hot-class
    * fixture; and note AQE CANNOT split a fact⋈agg SMJ, because the agg
    * child is not a bare shuffle stage — the broadcast/map-side-combine
    * design is the mitigation there, not AQE). What AQE skew-split DOES
    * cover is the surface's fact⋈fact pair joins — LSH (band,bucket)
    * buckets, PPJoin prefix tokens, trigram keys — where one hot bucket
    * skews a plain shuffle⋈shuffle join; that claim was argued, not
    * measured, and this probe measures it. Input: the corpus's events
    * table with HALF of all rows remapped onto one hot join key on the
    * left, joined to a uniformly-keyed projection of the same table (both
    * sides plain scan→shuffle, the splittable shape); broadcast disabled
    * so the join is a real SMJ, AQE skew thresholds lowered to match
    * probe-scale partitions (defaults target 256 MB production
    * partitions; the MECHANISM — split the oversized left partition,
    * replicate the matching right partition — is what's under test, and
    * it is threshold-gated, not size-dependent). Metric: the longest
    * task across the job (the straggler that gates wall-clock) with its
    * stage's median and the executed plan's skew marks, OFF vs ON —
    * after the split the longest task is no longer the join's hot
    * partition at all. */
  def skewProbe(dir: String, out: String): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    import spark.implicits._
    import org.apache.spark.sql.functions._
    warm(spark, dir)
    def run(skewJoin: Boolean): (Double, Long, Long, Int, Int) = {
      val c = spark.conf
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64k")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      // coalescing would immediately re-merge the sub-advisory splits
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try {
        // left: 50% of events on hot key 0, the rest spread over 997
        // keys (the hot-LSH-bucket shape); right: the same table keyed
        // uniformly (~rows/998 per key), so the hot output is
        // |hot|·|right match| while both join children stay bare
        // scan→shuffle stages. The repartition(16) exists because skew
        // split works at MAP-CHUNK granularity (a skewed reduce
        // partition is carved along mapper boundaries): the probe corpus
        // is one parquet file = ONE scan mapper, whose single chunk is
        // unsplittable — a small-file artifact, not a production
        // behavior (a 100 TB scan has thousands of mappers). 16 mappers
        // give the splitter real boundaries; debug-verified that without
        // it the rule sees the 25x-median partition and still splits 0.
        val left = Tables.events(spark, dir).repartition(16).select(
          when($"event_id" % 2 === 0, lit(0L))
            .otherwise(pmod($"event_id", lit(199)) + 1).as("k"),
          $"value")
        val right = Tables.events(spark, dir).select(
          pmod($"event_id", lit(200)).as("k"),
          length($"props").as("w"))
        // downstream agg groups on a NON-join key, as the engine's pair
        // pipelines do (LSH candidates group by pair id, not bucket):
        // grouping on the join key itself would make the join's output
        // partitioning reusable, and AQE's cost evaluator then correctly
        // DECLINES the skew rewrite (it would add an exchange a
        // non-skewed plan doesn't need) unless forceOptimizeSkewedJoin
        // is set — debug-verified: "skewed partitions: left 1" found,
        // rewrite reverted. Here the join output re-shuffles either way,
        // so the rewrite is cost-neutral and adopted.
        val joined = left.join(right, "k")
          .groupBy($"w")
          .agg(count(lit(1)).as("n"), sum($"value").as("s"))
        val listener = new TaskDurations
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        joined.queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        val skewMarks = "isSkew=true|skew=true".r
          .findAllIn(joined.queryExecution.executedPlan.toString).size
        val (mx, med, n) = listener.worstStage
        spark.catalog.clearCache()
        System.gc()
        (wall, mx, med, n, skewMarks)
      } finally {
        Seq("spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.skewJoin.enabled",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "spark.sql.adaptive.coalescePartitions.enabled").foreach(c.unset)
      }
    }
    run(skewJoin = false) // discarded JIT/page-cache warm-up leg
    val (wOff, mxOff, medOff, nOff, marksOff) = run(skewJoin = false)
    val (wOn, mxOn, medOn, nOn, marksOn) = run(skewJoin = true)
    def leg(w: Double, mx: Long, med: Long, n: Int, marks: Int): String =
      f"""{"wallSec":$w%.3f,"maxTaskMs":$mx,""" +
      f""""worstStageMedianTaskMs":$med,"worstStageTasks":$n,""" +
      f""""planSkewMarks":$marks}"""
    val line = s"""{"dir":${jstr(dir)},""" +
      s""""skewOff":${leg(wOff, mxOff, medOff, nOff, marksOff)},""" +
      s""""skewOn":${leg(wOn, mxOn, medOn, nOn, marksOn)},""" +
      f""""maxTaskRatioOffOverOn":${mxOff.toDouble / math.max(1L, mxOn)}%.2f}"""
    Files.writeString(Paths.get(out), line + "\n")
    println(line)
    spark.stop()
  }

  /** Straggler (slow-node) mitigation on real executor JVMs —
    * `runMain graft.Scale straggler <dir> <masterUrl> <baseTaskMs>
    * <outJson>`. One executor is made a 4×-slow node by injection (every
    * task on the lexicographically-first executor dilates its simulated
    * work 4×, modeling a contended or degraded host). The mitigation
    * under test is PULL-BASED SCHEDULING GRANULARITY — the lever the
    * engine actually controls via partition sizing: with one wave
    * (32 tasks on 32 slots) the slow node's tasks gate the stage no
    * matter what; with many waves of small tasks (256 partitions, same
    * total work) fast executors keep pulling while the slow node
    * finishes fewer tasks, and the per-executor task-count distribution
    * in the artifact shows the scheduler adapting. Spark's OTHER
    * mitigation, speculative re-execution, is structurally
    * unmeasurable on one machine and this is documented rather than
    * faked: a speculative copy is never scheduled on the same HOST as
    * the running attempt (TaskSetManager's hasAttemptOnHost exclusion),
    * and every local-cluster executor shares localhost — verified
    * empirically (quantile 0.5, multiplier 1.5, 100 ms interval, 8 tasks
    * 12× over median: zero speculative launches). Workload: a lineitem
    * scan (real corpus bytes) plus a per-task sleep of baseTaskMs·32/P
    * (4× that on the slow node), so total simulated work is identical
    * across legs. */
  def stragglerProbe(dir: String, master: String, baseTaskMs: Long,
      out: String): Unit = {
    val spark = Sessions.forMaster(master, "32")
    // wait for executor registration, as in clusterProbe
    val wantExecs = "local-cluster\\[(\\d+)".r.findFirstMatchIn(master)
      .map(_.group(1).toInt).getOrElse(0)
    val deadline = System.nanoTime() + 60L * 1000000000L
    while (spark.sparkContext.getExecutorMemoryStatus.size < wantExecs + 1 &&
           System.nanoTime() < deadline) Thread.sleep(200)
    warm(spark, dir)
    val target = spark.sparkContext.parallelize(1 to 256, 32)
      .mapPartitions(_ =>
        Iterator(org.apache.spark.SparkEnv.get.executorId))
      .collect().distinct.filterNot(_ == "driver").sorted.head
    def leg(partitions: Int): String = {
      val perTaskMs = baseTaskMs * 32 / partitions
      val rdd = Tables.load(spark, dir, "lineitem").repartition(partitions)
        .rdd.mapPartitions { it =>
          val slow = org.apache.spark.SparkEnv.get.executorId == target
          Thread.sleep(if (slow) perTaskMs * 4 else perTaskMs)
          it
        }
      val listener = new TaskDurations
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = rdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val byExec = listener.tasksByExecutor.toSeq.sortBy(_._1)
        .map { case (e, c) => s"${jstr(e)}:$c" }.mkString("{", ",", "}")
      spark.catalog.clearCache()
      System.gc()
      f"""{"partitions":$partitions,"perTaskMs":$perTaskMs,"rows":$n,""" +
        f""""wallSec":$wall%.3f,"tasksByExecutor":$byExec}"""
    }
    val coarse = leg(32)
    val fine = leg(256)
    val line = s"""{"dir":${jstr(dir)},"master":${jstr(master)},""" +
      s""""slowExecutor":${jstr(target)},"slowFactor":4,""" +
      s""""baseTaskMs":$baseTaskMs,"oneWave":$coarse,"manyWaves":$fine}"""
    Files.writeString(Paths.get(out), line + "\n")
    println(line)
    spark.stop()
  }
}
