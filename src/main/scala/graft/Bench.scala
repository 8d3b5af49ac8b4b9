package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds over
  * SPARK_GRAFT_SF_DIR plus era parse-throughput metrics comparable to the
  * reference's published blocks/s table (BASELINE.md).
  *
  * Each query runs twice and reports the faster run: the first execution
  * pays one-time JVM/codegen compilation (~6 s for a 5-stage join) that
  * amortizes to zero in any long-lived deployment — steady-state is the
  * number that scales to the 100 TB cluster. */
object Bench {

  private def timed(n: Int)(body: => Unit): Seq[Double] =
    (1 to n).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

  private def best(n: Int)(body: => Unit): Double = timed(n)(body).min

  /** Recursive on-disk size — the write-throughput witness's numerator. */
  private def dirBytes(path: String): Long = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  /** Fixed-size write probe: ~10 MB of parquet through the same Spark
    * write path as the measured exports, returned as MB/s and the dir
    * deleted. Run before AND after every write-heavy rep (wh_loop rungs,
    * ETL runs): this sandbox's write path is bimodal (3–5 s vs 20–80 s
    * page-cache writeback stalls — BENCH_NOTES), and a collapsed probe
    * labels the rep as ENVIRONMENT inside the artifact itself, so a slow
    * reading adjudicates without an out-of-band run (VERDICT r13 #1/#3).
    * [[WriteProbeStallMbps]] is the label threshold, calibrated idle vs
    * under induced write load by tools/WriteStallProbe. */
  private[graft] def writeProbeMbps(spark: SparkSession): Double = {
    val dir = java.nio.file.Files.createTempDirectory("graft-wprobe").toString
    val t0 = System.nanoTime()
    spark.range(1250000L).selectExpr("id", "hash(id) as v")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/p.parquet")
    val sec = (System.nanoTime() - t0) / 1e9
    val mb = dirBytes(dir) / 1e6
    deleteRecursively(dir)
    math.rint(mb / sec * 10) / 10
  }

  /** A rep with EITHER bracketing probe under this is stall-labeled
    * (min(pre, post) < threshold — the sensitive direction: a stall
    * window long enough to slow the rep usually reaches at least one
    * adjacent probe, and a false "stalled" only demotes the rep from the
    * headline, never hides it). Calibration (tools/WriteStallProbe on
    * this box): idle probes measure well above it; under an induced
    * dirty-page flood they collapse under it. */
  private[graft] val WriteProbeStallMbps = 8.0

  /** ~0.3 s single-thread CPU microprobe, run before AND after every
    * write-heavy rep NEXT TO the write probe: the write probe can only see
    * writeback stalls, and both final r14 runs had tmpfs ETL reps 3–6×
    * slow with `stalled=false` because the mechanism was CPU steal /
    * memory pressure — which the run-LEVEL cal probes bracket too coarsely
    * to pin on a rep (VERDICT r14 #1). Same xorshift kernel as the cal
    * probe at 3/8 the iterations (≈0.3 s idle on this box). */
  private[graft] def cpuProbeSec(): Double = {
    val t0 = System.nanoTime()
    blackhole ^= hashLoop(CpuProbeIters, 0x2545f4914f6cdd1dL)
    math.rint((System.nanoTime() - t0) / 1e9 * 1000) / 1000
  }

  private[graft] val CpuProbeIters = 150000000L

  /** Stall threshold for [[cpuProbeSec]], set from THIS run's own warm
    * calibration (st_sec × the iteration ratio × factor 2, floored at
    * 0.2 s): a probe that takes 2× the run's own single-thread baseline
    * names steal/pressure, not noise. Double.MaxValue until main
    * calibrates, so tools/tests that call the rep helpers directly never
    * label on an unset threshold. */
  @volatile private[graft] var CpuProbeStallSec: Double = Double.MaxValue

  /** Continuous IN-REP CPU sampler: a daemon thread runs back-to-back
    * [[cpuProbeSec]] probes for the rep's whole duration and keeps the
    * MAX. The bracketing pre/post probes miss a mid-rep steal window that
    * recovers before the post-probe — observed LIVE in the first r15
    * sf0.1 run: a 73 s tmpfs ETL rep (7× the clean rep) with healthy
    * brackets on both sides. Costs one of 32 cores during measured reps;
    * it runs during EVERY rep, so the tax is uniform and cancels in
    * rep-to-rep comparison. */
  private[graft] final class CpuSampler {
    @volatile private var stopped = false
    @volatile private var maxSec = 0.0
    @volatile private var sumSec = 0.0
    @volatile private var n = 0L
    private val t = new Thread(() => {
      while (!stopped) {
        val s = cpuProbeSec()
        if (s > maxSec) maxSec = s
        sumSec += s; n += 1
      }
    })
    t.setDaemon(true)
    t.start()
    /** Stop sampling; returns (mean, max) of the in-rep probes. The MEAN
      * is the label signal: a steal window runs minutes, so it lifts most
      * of a slow rep's probes (sustained 2× under the cpu-flood drill),
      * while the rep's OWN GC pauses — workload, not environment — only
      * spike the max. The max rides the artifact as evidence. */
    def stop(): (Double, Double) = {
      stopped = true
      t.join(5000)
      def r3(d: Double) = math.rint(d * 1000) / 1000
      (r3(if (n == 0) 0.0 else sumSec / n), r3(maxSec))
    }
  }

  /** Read /proc/stat's aggregate steal ticks — the KERNEL's own count of
    * time the hypervisor ran someone else while this guest had runnable
    * work. This box's counter is live (1.27M ticks ≈ 12,700 stolen
    * CPU-seconds at snapshot time), so a per-rep DELTA measures the
    * mechanism the probes could only infer: Δticks/100 = stolen
    * core-seconds during the rep, workload-independent (a rep's own
    * saturation or GC never moves it). None on non-Linux / unreadable. */
  private[graft] def stealTicks(): Option[Long] =
    try {
      val line = java.nio.file.Files.lines(java.nio.file.Paths.get("/proc/stat"))
        .filter(_.startsWith("cpu ")).findFirst()
      if (!line.isPresent) None
      else {
        val f = line.get.trim.split("\\s+")
        // cpu user nice system idle iowait irq softirq STEAL guest …
        if (f.length > 8) Some(f(8).toLong) else None
      }
    } catch { case _: Exception => None }

  /** A rep is steal-labeled when the hypervisor stole more than this many
    * cores on average across its window (10% of the advertised 32 — well
    * above jitter, well below the 2–3× slowdowns the label exists for). */
  private[graft] val StealStallCores = 3.2

  /** One write-heavy rep's bracketing evidence: seconds, both probe
    * pairs, the in-rep sampler mean/max, the /proc/stat steal delta, and
    * the derived labels. `stallKind` NAMES the mechanism(s) — "write"
    * (probe MB/s collapse), "cpu" (microprobe 2× slow at a bracket or
    * sustained mid-rep), "steal" (kernel-counted hypervisor steal over
    * 10% of the machine for the rep's duration), any "+"-joined
    * combination, or "none" — so a slow rep adjudicates itself without
    * an out-of-band run. */
  private[graft] case class ProbedRep(sec: Double, wpre: Double, wpost: Double,
      cpre: Double, cpost: Double, cmid: Double = 0.0, cmidMax: Double = 0.0,
      stealCores: Double = 0.0) {
    def writeStalled: Boolean = math.min(wpre, wpost) < WriteProbeStallMbps
    def cpuStalled: Boolean =
      math.max(math.max(cpre, cpost), cmid) > CpuProbeStallSec
    def stealStalled: Boolean = stealCores > StealStallCores
    def stalled: Boolean = writeStalled || cpuStalled || stealStalled
    def stallKind: String = {
      val kinds = Seq("write" -> writeStalled, "cpu" -> cpuStalled,
        "steal" -> stealStalled).collect { case (k, true) => k }
      if (kinds.isEmpty) "none" else kinds.mkString("+")
    }
  }

  /** Average cores stolen across a rep window, from two stealTicks reads
    * (USER_HZ = 100 on Linux). 0.0 when the counter is unavailable. */
  private[graft] def stealCoresOver(pre: Option[Long], post: Option[Long],
      sec: Double): Double = (for (a <- pre; b <- post) yield
    math.rint((b - a) / 100.0 / math.max(0.001, sec) * 100) / 100).getOrElse(0.0)

  /** Headline selector: the fastest CLEAN-labeled rep when one exists,
    * else the fastest overall (every rep stalled ⇒ there is no clean
    * witness to prefer). The r14 driver artifact's ETL headline was a
    * stall-LABELED 20.6 s disk rep that only `etl_committed_sec`
    * adjudicated — the headline field itself should not need
    * adjudicating (VERDICT r14 #1). */
  private[graft] def bestClean[A](reps: Seq[A])(sec: A => Double,
      stalled: A => Boolean): A = {
    val clean = reps.filterNot(stalled)
    (if (clean.nonEmpty) clean else reps).minBy(sec)
  }

  /** Minimum wall-clock gap before a soak entry's adjudication rerun —
    * this box's steal windows run minutes, so a rep2 seconds after rep1
    * is a weak witness (ADVICE r14 #2). */
  private[graft] val SoakMinGapSec = 60.0

  @volatile private var blackhole = 0L // defeats dead-code elimination of the probe

  private def hashLoop(iters: Long, seed: Long): Long = {
    var x = seed | 1L
    var i = 0L
    while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }

  /** Fixed-cost calibration probe, run before AND after the measured work.
    * BENCH numbers from this sandbox have drifted ±3× between rounds with
    * zero code change (BENCH_r07 vs r08); these three constants make every
    * run self-interpreting:
    *  - `st_sec`: 4e8-iteration xorshift on ONE thread — pure single-core
    *    speed / CPU steal, no allocation, no Spark;
    *  - `mt_sec`: the same per-thread work on min(32, cores) threads — on an
    *    uncontended 32-core box this equals st_sec; a higher ratio means the
    *    sandbox is not actually giving us the advertised cores;
    *  - `scan_sec`: sum over a fixed 20M-row / 2-col parquet written by this
    *    run — Spark scheduling + IO at a constant data size, independent of
    *    SPARK_GRAFT_SF_DIR.
    * A slow round with slow probes is environment; a slow round with fast
    * probes is a regression. */
  private def calibrate(spark: SparkSession, scanPath: String): (Double, String) = {
    val iters = 400000000L
    val t0 = System.nanoTime()
    blackhole ^= hashLoop(iters, 0x9e3779b97f4a7c15L)
    val st = (System.nanoTime() - t0) / 1e9
    val nThreads = math.min(Runtime.getRuntime.availableProcessors(), 32)
    val t1 = System.nanoTime()
    val threads = (1 to nThreads).map { i =>
      new Thread(() => { blackhole ^= hashLoop(iters, i.toLong) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val mt = (System.nanoTime() - t1) / 1e9
    var sum = 0L
    val t2 = System.nanoTime()
    sum = spark.read.parquet(scanPath)
      .selectExpr("sum(v)").collect()(0).getLong(0)
    val scan = (System.nanoTime() - t2) / 1e9
    blackhole ^= sum
    def r2(d: Double) = math.rint(d * 100) / 100
    (st,
      s"""{"st_sec":${r2(st)},"mt${nThreads}_sec":${r2(mt)},"scan_sec":${r2(scan)}}""")
  }

  /** Per-task maxima over a measured query — the skew detector: a
    * quadratic blocking bucket or a single-partition window shows up as
    * ONE task reading/shuffling the whole corpus, which wall-clock alone
    * can hide behind 31 idle cores. Shared with [[graft.SoakSpec]], which
    * turns the same measurement into a failing test. */
  private[graft] class MaxTaskListener
      extends org.apache.spark.scheduler.SparkListener {
    @volatile var maxInput = 0L
    @volatile var maxShuffleRead = 0L
    def reset(): Unit = { maxInput = 0L; maxShuffleRead = 0L }
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        maxInput = math.max(maxInput, m.inputMetrics.bytesRead)
        maxShuffleRead =
          math.max(maxShuffleRead, m.shuffleReadMetrics.totalBytesRead)
      }
    }
  }

  /** Build the adversarially-skewed soak corpus: `copies`× self-union of
    * `documents` where every copy appends the same boilerplate line (hot
    * chunk digests + hot SimHash buckets; each doc gains copies−1
    * byte-identical twins) and collapses onto one language, and `orders`
    * copies collapse onto one hot custkey. Returns the temp dir. */
  private[graft] def soakCorpus(spark: SparkSession, sfDir: String,
      copies: Int): String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val hot = "all rights reserved subscribe to our newsletter for more updates terms of service apply to every visitor"
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    (0 until copies).map { i =>
      val c = docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
      if (i == 0) c
      else c.withColumn("text", concat(col("text"), lit(" " + hot)))
        .withColumn("lang", lit("en"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val orders0 = spark.read.parquet(s"$sfDir/orders.parquet")
    (0 until copies).map { i =>
      if (i == 0) orders0 else orders0.withColumn("o_custkey", lit(1L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** Skew/scale soak: self-union the corpus `copies`× with a deliberately
    * hot key family — every copy appends the same boilerplate line (hot
    * chunk digests + hot SimHash buckets: each doc gains copies−1
    * byte-identical twins) and collapses onto one language; orders copies
    * collapse onto one hot custkey — then time the dedup/diag/calibration
    * family and report per-query seconds plus the largest single-task
    * input/shuffle-read. This is the measured regression gate for the r8
    * plan-shape fixes (bucket frequency caps, broadcast-free bad-digest
    * join, windowless totals, keyed rank windows): any of them reverting
    * turns a bounded max-task number into "one task ate the corpus". */
  private def soak(spark: SparkSession, sfDir: String, copies: Int,
      committed: Map[String, Double] = Map.empty): String = {
    val dir = soakCorpus(spark, sfDir, copies)
    val listener = new MaxTaskListener
    spark.sparkContext.addSparkListener(listener)
    val family = Seq("dedup_exact", "clean_boilerplate", "dedup_simhash_pairs",
      "dedup_winnow_pairs", "text_nb_calibration", "diag_skew", "passage_spans")
    case class SoakRun(name: String, sec: Double, inMb: Double, shufMb: Double,
        ok: Boolean, endT: Double)
    val mb = (b: Long) => math.rint(b / 1e5) / 10
    val first = family.map { name =>
      listener.reset()
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, dir).count(); true }
        catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      // barrier on the listener bus itself (not a sleep): all task-end
      // events for this query are delivered before the metrics are read
      org.apache.spark.graftutil.ListenerDrain.drain(spark.sparkContext)
      SoakRun(name, sec, mb(listener.maxInput), mb(listener.maxShuffleRead),
        ok, System.nanoTime() / 1e9)
    }
    // spaced adjudication rep (VERDICT r13 #1 — the wh_loop/soak families
    // were the last without the sweep's self-adjudication witness): any
    // entry above 3× its COMMITTED-round seconds re-runs after the whole
    // family has passed (minutes of gap), so a single steal/writeback
    // window can't cover both reps — the artifact entry then carries
    // rep2 + the measured gap + the committed baseline, and "steal vs
    // regression" is decidable from this file alone.
    val rerun: Map[String, (Double, Double)] = first
      .filter(e => e.ok && committed.get(e.name).exists(c => e.sec > 3 * c))
      .map { e =>
        // enforce REAL temporal spacing (ADVICE r14 #2): an entry late in
        // the family order would otherwise re-run with near-zero gap, and
        // one steal window could cover both reps — exactly what the
        // spaced rep exists to rule out. Waiting out the remainder costs
        // ≤ SoakMinGapSec and only when an entry actually tripped 3×.
        val gap0 = System.nanoTime() / 1e9 - e.endT
        if (gap0 < SoakMinGapSec)
          Thread.sleep(((SoakMinGapSec - gap0) * 1000).toLong)
        val gap = System.nanoTime() / 1e9 - e.endT
        val t0 = System.nanoTime()
        try SparkEntry.queries(e.name)(spark, dir).count()
        catch { case _: Throwable => () }
        e.name -> ((System.nanoTime() - t0) / 1e9, gap)
      }.toMap
    spark.sparkContext.removeSparkListener(listener)
    val r1d = (d: Double) => math.rint(d * 10) / 10
    val entries = first.map { e =>
      val extra = new StringBuilder
      committed.get(e.name).foreach(c => extra ++= s""","committed_sec":${r1d(c)}""")
      rerun.get(e.name).foreach { case (s2, gap) =>
        extra ++= s""","rep2_sec":${r1d(s2)},"gap_sec":${r1d(gap)}"""
      }
      val failStr = if (e.ok) "" else ",\"fail\":true"
      s""""${e.name}":{"sec":${r1d(e.sec)},"max_task_in_mb":${e.inMb},"max_task_shuf_mb":${e.shufMb}$extra$failStr}"""
    }
    s"""{"copies":$copies,${entries.mkString(",")}}"""
  }

  /** Self-scaled ramp corpus: `copies`× union of a deterministic 1/8
    * subsample of the input corpus, with DISTINCT ids and SHIFTED content —
    * the opposite of [[soakCorpus]]'s hot twins: every copy prepends a
    * copy-unique token to `text` (fresh shingles, MinHash/SimHash digests
    * and chunk hashes, so the dedup families do real work instead of
    * collapsing onto byte-twins) and nudges every embedding dimension by a
    * copy-dependent epsilon (fresh cosine structure, so cells/buckets
    * spread instead of stacking). Embedding ids are renumbered contiguously
    * after the subsample, then INTERLEAVED across copies (vec_id·copies +
    * copy), so the query (`vec_id < nQueries`) and centroid
    * (`[100, 100+k)`) id ranges are FULLY populated at every scale —
    * including deep rungs where k = centroidCount(copies·B) outgrows the
    * base subsample size B. Base is 1/8
    * of the bench corpus so the 64× rung lands at 8× the LARGEST
    * driver-provided corpus — measured scale evidence past sf0.1, not
    * plan-shape prose. */
  private[graft] def rampCorpus(spark: SparkSession, sfDir: String,
      copies: Int): String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ramp$copies").toString
    // copies are fanned out through ONE broadcast crossJoin against a
    // copies-row dimension, never an N-way union: a 512-way union is
    // itself the wrong plan shape (512 scan branches, megabyte task
    // binaries, minutes of planning) — the corpus builder has to obey the
    // same scale discipline the queries do
    val copyDim = broadcast(
      spark.range(copies.toLong).select(col("id").as("copy")))
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 8 === 0)
    docs0.crossJoin(copyDim)
      .withColumn("doc_id", col("doc_id") + col("copy") * 100000000L)
      .withColumn("text",
        concat(lit("c"), col("copy").cast("string"), lit(" "), col("text")))
      .drop("copy")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))
    val embAll = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // the ANN kernels draw queries from vec_id < 5 and centroids from
    // [100, 100+k): the renumbered 1/8 subsample only keeps that range
    // populated when the base is big enough — below it, ramp from the full
    // corpus (only reachable on tiny local runs; the sf0.1 bench samples)
    val emb0 =
      if (embAll.count() >= 1600)
        embAll.filter(col("vec_id") % 8 === 0)
          .withColumn("vec_id", row_number().over(w).cast("long") - 1)
      else embAll
    // ids are INTERLEAVED (vec_id·copies + copy), not copy-shifted: the
    // id space stays contiguous [0, copies·B), so the centroid range
    // [100, 100+k) is genuinely populated at EVERY rung even when
    // k = centroidCount(copies·B) outgrows the base subsample size B —
    // under the old copy-shift only copy 0's B ids sat below the shift,
    // so deep rungs silently measured min(k, B−100) real centroids
    emb0.crossJoin(copyDim)
      .withColumn("embedding", expr(
        "transform(embedding, (x, d) -> cast(x + ((d * 31 + copy) % 7 - 3) * cast(0.01 as double) as float))"))
      .withColumn("vec_id", col("vec_id") * copies + col("copy"))
      .drop("copy")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // events: whole USERS sampled (sessions/attribution windows must see a
    // user's complete stream), copies disjoint in user and event ids —
    // behavioral output scales exactly linearly, so the gate is strict
    graft.queries.Tables.load(spark, sfDir, "events")
      .filter(col("user_id") % 8 === 0)
      .crossJoin(copyDim)
      .withColumn("user_id", col("user_id") + col("copy") * 100000000L)
      .withColumn("event_id", col("event_id") + col("copy") * 100000000L)
      .drop("copy")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // lineitem: whole ORDERS sampled (baskets must stay intact), copies
    // disjoint in order AND part space — each copy is an isolated
    // co-purchase graph, so triangle work scales linearly too
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 8 === 0)
      .crossJoin(copyDim)
      .withColumn("l_orderkey", col("l_orderkey") + col("copy") * 1000000000L)
      .withColumn("l_partkey", col("l_partkey") + col("copy") * 100000000L)
      .drop("copy")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  /** The representative kernels per family the ramp tracks. */
  private val rampFamilies: Seq[(String, Seq[String])] = Seq(
    "dedup" -> Seq("dedup_exact", "dedup_minhash_pairs", "dedup_simhash_pairs"),
    "ann" -> Seq("sim_topk_ivf", "sim_hard_negatives", "sim_ivf_twolevel"),
    "text" -> Seq("text_quality", "text_langid"),
    // ExactSubstr: the ramp's copy-prefixed texts make almost every 8-gram
    // a cross-copy repeat, so the cut list covers ~the whole corpus — the
    // worst-case load for the dup-set aggregation and the island windows,
    // with output rows still linear (≈ one merged span per doc)
    "passage" -> Seq("passage_spans"),
    "behavioral" -> Seq("win_sessionize", "evt_attribution"),
    // triangles = the quadratic-risk closure; cc = the iterative-join
    // ladder (8 equi-joins + 4 min aggs over the same edge frame)
    "graph" -> Seq("graph_triangles", "graph_cc_labelprop"))

  /** Queries whose OUTPUT is quadratic in `copies` by corpus construction
    * (every copy is a near-duplicate of the same base doc, so each base
    * doc's pair set is copies²): meaningful through the 64× rung — where
    * `rows` next to `sec` shows time-per-pair falling — but at 512× the
    * pair sets alone are ~10⁹ rows, measuring the corpus design rather
    * than any plan property, so the deep rung skips them. */
  private val quadraticOutput = Set("dedup_minhash_pairs", "dedup_simhash_pairs")

  /** Scale-ramp measurement: per-family wall time at 1×/8×/64× of the
    * ramp base, with per-8×-step growth factors (sec[i+1] / (8·sec[i]) —
    * 1.0 = perfectly linear, >1 superlinear; the r9-verdict gate is
    * ≤ ~1.3 per step). OUTPUT rows are recorded alongside, because the
    * ramp corpus builds 8- and 64-way near-duplicate families by
    * construction, so the dedup PAIR queries' output grows quadratically
    * in copies — a time growth above the gate with `rows_growth` far above
    * it is output-driven (time per produced pair still falls), while a
    * steep time growth at flat output names a real plan defect. Per-query
    * data goes to BENCH_RAMP_FULL.json; the compact families + the
    * steepest-final-step entry ride the headline line. */
  private[graft] def ramp(spark: SparkSession, sfDir: String): String = {
    // SPARK_GRAFT_RAMP=deep adds a 512× rung (= 64× the LARGEST
    // driver-provided corpus) — minutes of extra wall time, so it is
    // opt-in for a dedicated scale run, not the per-round default;
    // the measured curve is recorded in BENCH_NOTES.md
    val scales =
      if (sys.env.get("SPARK_GRAFT_RAMP").contains("deep")) Seq(1, 8, 64, 512)
      else Seq(1, 8, 64)
    val dirs = scales.map(c => c -> rampCorpus(spark, sfDir, c)).toMap
    try rampMeasured(spark, sfDir, scales, dirs)
    finally
      // rung corpora are multi-GB at the deep scales and /tmp residue
      // worsens this sandbox's writeback stalls — delete them once the
      // last measurement that reads them is done
      dirs.values.foreach(deleteRecursively)
  }

  /** Shared temp-dir cleanup (also used by tools and the fixture-warehouse
    * shutdown hook — one hardening site, not three copies). */
  private[graft] def deleteRecursively(path: String): Unit = {
    import java.nio.file.{Files, Paths}
    import java.util.Comparator
    val p = Paths.get(path)
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
  }

  private def rampMeasured(spark: SparkSession, sfDir: String,
      scales: Seq[Int], dirs: Map[Int, String]): String = {
    val perQuery: Seq[(String, String, Seq[(Double, Long)], Seq[(Double, Double)])] =
      rampFamilies.flatMap {
      case (fam, qs) => qs.map { q =>
        val qScales =
          if (quadraticOutput(q)) scales.filter(_ <= 64) else scales
        // min of 2 measurements per rung, RUNG-SPACED (r14): pass 1 visits
        // every rung of this query, pass 2 revisits them — the sweep's r13
        // spacing discipline applied to the ramp. Back-to-back reps shared
        // one steal window (this sandbox's windows are minutes long and
        // land MID-run, where the pre/post calibration probes can't see
        // them); a growth ratio built from one stolen rung names an
        // innocent operator (observed 3–5× on single rungs across
        // otherwise-identical runs). Spacing costs nothing: each rep is
        // cache-cold anyway (clearCache below), so total work is identical.
        def pass(): Seq[(Double, Long)] = qScales.map { c =>
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(q)(spark, dirs(c)).count()
          val sec = (System.nanoTime() - t0) / 1e9
          // rungs must be independent measurements: queries that persist
          // shared frames (the graph family's edge cache is GBs at the
          // 512× rung) would otherwise accumulate dead entries across
          // scales and pay their successors' GC bill
          spark.sharedState.cacheManager.clearCache()
          (sec, n)
        }
        val p1 = pass()
        val p2 = pass()
        val runs = p1.zip(p2).map { case ((s1, n), (s2, _)) =>
          (math.min(s1, s2), n)
        }
        // BOTH reps ride the full artifact (r15): a blown rung whose min
        // is all the artifact carries cannot distinguish "one steal
        // window" (reps disagree → min trustworthy) from "persistent for
        // the rung's whole span" (reps agree → real, or a window longer
        // than the rung spacing) — the first r15 run's hard-negatives
        // 512× rung needed exactly this to adjudicate itself
        val reps = p1.zip(p2).map { case ((s1, _), (s2, _)) => (s1, s2) }
        (fam, q, runs, reps)
      }
    }
    def r3(d: Double) = math.rint(d * 1000) / 1000
    def growth(secs: Seq[Double]): Seq[Double] =
      secs.sliding(2).map { case Seq(a, b) => r3(b / (8 * a)) }.toSeq
    // Output-normalized step growth: time growth divided by the LARGER of
    // the input scale factor (8) and the measured output-rows growth —
    // time may legitimately track input volume OR produced output,
    // whichever dominates; growth beyond BOTH names a real compute defect.
    // This is the division the raw step_growth made the reader do by hand
    // for the quadratic-output pair queries (time growth 1.3–1.5 with rows
    // grown 70× is output-driven; the same time growth at flat rows is
    // not). Gate: ≤ ~1 per step for every family — EXCEPT the ANN rungs
    // where k = centroidCount ∝ N makes the exact IVF index BUILD
    // inherently superlinear (O(N·k) flat / O(N·√k) two-level, measured
    // against theory in tools/CrossoverProbe; see BENCH_NOTES): those
    // rungs re-build the index per measurement by design, and the
    // production shape amortizes the build (at-rest assignment artifact,
    // delta-only streaming ingest).
    def outNormGrowth(runs: Seq[(Double, Long)]): Seq[Double] =
      runs.sliding(2).map { case Seq((sa, ra), (sb, rb)) =>
        val rowsGrowth = rb.toDouble / math.max(1L, ra)
        if (sa == 0.0) 0.0 // same zero-rung guard as the family twin: no Infinity in the JSON
        else r3(sb / (sa * math.max(8.0, rowsGrowth)))
      }.toSeq
    def secPer1kRows(runs: Seq[(Double, Long)]): Seq[Double] =
      runs.map { case (s, r) => r3(s * 1000.0 / math.max(1L, r)) }
    val fullJson = perQuery.map { case (_, q, runs, reps) =>
      val secs = runs.map(_._1)
      s""""$q":{"sec":[${secs.map(r3).mkString(",")}],""" +
        s""""sec_reps":[${reps.map { case (a, b) => s"[${r3(a)},${r3(b)}]" }.mkString(",")}],""" +
        s""""rows":[${runs.map(_._2).mkString(",")}],""" +
        s""""sec_per_1k_rows":[${secPer1kRows(runs).mkString(",")}],""" +
        s""""step_growth":[${growth(secs).mkString(",")}],""" +
        s""""out_norm_growth":[${outNormGrowth(runs).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    val rampArtifact =
      if (scales.last > 64) "BENCH_RAMP_DEEP.json" else "BENCH_RAMP_FULL.json"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(new java.io.File(rampArtifact).getAbsolutePath),
      fullJson)
    val famJson = rampFamilies.map { case (fam, _) =>
      val famRuns = perQuery.filter(_._1 == fam).map(_._3)
      // queries can stop early (quadratic-output skip on the deep rung):
      // sum whatever was measured at each rung, but compute each growth
      // step only over queries measured at BOTH of its endpoints
      val famSecs = scales.indices.map(i =>
        famRuns.flatMap(_.lift(i)).map(_._1).sum)
      val famSteps = scales.indices.dropRight(1).map { i =>
        val both = famRuns.filter(_.length > i + 1)
        val denom = 8 * both.map(_(i)._1).sum
        if (denom == 0.0) 0.0 else r3(both.map(_(i + 1)._1).sum / denom)
      }
      val famNorm = scales.indices.dropRight(1).map { i =>
        val both = famRuns.filter(_.length > i + 1)
        val (sa, ra) = (both.map(_(i)._1).sum, both.map(_(i)._2).sum)
        val (sb, rb) = (both.map(_(i + 1)._1).sum, both.map(_(i + 1)._2).sum)
        val rowsGrowth = rb.toDouble / math.max(1L, ra)
        if (sa == 0.0) 0.0 else r3(sb / (sa * math.max(8.0, rowsGrowth)))
      }
      s""""$fam":{"sec":[${famSecs.map(r3).mkString(",")}],"step_growth":[${famSteps.mkString(",")}],"out_norm_growth":[${famNorm.mkString(",")}]}"""
    }.mkString("{", ",", "}")
    // the offender-naming entry: the steepest FINAL step (the 8×→64× rung,
    // where fixed job overhead no longer flatters the ratio), with the
    // same step's output-rows growth for the output-driven-or-not verdict
    val finalSteps = perQuery.map { case (_, q, runs, _) =>
      (q, growth(runs.map(_._1)).last,
        r3(runs.last._2.toDouble / math.max(1L, runs(runs.size - 2)._2)),
        outNormGrowth(runs).last)
    }
    val (wq, wg, wr, wn) = finalSteps.maxBy(_._2)
    // also the worst by the OUTPUT-NORMALIZED metric: raw growth names the
    // quadratic-output pair queries (time tracks produced pairs — the
    // corpus design, not a plan defect); the normalized worst is the entry
    // that names a real compute defect if one exists
    val (nq, ng, nr, nn) = finalSteps.maxBy(_._4)
    s"""{"scales":[${scales.mkString(",")}],"base":"$sfDir/8","families":$famJson,""" +
      s""""worst_final_step":{"query":"$wq","growth":$wg,"rows_growth":$wr,"out_norm_growth":$wn},""" +
      s""""worst_final_step_out_norm":{"query":"$nq","growth":$ng,"rows_growth":$nr,"out_norm_growth":$nn}}"""
  }

  /** Era-domain scale ramp (closes the "scale story above one fixture
    * corpus" gap): decode + staged 15-table export at 1×/4×/16× of a
    * 12k-block era archive — the top rung is 384 era files / ~197k blocks
    * / ~2.4 GB, 2× the deep decode corpus — with per-4×-step growth
    * factors (sec[i+1] / (4·sec[i]); 1.0 = perfectly linear). One era
    * FILE = one scan partition, so the archive fans out exactly `files`
    * ways at every rung — `scan_partitions` is recorded next to `files`
    * so a reader can check the parallelism claim, not take it on faith.
    * Both measurements are best-of-2 per rung, RUNG-SPACED (r14 — the
    * sweep's spacing discipline): pass 1 visits every rung, pass 2
    * revisits them, so one steal/writeback window (this sandbox's parquet
    * write path occasionally stalls 10–20× on page-cache writeback, and
    * its steal windows run minutes) can no longer cover both reps of the
    * same rung and fake a superlinear step. Corpora are
    * marker-cached under target/ (generated once per machine); the ETL
    * outputs are temp dirs deleted per run. */
  private def eraRamp(spark: SparkSession): String = {
    def r3(d: Double) = math.rint(d * 1000) / 1000
    // one pass = every rung measured once (decode + ETL); per-rep: temp
    // dirs are created/deleted OUTSIDE the timed window (multi-GB
    // recursive deletes were previously inside it, conflating export
    // throughput with filesystem delete cost that grows with rung size),
    // and each ETL rep carries a stage-write MB/s WITNESS so a rep that
    // hit this sandbox's bimodal writeback stall is labeled environment
    // IN the artifact, not relitigated from memory.
    def measure(rungs: Seq[Int], blocksPerFile: Int, dirPrefix: String): String = {
      val corpora = rungs.map { fpf =>
        val (dir, _) = graft.testkit.BenchEras.ensureGenerated(
          dir = s"$dirPrefix$fpf", filesPerFork = fpf,
          blocksPerFile = blocksPerFile)
        fpf -> spark.read.format("era").load(dir)
      }
      def pass(): Seq[(Long, Double, Double, Double)] = corpora.map { case (_, records) =>
        var blocks = 0L
        System.gc()
        val decodeSec = best(1) {
          blocks = graft.operators.Normalizer.decodeBlocks(records).count()
        }
        val stage = java.nio.file.Files.createTempDirectory("graft-era-ramp-stage").toString
        val out = java.nio.file.Files.createTempDirectory("graft-era-ramp-out").toString
        val t0 = System.nanoTime()
        val perTable = graft.export.StagedExport.exportAll(
          graft.operators.Normalizer.decodeBlocks(records),
          s"$stage/blocks", s"$out/out.parquet")
        val etlSec = (System.nanoTime() - t0) / 1e9
        val stageSec = math.max(0.001, etlSec - perTable.values.map(_._2).max)
        val mbps = dirBytes(stage) / 1e6 / stageSec
        deleteRecursively(stage); deleteRecursively(out)
        (blocks, decodeSec, etlSec, mbps)
      }
      val p1 = pass()
      val p2 = pass()
      val per = rungs.indices.map { i =>
        val fpf = rungs(i)
        val (blocks, d1, e1, m1) = p1(i)
        val (_, d2, e2, m2) = p2(i)
        val (etlSec, etlMbps) = if (e1 <= e2) (e1, m1) else (e2, m2)
        (fpf * 6, corpora(i)._2.rdd.getNumPartitions, blocks,
          math.min(d1, d2), etlSec, etlMbps, Seq(e1, e2), Seq(d1, d2))
      }
      def growth(xs: Seq[Double]) =
        xs.sliding(2).map { case Seq(a, b) => r3(b / (4 * a)) }.toSeq
      val decodeSecs = per.map(_._4)
      val etlSecs = per.map(_._5)
      s""""scales":[${rungs.indices.map(i => math.pow(4, i).toInt).mkString(",")}],""" +
        s""""blocks_per_file":$blocksPerFile,""" +
        s""""files":[${per.map(_._1).mkString(",")}],""" +
        s""""scan_partitions":[${per.map(_._2).mkString(",")}],""" +
        s""""blocks":[${per.map(_._3).mkString(",")}],""" +
        s""""decode_sec":[${decodeSecs.map(r3).mkString(",")}],""" +
        s""""decode_reps_sec":[${per.map(_._8.map(r3).mkString("[", ",", "]")).mkString(",")}],""" +
        s""""decode_blocks_per_sec":[${per.map(p => math.rint(p._3 / p._4)).mkString(",")}],""" +
        s""""decode_step_growth":[${growth(decodeSecs).mkString(",")}],""" +
        s""""etl_sec":[${etlSecs.map(r3).mkString(",")}],""" +
        s""""etl_step_growth":[${growth(etlSecs).mkString(",")}],""" +
        s""""etl_stage_mbps":[${per.map(p => r3(p._6)).mkString(",")}],""" +
        s""""etl_reps_sec":[${per.map(_._7.map(r3).mkString("[", ",", "]")).mkString(",")}]"""
    }
    // 512-block rungs (comparable to every earlier round) + PRODUCTION-
    // GEOMETRY rungs at 8,192 blocks/era (config/networks.py:6 — the real
    // gnosis era size; VERDICT r14 #3): raw scan→decode and the staged ETL
    // measured at real era-file size, so reader streaming and partition
    // sizing are witnessed at the geometry a 100 TB archive actually has,
    // not only at 16× smaller test files. (Corpora are marker-cached under
    // target/ like every other bench corpus — generated once per machine.)
    val std = measure(Seq(4, 16, 64), 512, "target/bench-eras-ramp")
    val prod = measure(Seq(1, 4), 8192, "target/bench-eras-prod-ramp")
    s"""{$std,"prod":{$prod}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // last COMMITTED headline, read BEFORE this run overwrites it — the
    // adjudication baselines for the wh_loop/soak/ETL families (the same
    // role BENCH_QUERIES_FULL.json plays for the sweep). A smoke run
    // clobbers it, so real runs `git checkout` the BENCH files first
    // (BENCH_NOTES workflow).
    // SF GATE (r15, closing the contamination path the workflow rule
    // alone guarded): a smoke run at another scale factor writes
    // BENCH_LAST/BENCH_QUERIES_FULL, and a later real run would read
    // its values as "committed" — every 3× adjudication threshold then
    // compares sf0.1 seconds against sf0.001 baselines. The artifact
    // carries its own "sf", so baselines from a different corpus are
    // structurally ignored (BENCH_QUERIES_FULL has no sf field of its
    // own, but it is written by the same run as BENCH_LAST, whose sf
    // vouches for both).
    val committedLast: Option[com.fasterxml.jackson.databind.JsonNode] = {
      val raw =
        try Some(new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File("BENCH_LAST.json")))
        catch { case _: Exception => None }
      raw.filter(r => Option(r.get("sf")).exists(_.asText() == sfDir))
    }
    def committedKey(keys: String*): Option[Double] =
      committedLast.flatMap { root =>
        var n: com.fasterxml.jackson.databind.JsonNode = root
        keys.foreach(k => if (n != null) n = n.get(k))
        Option(n).filter(_.isNumber).map(_.asDouble())
      }
    val committedSoakSec: Map[String, Double] = committedLast
      .flatMap(r => Option(r.get("soak"))).map { s =>
        import scala.jdk.CollectionConverters._
        s.fieldNames().asScala
          .filter(n => s.get(n).isObject && s.get(n).has("sec"))
          .map(n => n -> s.get(n).get("sec").asDouble()).toMap
      }.getOrElse(Map.empty)

    // fixed-size scan target for the calibration probe (constant across SFs)
    val calDir = java.nio.file.Files.createTempDirectory("graft-bench-cal").toString
    spark.range(20000000L).selectExpr("id", "hash(id) as v") // int: 20M-row sum fits a long under ANSI
      .repartition(8).write.mode("overwrite").parquet(s"$calDir/cal.parquet")
    // discarded warm-up: cal_pre's job is to measure ENVIRONMENT drift vs
    // cal_post, but on a fresh JVM the first probe also pays one-time JIT
    // (hashLoop) and first-parquet-job costs (codegen, scheduler spin-up) —
    // a systematic pre>post bias that reads as "dirty run" (r10's driver
    // artifact: scan probe 1.55s pre vs 0.26s post on an otherwise-clean
    // box). Pay those costs once here so pre≈post is the honest clean-run
    // signature and a genuinely taxed environment still shows up.
    calibrate(spark, s"$calDir/cal.parquet")
    val (calPreSt, calPre) = calibrate(spark, s"$calDir/cal.parquet")
    // per-rep CPU-stall threshold from THIS run's warm single-thread
    // baseline: the microprobe runs CpuProbeIters/4e8 of the cal kernel,
    // and 2× that is the "a steal window sat on this rep" label line
    CpuProbeStallSec = math.max(0.2,
      2.0 * calPreSt * (CpuProbeIters.toDouble / 400000000L))

    // era parse throughput (BASELINE.md blocks/s): decode a synthetic era
    // corpus end-to-end (scan → decompress → SSZ decode → nested-block
    // rows). Measured FIRST on a clean heap — after the query sweep,
    // accumulated garbage adds multi-second GC noise.
    //
    // Two corpora: the original 128-file/64-block mix feeds the ETL and
    // attestation-explode metrics (comparable to earlier rounds), while
    // THROUGHPUT is measured on an 8× deeper corpus (512 blocks/file —
    // ~16k blocks per fork). At 64 blocks/file a per-fork measurement
    // finished in ~0.3 s, i.e. it was timing Spark's job-scheduling
    // overhead, not the decoder — which is exactly the ±2× round-to-round
    // "regression" BENCH_NOTES kept relitigating.
    val (eraDir, _) = graft.testkit.BenchEras.ensureGenerated()
    val records = spark.read.format("era").load(eraDir)
    val (eraDirDeep, _) = graft.testkit.BenchEras.ensureGenerated(
      dir = "target/bench-eras-deep", filesPerFork = 32, blocksPerFile = 512)
    val recordsDeep = spark.read.format("era").load(eraDirDeep)
    var decoded = 0L
    System.gc()
    val decodeSec = best(4) {
      decoded = graft.operators.Normalizer.decodeBlocks(recordsDeep).count()
    }
    var attRows = 0L
    val explodeSec = best(4) {
      attRows = graft.operators.Normalizer
        .attestations(graft.operators.Normalizer.decodeBlocks(records)).count()
    }

    // decode-side column pruning (r13, SURVEY §4's last optional pushdown):
    // single-table extract through the section-pruned decode vs through the
    // full decode, on the same deep corpus as the decode headline — the
    // measured multiple a header-only scan gains when it skips the other
    // 14 sections' parse (the reference always computes all 15 datasets and
    // keeps one — processor.py:401-404)
    var prunedBlocks = 0L
    System.gc()
    val prunedSec = best(3) {
      prunedBlocks = graft.operators.Normalizer
        .datasetPruned(recordsDeep, "blocks").count()
    }
    val fullSingleSec = best(3) {
      graft.operators.Normalizer.blocksTable(
        graft.operators.Normalizer.decodeBlocks(recordsDeep)).count()
    }

    // per-fork decode throughput — directly comparable to BASELINE.md's
    // per-fork blocks/s table, all six rows (fork ↔ era number of its
    // fixture corpus; bellatrix/electra are the reshaped synthetics)
    val forkEras = Seq("phase0" -> 0L, "altair" -> 11L, "bellatrix" -> 756L,
      "capella" -> 1267L, "deneb" -> 1999L, "electra" -> 2613L)
    val perFork = forkEras.map { case (fork, era) =>
      val f = spark.read.format("era").load(f"$eraDirDeep/gnosis-$era%05d-*.era")
      var n = 0L
      System.gc() // isolate each fork's best-of from the previous fork's garbage
      val sec = best(3) { n = graft.operators.Normalizer.decodeBlocks(f).count() }
      fork -> (n / sec)
    }
    // full 15-table extract + parquet sink — on the SAME 12-era deep corpus
    // as the decode metric (98,304 blocks), decode STAGED to parquet once
    // and 16 CONCURRENT table writes over column-pruned stage scans.
    // Probed alternatives (tools/EtlProbe, this machine): cached-decode +
    // sequential writes 1.9k blocks/s, cached + 16 concurrent 2.1-3.5k
    // (every job re-deserializes the full cached `body` column — the cache
    // stores the struct as ONE column, so pruning can't help), splayed
    // in-memory cache 4.0-4.6k; parquet staging 11-13.6k: nested-schema
    // pruning reaches each job's scan, so a tiny table's job reads only
    // its own body.<child> column chunks (vectorized), and the staged
    // corpus — unlike executor cache — survives any corpus:memory ratio,
    // which is also why it is the 100 TB shape. Stage coalesced to 32
    // files so the 16 fan-out jobs emit ≤32 files per table.
    val etlBlocks = graft.operators.Normalizer.decodeBlocks(recordsDeep).count()
    // three full runs, artifact = the BEST run's numbers as one consistent
    // set (this sandbox's write path occasionally stalls 10-20× on page-
    // cache writeback — the per-table/stage breakdown must describe the
    // run the headline etl_15table_sec came from, not whichever ran last).
    // Rep 1 stages to DISK (the I/O witness); reps 2–3 stage to tmpfs when
    // available so the headline is the COMPUTE-bound number the 100 TB
    // plan argument actually needs — 2 of 3 disk reps stalled on page-
    // cache writeback in the r13 driver artifact (VERDICT r13 #3). Every
    // rep is additionally bracketed by the fixed-size write probe, so a
    // stalled rep is labeled per-rep in the artifact.
    val shmDir = new java.io.File("/dev/shm")
    val useShm = shmDir.isDirectory &&
      shmDir.getUsableSpace > 16L * 1024 * 1024 * 1024
    def scratchDir(fs: String, prefix: String): String =
      if (fs == "shm")
        java.nio.file.Files.createTempDirectory(shmDir.toPath, prefix).toString
      else java.nio.file.Files.createTempDirectory(prefix).toString
    val etlFs = if (useShm) Seq("disk", "shm", "shm") else Seq("disk", "disk", "disk")
    case class EtlRun(rep: ProbedRep, stageSec: Double,
        per: Map[String, (Long, Double)], stageMbps: Double, fs: String)
    val etlRuns = etlFs.map { fs =>
      val pre = writeProbeMbps(spark)
      val cpre = cpuProbeSec()
      val sampler = new CpuSampler
      val steal0 = stealTicks()
      val stage = scratchDir(fs, "graft-bench-stage")
      val etlOut = scratchDir(fs, "graft-bench-etl")
      val t0 = System.nanoTime()
      val per = graft.export.StagedExport.exportAll(
        graft.operators.Normalizer.decodeBlocks(recordsDeep),
        s"$stage/blocks", s"$etlOut/out.parquet")
      // stop the clock BEFORE the multi-GB stage delete: the timed window
      // covers only the export, not filesystem teardown
      val sec = (System.nanoTime() - t0) / 1e9
      // stage time = total − the concurrent fan-out window (per-table max)
      val stageSec = sec - per.values.map(_._2).max
      // write-throughput witness for THIS run: a rep that hit the sandbox's
      // writeback stall carries a visibly collapsed MB/s next to its seconds
      val steal1 = stealTicks()
      val stageMbps = dirBytes(stage) / 1e6 / math.max(0.001, stageSec)
      val (cmid, cmidMax) = sampler.stop()
      deleteRecursively(stage); deleteRecursively(etlOut)
      val cpost = cpuProbeSec()
      val post = writeProbeMbps(spark)
      EtlRun(ProbedRep(sec, pre, post, cpre, cpost, cmid, cmidMax,
        stealCoresOver(steal0, steal1, sec)), stageSec, per, stageMbps, fs)
    }
    // headline = fastest CLEAN rep (write AND cpu probes healthy); a
    // faster stall-labeled rep stays visible in etl_runs_* but never
    // becomes the field a round comparison starts from
    val etlBest = bestClean(etlRuns)(_.rep.sec, _.rep.stalled)
    val (etlSec, etlStageSec, etlPerTable, etlStageMbps, etlBestFs) =
      (etlBest.rep.sec, etlBest.stageSec, etlBest.per, etlBest.stageMbps, etlBest.fs)
    // the disk rep is the I/O witness even when a tmpfs rep wins the headline
    val etlDiskSec = etlRuns.filter(_.fs == "disk").map(_.rep.sec).min

    // the per-era WAREHOUSE loop end to end (resume anti-join → per-era
    // stage → dynamic partition overwrites → completion commit) on the
    // standard corpus — the reference's production contract measured as a
    // whole, state bookkeeping included, not just the raw fan-out. Each
    // rung runs ONE rep here and a SPACED second rep after the query sweep
    // (VERDICT r13 #1: these were the last families whose slow readings
    // needed the builder's committed run to adjudicate), and every rep is
    // bracketed by the fixed-size write probe so a writeback stall labels
    // itself in-artifact.
    def whRep(corpusDir: String, eras: Seq[Long]): ProbedRep = {
      val pre = writeProbeMbps(spark)
      val cpre = cpuProbeSec()
      val sampler = new CpuSampler
      val steal0 = stealTicks()
      val root = java.nio.file.Files.createTempDirectory("graft-bench-wh").toString
      val state = java.nio.file.Files.createTempDirectory("graft-bench-whstate").toString
      val t0 = System.nanoTime()
      val done = graft.export.IncrementalExporter.runWarehouse(spark,
        new graft.export.EraStateManager(spark, state), "gnosis",
        eras, root) { era =>
        spark.read.format("era").load(f"$corpusDir/gnosis-$era%05d-*.era")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val steal1 = stealTicks()
      val (cmid, cmidMax) = sampler.stop()
      deleteRecursively(root); deleteRecursively(state)
      require(done == eras, s"warehouse loop skipped eras: $done vs $eras")
      val cpost = cpuProbeSec()
      val post = writeProbeMbps(spark)
      ProbedRep(sec, pre, post, cpre, cpost, cmid, cmidMax,
        stealCoresOver(steal0, steal1, sec))
    }
    val whEras = new java.io.File(eraDir).listFiles().toSeq
      .filter(_.getName.endsWith(".era"))
      .map(_.getName.split("-")(1).toLong).distinct.sorted
    val whBlocks = graft.operators.Normalizer.decodeBlocks(records).count()
    val whRep1 = whRep(eraDir, whEras)

    // the same loop at PRODUCTION era geometry (8,192 slots/era —
    // config/networks.py:6): the standard corpus's 2,048-block eras make
    // the loop's fixed ~2.7 s/era bookkeeping dominate, which r12 could
    // only argue amortizes; this rung measures it. 6 forks × 1 file ×
    // 8,192 blocks = 6 eras / 49,152 blocks — the per-era protocol cost
    // spreads over 4× the blocks, so blocks/s should sit within ~2× of
    // the staged bulk rate (etl_blocks_per_sec) instead of 20× under it.
    val (prodEraDir, _) = graft.testkit.BenchEras.ensureGenerated(
      dir = "target/bench-eras-prod", filesPerFork = 1, blocksPerFile = 8192)
    val whProdEras = new java.io.File(prodEraDir).listFiles().toSeq
      .filter(_.getName.endsWith(".era"))
      .map(_.getName.split("-")(1).toLong).distinct.sorted
    val whProdBlocks = whProdEras.size * 8192L
    val whProdRep1 = whRep(prodEraDir, whProdEras)
    val whRep1EndT = System.nanoTime() / 1e9

    // the graph family's shared edge-frame build, timed as its OWN key
    // BEFORE the sweep — previously this cost landed on whichever graph
    // query the sweep ran first, which made cc read 3× slow for two
    // rounds (VERDICT r13 #5; tools/CcColdProbe decomposition)
    var graphEdgeCount = 0L
    val graphEdgeBuildSec = timed(1) {
      graphEdgeCount = graft.queries.Behavioral.prewarmGraphFrames(spark, sfDir)
    }.head

    // the query-serving IVF index BUILD as its own key (VERDICT r14 #8,
    // parallel to graph_edge_build_sec): cell assignment of the whole
    // corpus at the sample-bounded k_q — so build vs query cost never
    // re-entangles inside sim_topk_ivf's sweep number
    var ivfBuildRows = 0L
    val ivfBuildSec = timed(1) {
      ivfBuildRows = graft.operators.Similarity.ivfIndexBuild(
        spark.read.parquet(s"$sfDir/embeddings.parquet")).count()
    }.head

    // ── the query sweep: TEMPORALLY-SPACED reps (r13) ──────────────────
    // r12's witness failed its first real test: best-of-2 reps ran
    // back-to-back, so one multi-minute CPU-steal window (this sandbox's
    // documented ~20-min cadence) ate both reps of five queries and the
    // artifact read as a genuine 6× regression with cold == best. Now:
    //  - pass 1 (cold): every query once, in sorted order; sub-second
    //    queries take their second rep immediately (scheduling noise
    //    dominates them — spacing buys nothing);
    //  - pass 2 (spaced): every >1s query re-runs only after pass 1 has
    //    visited the whole registry, minutes later — one steal window can
    //    no longer cover both reps of the same query, and each entry
    //    records the measured gap;
    //  - pass 3 (adjudication): a query whose two reps AGREE (<20%) but
    //    sit above 3× its committed-round baseline (the tracked
    //    BENCH_QUERIES_FULL.json, read BEFORE this run overwrites it)
    //    takes a third rep at the very end — so "steal" vs "regression"
    //    is decidable from this artifact alone, no out-of-band run needed.
    val committedBaseline: Map[String, Double] =
      // same SF gate as committedLast: the two files are written by the
      // same run, so BENCH_LAST's sf vouches for the per-query map too —
      // an empty committedLast (missing file OR sf mismatch) disables
      // per-query adjudication rather than adjudicating cross-scale
      if (committedLast.isEmpty) Map.empty
      else try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File("BENCH_QUERIES_FULL.json"))
        import scala.jdk.CollectionConverters._
        node.fieldNames().asScala.map(n => n -> node.get(n).asDouble()).toMap
      } catch { case _: Exception => Map.empty }
    def runOnce(name: String): Double =
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    val sweepNames = SparkEntry.queries.keys.toSeq.sorted
    val reps = scala.collection.mutable.Map[String, List[Double]]()
    val repEnds = scala.collection.mutable.Map[String, Double]() // pass-1 end ts
    sweepNames.foreach { n =>
      val c = runOnce(n)
      reps(n) = List(c)
      repEnds(n) = System.nanoTime() / 1e9
      if (c >= 0 && c <= 1.0) reps(n) = reps(n) :+ runOnce(n)
    }
    val spacedNames = sweepNames.filter(n => reps(n).head > 1.0)
    val gaps = scala.collection.mutable.Map[String, Double]()
    spacedNames.foreach { n =>
      gaps(n) = System.nanoTime() / 1e9 - repEnds(n)
      reps(n) = reps(n) :+ runOnce(n)
    }
    val thirdRep = spacedNames.filter { n =>
      val rs = reps(n).take(2)
      rs.size == 2 && rs.forall(_ >= 0) && {
        val (a, b) = (rs(0), rs(1))
        val agree = math.abs(a - b) / math.max(1e-9, math.min(a, b)) < 0.2
        agree && math.min(a, b) >
          3 * committedBaseline.getOrElse(n, Double.MaxValue)
      }
    }
    thirdRep.foreach(n => reps(n) = reps(n) :+ runOnce(n))
    val results: Map[String, Double] = sweepNames.map { n =>
      val ok = reps(n).filter(_ >= 0)
      n -> (if (ok.isEmpty) -1.0 else ok.min)
    }.toMap
    val sweepCold: Map[String, Double] = sweepNames.map(n => n -> reps(n).head).toMap

    // SPACED second wh_loop reps: the whole query sweep ran in between
    // (minutes of gap), so one steal/writeback window cannot cover both
    // reps of a rung — the same discipline the sweep itself uses
    val whGapSec = System.nanoTime() / 1e9 - whRep1EndT
    val whRep2 = whRep(eraDir, whEras)
    val whProdRep2 = whRep(prodEraDir, whProdEras)
    // same clean-preference as the ETL headline: a stall-labeled rep can
    // only win when both reps are labeled
    val whSec = bestClean(Seq(whRep1, whRep2))(_.sec, _.stalled).sec
    val whProdSec = bestClean(Seq(whProdRep1, whProdRep2))(_.sec, _.stalled).sec

    // skewed-corpus soak (disable with SPARK_GRAFT_SOAK=0)
    val soakJson =
      if (sys.env.get("SPARK_GRAFT_SOAK").contains("0")) "{}"
      else try soak(spark, sfDir, copies = 5, committedSoakSec)
      catch { case e: Throwable => s"""{"error":"${e.getClass.getSimpleName}"}""" }

    // self-scaled 1×/8×/64× ramp (disable with SPARK_GRAFT_RAMP=0)
    val rampJson =
      if (sys.env.get("SPARK_GRAFT_RAMP").contains("0")) "{}"
      else try ramp(spark, sfDir)
      catch { case e: Throwable => s"""{"error":"${e.getClass.getSimpleName}"}""" }

    // era-domain scale ramp (shares the SPARK_GRAFT_RAMP=0 kill switch)
    val eraRampJson =
      if (sys.env.get("SPARK_GRAFT_RAMP").contains("0")) "{}"
      else try eraRamp(spark)
      catch { case e: Throwable => s"""{"error":"${e.getClass.getSimpleName}"}""" }

    // second decode measurement AFTER the sweep+soak: pre/post decode drift
    // on identical code+data within one process bounds the within-run noise.
    System.gc()
    var decoded2 = 0L
    val decodeSec2 = best(3) {
      decoded2 = graft.operators.Normalizer.decodeBlocks(recordsDeep).count()
    }
    val (_, calPost) = calibrate(spark, s"$calDir/cal.parquet")

    // The driver captures only a bounded tail of stdout (~2k chars): the
    // r6 line with all 125 full-precision per-query entries was 4.4k and got
    // cut mid-stream (BENCH_r06 `parsed: null`). Keep the final JSON line
    // compact — 3-decimal seconds, only the slowest queries inline, the rest
    // summarized — and write the complete full-precision map to a file whose
    // path the line carries.
    def r3(d: Double): Double = math.rint(d * 1000) / 1000
    def r1(d: Double): Double = math.rint(d * 10) / 10
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // tracked repo path (not target/) so the committed artifact carries the
    // complete map — the r8 headline's -1 entries were only verifiable from
    // an untracked file.
    val fullPath = new java.io.File("BENCH_QUERIES_FULL.json").getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), fullQs)
    // the COMPLETE per-query map also goes to stdout as reassemblable
    // chunked marker lines (each well under any line-length cut) printed
    // BEFORE the headline, so the headline stays last even if the driver
    // keeps only a stdout tail; a driver that keeps more gets the full map
    // by concatenating the chunk payloads in order.
    val chunks = fullQs.grouped(1500).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(s"BENCH_JSON:${i + 1}/${chunks.size}:$c")
    }
    val topN = 30
    val sorted = results.toSeq.sortBy(-_._2)
    val top = sorted.take(topN)
    val rest = sorted.drop(topN)
    val qs = top.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // cold-vs-best for every query whose steady state exceeds 3 s, now
    // carrying the SPACED second rep, its measured gap back to the first,
    // the committed-round baseline, and (when adjudication fired) the
    // third rep — a 6× reading with two agreeing spaced reps and a third
    // is a regression; disagreeing reps name the steal window themselves
    val coldJson = sweepNames.filter(n => results(n) > 3.0)
      .sortBy(n => -results(n))
      .map { n =>
        val rs = reps(n)
        val extra = new StringBuilder
        if (rs.size >= 2) extra ++= s""","rep2":${r3(rs(1))}"""
        if (rs.size >= 3) extra ++= s""","rep3":${r3(rs(2))}"""
        gaps.get(n).foreach(g => extra ++= s""","gap_sec":${r3(g)}""")
        committedBaseline.get(n).foreach(b =>
          extra ++= s""","committed":${r3(b)}""")
        s""""$n":{"cold":${r3(sweepCold(n))},"best":${r3(results(n))}$extra}"""
      }.mkString("{", ",", "}")
    val forkJsonCompact = perFork
      .map { case (f, bps) => s""""$f":${r1(bps)}""" }.mkString("{", ",", "}")
    // failed queries keep their -1 sentinel in `queries` but must not
    // subtract from the headline total
    val total = results.values.filter(_ >= 0).sum
    val headline =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir"""" +
        s""","n_queries":${results.size},"queries":$qs""" +
        s""","queries_omitted":${rest.size}""" +
        s""","queries_omitted_sec":${r3(rest.map(_._2).filter(_ >= 0).sum)}""" +
        s""","slow_queries_cold_vs_best":$coldJson""" +
        s""","full_queries_json":"$fullPath"""" +
        s""","era_blocks":$decoded,"era_decode_sec":${r3(decodeSec)}""" +
        s""","blocks_per_sec":${r1(decoded / decodeSec)}""" +
        s""","blocks_per_sec_rerun":${r1(decoded2 / decodeSec2)}""" +
        s""","cal_pre":$calPre,"cal_post":$calPost""" +
        s""","attestation_rows":$attRows,"attestation_rows_per_sec":${r1(attRows / explodeSec)}""" +
        s""","blocks_per_sec_by_fork":$forkJsonCompact""" +
        s""","pruned_blocks_per_sec":${r1(prunedBlocks / prunedSec)}""" +
        s""","fullsingle_blocks_per_sec":${r1(prunedBlocks / fullSingleSec)}""" +
        s""","decode_prune_speedup":${r3(fullSingleSec / prunedSec)}""" +
        s""","etl_15table_sec":${r3(etlSec)},"etl_blocks_per_sec":${r1(etlBlocks / etlSec)}""" +
        s""","etl_stage_sec":${r3(etlStageSec)}""" +
        s""","etl_stage_mbps":${r1(etlStageMbps)}""" +
        s""","etl_best_fs":"$etlBestFs","etl_disk_sec":${r3(etlDiskSec)}""" +
        s""","etl_runs_sec":[${etlRuns.map(r => r3(r.rep.sec)).mkString(",")}]""" +
        s""","etl_runs_fs":[${etlRuns.map(r => "\"" + r.fs + "\"").mkString(",")}]""" +
        s""","etl_runs_stage_mbps":[${etlRuns.map(r => r1(r.stageMbps)).mkString(",")}]""" +
        s""","etl_runs_probe_mbps":[${etlRuns.map(r => s"[${r1(r.rep.wpre)},${r1(r.rep.wpost)}]").mkString(",")}]""" +
        s""","etl_runs_cpu_probe_sec":[${etlRuns.map(r =>
          s"[${r3(r.rep.cpre)},${r3(r.rep.cmid)},${r3(r.rep.cmidMax)},${r3(r.rep.cpost)}]").mkString(",")}]""" +
        s""","etl_runs_stalled":[${etlRuns.map(_.rep.stalled).mkString(",")}]""" +
        s""","etl_runs_stall_kind":[${etlRuns.map(r => "\"" + r.rep.stallKind + "\"").mkString(",")}]""" +
        s""","etl_runs_steal_cores":[${etlRuns.map(r => r3(r.rep.stealCores)).mkString(",")}]""" +
        s""","cpu_probe_stall_sec":${r3(CpuProbeStallSec)}""" +
        s""","etl_committed_sec":${committedKey("etl_15table_sec").map(r3).getOrElse(-1.0)}""" +
        s""","etl_disk_committed_sec":${committedKey("etl_disk_sec").map(r3).getOrElse(-1.0)}""" +
        s""","etl_blocks":$etlBlocks""" +
        s""","graph_edge_build_sec":${r3(graphEdgeBuildSec)}""" +
        s""","graph_edge_count":$graphEdgeCount""" +
        s""","sim_ivf_build_sec":${r3(ivfBuildSec)}""" +
        s""","sim_ivf_build_rows":$ivfBuildRows""" +
        s""","wh_loop_sec":${r3(whSec)},"wh_loop_blocks_per_sec":${r1(whBlocks / whSec)}""" +
        s""","wh_loop_reps_sec":[${r3(whRep1.sec)},${r3(whRep2.sec)}]""" +
        s""","wh_loop_probe_mbps":[[${r1(whRep1.wpre)},${r1(whRep1.wpost)}],[${r1(whRep2.wpre)},${r1(whRep2.wpost)}]]""" +
        s""","wh_loop_cpu_probe_sec":[[${r3(whRep1.cpre)},${r3(whRep1.cmid)},${r3(whRep1.cmidMax)},${r3(whRep1.cpost)}],[${r3(whRep2.cpre)},${r3(whRep2.cmid)},${r3(whRep2.cmidMax)},${r3(whRep2.cpost)}]]""" +
        s""","wh_loop_reps_stall_kind":["${whRep1.stallKind}","${whRep2.stallKind}"]""" +
        s""","wh_loop_reps_steal_cores":[${r3(whRep1.stealCores)},${r3(whRep2.stealCores)}]""" +
        s""","wh_loop_committed_sec":${committedKey("wh_loop_sec").map(r3).getOrElse(-1.0)}""" +
        s""","wh_loop_eras":${whEras.size},"wh_loop_blocks":$whBlocks""" +
        s""","wh_loop_prod_sec":${r3(whProdSec)}""" +
        s""","wh_loop_prod_blocks_per_sec":${r1(whProdBlocks / whProdSec)}""" +
        s""","wh_loop_prod_reps_sec":[${r3(whProdRep1.sec)},${r3(whProdRep2.sec)}]""" +
        s""","wh_loop_prod_probe_mbps":[[${r1(whProdRep1.wpre)},${r1(whProdRep1.wpost)}],[${r1(whProdRep2.wpre)},${r1(whProdRep2.wpost)}]]""" +
        s""","wh_loop_prod_cpu_probe_sec":[[${r3(whProdRep1.cpre)},${r3(whProdRep1.cmid)},${r3(whProdRep1.cmidMax)},${r3(whProdRep1.cpost)}],[${r3(whProdRep2.cpre)},${r3(whProdRep2.cmid)},${r3(whProdRep2.cmidMax)},${r3(whProdRep2.cpost)}]]""" +
        s""","wh_loop_prod_reps_stall_kind":["${whProdRep1.stallKind}","${whProdRep2.stallKind}"]""" +
        s""","wh_loop_prod_reps_steal_cores":[${r3(whProdRep1.stealCores)},${r3(whProdRep2.stealCores)}]""" +
        s""","wh_loop_prod_committed_sec":${committedKey("wh_loop_prod_sec").map(r3).getOrElse(-1.0)}""" +
        s""","wh_loop_gap_sec":${r3(whGapSec)}""" +
        s""","wh_loop_prod_eras":${whProdEras.size},"wh_loop_prod_blocks":$whProdBlocks""" +
        s""","etl_per_table_sec":${etlPerTable.toSeq.sortBy(-_._2._2)
          .map { case (n, (_, s)) => s""""$n":${r3(s)}""" }.mkString("{", ",", "}")}""" +
        s""","soak":$soakJson,"ramp":$rampJson,"era_ramp":$eraRampJson}"""
    // the COMPLETE headline as a committed file: the driver's stdout tail
    // truncated away the decode/ETL keys in r11 — BENCH_LAST.json makes
    // every headline metric machine-readable in-repo regardless
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(new java.io.File("BENCH_LAST.json").getAbsolutePath),
      headline)
    println(headline)
    spark.stop()
  }
}
