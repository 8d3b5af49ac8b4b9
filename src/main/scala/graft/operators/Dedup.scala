package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication suite for a large-scale training-data pipeline — the five
 * standard techniques, each expressed Spark-first over the `documents` /
 * `embeddings` tables:
 *
 *  - exact:          md5 hash-groupBy (map-side partial agg; one shuffle of
 *                    (digest) keys only)
 *  - n-gram Jaccard: blocked pairwise Jaccard over word-trigram shingles
 *  - MinHash + LSH:  shingle → k minhashes → banded bucket-join → verify
 *  - SimHash:        48-bit weighted bit-vote signature → chunk-blocked
 *                    Hamming join
 *  - embedding cosine: near-dup by cosine over `Array[Float]` embeddings
 *
 * The driver test tables contain no real duplicates, so [[augmentedDocs]] /
 * [[augmentedEmbeddings]] deterministically inject exact copies and
 * near-duplicates (truncated texts, perturbed vectors) — the same injection
 * is reproduced in the DuckDB oracle SQL, so every operator is verified
 * value-for-value.
 *
 * Scale design (100 TB): nothing here ever materializes the O(n²) pair
 * space. Every pairwise step is preceded by a blocking key (lang+first
 * token, LSH band, SimHash chunk, cluster label), so the self-join shuffles
 * on the block key and only same-block pairs are generated. All signature
 * computation is narrow, codegen'd column work (no UDFs).
 */
object Dedup {

  // ── corpus augmentation (deterministic, oracle-reproducible) ───────────

  /** documents ∪ exact copies (doc_id%13==0 → +200000) ∪ near-dup truncated
    * texts (doc_id%7==0 → +100000, first ceil(0.8·n) tokens). */
  def augmentedDocs(docs: DataFrame): DataFrame = {
    val base = TextAnalysis.withTokens(docs)
      .select(col("doc_id"), col("text"), col("lang"), col("toks"))
    val exact = base
      .filter(col("doc_id") % 13 === 0)
      .withColumn("doc_id", col("doc_id") + 200000)
    val near = base
      .filter(col("doc_id") % 7 === 0)
      .withColumn("toks",
        expr("slice(toks, 1, greatest(cast(ceil(size(toks) * 0.8) as int), 1))"))
      .withColumn("text", array_join(col("toks"), " "))
      .withColumn("doc_id", col("doc_id") + 100000)
    base.unionByName(exact).unionByName(near)
  }

  /** embeddings ∪ near-identical vectors (vec_id%11==0 → +100000, first
    * component shifted by +0.05 — cosine ≈ 0.999). */
  def augmentedEmbeddings(emb: DataFrame): DataFrame = {
    val base = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("vec"))
    val near = base
      .filter(col("vec_id") % 11 === 0)
      .withColumn("vec",
        expr("transform(vec, (x, i) -> case when i = 0 then x + cast(0.05 as double) else x end)"))
      .withColumn("vec_id", col("vec_id") + 100000)
    base.unionByName(near)
  }

  // ── 1. exact dedup ─────────────────────────────────────────────────────

  /** THE content-digest convention — md5 of the trim-coalesced text — in
    * one place: exact dedup, the per-source reports, the incremental
    * snapshot gates (batch AND streaming), and the at-rest digest
    * snapshot all hash the same bytes, so their frontiers compose. Over a
    * frame that already passed [[graft.operators.TextAnalysis.withTokens]]
    * (augmentedDocs does) the trim is an idempotent no-op. */
  private[graft] def contentDigest(c: Column): Column =
    md5(coalesce(trim(c), lit("")))

  /** Exact dedup: group by content digest, keep the lowest doc_id. */
  def exact(docs: DataFrame): DataFrame =
    augmentedDocs(docs)
      .groupBy(contentDigest(col("text")).as("digest"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("digest"))

  // ── 2. n-gram Jaccard ──────────────────────────────────────────────────

  /** Word-trigram shingle set as a column (distinct, order-free). Native
    * single-pass kernel: the equivalent
    * `array_distinct(transform(sequence(...), i -> concat_ws(...)))` SQL
    * re-runs the `split` tokenization per element after CollapseProject
    * inlines the token column — a measured ~25× slowdown. */
  private def shingles(textCol: String): Column =
    call_function("word_shingles", col(textCol), lit(3))

  /** Candidate pairs for [[ngramJaccard]] — the blocking stage, exposed for
    * the skew test. The blocking key is (lang, first token, shingle-count
    * log₂-bucket): J(A,B) ≥ t forces |A|/|B| ∈ [t, 1/t], so a true pair's
    * buckets differ by at most ceil(log₂(1/t)); one side probes that many
    * adjacent buckets and no pair is lost. The size dimension splits the
    * hot first-token block ("the …") that would otherwise go quadratic at
    * 100× — block size is now bounded by docs sharing tok0 AND length
    * scale, and the in-block size-ratio prefilter (`max·t ≤ min+1`, one
    * shingle of slack so float rounding can never drop a true pair) prunes
    * most survivors before the merge kernel runs. */
  private[graft] def ngramCandidates(docs: DataFrame, threshold: Double): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    require(threshold > 0.0 && threshold <= 1.0, s"threshold out of range: $threshold")
    // bucket = floor(log2(nsh)) via binary-string length — exact int math
    val sh = augmentedDocs(docs)
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", shingles("text"))
      .select(col("doc_id"), col("lang"),
        element_at(col("toks"), 1).as("tok0"),
        // native one-pass kernel = array_sort(array_distinct(transform(…)))
        call_function("sorted_hash_set", col("sh")).as("shl"))
      .withColumn("nsh", size(col("shl")))
      .withColumn("bucket", expr("length(bin(nsh)) - 1"))
    val probeWidth = math.max(1,
      math.ceil(math.log(1.0 / threshold) / math.log(2.0)).toInt)
    val a = sh
      .withColumn("probe", explode(sequence(
        col("bucket") - probeWidth, col("bucket") + probeWidth)))
      .as("a")
    val b = sh.as("b")
    // a pair matches exactly once: b's home bucket is a single value and
    // a's probe values are distinct — no post-join dedup needed
    a.join(b,
        col("a.lang") === col("b.lang") && col("a.tok0") === col("b.tok0") &&
          col("a.probe") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.nsh"), col("b.nsh")) * lit(threshold) <=
            least(col("a.nsh"), col("b.nsh")) + lit(1.0))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.shl").as("shl_a"), col("b.shl").as("shl_b"),
        col("a.nsh").as("nsh_a"), col("b.nsh").as("nsh_b"))
  }

  /** Blocked pairwise n-gram Jaccard: candidate pairs share a skew-resistant
    * blocking key — see [[ngramCandidates]] — so the full O(n²) pair space
    * is never formed and no single block goes quadratic. Shingle sets are
    * hashed to sorted long arrays once per doc, so the per-pair kernel is a
    * zero-allocation two-pointer merge
    * ([[graft.functions.Signatures.sortedOverlap]]) instead of a string-set
    * intersection. */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.6): DataFrame =
    ngramCandidates(docs, threshold)
      .withColumn("common", call_function("sorted_overlap", col("shl_a"), col("shl_b")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("nsh_a") + col("nsh_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(
        col("doc_a"),
        col("doc_b"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Jaccard-threshold sensitivity sweep — the "which threshold do I
    * ship" table: for each candidate threshold, how many pairs would the
    * n-gram dedup flag and how similar are they on average? Computed from
    * ONE pass of the blocked candidate machinery at the loosest
    * threshold; each pair then counts toward every threshold at or below
    * its Jaccard (a 5-literal explode, not five corpus passes).
    *
    * Scale shape: [[ngramCandidates]]'s de-skewed blocking at t = 0.5
    * (the widest setting pays the widest probe — that is the honest
    * cost), the per-pair merge kernel once, then a ≤5-row aggregation.
    * Mean Jaccard aggregates the exact integer `round(j·10⁴)`. */
  def thresholdSweep(docs: DataFrame,
      thresholds: Seq[Double] = Seq(0.5, 0.6, 0.7, 0.8, 0.9)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = thresholds.min
    // membership tests run on the UNROUNDED jaccard — the same predicate
    // ngramJaccard(t) ships — so a pair at 0.59996 (display j4 = 0.6) does
    // NOT count toward threshold 0.6; only display values round
    val pairs = ngramCandidates(docs, base)
      .withColumn("common", call_function("sorted_overlap", col("shl_a"), col("shl_b")))
      .withColumn("jaccard",
        col("common").cast("double") / (col("nsh_a") + col("nsh_b") - col("common")))
      .filter(col("jaccard") >= base)
      .select(col("jaccard"), round(col("jaccard"), 4).as("j4"))
    val counted = pairs
      .select(col("jaccard"), col("j4"),
        explode(array(thresholds.map(t => lit(t)): _*)).as("threshold"))
      .filter(col("jaccard") >= col("threshold"))
      .groupBy(col("threshold"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(sum(round(col("j4") * 1e4).cast("long")).cast("double") /
          (count(lit(1)) * 1e4), 4).as("mean_jaccard"))
    // every requested threshold reports — a setting that flags NOTHING is
    // exactly the row the "which threshold do I ship" reader needs to see
    thresholds.toDF("threshold")
      .join(counted, Seq("threshold"), "left")
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        col("mean_jaccard"))
      .orderBy(col("threshold"))
  }

  // ── 3. MinHash + LSH ───────────────────────────────────────────────────

  val MinhashK = 12
  val MinhashBands = 3 // 3 bands × 4 rows

  /** MinHash signature-agreement Jaccard estimate over two signature
    * columns: matching positions / k. One home for the metric, shared by
    * the pair path and the incremental snapshot gate (and the DuckDB
    * oracle mirrors), so they cannot drift apart. */
  private def estJaccard(sigA: String, sigB: String) =
    // native kernel = size(filter(zip_with(a, b, (x,y) -> x = y), v -> v))
    expr(s"zip_eq_count($sigA, $sigB) / cast($MinhashK as double)")

  /** Per-doc MinHash signature: k portable hash functions, each the min over
    * the shingle set of hash64(shingle || '#' || i). Computed by the native
    * codegen kernel [[graft.functions.Signatures.minhashSig]] — identical
    * values to the SQL/oracle formulation, ~20× cheaper than the
    * interpreted higher-order-function fold. */
  def minhashSignatures(docs: DataFrame): DataFrame =
    sigsOf(augmentedDocs(docs))

  /** [[minhashSignatures]] over an ARBITRARY corpus already carrying
    * (doc_id, text, toks) — the production entry point (no augmentation);
    * shared with the fuzzy decontamination scan. */
  private[operators] def sigsOf(corpus: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(corpus.sparkSession)
    corpus
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", shingles("text"))
      .select(
        col("doc_id"),
        call_function("minhash_sig", col("sh")).as("sig"))
  }

  /** MinHash signatures rendered flat for oracle comparison. */
  def minhashSignaturesFlat(docs: DataFrame): DataFrame =
    minhashSignatures(docs)
      .select(col("doc_id"),
        expr("array_join(transform(sig, x -> cast(x as string)), ',')").as("sig"))
      .orderBy(col("doc_id"))

  /** LSH candidate pairs: band the signature (4 rows/band), bucket-join on
    * (band index, band hash), then verify with the signature-agreement
    * estimate of Jaccard. The join shuffles on the band key only. */
  def minhashLshPairs(docs: DataFrame, estThreshold: Double = 0.5): DataFrame = {
    // explicit fan-out before the exploding self-join — AQE coalescing is
    // blind to join-output explosion ([[Similarity.pairFanout]])
    val banded = Similarity.pairFanout(
      bandedSigs(minhashSignatures(docs)), col("band"), col("band_key"))
    val a = banded.as("a")
    val b = banded.as("b")
    // estimate + threshold are applied PER COLLISION, map-side in the
    // bucket join's output partitions, and only (doc_a, doc_b, est) rows
    // reach the cross-band dedupe — r16: the old shape deduped FIRST, so
    // the distinct's shuffle carried both full signature arrays for every
    // band collision (~2 KB/row vs ~30 B/row; at the 512× deep rung that
    // is the difference between a 3 GB and a 70 GB pair shuffle). est is
    // a pure function of the pair, so distinct-after-score is
    // value-identical to score-after-distinct — the oracle pins it.
    a.join(b,
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("est_jaccard", estJaccard("a.sig", "b.sig"))
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
      .distinct() // a pair can collide in >1 band
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Edit-distance verification of the MinHash-LSH candidate pairs — the
    * exact-check stage a production near-dedup pipeline runs AFTER blocking:
    * LSH proposes, Levenshtein disposes. Candidates join back to the corpus
    * text (two doc_id equi-joins; the text shuffles once per side, never
    * into a pair-space blowup) and each pair gets
    * `edit_sim = 1 − dist / max(len)` over a fixed `prefixLen`-char prefix.
    * The prefix cap bounds per-pair cost at O(prefixLen²) regardless of
    * document length — at 100 TB the verify cost is |candidates|·prefixLen²,
    * linear in the LSH output, not in corpus size. Pairs at or above
    * `simThreshold` are marked verified; the est-vs-exact disagreement rate
    * is the knob-tuning signal for the band/row configuration. */
  def editVerify(docs: DataFrame, prefixLen: Int = 400,
      simThreshold: Double = 0.8): DataFrame = {
    val txt = augmentedDocs(docs)
      .select(col("doc_id"), expr(s"substring(trim(text), 1, $prefixLen)").as("txt"))
    minhashLshPairs(docs)
      .join(txt.select(col("doc_id").as("doc_a"), col("txt").as("ta")), Seq("doc_a"))
      .join(txt.select(col("doc_id").as("doc_b"), col("txt").as("tb")), Seq("doc_b"))
      .withColumn("edit_dist", levenshtein(col("ta"), col("tb")).cast("long"))
      .withColumn("edit_sim",
        round(lit(1.0) - col("edit_dist").cast("double") /
          greatest(greatest(length(col("ta")), length(col("tb"))), lit(1)), 4))
      .withColumn("verified", col("edit_sim") >= simThreshold)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        col("edit_dist"), col("edit_sim"), col("verified"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Duplicate clusters: connected components over the MinHash-LSH pair
    * graph. Adaptive execution: a broadcast-size graph
    * (≤ [[DriverCcMaxEdges]]) is solved with driver-side union-find — one
    * collect, no iterative jobs; a larger graph runs min-label propagation
    * **with pointer doubling** over DataFrames: each round takes the min
    * over neighbor labels AND jumps `label ← label(label)`, so label
    * chains halve every round and convergence is O(log diameter) instead
    * of O(diameter). Labels are monotone non-increasing and always ids
    * inside the component, so the fixed point is the component minimum —
    * both paths produce identical labels. Each distributed round is one
    * action (the count that materializes the cached step doubles as the
    * convergence check). Output: (doc_id, cluster) for every doc that
    * appears in ≥1 pair, cluster = smallest doc_id in its component — the
    * canonical keeper. */
  /** Pair graphs up to this many edges are solved with driver-side
    * union-find instead of the distributed loop — the adaptive move AQE
    * makes when a join side fits in a broadcast. Sized for the REAL driver
    * footprint, not the raw bytes: collect() materializes ~100 B/edge of
    * Row objects and the boxed parent map ~50 B/node, so 1M edges is
    * roughly 150–200 MB transient heap — safe on default driver memory.
    * The distributed loop pays several shuffle jobs per round, which for
    * a broadcast-size graph is pure overhead (measured: job-latency-bound
    * locally). */
  val DriverCcMaxEdges = 1000000L

  /** Test seam (the [[graft.operators.Similarity.driverCollectRows]]
    * discipline, r12 stretch ask): rows materialized on the driver by the
    * clustering path since the last reset. The union-find collect is the
    * ONLY corpus-proportional driver collect in this module and must fire
    * only under the [[DriverCcMaxEdges]] gate — `DriverStateGateSpec`
    * asserts the distributed path ledgers ZERO rows and seed-proves the
    * checker by forcing the collect over the gate. One atomic add; free
    * in production. */
  private[graft] val driverCollectRows = new java.util.concurrent.atomic.AtomicLong

  /** Union-find with path compression; roots are component minima (union
    * always attaches the larger root under the smaller), so labels match
    * the distributed fixed point exactly. */
  private def unionFindClusters(edges: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { case (a, b) =>
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
    }
    import scala.jdk.CollectionConverters._
    parent.keySet().asScala.toSeq.map(n => n -> find(n))
  }

  def duplicateClusters(docs: DataFrame): DataFrame =
    duplicateClusters(docs, DriverCcMaxEdges)

  /** Threshold-injectable form so tests can force the distributed loop. */
  private[graft] def duplicateClusters(docs: DataFrame, driverMaxEdges: Long): DataFrame = {
    val pairs = minhashLshPairs(docs).select(col("doc_a"), col("doc_b")).cache()
    try {
      // dup-pair graphs are sparse relative to the corpus: size the loop's
      // partitioning to the graph, not the session default — iterating a
      // few-hundred-edge graph over 32 shuffle partitions is pure overhead
      val nEdges = pairs.count()
      if (nEdges <= driverMaxEdges) {
        val spark = pairs.sparkSession
        import spark.implicits._
        driverCollectRows.addAndGet(nEdges)
        val labels = unionFindClusters(
          pairs.collect().map(r => (r.getLong(0), r.getLong(1))))
        return labels.toDF("doc_id", "cluster").orderBy(col("doc_id"))
      }
      val parts = math.max(1, math.min(
        (nEdges / 500000L).toInt, pairs.sparkSession.sparkContext.defaultParallelism))
      val edges = pairs
        .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .withColumnRenamed("doc_a", "src").withColumnRenamed("doc_b", "dst")
        .repartition(parts, col("dst"))
        .cache()
      var labels = edges.select(col("src").as("doc_id")).distinct()
        .withColumn("cluster", col("doc_id"))
      var cachedStep: DataFrame = null
      val maxRounds = 30 // 2^30 ≫ any component diameter
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < maxRounds) {
        // candidate label = min(own, min over neighbors' labels)
        val viaNeighbors = edges
          .join(labels.withColumnRenamed("doc_id", "dst").withColumnRenamed("cluster", "ncluster"), Seq("dst"))
          .groupBy(col("src").as("doc_id"))
          .agg(min(col("ncluster")).as("ncluster"))
        val propagated = labels.join(viaNeighbors, Seq("doc_id"), "left")
          .select(col("doc_id"), col("cluster").as("old"),
            least(col("cluster"), coalesce(col("ncluster"), col("cluster"))).as("cluster"))
        // pointer doubling: cluster ← label(cluster) using this round's
        // labels (label(x) ≤ x always, so the jump only tightens)
        val step = propagated.join(
            propagated.select(col("doc_id").as("cluster"), col("cluster").as("jcluster")),
            Seq("cluster"), "left")
          .select(col("doc_id"), col("old"),
            coalesce(col("jcluster"), col("cluster")).as("cluster"))
          .cache()
        changed = step.filter(col("cluster") =!= col("old")).count()
        if (cachedStep != null) cachedStep.unpersist()
        cachedStep = step // final round's cache backs the returned frame
        labels = step.drop("old")
        rounds += 1
      }
      require(changed == 0L,
        s"duplicateClusters did not converge after $maxRounds rounds — " +
          "partial labels would be wrong; raise maxRounds")
      edges.unpersist()
      labels.orderBy(col("doc_id"))
    } finally pairs.unpersist()
  }

  /** Per-source duplication profile — the observability report over exact
    * dedup: for every source, how many of its documents share a text
    * digest with ANY other document, and how many share one ACROSS
    * sources (the cross-source contamination signal: a mirror site or
    * re-crawled domain shows up as one source whose content is another's).
    * A deterministic 'mirror' source (exact copies of doc_id % 13 == 0,
    * the [[augmentedDocs]] convention with source retained) guarantees the
    * report is exercised at every fixture scale.
    *
    * Scale shape: one digest-keyed aggregation (16-byte digests, map-side
    * combined), the per-digest stats join back CO-PARTITIONED on the same
    * digest key (no broadcast, no second corpus pass), then a
    * source-cardinality aggregation — #sources rows out, text never
    * shuffles. */
  /** docs ∪ a deterministic 'mirror' source copy (doc_id%13==0 → +200000,
    * source = "mirror"): the injected cross-source duplicates the
    * per-source reports observe. ONE home for the convention — shared by
    * [[dupBySource]], [[graft.operators.Curation.sourceScorecard]], and
    * interpolation-free but mirrored in their DuckDB oracles. */
  private[graft] def withMirrorSource(base: DataFrame): DataFrame = {
    val mirror = base.filter(col("doc_id") % 13 === 0)
      .withColumn("doc_id", col("doc_id") + 200000)
      .withColumn("source", lit("mirror"))
    base.unionByName(mirror)
  }

  def dupBySource(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"), col("source"))
    // digest computed narrowly, text dropped BEFORE any shuffle — every
    // Exchange in this plan carries (digest, source) only. Digest the
    // trim-coalesced text: the SAME content convention exact() observes
    // (via withTokens), so this per-source report describes the dedup it
    // claims to — raw md5(text) would call space-padded twins distinct and
    // silently drop null-text docs from their source's n_docs (null digest
    // never matches the inner join)
    val all = withMirrorSource(base)
      .select(contentDigest(col("text")).as("digest"), col("source"))
    val perDigest = all.groupBy(col("digest"))
      .agg(countDistinct(col("source")).as("n_sources"),
        count(lit(1)).as("n_copies"))
    all.join(perDigest.hint("shuffle_hash"), Seq("digest"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(when(col("n_sources") > 1, 1L).otherwise(0L)).as("n_cross_source"),
        round(sum(when(col("n_copies") > 1, 1.0).otherwise(0.0)) /
          count(lit(1)), 4).as("dup_rate"))
      .orderBy(col("source"))
  }

  /** Measured MinHash-LSH quality — the dedup twin of
    * [[Similarity.recallReport]]'s "measure, don't guess" rule: the exact
    * blocked n-gram Jaccard pairs ([[ngramJaccard]], J ≥ `threshold`) are
    * ground truth; the production LSH candidate set
    * ([[minhashLshPairs]], banded signatures + estimate filter) is the
    * system under test. One row: truth/candidate/hit counts, precision,
    * recall — the number that says whether k=12, 3×4 banding is enough
    * BEFORE a 100 TB run commits to it.
    *
    * Scale shape: both pair frames are the already-blocked shapes (no new
    * pair space); the comparison is one full-outer join on the pair key
    * and a 1-row aggregate. At 100 TB ground truth is the expensive side —
    * run the eval on a sampled slice; the operator takes whatever corpus
    * it is given. */
  def lshEval(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
    val truth = ngramJaccard(docs, threshold)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("t"))
    val cand = minhashLshPairs(docs)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("c"))
    truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(coalesce(col("t"), lit(0L))).as("n_truth"),
        sum(coalesce(col("c"), lit(0L))).as("n_cand"),
        sum(when(col("t").isNotNull && col("c").isNotNull, 1L).otherwise(0L))
          .as("n_hit"))
      .select(
        col("n_truth"), col("n_cand"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_cand"), 4).as("precision"),
        round(col("n_hit").cast("double") / col("n_truth"), 4).as("recall"))
  }

  /** Measured vs theoretical LSH s-curve — [[lshEval]] refined by
    * similarity bucket: for truth pairs in each Jaccard decile, the share
    * the production LSH path (banding + estimate filter) actually
    * surfaced, next to the banding-only collision probability
    * 1 − (1 − s^r)^b at the bucket midpoint (r = 4 rows, b = 3 bands).
    * Measured below theory at a bucket = the estimate filter is biting;
    * theory below target at the threshold = change the banding geometry,
    * no amount of tuning elsewhere helps. The standard plot for choosing
    * (k, bands) — computed from the corpus instead of assumed.
    *
    * Scale shape: the two already-blocked pair frames joined on the pair
    * key, a ≤6-row bucket aggregation, theory as a per-row literal
    * formula. */
  def lshScurve(docs: DataFrame, minJ: Double = 0.5): DataFrame = {
    val truth = ngramJaccard(docs, minJ)
    val cand = minhashLshPairs(docs)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("c"))
    truth.join(cand, Seq("doc_a", "doc_b"), "left_outer")
      .withColumn("bucket", floor(col("jaccard") * 10).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("c"), lit(0L))).as("n_caught"))
      .withColumn("recall_measured",
        round(col("n_caught").cast("double") / col("n_truth"), 4))
      .withColumn("mid", least((col("bucket").cast("double") + 0.5) / 10.0, lit(1.0)))
      .withColumn("p_theory",
        round(lit(1.0) - pow(lit(1.0) - pow(col("mid"), lit(4.0)), lit(3.0)), 4))
      .select(col("bucket"), col("n_truth"), col("n_caught"),
        col("recall_measured"), col("p_theory"))
      .orderBy(col("bucket"))
  }

  // ── 4. SimHash ─────────────────────────────────────────────────────────

  val SimhashBits = 48 // fits signed 64-bit in every engine

  /** 48-bit SimHash: per bit, the sign of the token-multiset vote
    * (+1 if the token hash has the bit set, −1 otherwise). Native codegen
    * kernel ([[graft.functions.Signatures.simhash48]]) — identical values
    * to the SQL/oracle nested-fold formulation. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    augmentedDocs(docs)
      .select(
        col("doc_id"),
        call_function("simhash48", col("toks")).as("simhash"))
      .orderBy(col("doc_id"))
  }

  val SimhashChunks = 4 // 4 × 12-bit chunks for Hamming blocking

  /** Fraction of documents a 12-bit chunk bucket may hold before the pair
    * stage drops it (floor of 2 docs so tiny corpora still pair) — the
    * [[Winnow.MaxFpDocFrac]] fix class applied to SimHash blocking: a chunk
    * value shared by a large slice of the corpus (boilerplate-dominated or
    * adversarially repetitive input, e.g. thousands of near-identical short
    * docs) makes its bucket QUADRATIC in the self-join. Capping the
    * posting-list size bounds every bucket's pair count at
    * (frac·N)², independent of the hot family's size. Recall note: an
    * over-cap bucket contributes no pairs from that chunk — a family that
    * hot is mass near-duplication, which exact dedup catches far cheaper. */
  val MaxChunkDocFrac = 0.05

  /** SimHash near-dup pairs: block on any equal 12-bit chunk (a pair within
    * Hamming distance 3 of a 48-bit hash must agree on ≥1 of 4 chunks —
    * pigeonhole), frequency-cap the blocking buckets ([[MaxChunkDocFrac]]),
    * verify bit_count(xor) ≤ maxHamming. The bucket-frequency join shuffles
    * on the same (chunk, chunk_val) key as the pair join (co-partitioned);
    * the 1-row corpus total is broadcast. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val sig = simhashSignatures(docs)
    val chunkBits = SimhashBits / SimhashChunks
    val chunked = sig.select(
      col("doc_id"), col("simhash"),
      posexplode(expr(
        s"""transform(sequence(0, ${SimhashChunks - 1}),
           |  c -> shiftright(simhash, c * $chunkBits) % ${1 << chunkBits})""".stripMargin))
        .as(Seq("chunk", "chunk_val")))
    val total = sig.agg(count(lit(1)).as("n_docs_total"))
    val freq = chunked.groupBy(col("chunk"), col("chunk_val"))
      .agg(count(lit(1)).as("bucket_docs"))
    val capped = chunked.join(freq, Seq("chunk", "chunk_val"))
      .crossJoin(broadcast(total))
      .filter(col("bucket_docs") <=
        greatest(lit(2L), ceil(lit(MaxChunkDocFrac) * col("n_docs_total"))))
      .select(col("doc_id"), col("simhash"), col("chunk"), col("chunk_val"))
    // explicit fan-out before the exploding self-join ([[Similarity.pairFanout]])
    val cappedWide = Similarity.pairFanout(capped, col("chunk"), col("chunk_val"))
    val a = cappedWide.as("a")
    val b = cappedWide.as("b")
    // hamming verify runs PER COLLISION, map-side, so pairs that fail the
    // radius die before any shuffle and the cross-chunk dedupe carries
    // only (doc_a, doc_b, hamming) — same r16 restructure as
    // [[minhashLshPairs]] (hamming is a pure pair function, so
    // distinct-after-verify is value-identical; the oracle pins it)
    a.join(b,
        col("a.chunk") === col("b.chunk") && col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        expr("bit_count(a.simhash ^ b.simhash)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("hamming"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ── 5. embedding cosine near-dup ───────────────────────────────────────

  /** Label-free variant: blocking via signed-hyperplane LSH buckets
    * ([[Similarity.withBucket]]) — the honest 100 TB path when no cluster
    * label exists. Recall is ANN-partial: a near-dup pair straddling a
    * bucket boundary is missed (multi-probe or fewer planes to trade). */
  def embeddingNearDupsLsh(emb: DataFrame, threshold: Double = 0.995): DataFrame = {
    import graft.functions.VectorMath
    graft.GraftExtensions.ensureRegistered(emb.sparkSession)
    val v = Similarity.pairFanout(Similarity.withBucket(
      augmentedEmbeddings(emb).withColumn("sq", VectorMath.normSq("vec"))),
      col("bucket"))
    val a = v.as("a")
    val b = v.as("b")
    a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        VectorMath.dot("a.vec", "b.vec") / sqrt(col("a.sq") * col("b.sq")))
      .filter(col("cos") >= threshold)
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Embedding near-dup: pairs within the same cluster label (the blocking
    * key; at scale this is an LSH/IVF bucket — see
    * [[graft.operators.Similarity]]) with cosine ≥ threshold. Squared norms
    * are computed once per vector, before the pair join fans out. */
  def embeddingNearDups(emb: DataFrame, threshold: Double = 0.995): DataFrame = {
    import graft.functions.VectorMath
    graft.GraftExtensions.ensureRegistered(emb.sparkSession)
    val v = Similarity.pairFanout(
      augmentedEmbeddings(emb).withColumn("sq", VectorMath.normSq("vec")),
      col("label"))
    val a = v.as("a")
    val b = v.as("b")
    a.join(b,
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        VectorMath.dot("a.vec", "b.vec") / sqrt(col("a.sq") * col("b.sq")))
      .filter(col("cos") >= threshold)
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(col("cos"), 6).as("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // ── 6b. SemDeDup (semantic dedup via k-means cells) ────────────────────

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * by clustering embeddings into k-means cells and dropping, within each
    * cell, every member that has a near-duplicate (cosine ≥ threshold) of
    * LOWER centroid similarity — i.e. of each semantic-duplicate pair the
    * paper keeps the member farthest from the centroid (the more "extreme",
    * diversity-preserving representative) and drops the inlier. Ties on
    * centrality break by vec_id (lower id wins).
    *
    * The rule here is the single-pass pairwise form: x is dropped iff some
    * y in x's CELL-BLOCK with cos(x,y) ≥ τ ranks below x on
    * (cent_cos, vec_id). The comparison scope is [[Similarity.withCellBlock]]'s
    * deterministic ≤256-member sub-block of the cell, not the whole cell:
    * that bounds the worst-case pair work per task (an adversarial corpus
    * piling onto one centroid stays ≤ cap² per block instead of m²) at the
    * cost of never comparing duplicates that straddle a block boundary
    * within an over-full cell — the same bounded-recall trade SemDeDup
    * itself makes by fixing k and ε per cluster. Cells at their expected
    * occupancy (k = N/256) fit one block, where the rule IS whole-cell.
    * For transitively-closed duplicate cliques this keeps exactly the
    * paper's one representative; across a non-transitive chain it is
    * slightly more aggressive (both ends of the chain can survive, the
    * middle drops) — deterministic either way, which is what the value
    * gate needs.
    *
    * Scale shape: cell is the blocking key — the only Exchange carries
    * (vec, sq, cell, cent_cos), never corpus text, and pair work is bounded
    * per cell (at 100 TB: k ∝ corpus size / target cell size keeps cells
    * ~constant; the paper runs k = 50k for LAION). Assignment itself is the
    * narrow literal-centroid argmax ([[Similarity.withIvfCellScore]]). */
  def semDedup(emb: DataFrame, threshold: Double = 0.96): DataFrame = {
    import graft.functions.VectorMath
    graft.GraftExtensions.ensureRegistered(emb.sparkSession)
    // pinned: count + centroid extraction + assignment + the pair join
    // are repeated passes over the prepared corpus (r16)
    val prepped = augmentedEmbeddings(emb).withColumn("sq", VectorMath.normSq("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val v = Similarity.pairFanout(
      Similarity.withCellBlock(Similarity.withIvfCellScore(prepped)),
      col("cell_blk"))
    val dropped = v.as("a").join(v.as("b"),
        col("a.cell_blk") === col("b.cell_blk") && col("a.vec_id") =!= col("b.vec_id") &&
          (VectorMath.dot("a.vec", "b.vec") /
            sqrt(col("a.sq") * col("b.sq")) >= threshold) &&
          (col("b.cent_cos") < col("a.cent_cos") ||
            (col("b.cent_cos") === col("a.cent_cos") &&
              col("b.vec_id") < col("a.vec_id"))),
        "left_semi")
      .select(col("vec_id"), lit(1).as("is_dropped"))
    v.join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        round(col("cent_cos"), 6).as("cent_cos"),
        col("is_dropped").isNull.as("kept"))
      .orderBy(col("vec_id"))
  }

  // ── 7. incremental (snapshot) dedup ────────────────────────────────────

  /** Incremental ingest dedup against a prior corpus snapshot: each
    * arriving batch document is checked against the snapshot's content
    * digests and labeled `duplicate` (digest already ingested) or `new`.
    * This is the batch-mode sibling of the streaming first-seen filter
    * ([[graft.streaming.DocStream]]); here snapshot = the base `documents`
    * corpus and batch = the augmented additions (ids ≥ 100000), so the
    * oracle can verify the labeling value-for-value: exact copies come
    * back `duplicate`, truncated near-dups come back `new` (near-dup
    * ingest control is MinHash's job, not the digest gate's).
    *
    * Scale shape: both sides shuffle ONLY their digest column (the join
    * key); at 100 TB the snapshot digest table is itself a compact column
    * (32 bytes/doc) and the hash join is the intended plan. For the common
    * case where the arriving batch is small relative to the snapshot, use
    * [[incrementalStatusBloom]] — the broadcast-bloom prefilter keeps the
    * snapshot scan but spares the batch the shuffle for every
    * bloom-negative (definitely-new) row. */
  /** Persist a corpus snapshot's digest table BUCKETED by digest — the
    * at-rest layout that makes every future ingest gate free of
    * snapshot-side shuffle. One distinct + bucket-write shuffle now; every
    * [[incrementalStatusBucketed]] after reads co-partitioned buckets. */
  def saveSnapshotDigests(docs: DataFrame, table: String,
      nBuckets: Int = 32): Unit =
    graft.export.Bucketed.saveBucketed(
      docs.select(contentDigest(col("text")).as("digest")).distinct(),
      table, "digest", nBuckets)

  /** The digest ingest gate against a bucketed snapshot table
    * ([[saveSnapshotDigests]]): same labeling as [[incrementalStatus]],
    * but the snapshot side — the 100 TB side — plans with ZERO Exchange
    * (its `HashPartitioning(digest, n)` comes from the bucket layout);
    * only the small arriving batch shuffles, into the snapshot's bucket
    * count. `BucketedJoinSpec` pins the one-Exchange plan. */
  def incrementalStatusBucketed(batch: DataFrame, snapshotTable: String): DataFrame = {
    val snapshot = batch.sparkSession.table(snapshotTable)
      .withColumn("seen", lit(1))
    batch.select(col("doc_id"), contentDigest(col("text")).as("digest"))
      .join(snapshot, Seq("digest"), "left")
      .select(col("doc_id"),
        when(col("seen").isNotNull, "duplicate").otherwise("new").as("status"))
      .orderBy(col("doc_id"))
  }

  def incrementalStatus(docs: DataFrame): DataFrame = {
    val aug = augmentedDocs(docs)
    val snapshot = aug.filter(col("doc_id") < 100000)
      .select(contentDigest(col("text")).as("digest")).distinct()
      .withColumn("seen", lit(1))
    aug.filter(col("doc_id") >= 100000)
      .select(col("doc_id"), contentDigest(col("text")).as("digest"))
      .join(snapshot, Seq("digest"), "left")
      .select(col("doc_id"),
        when(col("seen").isNotNull, "duplicate").otherwise("new").as("status"))
      .orderBy(col("doc_id"))
  }

  /** Bloom-prefiltered variant of [[incrementalStatus]] — identical output
    * (bloom filters have no false negatives, so every true duplicate still
    * reaches the exact confirm join; false positives are caught BY that
    * join). The snapshot digests are folded into a compact bloom filter
    * with one distributed aggregation, broadcast to the batch scan, and
    * only bloom-positive batch rows (true dups + fpp-rate noise) enter the
    * exact join — the bloom-negative majority is labeled `new` map-side
    * with zero shuffle. The membership probe is a driver-broadcast sketch
    * lookup, which no Catalyst expression expresses — the one-UDF boundary
    * is deliberate and sits outside every hot codegen span. */
  def incrementalStatusBloom(docs: DataFrame, expectedItems: Long = 2000000L,
      fpp: Double = 0.01): DataFrame = {
    val aug = augmentedDocs(docs)
    val snapshot = aug.filter(col("doc_id") < 100000)
      .select(contentDigest(col("text")).as("digest"))
    val bloom = snapshot.stat.bloomFilter("digest", expectedItems, fpp)
    val bloomBc = docs.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((d: String) => d != null && bloomBc.value.mightContainString(d))
    val batch = aug.filter(col("doc_id") >= 100000)
      .select(col("doc_id"), contentDigest(col("text")).as("digest"))
      .withColumn("candidate", mightContain(col("digest")))
    val definiteNew = batch.filter(!col("candidate"))
      .select(col("doc_id"), lit("new").as("status"))
    val confirmed = batch.filter(col("candidate"))
      .join(snapshot.distinct().withColumn("seen", lit(1)), Seq("digest"), "left")
      .select(col("doc_id"),
        when(col("seen").isNotNull, "duplicate").otherwise("new").as("status"))
    definiteNew.unionByName(confirmed).orderBy(col("doc_id"))
  }

  /** Content-addressed corpus-version diff — the audit a pipeline runs
    * between two corpus snapshots ("what changed since the last training
    * set?"): digests present only in v2 are `added`, only in v1 `removed`,
    * in both `common`. Content-level semantics: a document deleted from v2
    * whose exact copy survives still counts `common` — its CONTENT is
    * still in the corpus. Each side collapses to distinct 32-byte digests
    * before the full-outer join, so the shuffle is digest-only regardless
    * of corpus size. Expects a `text` column on both inputs. */
  def snapshotDiffRaw(v1: DataFrame, v2: DataFrame): DataFrame = {
    val d1 = v1.select(contentDigest(col("text")).as("digest")).distinct()
      .withColumn("in1", lit(1))
    val d2 = v2.select(contentDigest(col("text")).as("digest")).distinct()
      .withColumn("in2", lit(1))
    d1.join(d2, Seq("digest"), "full_outer")
      .select(
        when(col("in1").isNull, "added")
          .when(col("in2").isNull, "removed")
          .otherwise("common").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_digests"))
      .orderBy(col("status"))
  }

  /** [[snapshotDiffRaw]] harness twin: v1 = the base corpus, v2 = the
    * augmented corpus minus a deterministic removal stride (base ids
    * divisible by 17) — guaranteeing all three statuses exist for the
    * oracle to verify. */
  def snapshotDiff(docs: DataFrame): DataFrame = {
    val v1 = augmentedDocs(docs).filter(col("doc_id") < 100000)
    val v2 = augmentedDocs(docs)
      .filter(!(col("doc_id") < 100000 && col("doc_id") % 17 === 0))
    snapshotDiffRaw(v1, v2)
  }

  /** (doc_id, sig) → one row per (band, band_key) — the LSH bucket key a
    * signature lands in (shared by [[minhashLshPairs]] and the incremental
    * near-dup gate). */
  private[operators] def bandedSigs(sig: DataFrame): DataFrame = {
    val rows = MinhashK / MinhashBands
    sig.select(
      col("doc_id"), col("sig"),
      posexplode(expr(
        s"""transform(sequence(0, ${MinhashBands - 1}),
           |  b -> array_join(transform(slice(sig, b * $rows + 1, $rows),
           |                            x -> cast(x as string)), ','))""".stripMargin))
        .as(Seq("band", "band_key")))
  }

  /** Near-dup-aware incremental ingest: the MinHash sibling of the
    * digest-only [[incrementalStatus]] gate. Each arriving batch document
    * is labeled `duplicate` (content digest already in the snapshot),
    * `near_duplicate` (an LSH band collision with a snapshot document whose
    * signature-agreement Jaccard estimate clears `estThreshold` — e.g. a
    * truncated or lightly edited copy the digest gate waves through), or
    * `new`; `best_est` carries the best snapshot match's estimate (null
    * when no banded candidate cleared the threshold, including sub-3-token
    * documents that have no signature).
    *
    * Scale shape: the snapshot side is reduced to its band table (3 rows ×
    * ~30 bytes per doc) and the join shuffles band keys only — never text,
    * never the corpus; the estimate verify runs per banded candidate (LSH
    * keeps that set ∝ true near-dups) and collapses to one row per batch
    * doc before the cheap digest/status joins. Nothing is ever pairwise
    * across the full snapshot. */
  def incrementalNearDupStatus(docs: DataFrame,
      estThreshold: Double = 0.5): DataFrame = {
    val aug = augmentedDocs(docs)
    val snapDigests = aug.filter(col("doc_id") < 100000)
      .select(contentDigest(col("text")).as("digest")).distinct()
      .withColumn("seen", lit(1))
    val sigs = minhashSignatures(docs)
    val snapBands = bandedSigs(sigs.filter(col("doc_id") < 100000))
      .select(col("band"), col("band_key"), col("sig").as("snap_sig"))
    val batchBands = bandedSigs(sigs.filter(col("doc_id") >= 100000))
    val near = batchBands.as("a")
      .join(snapBands.as("b"), Seq("band", "band_key"))
      .select(col("doc_id"), col("sig"), col("snap_sig"))
      .distinct() // a pair can collide in >1 band
      .withColumn("est", estJaccard("sig", "snap_sig"))
      .filter(col("est") >= estThreshold)
      .groupBy(col("doc_id"))
      .agg(max(col("est")).as("best_est"))
    aug.filter(col("doc_id") >= 100000)
      .select(col("doc_id"), contentDigest(col("text")).as("digest"))
      .join(snapDigests, Seq("digest"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("seen").isNotNull, "duplicate")
          .when(col("best_est").isNotNull, "near_duplicate")
          .otherwise("new").as("status"),
        round(col("best_est"), 4).as("best_est"))
      .orderBy(col("doc_id"))
  }
}
