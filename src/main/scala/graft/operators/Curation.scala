package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators — the steps a pretraining-data pipeline runs
 * AFTER dedup/quality analysis to produce the training set:
 *
 *  - [[clusterKeepers]]: quality-aware canonical-document selection per
 *    duplicate cluster (keep the best-scoring member, not just the lowest
 *    id) — the decision step that turns dedup output into a keep/drop list;
 *  - [[withSplit]] / [[splitSummary]]: deterministic hash-based train/val
 *    split, stratified per language by construction (the hash is uniform
 *    within every stratum) — reproducible across runs and engines, no RNG;
 *  - [[packSequences]] / [[packingSummary]]: GPT-style concat-and-chunk
 *    sequence packing — documents are ordered within hash shards, token
 *    offsets accumulated, and each document assigned to the context-window
 *    chunk its start offset lands in.
 *
 * Scale shape: splits are narrow projections; keeper selection is one
 * groupBy over the (tiny) cluster set; packing is a per-shard window — the
 * shard count bounds every sort partition to corpus/shards, and the
 * cumulative sum is the only stateful step (inherent: packing requires a
 * defined order). All outputs are integers or 4-digit-rounded doubles, so
 * the DuckDB oracle verifies them value-for-value.
 */
object Curation {

  /** Test seam mirroring [[Similarity.driverCollectRows]] /
    * [[Dedup.driverCollectRows]]: rows the stratum-rate builders
    * materialize on the driver. Legitimate callers collect ONE row per
    * stratum (language / source — a domain-bounded handful), never per
    * document; `DriverStateGateSpec` pins the bound and seed-proves that a
    * corpus-keyed stratum collect trips it. */
  private[graft] val driverCollectRows = new java.util.concurrent.atomic.AtomicLong

  /** The ONE driver collect of the mixture-rate family: per-stratum
    * aggregate pulled as a null-safely-sorted (stratum, value) table, row
    * count ledgered. Every stratum map (temperature rates, epoch rates)
    * routes through here so the driver-state bound is machine-checked at
    * one site instead of audited per round. */
  private[graft] def ledgeredStrata(df: DataFrame, key: Column,
      agg: Column): Array[(String, Long)] = {
    val arr = df.groupBy(key.as("k")).agg(agg.as("v"))
      // null-safe sort: a NULL stratum must not NPE the driver fold
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(t => Option(t._1).getOrElse(""))
    driverCollectRows.addAndGet(arr.length)
    arr
  }

  /** Portable per-id split hash: hash64("<id>#<salt>") ∈ [0, 2^60) — the
    * ONE home of the split-hash convention (doc split, leakage audits,
    * epoch stochastic rounding all derive from it; the DuckDB oracles
    * mirror the same formula). */
  private def splitHash(salt: String, id: Column = col("doc_id")): Column =
    call_function("hash64", concat(id.cast("string"), lit("#" + salt)))

  /** Quality-aware keeper per duplicate cluster: join the MinHash-LSH
    * connected components with quality scores and keep the member with the
    * best (rounded) quality, doc-id tie-break. Output: one row per cluster
    * with the keeper and the member count — the keep/drop decision list. */
  def clusterKeepers(docs: DataFrame): DataFrame =
    clusterKeepersFrom(
      Dedup.duplicateClusters(docs),
      TextAnalysis.qualityScores(
        Dedup.augmentedDocs(docs).select(col("doc_id"), col("text"), col("lang")))
        .select(col("doc_id"), col("quality_score")))

  /** [[clusterKeepers]] over ALREADY-BUILT cluster and quality frames — so
    * a caller that needs clusters, quality, AND keepers (the funnel) pays
    * for the expensive connected-components derivation once. */
  def clusterKeepersFrom(clusters: DataFrame, quality: DataFrame): DataFrame = {
    clusters.join(quality, Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_members"),
        // argmax by (quality desc, doc_id asc) via struct max on (q, -id)
        max(struct(col("quality_score").as("q"), (-col("doc_id")).as("nd")))
          .as("best"))
      .select(
        col("cluster"),
        col("n_members"),
        (-col("best.nd")).as("keep_doc_id"),
        col("best.q").as("keep_quality"))
      .orderBy(col("cluster"))
  }

  /** Deterministic train/val assignment: `val` iff
    * hash64(doc_id#salt) mod 1000 < valPermille. Uniform within any
    * stratum, stable across runs/engines, and adding documents never
    * reassigns existing ones — the properties an RNG split lacks. */
  def withSplit(docs: DataFrame, valPermille: Int = 100,
      salt: String = "split1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    docs.withColumn("split",
      when(splitHash(salt) % 1000 < valPermille, "val").otherwise("train"))
  }

  /** Per-(lang, split) corpus accounting over the split assignment.
    * n_tokens is computed INLINE on the same scan (size of the token
    * array) — joining tokenCounts back on doc_id would re-scan and
    * re-shuffle the corpus just to glue a column the row already
    * derives. */
  def splitSummary(docs: DataFrame, valPermille: Int = 100,
      salt: String = "split1"): DataFrame =
    TextAnalysis.withTokens(withSplit(docs, valPermille, salt))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy(col("lang"), col("split"))

  /** Concat-and-chunk packing: shard documents by hash, order by doc_id
    * within each shard, accumulate token offsets, and assign each document
    * to the `budgetTokens`-sized chunk its start offset lands in. Output:
    * (doc_id, shard, start_offset, seq_index). */
  def packSequences(docs: DataFrame, budgetTokens: Int = 2048,
      shards: Int = 8, salt: String = "pack1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    TextAnalysis.tokenCounts(docs)
      .select(col("doc_id"), col("n_tokens"))
      .withColumn("shard", splitHash(salt) % shards)
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_index", floor(col("start_offset") / budgetTokens))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("start_offset"), col("seq_index"))
  }

  /** Chunks-per-shard accounting: how many documents and tokens land in
    * each packed context window. */
  def packingSummary(docs: DataFrame, budgetTokens: Int = 2048,
      shards: Int = 8, salt: String = "pack1"): DataFrame =
    packSequences(docs, budgetTokens, shards, salt)
      .groupBy(col("shard"), col("seq_index"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"))
      .orderBy(col("shard"), col("seq_index"))

  // ── stratified mixture sampling ──────────────────────────────────────────

  /** Per-language sampling rates in basis points (out of 10000) — the
    * mixture-weight knob of a pretraining data recipe ("keep 50% of en,
    * 10% of zh"). Integer basis points, not double rates: the keep
    * predicate stays exact integer arithmetic on both engines. */
  val SampleRatesBp: Map[String, Int] =
    Map("en" -> 5000, "es" -> 3000, "fr" -> 3000, "de" -> 2000, "zh" -> 1000)

  /** Deterministic stratified downsampling: keep a document iff
    * hash64(doc_id#salt) mod 10000 < its language's basis-point rate.
    * Unknown languages default to 0 (dropped). The hash is uniform within
    * every stratum, so realized rates converge to the configured mixture;
    * re-runs and late-arriving shards never reshuffle prior decisions.
    *
    * Scale shape: a narrow map-side filter — no shuffle, no RNG state, no
    * driver involvement; the sampled corpus streams straight into the next
    * stage at full scan speed. */
  /** Basis-point rate for the row's language, as a typed when-chain — NOT
    * string-built SQL: `rates` is a public parameter, so keys must never be
    * spliced into a parsed statement. Unknown languages rate 0 (dropped). */
  private def rateCol(rates: Map[String, Int]): Column =
    // null-safe sort + null-safe equality: temperatureRatesBp deliberately
    // keeps a NULL-lang stratum alive, so the fold must neither NPE on the
    // sort nor compile that stratum into `=== NULL` (never matches)
    rates.toSeq.sortBy(t => Option(t._1).getOrElse("")).reverse
      .foldLeft(lit(0)) { case (acc, (l, bp)) =>
        when(col("lang") <=> lit(l), lit(bp)).otherwise(acc)
      }

  def withSampleFlag(docs: DataFrame, rates: Map[String, Int] = SampleRatesBp,
      salt: String = "sample1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    docs
      .withColumn("rate_bp", rateCol(rates))
      .withColumn("keep", splitHash(salt) % 10000 < col("rate_bp"))
  }

  /** Per-language sampling accounting: configured vs realized rate. */
  def sampleSummary(docs: DataFrame, rates: Map[String, Int] = SampleRatesBp,
      salt: String = "sample1"): DataFrame =
    withSampleFlag(docs, rates, salt)
      .groupBy(col("lang"))
      .agg(
        max(col("rate_bp")).as("rate_bp"),
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("realized_rate",
        round(col("n_kept").cast("double") / col("n_total"), 4))
      .orderBy(col("lang"))

  /** Token-weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    * A-ES (Inf. Proc. Letters 2006): each document draws a uniform u from
    * a salted hash of its id and ranks by u^(1/w) with w = its word count;
    * the global top-k is an exact weighted sample without replacement —
    * long documents proportionally likelier, yet every doc has a chance.
    * The mixture-rate sibling [[withSampleFlag]] keeps a per-language
    * FRACTION; this keeps a fixed BUDGET (k docs) weighted by length —
    * the "fill exactly one shard, length-proportionally" primitive.
    *
    * Determinism: u is hash-derived (no RNG state, replay-stable across
    * shards and reruns); the A-ES key is ranked via ln(u)/w — monotone in
    * u^(1/w) — computed as ONE transcendental rounded once to integer
    * micro-nats, so Spark and the DuckDB oracle sort identical integers
    * (the [[TextAnalysis.unigramScores]] parity trick).
    *
    * Scale shape: a narrow per-row projection into a TakeOrdered top-k —
    * no shuffle of the corpus, no full sort, no driver-side sampling
    * state; at 100 TB the only cross-executor traffic is each partition's
    * k candidate rows. */
  def weightedSample(docs: DataFrame, k: Int = 50,
      salt: String = "ws1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val m = 2147483647L // 2³¹−1: u = (hash mod m + 1)/(m+1) ∈ (0, 1]
    TextAnalysis.withTokens(docs)
      .withColumn("n_words",
        call_function("count_nonempty", col("toks")).cast("long"))
      .filter(col("n_words") > 0)
      // the ONE split-hash convention (id#salt, splitHash above) — this
      // previously hand-rolled a salt#id variant that the oracle had to
      // mirror separately, falsifying the one-home invariant
      .withColumn("hm", pmod(splitHash(salt), lit(m)))
      .withColumn("key_micro",
        round(log((col("hm") + 1).cast("double") / (m + 1).toDouble) /
          col("n_words") * 1e6).cast("long"))
      .select(col("doc_id"), col("n_words"), col("key_micro"))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Quality floor for the funnel's filter stage. */
  val QualityFloor = 0.3

  /** The curation funnel — one corpus pass reporting how many documents
    * survive each cumulative pipeline stage: ingest → exact dedup (digest
    * keepers) → near-dedup (LSH cluster keepers) → quality floor →
    * stratified mixture sampling. The number every pipeline owner asks for
    * ("where did my tokens go?"), and the proof the operators compose.
    *
    * Scale shape: stage predicates are all per-row flags (digest-group min
    * via one keyed window, cluster keeper via joins against the — tiny —
    * cluster tables, quality and sampling narrow projections); the five
    * counts ride ONE aggregation to a single row, unpivoted with `stack`. */
  def funnel(docs: DataFrame, qualityFloor: Double = QualityFloor,
      rates: Map[String, Int] = SampleRatesBp, salt: String = "sample1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val aug = Dedup.augmentedDocs(docs)
    val quality = TextAnalysis.qualityScores(
      aug.select(col("doc_id"), col("text"), col("lang")))
      .select(col("doc_id"), col("quality_score"))
    // connected components once; keepers derive from the same frame
    val clusterFrame = Dedup.duplicateClusters(docs)
    val clusters = clusterFrame.select(col("doc_id"), lit(1).as("in_cluster"))
    val keepers = clusterKeepersFrom(clusterFrame, quality)
      .select(col("keep_doc_id").as("doc_id"), lit(1).as("is_keeper"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("digest"))
    val flagged = aug
      .withColumn("digest", Dedup.contentDigest(col("text")))
      .withColumn("min_id", min(col("doc_id")).over(w))
      .join(clusters, Seq("doc_id"), "left")
      .join(keepers, Seq("doc_id"), "left")
      .join(quality, Seq("doc_id"))
      .withColumn("s2", col("doc_id") === col("min_id"))
      .withColumn("s3", col("s2") &&
        (col("in_cluster").isNull || col("is_keeper").isNotNull))
      .withColumn("s4", col("s3") && col("quality_score") >= qualityFloor)
      .withColumn("s5", col("s4") && splitHash(salt) % 10000 < rateCol(rates))
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    flagged
      .agg(
        count(lit(1)).as("n1"), cnt(col("s2")).as("n2"), cnt(col("s3")).as("n3"),
        cnt(col("s4")).as("n4"), cnt(col("s5")).as("n5"))
      .select(expr(
        """stack(5,
          |  1, 'ingest', n1, 2, 'exact_dedup', n2, 3, 'near_dedup', n3,
          |  4, 'quality', n4, 5, 'sample', n5) as (stage_idx, stage, n_docs)"""
          .stripMargin))
      .orderBy(col("stage_idx"))
  }

  // ── temperature (α) mixture sampling ─────────────────────────────────────

  /** Temperature-sampling rates in basis points: language l keeps
    * `min(1, T·w_l/n_l)` of its documents, where `w_l = √n_l / Σ√n` (the
    * α=0.5 temperature reweighting multilingual pretraining uses to damp
    * head languages and boost the tail) and `T = targetShare·N` is the
    * token budget. Computed on the driver from the tiny per-language count
    * table, with the √-sum folded in sorted-language order so the doubles
    * — and the floor to integer basis points — are engine-exact. */
  def temperatureRatesBp(docs: DataFrame, targetShare: Double = 0.5): Map[String, Int] = {
    val counts = ledgeredStrata(docs, col("lang"), count(lit(1)))
    val totN = counts.map(_._2).sum.toDouble
    val sumW = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + math.sqrt(n.toDouble) }
    counts.map { case (l, n) =>
      l -> math.min(10000.0,
        math.floor(((totN * targetShare * math.sqrt(n.toDouble) / sumW) / n.toDouble)
          * 10000.0)).toInt
    }.toMap
  }

  /** [[sampleSummary]] under the temperature-derived mixture — configured
    * (α-damped) vs realized rate per language. */
  def temperatureSampleSummary(docs: DataFrame, targetShare: Double = 0.5,
      salt: String = "temp1"): DataFrame =
    sampleSummary(docs, temperatureRatesBp(docs, targetShare), salt)

  /** Per-source repeat factors (EPOCHS) for a token-budget data mix — the
    * table a pretraining run is actually configured from (the LLaMA-style
    * "sampling prop. / epochs" table): given a token budget of
    * `budgetMultiplier` × the corpus and √-damped target shares (small
    * sources up-weighted, the [[temperatureRatesBp]] damping applied to
    * SOURCES by token mass), how many times does each source repeat?
    * Computed on the driver from the tiny per-source token-count table
    * with sorted-order folds (bit-reproducible); returned in micro-epochs
    * so all downstream arithmetic is exact-integer. */
  def epochsRatesMicro(docs: DataFrame,
      budgetMultiplier: Double = 2.0): Map[String, Long] = {
    val counts = ledgeredStrata(
      TextAnalysis.withTokens(docs)
        .withColumn("n_tokens", size(col("toks")).cast("long")),
      col("source"), sum(col("n_tokens")))
    val tot = counts.map(_._2).sum.toDouble
    val sumW = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + math.sqrt(n.toDouble) }
    counts.map { case (src, n) =>
      src -> math.floor(
        (tot * budgetMultiplier * (math.sqrt(n.toDouble) / sumW) / n.toDouble)
          * 1e6).toLong
    }.toMap
  }

  /** [[epochsRatesMicro]] APPLIED: every document repeats floor(epochs)
    * times plus one more with probability frac(epochs), decided by a
    * deterministic per-doc hash (stochastic rounding without RNG — the
    * realized token count converges to the budget while each doc's count
    * is reproducible). Narrow map-side arithmetic on the corpus; the
    * summary is one per-source aggregation.
    *
    * Output per source: the micro-epoch rate, doc/token mass, emitted doc
    * count, and the realized epochs — the number a mixing audit compares
    * against the plan. */
  def epochsSummary(docs: DataFrame, budgetMultiplier: Double = 2.0,
      salt: String = "epoch1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val rates = epochsRatesMicro(docs, budgetMultiplier)
    // same null discipline as rateCol: epochsRatesMicro keeps NULL-source
    // strata, so sort null-safe and match with <=>
    val rateCol = rates.toSeq.sortBy(t => Option(t._1).getOrElse("")).foldLeft(lit(0L)) {
      case (acc, (src, m)) => when(col("source") <=> lit(src), lit(m)).otherwise(acc)
    }
    TextAnalysis.withTokens(docs)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("epochs_micro", rateCol)
      .withColumn("n_emit",
        expr("epochs_micro div 1000000L") +
          when(splitHash(salt) % 1000000L <
            col("epochs_micro") % 1000000L, 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(
        max(col("epochs_micro")).as("epochs_micro"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_emit")).as("n_emitted"),
        round(sum(col("n_emit")).cast("double") / count(lit(1)), 4)
          .as("realized_epochs"))
      .orderBy(col("source"))
  }

  /** DSIR-style importance selection (Xie et al. 2023, simplified to the
    * unigram bag-of-words form): score every corpus document by the
    * log-likelihood RATIO between a target-domain language model and the
    * raw-corpus model, and keep the most target-like. The target here is
    * the deterministic id carve ([[graft.operators.Contamination]]'s
    * stride — standing in for "a small trusted domain sample"), both
    * models are Laplace-smoothed unigrams over the shared vocabulary, and
    * every per-token log is rounded once to integer micro-nats so the
    * per-doc sum is order-free and engine-exact (the
    * [[graft.operators.TextAnalysis.nbQuality]] arithmetic).
    *
    * Scale shape: two vocab-sized count aggregations (target counts ride
    * the same shuffle as raw counts — one conditional sum), a 1-row stats
    * broadcast, the word-count join back to the token stream, one per-doc
    * aggregation, and a TakeOrdered top-k. Text never reaches an
    * Exchange. */
  def dsirSelect(docs: DataFrame, topK: Int = 50): DataFrame = {
    val isTarget = col("doc_id") % 50 === 0
    val toks = TextAnalysis.withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("is_target", isTarget)
    val model = toks.groupBy(col("tok")).agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("cnt_t"),
      sum(when(col("is_target"), 0L).otherwise(1L)).as("cnt_r"))
    val stats = model.agg(
      sum("cnt_t").as("tot_t"), sum("cnt_r").as("tot_r"),
      count(lit(1)).as("v"))
    def nllMicro(cnt: Column, tot: Column): Column =
      round(-log((cnt + 1).cast("double") / (tot + col("v")).cast("double")) * 1e6)
        .cast("long")
    toks.filter(!col("is_target"))
      .join(model, Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("w_micro",
        nllMicro(col("cnt_r"), col("tot_r")) - nllMicro(col("cnt_t"), col("tot_t")))
      .groupBy(col("doc_id"))
      .agg(sum(col("w_micro")).as("weight_micro"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("weight_micro").desc, col("doc_id"))
      .limit(topK)
  }

  // ── deterministic corpus shuffle / training shards ───────────────────────

  /** Seeded global shuffle order + shard assignment for training: a trainer
    * wants the corpus in a random-but-reproducible order, split into
    * equal-ish shards it can stream independently. `shuffle_key =
    * hash64(doc_id#seed)` IS the order (uniform in [0, 2^60), so sorting by
    * it is a derangement of any insertion/source order); `shard = key mod
    * nShards`. Changing the seed reshuffles everything; re-running never
    * does. Narrow map-side projection — zero shuffle to ASSIGN; the
    * physical reorder happens only where it must, inside
    * `repartition(shard).sortWithinPartitions(shuffle_key)` when shards are
    * written — a single bounded exchange, never a global sort. */
  def withShuffleOrder(docs: DataFrame, nShards: Int = 16,
      seed: String = "shuffle1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    require(nShards > 0, s"nShards must be positive: $nShards")
    docs
      .withColumn("shuffle_key", splitHash(seed))
      .withColumn("shard", (col("shuffle_key") % nShards).cast("int"))
  }

  /** Per-shard accounting over the shuffle assignment: document counts plus
    * the key range each shard spans — the balance check (uniform hash ⇒
    * shard sizes within sampling noise of corpus/nShards). */
  def shuffleSummary(docs: DataFrame, nShards: Int = 16,
      seed: String = "shuffle1"): DataFrame =
    withShuffleOrder(docs, nShards, seed)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("shuffle_key")).as("min_key"),
        max(col("shuffle_key")).as("max_key"))
      .orderBy(col("shard"))

  // ── source mixture report ────────────────────────────────────────────────

  /** Per-source corpus accounting — the mixture dashboard of a pretraining
    * recipe (how much of the token budget each source contributes): document
    * and token counts, mean document length, and each source's share of all
    * tokens. One map-side-combined aggregation collapses the corpus to one
    * row per source; the global-total window then runs over that tiny frame
    * (rows ∝ distinct sources), not the corpus. */
  /** Sliding-window document chunking — the splitting counterpart of
    * [[packSequences]] (packing concatenates short docs; chunking splits
    * long ones): fixed `size`-token windows every `stride` tokens
    * (overlap = size − stride keeps context across boundaries), the shape
    * every embedding/pretraining pipeline runs before a fixed context
    * window. Each chunk carries its own content digest, so chunk-level
    * dedup (the finer-grained sibling of document dedup) composes
    * directly with the digest gates.
    *
    * Scale shape: fully narrow — chunk starts are a `sequence` posexplode
    * per row, the window slice and digest are per-row lambdas; no shuffle
    * until a consumer aggregates. */
  def chunkDocs(docs: DataFrame, chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && stride <= chunkSize, "need 0 < stride <= chunkSize")
    TextAnalysis.withTokens(docs)
      .withColumn("words", expr("filter(toks, t -> t <> '')"))
      .withColumn("n_words", size(col("words")))
      .filter(col("n_words") > 0)
      .withColumn("n_chunks",
        expr(s"cast(greatest(ceil((n_words - $chunkSize) / cast($stride as double)), 0) as int) + 1"))
      .select(col("doc_id"), col("words"),
        posexplode(expr("sequence(0, n_chunks - 1)")).as(Seq("pos", "i")))
      .withColumn("start_word", (col("i") * stride).cast("long"))
      .withColumn("chunk_toks", expr(s"slice(words, start_word + 1, $chunkSize)"))
      .select(
        col("doc_id"),
        col("i").cast("long").as("chunk_idx"),
        col("start_word"),
        size(col("chunk_toks")).cast("long").as("n_tokens"),
        md5(array_join(col("chunk_toks"), " ")).as("chunk_digest"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Train/val split-leakage audit: the check a pipeline runs before
    * training — are any val documents near-duplicates of train documents?
    * Rides the MinHash-LSH pair list ([[Dedup.minhashLshPairs]]) and maps
    * each endpoint to its split; a (train, val) row with n_pairs > 0 IS
    * the leak. Reported as the full split×split pair matrix so the
    * same-split mass is visible context for the cross-split tail.
    *
    * Scale shape: the split is a pure hash of doc_id ([[withSplit]]'s
    * formula), so endpoint assignment is a narrow projection ON the pair
    * list — no join back to the corpus. Cost is the banded LSH join the
    * dedup path already pays; the matrix is a k²-row aggregation. */
  def splitLeakage(docs: DataFrame, valPermille: Int = 100,
      salt: String = "split1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    def splitOf(c: Column): Column =
      when(splitHash(salt, c) % 1000 < valPermille, "val").otherwise("train")
    Dedup.minhashLshPairs(docs)
      .withColumn("split_a", splitOf(col("doc_a")))
      .withColumn("split_b", splitOf(col("doc_b")))
      .groupBy(col("split_a"), col("split_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        round(avg(col("est_jaccard")), 4).as("avg_est_jaccard"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** Doc-hash vs source-grouped split, leakage measured side by side —
    * the GroupShuffleSplit argument made with numbers: hashing DOCUMENTS
    * into train/val strands near-duplicates across the boundary (the
    * model sees val's twins in training), while hashing SOURCES keeps
    * every mirror/recrawl family on one side. Both modes are scored on
    * the SAME near-dup pair list ([[Dedup.minhashLshPairs]]); the report
    * is two rows — pairs straddling the boundary and the leak rate —
    * and the spec pins the structural fact that same-source dup families
    * can never leak under the grouped split.
    *
    * Scale shape: the pair list is the banded-LSH frame the dedup path
    * already pays for; endpoint sources arrive via two doc-keyed joins
    * of (doc_id, source) against the pair endpoints' base ids (narrow
    * columns only), split labels are per-row hashes, and the report is a
    * 1-row aggregate melted to two rows. */
  def groupedSplitLeakage(docs: DataFrame, valPermille: Int = 100,
      srcValPermille: Int = 300, salt: String = "split1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    def docVal(c: Column): Column = splitHash(salt, c) % 1000 < valPermille
    def srcVal(c: Column): Column =
      call_function("hash64",
        concat(lit("src#"), c, lit("#" + salt))) % 1000 < srcValPermille
    val src = docs.select(col("doc_id"), col("source"))
    val pairs = Dedup.minhashLshPairs(docs)
      // augmented ids map to their base document: +100000 truncated,
      // +200000 exact copies (Dedup.augmentedDocs convention)
      .withColumn("base_a", col("doc_a") % 100000)
      .withColumn("base_b", col("doc_b") % 100000)
    val withSrc = pairs
      .join(src.select(col("doc_id").as("base_a"), col("source").as("src_a")),
        Seq("base_a"))
      .join(src.select(col("doc_id").as("base_b"), col("source").as("src_b")),
        Seq("base_b"))
      .select(
        (docVal(col("doc_a")) =!= docVal(col("doc_b"))).as("cross_doc"),
        (srcVal(col("src_a")) =!= srcVal(col("src_b"))).as("cross_src"))
    withSrc.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("cross_doc"), 1L).otherwise(0L)).as("c_doc"),
        sum(when(col("cross_src"), 1L).otherwise(0L)).as("c_src"))
      .select(expr(
        """stack(2,
          |  'doc_hash', n_pairs, c_doc, round(c_doc / cast(n_pairs as double), 4),
          |  'source_group', n_pairs, c_src, round(c_src / cast(n_pairs as double), 4)
          |) as (mode, n_pairs, n_cross, leak_rate)""".stripMargin))
      .orderBy(col("mode"))
  }

  /** RefinedWeb-style per-source document cap: within each source, rank
    * documents by (quality desc, doc_id) and keep at most `cap` — the
    * standard guard against one domain (a crawler trap, a mirror farm)
    * dominating the training mixture. Reported per source: total docs,
    * kept docs, whether the cap actually bit, and the quality of the last
    * document over the line (the per-source admission bar).
    *
    * Scale shape: one window keyed on source (the only Exchange — carries
    * (source, quality, doc_id), never text). A pathologically hot source
    * skews its partition; the production mitigation is the two-pass form —
    * per-source counts first (tiny), then a quality-threshold filter for
    * the capped sources only — which trades the full sort for a second
    * scan. At this cap the exact window is the honest shape. */
  def sourceCapSummary(docs: DataFrame, cap: Int = 15): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("quality_score").desc, col("doc_id"))
    TextAnalysis.withQualityScore(docs)
      .select(col("source"), col("doc_id"), col("quality_score"))
      .withColumn("rk", row_number().over(w))
      .withColumn("kept", col("rk") <= cap)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        min(when(col("kept"), col("quality_score"))).as("bar"))
      .select(
        col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") > cap.toLong).as("cap_hit"),
        round(col("bar"), 4).as("min_kept_quality"))
      .orderBy(col("source"))
  }

  def sourceMix(docs: DataFrame): DataFrame = {
    // token count inline on the scan (same whitespace tokens as
    // TextAnalysis.tokenCounts) — a join back to doc_id would shuffle the
    // corpus for a column the same scan already has
    val perSource = TextAnalysis.withTokens(docs)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"))
    perSource
      .withColumn("token_share",
        round(col("total_tokens").cast("double") /
          sum(col("total_tokens")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()), 4))
      .orderBy(col("source"))
  }

  /** One-row corpus datasheet — the "dataset card" numbers a training-data
    * release publishes and an intake review reads first: size (docs,
    * tokens), composition breadth (languages, sources), exact-duplicate
    * rate (1 − distinct content digests / docs), mean quality score, and
    * the Gopher-rule keep rate. Pure composition of kernels that are each
    * separately oracle-verified; everything reduces to three 1-row
    * aggregates glued with broadcast cross-joins — no shuffle carries more
    * than partial-aggregate state at any corpus size. The quality mean is
    * summed in integer 1e-4 units so the cross-engine value is exact. */
  def datasetCard(docs: DataFrame): DataFrame = {
    val base = TextAnalysis.withTokens(docs).agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(Dedup.contentDigest(col("text"))).as("n_distinct_texts"))
    val q = TextAnalysis.withQualityScore(docs)
      .agg(sum(round(col("quality_score") * 10000).cast("long")).as("q_micro"))
    val g = TextAnalysis.gopherFlags(docs)
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
    base.crossJoin(broadcast(q)).crossJoin(broadcast(g))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"), col("n_sources"),
        col("n_distinct_texts"),
        round(lit(1.0) - col("n_distinct_texts").cast("double") / col("n_docs"), 4)
          .as("dup_rate"),
        round(col("q_micro").cast("double") / (col("n_docs") * 10000.0), 4)
          .as("avg_quality"),
        round(col("n_keep").cast("double") / col("n_docs"), 4)
          .as("gopher_keep_rate"))
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, distilled to its
    * deterministic core): upweight the sources the current model finds
    * HARD. Here "the model" is the corpus's own unigram LM (the CCNet
    * proxy this pipeline already trains for perplexity filtering —
    * [[TextAnalysis.unigramScores]]), hardness is a source's average
    * per-token NLL above the corpus average, and the output mix is
    *   weight(s) ∝ token_share(s) · exp(η · excess_nll(s)),
    * normalized — the exponentiated-gradient tilt of the paper with the
    * reference model fixed. Feed the weights to [[sampleBySource]]-style
    * samplers or the epochs planner.
    *
    * Scale shape: the word-count shape end-to-end (one vocab aggregation,
    * one token-level hash join, one per-source aggregation); everything
    * after is windows over the ≤|sources|-row collapsed frame.
    *
    * Determinism: per-token NLL in integer micro-nats; per-source and
    * corpus sums are integer; shares/tilts are rounded to integer micro
    * BEFORE the (order-free, integer) normalization sum — so both engines
    * divide identical integers. */
  def domainReweight(docs: DataFrame, eta: Double = 1.0): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val tk = TextAnalysis.withTokens(docs)
      .select(col("doc_id"), col("source"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = tk.agg(count(lit(1)).cast("double").as("total"))
    tk
      .join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("nll_micro",
        round(-log(col("cnt").cast("double") / col("total")) * 1e6).cast("long"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(col("nll_micro")).as("nll_sum"))
      .withColumn("avg_micro",
        round(col("nll_sum").cast("double") / col("n_tokens")).cast("long"))
      .withColumn("all_tokens", sum(col("n_tokens")).over(w))
      .withColumn("corpus_micro",
        round(sum(col("nll_sum")).over(w).cast("double") / col("all_tokens"))
          .cast("long"))
      .withColumn("excess_micro",
        greatest(lit(0L), col("avg_micro") - col("corpus_micro")))
      .withColumn("ts_micro",
        round(col("n_tokens").cast("double") * 1e6 / col("all_tokens")).cast("long"))
      .withColumn("raw_micro",
        round(col("ts_micro").cast("double") *
          exp(lit(eta) * col("excess_micro").cast("double") / 1e6)).cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("ts_micro").cast("double") / 1e6, 6).as("token_share"),
        round(col("nll_sum").cast("double") / (col("n_tokens") * 1e6), 4).as("avg_nll"),
        round(col("excess_micro").cast("double") / 1e6, 4).as("excess_nll"),
        round(col("raw_micro").cast("double") / sum(col("raw_micro")).over(w), 6)
          .as("doremi_weight"))
      .orderBy(col("source"))
  }

  /** Deequ-style intake profile of the documents table — the schema
    * expectations a pipeline asserts BEFORE spending compute: per column,
    * null count and exact distinct count. Run on every ingest batch; a
    * jump in `text` distincts vs `doc_id` distincts is the dup alarm, a
    * nonzero null count on a required column stops the run.
    *
    * Scale shape: one multi-distinct aggregation (Spark plans the
    * standard Expand — corpus ×5 narrow rows, map-side partial) melted
    * by stack. Exact distincts are the fixture-scale honest form; the
    * 100 TB form swaps each COUNT(DISTINCT) for the KMV sketch
    * ([[TextAnalysis.vocabKmv]]) — same report schema, mergeable. */
  def tableProfile(docs: DataFrame): DataFrame = {
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    val aggs = cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"))
    }
    val stacked = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    docs.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${cols.size}, $stacked) as (column_name, n_null, n_distinct)"))
      .orderBy(col("column_name"))
  }

  /** Per-source scorecard — the one-page "which sources are worth their
    * bytes" report combining the pipeline's cheap signals: exact-dup rate
    * (with the deterministic 'mirror' source from
    * [[Dedup.dupBySource]]'s convention guaranteeing the dup columns are
    * exercised), Gopher keep rate, mean composite quality, and mean
    * length. A crawl-source triage run reads this before anything
    * heavier; a source with high dup_rate and low keep_rate is cut
    * before dedup ever sees it.
    *
    * Scale shape: quality + Gopher + digest are ONE narrow projection
    * (no per-signal joins back on doc_id); the only shuffles are the
    * digest-keyed frequency count with its CO-PARTITIONED mark-back join
    * (the [[Dedup.dupBySource]] shape — text dropped before the
    * Exchange, the dup-count table never broadcast) and the final
    * #sources-row aggregation. Float discipline: quality_score is
    * already rounded to 4 places in both engines, so its mean aggregates
    * the exact integer `round(q·10⁴)` and divides once. */
  def sourceScorecard(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"), col("source"))
    val scored = TextAnalysis.withGopherFlags(
      TextAnalysis.withQualityScore(Dedup.withMirrorSource(base)))
      .select(
        Dedup.contentDigest(col("text")).as("digest"), col("source"),
        round(col("quality_score") * 1e4).cast("long").as("q_e4"),
        when(col("keep"), 1L).otherwise(0L).as("kept"),
        col("n_words"))
    val perDigest = scored.groupBy(col("digest"))
      .agg(count(lit(1)).as("n_copies"))
    scored.join(perDigest.hint("shuffle_hash"), Seq("digest"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        round(sum(when(col("n_copies") > 1, 1.0).otherwise(0.0)) /
          count(lit(1)), 4).as("dup_rate"),
        round(sum(col("kept")).cast("double") / count(lit(1)), 4)
          .as("keep_rate"),
        round(sum(col("q_e4")).cast("double") / (count(lit(1)) * 1e4), 4)
          .as("avg_quality"),
        round(sum(col("n_words")).cast("double") / count(lit(1)), 4)
          .as("avg_words"))
      .orderBy(col("source"))
  }
}
