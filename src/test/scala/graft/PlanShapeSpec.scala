package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: pin the SCALE-critical plan shapes the
  * oracle gate cannot see. A refactor that keeps results identical but turns
  * a broadcast star join into a shuffle join, or lets a narrow scan grow an
  * aggregation Exchange, is a 100 TB regression even though every value
  * still matches — these assertions fail it at test time. Plan strings are
  * the pre-execution AQE initial plans (deterministic locally; no actions
  * run except for operators whose CONSTRUCTION plans with collected stats,
  * e.g. k-means centroids). */
class PlanShapeSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  /** Physical-plan TREE (AQE wrapper unwrapped) for node-level assertions
    * the string form can't express, e.g. a WindowExec's partition spec. */
  private def execTree(name: String): org.apache.spark.sql.execution.SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case o => o
    }

  /** WindowExec nodes whose partition spec is EMPTY — each funnels its
    * entire input through one task, the canonical 100 TB anti-shape. */
  private def globalWindows(name: String): Seq[String] =
    execTree(name).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w.simpleStringWithNodeId()
    }

  private def count(p: String, needle: String): Int =
    p.sliding(needle.length).count(_ == needle)

  test("star revenue join broadcasts every dimension — never a shuffle join") {
    val p = plan("join_star_revenue")
    assert(count(p, "BroadcastHashJoin") === 4, p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("brute-force ANN broadcasts the query side; the corpus is never shuffled into the join") {
    val p = plan("sim_topk_brute")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    // the only hash Exchange is the per-query top-k window, after scoring
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
  }

  test("IVF ANN joins probes to cells via broadcast; no shuffle before cell assignment") {
    val p = plan("sim_topk_ivf")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
  }

  test("recall report broadcasts the exact top-k; every ANN branch stays broadcast-joined") {
    val p = plan("sim_recall")
    // the brute-force reference set and all per-method probe/query sides are
    // broadcast — a SortMergeJoin anywhere means a corpus shuffle crept in
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("bm25 broadcasts the 1-row stats and truncates the global sort to top-k") {
    val p = plan("text_bm25")
    assert(p.contains("TakeOrderedAndProject(limit=20"), p.take(2000))
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin") && !p.contains("Exchange hashpartitioning"))
  }

  test("pii scan is a fully narrow projection — zero aggregation/join shuffles") {
    val p = plan("pii_scan")
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
    assert(count(p, "Exchange rangepartitioning") === 1) // the final orderBy only
    // the findings predicate reaches the scan operator (DataFilters), so
    // non-hit rows never materialize count columns above the scan
    assert(p.contains("DataFilters: [(((("), p.take(2000))
  }

  test("exact dedup is one partial+final aggregation — a single key shuffle") {
    val p = plan("dedup_exact")
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
    assert(count(p, "HashAggregate") === 2)
  }

  test("stratified sampling aggregates with one shuffle; the keep filter is map-side") {
    val p = plan("cur_sample")
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
    assert(!p.contains("Join"))
  }

  test("decontamination broadcasts the eval n-gram set over the corpus probe") {
    val p = plan("decon_overlap")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("incremental dedup joins digests only — text never reaches an Exchange") {
    for (q <- Seq("dedup_incremental", "dedup_incremental_near")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(2000)}")
      // every Exchange/Broadcast row ships digests/signatures, never text
      p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast"))
        .foreach(l => assert(!l.contains("text#"), s"$q shuffles raw text: $l"))
    }
  }

  test("passage share shuffles gram hashes only — neither text nor gram strings reach an Exchange") {
    val p = plan("passage_doc_share")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast"))
      .foreach(l => assert(!l.contains("text#") && !l.contains("gram#"),
        s"passage_doc_share shuffles strings: $l"))
  }

  test("corpus shuffle summary is one key shuffle; assignment itself is map-side") {
    val p = plan("cur_shuffle")
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
    assert(!p.contains("Join"))
  }

  test("source mix aggregates once; the share window runs on the collapsed per-source frame") {
    val p = plan("cur_source_mix")
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
    assert(!p.contains("Join"))
    // the global-total window sits ABOVE the aggregation (tiny frame), so
    // its SinglePartition exchange must consume the aggregate, not the scan
    val idxWindow = p.indexOf("Window")
    val idxAgg = p.indexOf("HashAggregate")
    assert(idxWindow >= 0 && idxAgg >= 0 && idxWindow < idxAgg, p.take(2000))
  }

  test("perplexity is the word-count shape — exchanges carry tokens and counts, never text") {
    val p = plan("text_perplexity")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"text_perplexity shuffles text: $l"))
    // corpus-total is a 1-row broadcast, not a per-row join key
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"), p.take(2000))
  }

  test("winnow pairs shuffle fingerprints and ids only — never text or gram arrays") {
    val p = plan("dedup_winnow_pairs")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast"))
      .foreach(l => assert(!l.contains("text#") && !l.contains("hl#"),
        s"dedup_winnow_pairs shuffles heavy columns: $l"))
  }

  test("naive-bayes classifier: model and stats broadcast, text never in an Exchange") {
    val p = plan("text_nb_quality")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"text_nb_quality shuffles text: $l"))
    // the 1-row stats/priors ride IdentityBroadcastMode
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"), p.take(2000))
  }

  test("source cap: the ranking window shuffles (source, quality, id) only — never text") {
    val p = plan("cur_source_cap")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"cur_source_cap shuffles text: $l"))
  }

  test("semdedup pairs join inside the cell — assignment itself never shuffles") {
    val p = plan("dedup_semdedup")
    // the pair join keys on cell (+ the keeper predicate as residual); the
    // literal-centroid assignment is a narrow projection, so every Exchange
    // in the plan sits AFTER the cell column exists and none is a cartesian
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(p.contains("cell"), p.take(2000))
  }

  test("split leakage rides the band join — text and token arrays stay out of every Exchange") {
    val p = plan("cur_split_leakage")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach { l =>
        assert(!l.contains("text#") && !l.contains("toks#"),
          s"cur_split_leakage shuffles corpus content: $l")
      }
  }

  test("gopher summary is a narrow rule projection into one aggregation") {
    val p = plan("text_gopher_summary")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p.take(2000))
    // global 1-row agg: partial + final over a single-partition exchange
    assert(count(p, "HashAggregate") === 2, p.take(2000))
  }

  test("interpolated LM keeps the word-count shape — no text in any Exchange") {
    val p = plan("text_perplexity_interp")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"interp LM shuffles text: $l"))
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"), p.take(2000))
  }

  test("chunking is narrow — the only exchange is the report ordering") {
    val p = plan("cur_chunks")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"), p.take(2000))
    assert(!p.contains("Exchange hashpartitioning"), p.take(2000))
  }

  test("binned range join is an equi-join — never a nested loop, even with broadcast disabled") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("join_range_binned")
      // the naive interval join would be a BroadcastNestedLoopJoin (or a
      // CartesianProduct with broadcast off); the bin turns it into a hash-
      // joinable equi-join with the interval predicate as residual
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        p.take(2000))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("boilerplate rewrite: the bad-digest set joins co-partitioned — never broadcast") {
    val p = plan("clean_boilerplate")
    // the bad set is unbounded (corpus-dependent), so it must ride a
    // digest-co-partitioned ShuffledHashJoin; any BroadcastExchange here
    // would be the driver collecting the whole boilerplate set
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // the chunk-frequency aggregation keys on digest and must not drag the
    // chunk token arrays (or raw text) through its Exchange — only the
    // doc-keyed REBUILD may carry chunk content (the output is the corpus)
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning(digest"))
      .foreach(l => assert(!l.contains("chunk_toks#") && !l.contains("text#"),
        s"digest count shuffles chunk content: $l"))
  }

  test("fuzzy decontamination broadcasts the eval band table; the corpus never shuffles text") {
    val p = plan("decon_fuzzy")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast"))
      .foreach(l => assert(!l.contains("text#") && !l.contains("toks#"),
        s"decon_fuzzy ships corpus content: $l"))
  }

  test("tf-idf is the word-count shape — text never reaches an Exchange") {
    val p = plan("text_tfidf")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"text_tfidf shuffles text: $l"))
    // corpus doc count is a 1-row broadcast
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"), p.take(2000))
  }

  test("nb calibration: exact rank rides the KEYED bin window — no global-order window anywhere") {
    // the decile is replayed from an exact distributed rank (bin offsets +
    // per-bin row_number); a WindowExec with an empty partition spec would
    // mean the per-doc frame funnels through one task again
    assert(globalWindows("text_nb_calibration").isEmpty,
      globalWindows("text_nb_calibration").mkString("\n"))
    val p = plan("text_nb_calibration")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"nb calibration shuffles text: $l"))
    // the rank window is partitioned by the margin-range bin
    assert(p.contains("windowspecdefinition(bin#"), p.take(2000))
  }

  test("cube expands grouping sets before ONE aggregation shuffle") {
    val p = plan("agg_cube")
    assert(p.contains("Expand"), p.take(2000))
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
    assert(!p.contains("Join"))
  }

  test("skew diagnosis: totals ride a 1-row broadcast cross join — no window at all") {
    val p = plan("diag_skew")
    assert(!p.contains("Window"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    // only the narrow per-key count frames shuffle (main + totals branch)
    assert(count(p, "Exchange hashpartitioning") === 2, p.take(2000))
  }

  test("epochs application is map-side arithmetic into one source-keyed aggregation") {
    val p = plan("cur_epochs")
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("ivf cell stats: assignment is narrow — the only hash shuffle is the cell aggregation") {
    val p = plan("sim_ivf_stats")
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("per-query top-k windows carry the rank-limit pushdown (WindowGroupLimit partial+final)") {
    // Spark's InferWindowGroupLimit rewrites `row_number() ≤ k` into a
    // partial WindowGroupLimit BELOW the Exchange plus a final one above —
    // map-side truncation to k rows per (task, query), so the ranking
    // shuffle never carries the scored corpus. The r13 Similarity review
    // verified this is what makes every rankTopK/probe window scale (a
    // 200k-row single-group rank query shuffles ~1 KB, measured in
    // TopKWindowSpec); if the rule ever stops firing — a non-rank-like
    // function, a projection wedged between filter and window, a changed
    // conf default — the per-query sort silently becomes corpus-sized at
    // 100 TB. This pins the plan; TopKWindowSpec pins the bytes.
    Seq("sim_topk_brute", "sim_topk_ivf", "sim_topk_lsh", "sim_chunk_topk",
        "sim_topk_pq").foreach { q =>
      val p = plan(q)
      assert(count(p, "WindowGroupLimit") >= 2,
        s"$q lost the rank-limit pushdown:\n${p.take(2000)}")
    }
  }

  test("chunk retrieval broadcasts queries; chunk vectors never shuffle into the join") {
    val p = plan("sim_chunk_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"chunk retrieval shuffles text: $l"))
  }

  test("hard negatives join inside the cell — keyed join, never a nested loop") {
    val p = plan("sim_hard_negatives")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(p.contains("cell"), p.take(2000))
  }

  test("exploding pair joins carry the explicit AQE-exempt fanout (REPARTITION_BY_NUM at cluster width)") {
    // r16: AQE's partition coalescing sizes post-shuffle partitions by
    // INPUT bytes and is blind to join-OUTPUT explosion — at the 512× deep
    // rung a ~50 MB banded frame coalesced to ONE partition and a
    // 113M-pair explosion ran on 1 of 32 cores. Similarity.pairFanout is
    // the fix: an explicit repartition(N, bucketKeys) before every
    // exploding self-join, which plans as a REPARTITION_BY_NUM Exchange
    // that AQE may never coalesce. The oracle gate cannot see this (values
    // are identical either way), so the plan string is the regression
    // fence. N = max(2·defaultParallelism, 16) = 16 under TestSpark's
    // local[4].
    val n = math.max(spark.sparkContext.defaultParallelism * 2, 16)
    for (q <- Seq("dedup_minhash_pairs", "dedup_simhash_pairs",
        "dedup_semdedup", "sim_hard_negatives", "dedup_embedding",
        "dedup_embedding_lsh")) {
      val p = plan(q)
      assert(p.contains("REPARTITION_BY_NUM"),
        s"$q lost the explicit pair fanout:\n${p.take(2000)}")
      assert(p.contains(s", $n), REPARTITION_BY_NUM"),
        s"$q fanout width is not $n:\n${p.take(2000)}")
    }
  }

  test("rolling z-score: one day-bucket aggregation, then windows on the collapsed frame") {
    val p = plan("win_zscore_anomaly")
    assert(!p.contains("Join"), p.take(2000))
    assert(count(p, "Exchange hashpartitioning") === 2, p.take(2000)) // day agg + per-type window
    val idxWindow = p.indexOf("Window")
    val idxAgg = p.indexOf("HashAggregate")
    assert(idxWindow >= 0 && idxAgg >= 0 && idxWindow < idxAgg, p.take(2000))
  }

  test("dsir: word-count shape with a broadcast stats row and a truncated top-k") {
    val p = plan("cur_dsir")
    assert(!p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"cur_dsir shuffles text: $l"))
    assert(p.contains("BroadcastExchange IdentityBroadcastMode"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("correlation from exact sums is one shuffle of map-side partials") {
    val p = plan("agg_corr")
    assert(count(p, "Exchange hashpartitioning") === 1, p.take(2000))
    assert(count(p, "HashAggregate") === 2)
    assert(!p.contains("Join"))
  }

  test("histogram quantiles: two aggregation passes, stats broadcast back, no sort of the data") {
    val p = plan("agg_histogram_quantile")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // the scale property: raw VALUES never shuffle — both aggregation
    // passes combine map-side, so every hash Exchange carries partials /
    // the tiny (group, bin) frame, never the value column itself
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains(" v#") && !l.contains("(v#"),
        s"raw values reach a shuffle: $l"))
  }

  test("pmi: word-count aggregations, broadcast totals, truncated top-k, no text in Exchange") {
    val p = plan("text_pmi")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"text_pmi shuffles text: $l"))
  }

  test("weighted sample is a narrow projection into a TakeOrdered — no shuffle, no join") {
    val p = plan("cur_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("Exchange hashpartitioning") && !p.contains("Join"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("ccnet buckets: per-language rank rides the KEYED (lang, bin) window") {
    assert(globalWindows("text_ccnet_buckets").isEmpty,
      globalWindows("text_ccnet_buckets").mkString("\n"))
    val p = plan("text_ccnet_buckets")
    assert(p.contains("windowspecdefinition(lang#"), p.take(2000))
    p.linesIterator.filter(l => l.contains("Exchange hashpartitioning"))
      .foreach(l => assert(!l.contains("text#"), s"ccnet buckets shuffles text: $l"))
  }

  test("dup-by-source joins digest stats co-partitioned; text never reaches an Exchange") {
    val p = plan("diag_dup_source")
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast"))
      .foreach(l => assert(!l.contains("text#"), s"diag_dup_source ships text: $l"))
  }

  test("token entropy: token strings never enter an Exchange") {
    val p = plan("text_entropy")
    assert(!p.contains("Join"), p.take(2000))
    p.linesIterator.filter(_.contains("Exchange"))
      .foreach(l => assert(!l.contains("tok#") && !l.contains("text#"),
        s"text_entropy shuffles token text: $l"))
  }

  test("novelty: gram-frequency mark-back is a co-partitioned shuffle join, never broadcast") {
    val p = plan("text_novelty")
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
    // the gram-frequency table grows with the corpus — broadcasting it is
    // the clean_boilerplate bug all over again
    assert(!p.contains("BroadcastHashJoin"), p.take(2000))
    p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast"))
      .foreach(l => assert(!l.contains("text#"), s"text_novelty ships text: $l"))
  }

  test("linear probe: one collapsed aggregation, no joins, no windows") {
    val p = plan("text_linear_probe")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(2000))
    // the only Exchange is the 55-long partial-agg collapse
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("SinglePartition")),
      s"probe shuffles more than the collapsed moments: $exchanges")
  }

  test("source scorecard: digest stats join co-partitioned; text never shuffles") {
    val p = plan("diag_source_scorecard")
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast"))
      .foreach(l => assert(!l.contains("text#"), s"scorecard ships text: $l"))
  }

  test("dim stats: dims-row aggregation, vectors never cross an Exchange") {
    val p = plan("sim_dim_stats")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(2000))
    p.linesIterator.filter(_.contains("Exchange"))
      .foreach(l => assert(!l.contains("embedding#") && !l.contains("vec#"),
        s"sim_dim_stats shuffles vectors: $l"))
  }

  test("ExactSubstr spans: hash-only exchanges, doc-partitioned island window, no pair stage") {
    val p = plan("passage_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // the dup-set membership check is a semi join on the 8-byte hash
    assert(p.contains("LeftSemi"), p.take(2000))
    // shuffles move (hash, doc_id, pos) — raw text never reaches an Exchange
    p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast"))
      .foreach(l => assert(!l.contains("text#"), s"passage_spans shuffles raw text: $l"))
    // the island merge is a per-document window, never a global one
    p.linesIterator.filter(_.contains("Window")).foreach { l =>
      assert(l.contains("doc_id#"), s"island window not doc-partitioned: $l")
    }
  }

  test("no query plans a CartesianProduct") {
    // plan-only sweep of the whole registered surface; deliberate bounded
    // cross joins must appear as BroadcastNestedLoopJoin (tiny broadcast
    // side), never as a partition-pairing CartesianProduct
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }

  /** Queries ALLOWED to carry a WindowExec with an empty partition spec —
    * each window provably consumes a frame already COLLAPSED by an
    * aggregation to bounded (group-cardinality) size, so the single task
    * is a few rows, not the corpus. Anything else funnels unbounded input
    * through one task and fails the sweep. Keep this list justified:
    * an entry without a collapsed input frame is a 100 TB regression. */
  private val globalWindowAllowlist: Map[String, String] = Map(
    "win_global_avg" -> "the operator IS the global-avg-over-groups demo; input is the per-(flag,status) aggregate (≤ 6 rows)",
    "cur_source_mix" -> "share-of-total over the per-source aggregate (≤ #sources rows)",
    "cur_doremi" -> "share/tilt normalization over the per-source aggregate (≤ #sources rows)",
    "sim_ivf_stats" -> "imbalance ratio over the per-cell aggregate (≤ #IVF cells rows)",
    "era_slot_gaps" -> "lag over the per-era max-slot aggregate (one row per era, ~1.5k rows for the full chain); the per-slot lag itself is era-partitioned",
    "era_sql_slot_gaps" -> "VERBATIM user SQL from the reference's query corpus (CLICKHOUSE.md:500-508) — the global lag is the user's own text, run as-is by design; the engine-native twin era_slot_gaps is the era-partitioned scale path",
    "sim_ivf_twolevel" -> "share/balance over the per-cell aggregate (≤ #IVF cells rows) — same collapsed frame as sim_ivf_stats; the log-tree assignment itself carries no global window",
    "text_length_histogram" -> "cumulative sum over the per-log2-bucket aggregate (≤ 64 rows: buckets of a long)",
    "ret_hybrid_rrf" -> "rank assignment over each leg's ALREADY-TRUNCATED top-legK frame (≤ 50 rows per leg; the truncation itself is distributed TakeOrderedAndProject)")

  test("behavioral family: user-keyed plans with no cartesian anywhere") {
    // the funnel is chained user_id equi-joins; the cohort matrix is two
    // user_id shuffles; nothing may degrade to a nested-loop or cartesian
    Seq("evt_step_funnel", "evt_retention_cohorts", "evt_markov_chain").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p".take(2000))
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p".take(2000))
    }
  }

  test("rolling-active avoids the range join: bounded explode + broadcast day filter") {
    val p = plan("evt_rolling_active")
    assert(p.contains("Generate explode"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("pagerank iterations are equi-joins; the only nested loop is none") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    // rank updates stay integer-typed end to end (bigint in every HashAggregate)
    assert(!p.contains("CheckOverflow"), "no decimal creep in the rank arithmetic")
  }

  test("association rules: pair space rides the basket equi-join; corpus total is a 1-row broadcast") {
    val p = plan("basket_assoc_rules")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000)) // the 1-row tot crossJoin only
    assert(count(p, "BroadcastNestedLoopJoin") === 1, p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("EXISTS/NOT EXISTS plan as semi + anti hash joins, never re-executed subqueries") {
    val p = plan("sub_exists")
    assert(p.contains("LeftSemi"), p.take(2000))
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("lateral top-n per group: partitioned window + broadcast dim, no per-group re-scan") {
    val p = plan("join_lateral_topn")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(count(p, "Scan parquet") === 2, "customer scanned once, nation once")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("triangle count: wedge space rides equi-joins; only the two 1-row stat crossJoins nest") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(count(p, "BroadcastNestedLoopJoin") === 2, p.take(2000))
  }

  test("time-series family: per-type equi-joins and partitioned windows only") {
    Seq("ts_autocorr", "ts_dow_seasonality", "ts_cusum", "win_range_frame",
        "evt_attribution", "evt_interarrival", "rec_item_sim").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(2000)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(2000)}")
    }
  }

  test("edit verify: candidate pairs join text by doc_id equi-joins, no pair-space blowup") {
    val p = plan("dedup_edit_verify")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("global-order window sweep: every empty-partition-spec WindowExec is on the documented allowlist") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(globalWindowAllowlist.contains)
      .flatMap { name =>
        val gw = globalWindows(name)
        if (gw.nonEmpty) Some(s"$name:\n  ${gw.mkString("\n  ")}") else None
      }
    assert(offenders.isEmpty,
      s"queries with an un-allowlisted global window:\n${offenders.mkString("\n")}")
    // and the allowlist itself must stay honest: every entry must exist
    // AND still carry a global window (a stale entry hides regressions)
    globalWindowAllowlist.keys.foreach { n =>
      assert(SparkEntry.queries.contains(n), s"allowlist entry $n is not a registered query")
      assert(globalWindows(n).nonEmpty, s"allowlist entry $n has no global window — remove it")
    }
  }
}
