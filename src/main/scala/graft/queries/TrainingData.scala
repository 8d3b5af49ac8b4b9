package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Cleaning, Contamination, Curation, Dedup, Multimodal, Passages, Pii, Similarity, TextAnalysis, Winnow}

/**
 * Training-data pipeline query corpus: text analysis, dedup (exact /
 * n-gram-Jaccard / MinHash-LSH / SimHash / embedding-cosine), similarity
 * search (brute-force + LSH ANN), and multimodal-column plumbing — over the
 * driver's `documents` / `embeddings` tables.
 *
 * Every query has a DuckDB oracle that reproduces the computation exactly
 * (portable md5-based hashing, ordered double folds, identical blocking
 * keys — see [[graft.functions.Hashing]] / [[graft.functions.VectorMath]]),
 * so the driver hash-verifies values, not just row counts.
 */
object TrainingData {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── text analysis ─────────────────────────────────────────────────────
    "text_token_count" -> ((s, dir) =>
      TextAnalysis.tokenCounts(docs(s, dir)).orderBy(col("doc_id"))),
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScores(docs(s, dir)).orderBy(col("doc_id"))),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langIdConfusion(docs(s, dir))),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Dedup.augmentedDocs(docs(s, dir))).orderBy(col("doc_id"))),
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionRatio(docs(s, dir))),
    "text_vocab" -> ((s, dir) =>
      TextAnalysis.vocabulary(docs(s, dir))),
    "text_bm25" -> ((s, dir) =>
      TextAnalysis.bm25Scores(docs(s, dir))),
    "text_perplexity" -> ((s, dir) =>
      TextAnalysis.unigramScores(docs(s, dir))),
    "text_perplexity2" -> ((s, dir) =>
      TextAnalysis.bigramScores(docs(s, dir))),
    "text_vocab_kmv" -> ((s, dir) =>
      TextAnalysis.vocabKmv(docs(s, dir))),
    "text_feature_hash" -> ((s, dir) =>
      TextAnalysis.featureHash(docs(s, dir))),
    "text_heavy_hitters" -> ((s, dir) =>
      TextAnalysis.heavyHitters(docs(s, dir))),
    "text_gopher" -> ((s, dir) =>
      TextAnalysis.gopherRules(docs(s, dir))),
    "text_nb_quality" -> ((s, dir) =>
      TextAnalysis.nbQuality(docs(s, dir))),
    "text_gopher_summary" -> ((s, dir) =>
      TextAnalysis.gopherSummary(docs(s, dir))),
    "text_perplexity_interp" -> ((s, dir) =>
      TextAnalysis.interpolatedScores(docs(s, dir))),
    "cur_doremi" -> ((s, dir) =>
      Curation.domainReweight(docs(s, dir))),
    "text_fertility" -> ((s, dir) =>
      TextAnalysis.fertility(docs(s, dir))),
    "cur_dataset_card" -> ((s, dir) =>
      Curation.datasetCard(docs(s, dir))),
    "text_zipf" -> ((s, dir) =>
      TextAnalysis.zipfFit(docs(s, dir))),
    "text_bpe_merges" -> ((s, dir) =>
      Bpe.learnMerges(docs(s, dir))),
    "text_bpe_tokenize" -> ((s, dir) =>
      Bpe.tokenizeSummary(docs(s, dir))),

    // ── repeated-passage (substring-level) dedup ──────────────────────────
    "passage_top" -> ((s, dir) => Passages.topRepeatedPassages(docs(s, dir))),
    "passage_doc_share" -> ((s, dir) => Passages.docRepeatedShare(docs(s, dir))),
    "passage_spans" -> ((s, dir) => Passages.duplicatedSpans(docs(s, dir))),
    "passage_span_stats" -> ((s, dir) => Passages.duplicatedSpanStats(docs(s, dir))),
    "passage_excise" -> ((s, dir) => Passages.excised(docs(s, dir))),

    // ── decontamination / PII scrubbing ───────────────────────────────────
    "decon_overlap" -> ((s, dir) => Contamination.contaminatedDocs(docs(s, dir))),
    "decon_spans" -> ((s, dir) => Contamination.contaminationSpans(docs(s, dir))),
    "pii_scan" -> ((s, dir) => Pii.piiScan(docs(s, dir))),
    "pii_summary" -> ((s, dir) => Pii.piiSummary(docs(s, dir))),

    // ── dedup ─────────────────────────────────────────────────────────────
    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    "dedup_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccard(docs(s, dir))),
    "dedup_minhash_sig" -> ((s, dir) => Dedup.minhashSignaturesFlat(docs(s, dir))),
    "dedup_minhash_pairs" -> ((s, dir) => Dedup.minhashLshPairs(docs(s, dir))),
    "dedup_edit_verify" -> ((s, dir) => Dedup.editVerify(docs(s, dir))),
    "dedup_clusters" -> ((s, dir) => Dedup.duplicateClusters(docs(s, dir))),
    "dedup_simhash" -> ((s, dir) => Dedup.simhashSignatures(docs(s, dir))),
    "dedup_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir))),
    "dedup_embedding" -> ((s, dir) => Dedup.embeddingNearDups(emb(s, dir))),
    "dedup_embedding_lsh" -> ((s, dir) => Dedup.embeddingNearDupsLsh(emb(s, dir))),
    "dedup_incremental" -> ((s, dir) => Dedup.incrementalStatus(docs(s, dir))),
    "dedup_incremental_bloom" -> ((s, dir) => Dedup.incrementalStatusBloom(docs(s, dir))),
    "dedup_incremental_near" -> ((s, dir) => Dedup.incrementalNearDupStatus(docs(s, dir))),
    "dedup_snapshot_diff" -> ((s, dir) => Dedup.snapshotDiff(docs(s, dir))),
    "dedup_semdedup" -> ((s, dir) => Dedup.semDedup(emb(s, dir))),
    "dedup_winnow" -> ((s, dir) => Winnow.fingerprintSummary(docs(s, dir))),
    "dedup_winnow_pairs" -> ((s, dir) => Winnow.overlapPairs(docs(s, dir))),

    // ── curation (post-dedup pipeline steps) ──────────────────────────────
    "cur_keeper" -> ((s, dir) => Curation.clusterKeepers(docs(s, dir))),
    "cur_split" -> ((s, dir) => Curation.splitSummary(docs(s, dir))),
    "cur_packing" -> ((s, dir) => Curation.packingSummary(docs(s, dir))),
    "cur_sample" -> ((s, dir) => Curation.sampleSummary(docs(s, dir))),
    "cur_shuffle" -> ((s, dir) => Curation.shuffleSummary(docs(s, dir))),
    "cur_funnel" -> ((s, dir) => Curation.funnel(docs(s, dir))),
    "cur_temperature" -> ((s, dir) => Curation.temperatureSampleSummary(docs(s, dir))),
    "cur_source_mix" -> ((s, dir) => Curation.sourceMix(docs(s, dir))),
    "cur_source_cap" -> ((s, dir) => Curation.sourceCapSummary(docs(s, dir))),
    "cur_split_leakage" -> ((s, dir) => Curation.splitLeakage(docs(s, dir))),
    "cur_kcenter" -> ((s, dir) => Similarity.kcenterSelect(emb(s, dir))),
    "cur_chunks" -> ((s, dir) => Curation.chunkDocs(docs(s, dir))),
    "cur_weighted_sample" -> ((s, dir) => Curation.weightedSample(docs(s, dir))),
    "text_ccnet_buckets" -> ((s, dir) => TextAnalysis.ccnetBuckets(docs(s, dir))),
    "diag_dup_source" -> ((s, dir) => Dedup.dupBySource(docs(s, dir))),
    "diag_source_scorecard" -> ((s, dir) => Curation.sourceScorecard(docs(s, dir))),
    "text_entropy" -> ((s, dir) => TextAnalysis.tokenEntropy(docs(s, dir))),
    "text_novelty" -> ((s, dir) => TextAnalysis.noveltyScores(docs(s, dir))),
    "text_length_histogram" -> ((s, dir) => TextAnalysis.lengthHistogram(docs(s, dir))),
    "text_linear_probe" -> ((s, dir) => TextAnalysis.linearProbeMoments(docs(s, dir))),
    "dedup_lsh_eval" -> ((s, dir) => Dedup.lshEval(docs(s, dir))),
    "cur_split_grouped" -> ((s, dir) => Curation.groupedSplitLeakage(docs(s, dir))),
    "diag_filter_agreement" -> ((s, dir) => TextAnalysis.filterAgreement(docs(s, dir))),
    "diag_corpus_drift" -> ((s, dir) => TextAnalysis.corpusDrift(docs(s, dir))),
    "diag_table_profile" -> ((s, dir) => Curation.tableProfile(docs(s, dir))),
    "dedup_threshold_sweep" -> ((s, dir) => Dedup.thresholdSweep(docs(s, dir))),
    "dedup_lsh_scurve" -> ((s, dir) => Dedup.lshScurve(docs(s, dir))),

    // ── similarity search ─────────────────────────────────────────────────
    "sim_topk_brute" -> ((s, dir) => Similarity.bruteForceTopK(emb(s, dir))),
    "sim_dim_stats" -> ((s, dir) => Similarity.dimStats(emb(s, dir))),
    "sim_pair_stats" -> ((s, dir) => Similarity.pairStats(emb(s, dir))),
    "sim_doc_topk" -> ((s, dir) => Similarity.hashedDocTopK(docs(s, dir))),
    "ret_hybrid_rrf" -> ((s, dir) => Similarity.hybridRrfTopK(docs(s, dir))),
    "sim_topk_lsh" -> ((s, dir) => Similarity.lshTopK(emb(s, dir))),
    "sim_topk_lsh_mp" -> ((s, dir) => Similarity.lshMultiProbeTopK(emb(s, dir))),
    "sim_topk_ivf" -> ((s, dir) => Similarity.ivfTopK(emb(s, dir))),
    "sim_kmeans_cells" -> ((s, dir) => Similarity.kmeansCells(emb(s, dir))),
    "sim_topk_pq" -> ((s, dir) => Similarity.pqTopK(emb(s, dir))),
    "sim_topk_ivfpq" -> ((s, dir) => Similarity.ivfPqTopK(emb(s, dir))),
    "sim_rp_project" -> ((s, dir) => Similarity.rpProject(emb(s, dir))),
    "sim_topk_rp" -> ((s, dir) => Similarity.rpRerankTopK(emb(s, dir))),
    "sim_topk_sq8" -> ((s, dir) => Similarity.sq8TopK(emb(s, dir))),
    "sim_recall" -> ((s, dir) => Similarity.recallReport(emb(s, dir))),

    // ── multimodal ────────────────────────────────────────────────────────
    "mm_decode_meta" -> ((s, dir) => Multimodal.metaSummary(docs(s, dir))),
    "mm_features" -> ((s, dir) => Multimodal.featuresFlat(docs(s, dir))),
    "mm_frame_sample" -> ((s, dir) => Multimodal.frameSamples(docs(s, dir))),
    "mm_frame_dedup" -> ((s, dir) => Multimodal.frameDuplicates(docs(s, dir))),

    // ── corpus cleaning / fuzzy decontamination / lexical features ────────
    "clean_boilerplate" -> ((s, dir) => Cleaning.boilerplateRewrite(docs(s, dir))),
    "decon_fuzzy" -> ((s, dir) => Contamination.fuzzyContaminatedDocs(docs(s, dir))),
    "text_tfidf" -> ((s, dir) => TextAnalysis.tfidfTop(docs(s, dir))),
    "text_nb_calibration" -> ((s, dir) => TextAnalysis.nbCalibration(docs(s, dir))),
    "cur_epochs" -> ((s, dir) => Curation.epochsSummary(docs(s, dir))),
    "sim_ivf_stats" -> ((s, dir) => Similarity.ivfCellStats(emb(s, dir))),
    "sim_cell_quality" -> ((s, dir) => Similarity.cellQuality(emb(s, dir))),
    // hierarchical (log-tree) assignment, oracle-checked against the FLAT
    // argmax SQL — the value gate IS the exactness proof for the 100 TB
    // plan (key name is historical: the r11 two-level plan it generalizes)
    "sim_ivf_twolevel" -> ((s, dir) => Similarity.ivfCellStatsTree(emb(s, dir))),
    "sim_chunk_topk" -> ((s, dir) => Similarity.chunkTopK(docs(s, dir))),
    "sim_hard_negatives" -> ((s, dir) => Similarity.hardNegatives(emb(s, dir))),
    "text_bpe_eval" -> ((s, dir) => Bpe.tokenizeEval(docs(s, dir))),
    "cur_dsir" -> ((s, dir) => Curation.dsirSelect(docs(s, dir))),
    "text_pmi" -> ((s, dir) => TextAnalysis.pmiCollocations(docs(s, dir)))
  )

  // ────────────────────────────────────────────────────────────────────────
  // DuckDB oracle SQL. Shared CTE fragments keep the mirrors readable; the
  // computations replicate the Spark expressions value-for-value.
  // ────────────────────────────────────────────────────────────────────────

  /** hash64: first 15 hex chars of md5 → BIGINT (mirrors Signatures.hash64). */
  private def h64(inner: String): String =
    s"('0x' || substr(md5($inner), 1, 15))::BIGINT"

  /** Ordered left fold with explicit typed init (mirrors Spark aggregate). */
  private def fold(listExpr: String, init: String, lambda: String): String =
    s"list_reduce(list_prepend($init, $listExpr), $lambda)"

  /** documents → trimmed text + whitespace tokens. */
  private val baseCte =
    """base AS (
      |  SELECT doc_id, trim(text) AS text, lang,
      |         regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents)""".stripMargin

  /** The deterministic dup-injected corpus (mirrors Dedup.augmentedDocs). */
  private val augCte =
    """aug AS (
      |  SELECT doc_id, text, lang, toks FROM base
      |  UNION ALL
      |  SELECT doc_id + 200000, text, lang, toks FROM base WHERE doc_id % 13 = 0
      |  UNION ALL
      |  SELECT doc_id + 100000,
      |         array_to_string(toks[1:greatest(CAST(ceil(len(toks) * 0.8) AS INT), 1)], ' '),
      |         lang,
      |         toks[1:greatest(CAST(ceil(len(toks) * 0.8) AS INT), 1)]
      |  FROM base WHERE doc_id % 7 = 0)""".stripMargin

  /** Word-trigram shingle sets over aug (mirrors Dedup.shingles). */
  private val shCte =
    """sh AS (
      |  SELECT doc_id, lang, toks[1] AS tok0,
      |         list_distinct(list_transform(range(1, len(toks) - 1),
      |           i -> toks[i::INT] || ' ' || toks[(i+1)::INT] || ' ' || toks[(i+2)::INT])) AS sh
      |  FROM aug WHERE len(toks) >= 3)""".stripMargin

  /** MinHash signatures over sh (mirrors Dedup.minhashSignatures, k=12). */
  private val sigCte =
    s"""sig AS (
       |  SELECT doc_id, list_transform(range(0, 12),
       |    i -> list_min(list_transform(sh, s -> ${h64("s || '#' || i")}))) AS sig
       |  FROM sh)""".stripMargin

  /** Shared NB-classifier CTE chain (Gopher pseudo-labels -> token
    * likelihoods -> per-doc integer micro-nat NLLs), ending in `fin`
    * (doc_id, label, nll_keep, nll_toss). Used by text_nb_quality and
    * text_nb_calibration. */
  private def nbCtes: String =
    s"""$baseCte,
       |g AS (
       |  SELECT doc_id,
       |         list_filter(toks, t -> t <> '') AS words,
       |         len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS n_sym
       |  FROM base),
       |g2 AS (
       |  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
       |         ROUND(${fold("list_transform(words, t -> strlen(t))", "0::BIGINT", "(x, y) -> x + y")}::DOUBLE
       |           / greatest(len(words), 1), 4) AS mean_word_len,
       |         ROUND(n_sym::DOUBLE / greatest(len(words), 1), 4) AS symbol_ratio,
       |         ROUND(len(list_filter(words, t -> regexp_matches(t, '[a-z]')))::DOUBLE
       |           / greatest(len(words), 1), 4) AS alpha_word_ratio,
       |         CAST(len(list_filter(words, t -> list_contains($stopArr, t))) AS BIGINT) AS n_stop
       |  FROM g),
       |lab AS (
       |  SELECT doc_id,
       |         (n_words >= ${TextAnalysis.GopherMinWords}
       |          AND n_words <= ${TextAnalysis.GopherMaxWords}
       |          AND mean_word_len >= ${TextAnalysis.GopherMinMeanLen}
       |          AND mean_word_len <= ${TextAnalysis.GopherMaxMeanLen}
       |          AND symbol_ratio <= ${TextAnalysis.GopherMaxSymbolRatio}
       |          AND alpha_word_ratio >= ${TextAnalysis.GopherMinAlphaRatio}
       |          AND n_stop >= ${TextAnalysis.GopherMinStopHits}) AS keep
       |  FROM g2),
       |tk AS (SELECT doc_id, tok FROM
       |         (SELECT doc_id, unnest(toks) AS tok FROM base) WHERE tok <> ''),
       |tl AS (SELECT tk.doc_id, tk.tok, lab.keep FROM tk JOIN lab USING (doc_id)),
       |m AS (
       |  SELECT tok,
       |         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS cnt_keep,
       |         CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS cnt_toss
       |  FROM tl GROUP BY tok),
       |st AS (
       |  SELECT CAST(SUM(cnt_keep) AS BIGINT) AS tot_keep,
       |         CAST(SUM(cnt_toss) AS BIGINT) AS tot_toss,
       |         CAST(COUNT(*) AS BIGINT) AS v
       |  FROM m),
       |pr AS (
       |  SELECT CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |         CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM lab),
       |sc AS (
       |  SELECT tl.doc_id,
       |         CAST(ROUND(-ln((m.cnt_keep + 1)::DOUBLE / (st.tot_keep + st.v)::DOUBLE)
       |           * 1000000) AS BIGINT) AS nk,
       |         CAST(ROUND(-ln((m.cnt_toss + 1)::DOUBLE / (st.tot_toss + st.v)::DOUBLE)
       |           * 1000000) AS BIGINT) AS nt
       |  FROM tl JOIN m USING (tok) CROSS JOIN st),
       |agg AS (
       |  SELECT doc_id, CAST(SUM(nk) AS BIGINT) AS sk, CAST(SUM(nt) AS BIGINT) AS st2
       |  FROM sc GROUP BY doc_id),
       |fin AS (
       |  SELECT a.doc_id, lab.keep AS label,
       |         CAST(a.sk + ROUND(-ln((pr.n_keep + 1)::DOUBLE / (pr.n_docs + 2)::DOUBLE)
       |           * 1000000) AS BIGINT) AS nll_keep,
       |         CAST(a.st2 + ROUND(-ln((pr.n_docs - pr.n_keep + 1)::DOUBLE / (pr.n_docs + 2)::DOUBLE)
       |           * 1000000) AS BIGINT) AS nll_toss
       |  FROM agg a JOIN lab USING (doc_id) CROSS JOIN pr)""".stripMargin

  /** Ordered double dot product of two DOUBLE[] exprs, init 0.0 (mirrors
    * VectorMath.dotSql). */
  private def dotD(a: String, b: String, dims: Int = 64): String =
    fold(s"list_transform(range(1, ${dims + 1}), i -> $a[i::INT] * $b[i::INT])",
      "0.0::DOUBLE", "(x, y) -> x + y")

  /** Mirrors [[graft.operators.Similarity.centroidCount]]: the IVF centroid
    * count k = max(16, ⌈N/256⌉) of the corpus the centroids are drawn from,
    * as a scalar subquery so the oracle tracks k at any scale factor. */
  private def kCentSub(corpus: String): String =
    s"(SELECT GREATEST(${graft.operators.Similarity.IvfCentroids}, " +
      s"CAST(CEIL(COUNT(*) / ${graft.operators.Similarity.MaxMembersPerCell}.0) AS BIGINT)) " +
      s"FROM $corpus)"

  /** Mirrors [[graft.operators.Similarity.queryCentroidCount]]: the
    * QUERY-serving index's centroid count, bounded by the
    * [[graft.operators.Similarity.QueryTrainSample]] training sample —
    * k_q = max(16, ⌈min(N, S)/256⌉) — so the oracle tracks the sample
    * bound exactly like it tracks the occupancy-pinned k. */
  private def kCentQuerySub(corpus: String): String =
    s"(SELECT GREATEST(${graft.operators.Similarity.IvfCentroids}, " +
      s"CAST(CEIL(LEAST(COUNT(*), ${graft.operators.Similarity.QueryTrainSample}) " +
      s"/ ${graft.operators.Similarity.MaxMembersPerCell}.0) AS BIGINT)) " +
      s"FROM $corpus)"

  /** Mirrors [[graft.operators.Similarity.withCellBlock]]: subdivide each
    * cell into deterministic ≤256-member blocks (rank by vec_id). */
  private def cellBlkExpr: String =
    s"cell * ${graft.operators.Similarity.CellBlockStride} + " +
      "(ROW_NUMBER() OVER (PARTITION BY cell ORDER BY vec_id) - 1) // " +
      s"${graft.operators.Similarity.MaxMembersPerCell}"

  /** embeddings → DOUBLE[] vectors + squared norms (mirrors
    * Similarity.prepared). */
  private val vecCte =
    s"""v AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
       |vn AS (
       |  SELECT vec_id, label, vec, ${dotD("vec", "vec")} AS sq FROM v)""".stripMargin

  /** media table derived from documents (mirrors Multimodal.mediaTable;
    * payload stays textual — the corpus is ASCII so bytes == codepoints). */
  private val mediaCte =
    """m AS (
      |  SELECT doc_id AS media_id,
      |         ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
      |         trim(text) AS payload,
      |         (32 + n_chars % 97)::INT AS width,
      |         (32 + n_chars % 53)::INT AS height,
      |         (n_chars * 40)::BIGINT AS duration_ms
      |  FROM documents)""".stripMargin

  private val langScoreCols: String = TextAnalysis.LangMarkers.map { case (code, ms) =>
    val arr = s"[${ms.map(m => s"'$m'").mkString(",")}]"
    s"len(list_filter(toks, t -> list_contains($arr, t))) AS s_$code"
  }.mkString(",\n         ")

  private val langLadder: String = {
    val codes = TextAnalysis.LangMarkers.map(_._1)
    val g = s"greatest(${codes.map(c => s"s_$c").mkString(", ")})"
    // the zero-hit arm FIRST (mirrors withPredictedLang): all-zero scores
    // predict 'und', never the alphabetically-first language
    (s"WHEN $g = 0 THEN 'und'" +: codes.map(c => s"WHEN s_$c = $g THEN '$c'"))
      .mkString("CASE ", " ", " ELSE 'und' END")
  }

  private val stopArr =
    s"[${TextAnalysis.Stopwords.map(s => s"'$s'").mkString(",")}]"

  /** Synthetic-raster channel expressions (mirrors Multimodal.pixelValue /
    * ChannelMults — interpolated from the operator's constants so the
    * generator and the oracle cannot desynchronize). */
  private val imgChannelCols: String = {
    val Seq((rx, ry), (gx, gy), (bx, by)) = Multimodal.ChannelMults
    Seq(("r", rx, ry), ("g", gx, gy), ("b", bx, by)).map { case (c, xm, ym) =>
      s"(((media_id % 251) + $xm * x.i + $ym * y.j) % 256)::BIGINT AS $c"
    }.mkString(",\n         ")
  }

  /** f0..f7 checksum features (mirrors Multimodal.decodeAndFeaturize). */
  private val featureCols: String = (0 until Multimodal.FeatureDims).map { j =>
    val sum = fold(
      s"list_transform(range($j * cl + 1, least($j * cl + cl, n) + 1), i -> unicode(substr(payload, i::INT, 1))::BIGINT)",
      "0::BIGINT", "(x, y) -> x + y")
    s"ROUND(CASE WHEN $j * cl >= n THEN 0.0::DOUBLE ELSE ($sum % 1000)::DOUBLE / 999.0 END, 6) AS f$j"
  }.mkString(",\n       ")

  /** MinHash-LSH candidate pairs above the est-Jaccard threshold (shared
    * by dedup_minhash_pairs and dedup_clusters). */
  private val fpairsCtes =
    s"""banded AS (
       |  SELECT doc_id, sig, b.band AS band,
       |         array_to_string(sig[(b.band * 4 + 1)::INT:(b.band * 4 + 4)::INT], ',') AS band_key
       |  FROM sig, (SELECT unnest(range(0, 3)) AS band) b),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       |         a.sig AS sig_a, b2.sig AS sig_b
       |  FROM banded a JOIN banded b2
       |    ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id),
       |fpairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE >= 0.5)"""
      .stripMargin

  /** One Lloyd iteration as CTEs (mirrors Similarity.kmeansCentroids):
    * assign by cosine argmax vs `prevC`, per-cell per-dim ordered-fold
    * mean over members sorted by vec_id, empty cells keep the previous
    * centroid, then recompute squared norms. */
  private def kmeansIterCtes(i: Int, prevC: String): String = {
    val memberDim = s"list_transform(m$i.ms, m -> m[d::INT])"
    s"""a$i AS (
       |  SELECT vec_id, vec, cell FROM (
       |    SELECT vn.vec_id, vn.vec, c.cell,
       |           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
       |             ORDER BY ${dotD("vn.vec", "c.cvec")} / sqrt(vn.sq * c.csq) DESC,
       |                      c.cell) AS rn
       |    FROM vn, $prevC c) t WHERE rn = 1),
       |sm$i AS (
       |  SELECT vec_id, vec, cell FROM (
       |    SELECT vec_id, vec, cell,
       |           ROW_NUMBER() OVER (PARTITION BY cell
       |             ORDER BY ${h64("vec_id::VARCHAR")}, vec_id) AS srn
       |    FROM a$i) t
       |  WHERE srn <= ${graft.operators.Similarity.MaxMembersPerCell}),
       |m$i AS (SELECT cell, list(vec ORDER BY vec_id) AS ms FROM sm$i GROUP BY cell),
       |c$i AS (
       |  SELECT p.cell,
       |         CASE WHEN m$i.cell IS NULL THEN p.cvec
       |              ELSE list_transform(range(1, 65), d ->
       |                ${fold(memberDim, "0.0::DOUBLE", "(x, y) -> x + y")} / len(m$i.ms))
       |         END AS cvec
       |  FROM $prevC p LEFT JOIN m$i ON p.cell = m$i.cell),
       |c${i}n AS (SELECT cell, cvec, ${dotD("cvec", "cvec")} AS csq FROM c$i)""".stripMargin
  }

  /** The PII-planted corpus (mirrors Pii.augmentPii). */
  private val piiCte =
    """pii AS (
      |  SELECT doc_id, lang,
      |         trim(text) ||
      |         CASE WHEN doc_id % 5 = 0
      |              THEN ' contact user' || doc_id::VARCHAR || '@example.com' ELSE '' END ||
      |         CASE WHEN doc_id % 7 = 0
      |              THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END ||
      |         CASE WHEN doc_id % 11 = 0
      |              THEN ' host 10.' || (doc_id % 256)::VARCHAR || '.0.' ||
      |                   ((doc_id * 7) % 256)::VARCHAR ELSE '' END ||
      |         CASE WHEN doc_id % 13 = 0
      |              THEN ' id 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
      |         AS text
      |  FROM documents)""".stripMargin

  /** Per-kind PII span counts over the planted corpus (mirrors
    * Pii.piiScan's count columns; Spark regexp_extract_all == DuckDB's). */
  private val piiCountsCte: String = {
    val counts = Seq("email" -> graft.operators.Pii.EmailRe,
      "phone" -> graft.operators.Pii.PhoneRe,
      "ip" -> graft.operators.Pii.IpRe,
      "ssn" -> graft.operators.Pii.SsnRe).map { case (k, re) =>
      s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$k"
    }.mkString(",\n       ")
    s"""pc AS (
       |  SELECT doc_id, text,
       |       $counts
       |  FROM pii)""".stripMargin
  }

  /** Redaction chain in Pii.Kinds order. DuckDB regexp_replace only
    * substitutes the first match by default — the 'g' flag mirrors Spark's
    * replace-all semantics. */
  private val piiRedacted: String =
    graft.operators.Pii.Kinds.foldLeft("text") { case (c, (_, pat, repl)) =>
      s"regexp_replace($c, '$pat', '$repl', 'g')"
    }

  /** Winnowed fingerprint sets over aug (mirrors Winnow.withFingerprints:
    * positional 5-gram hashes → distinct 4-window minima). */
  private val winnowCtes: String = {
    val k = graft.operators.Winnow.K
    val w = graft.operators.Winnow.W
    s"""wn AS (
       |  SELECT doc_id,
       |         list_transform(
       |           list_transform(range(1, len(toks) - ${k - 2}),
       |             i -> array_to_string(toks[i::INT:(i + ${k - 1})::INT], ' ')),
       |           g -> ${h64("g")}) AS hl
       |  FROM aug),
       |fpd AS (
       |  SELECT doc_id, len(hl) AS ng,
       |         list_distinct(list_transform(range(1, len(hl) - ${w - 2}),
       |           i -> list_min(hl[i::INT:(i + ${w - 1})::INT]))) AS fps
       |  FROM wn WHERE len(hl) >= $w)""".stripMargin
  }

  /** Deterministic ±1 JL projection matrix (mirrors Similarity.rpMatrix). */
  private val rpCte: String =
    s"""rp AS (
       |  SELECT j.j AS j, list_transform(range(0, 64),
       |    d -> (CASE WHEN (${h64("'rp' || j.j || '_' || d")} % 2) = 0
       |            THEN 1.0 ELSE -1.0 END)::DOUBLE) AS w
       |  FROM (SELECT unnest(range(0, ${graft.operators.Similarity.RpDims})) AS j) j)""".stripMargin

  /** Signed-hyperplane LSH buckets for every vector + the query rows
    * (mirrors Similarity.withBucket; shared by the single- and
    * multi-probe mirrors). */
  private val lshBucketCtes: String =
    s"""planes AS (
       |  SELECT p.p AS p, list_transform(range(0, 64),
       |    d -> ((${h64("'hp' || p.p || '_' || d")} % 2001) - 1000)::DOUBLE / 1000.0::DOUBLE) AS w
       |  FROM (SELECT unnest(range(0, 6)) AS p) p),
       |vb AS (
       |  SELECT vn.vec_id, vn.vec, vn.sq,
       |         SUM(CASE WHEN ${dotD("vn.vec", "planes.w")} > 0.0::DOUBLE
       |               THEN (1 << planes.p::INT) ELSE 0 END) AS bucket
       |  FROM vn, planes GROUP BY vn.vec_id, vn.vec, vn.sq),
       |q AS (SELECT vec_id AS query_id, vec AS qvec, sq AS qsq, bucket AS qbucket
       |      FROM vb WHERE vec_id < 5)""".stripMargin

  /** One BPE round as CTEs (mirrors one Bpe.learnMerges iteration):
    * weighted positional symbol bigrams over `prev`, deterministic argmax
    * (count desc, pair asc), greedy left-to-right literal merge apply.
    * Boundaries are doubled chr(1)s and the merge pattern consumes only the
    * inner half of each — see the Bpe.scala class doc: this is what makes
    * one non-overlapping replace merge ADJACENT occurrences too ('banana'
    * under (a,n) → [b,an,an,a]). */
  private def bpeRoundCtes(i: Int, prev: String): String =
    s"""p$i AS (
       |  SELECT pair, SUM(n) AS cnt FROM (
       |    SELECT n, unnest(list_transform(range(1, len(tks)),
       |      j -> tks[j::INT] || ' ' || tks[(j+1)::INT])) AS pair
       |    FROM (SELECT string_split(trim(replace(syms, chr(1) || chr(1), ' ')), ' ') AS tks, n
       |          FROM $prev) t)
       |  GROUP BY pair),
       |b$i AS (SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
       |s$i AS (
       |  SELECT COALESCE(replace(p.syms,
       |           chr(1) || split_part(b.pair, ' ', 1) || chr(1) || chr(1) ||
       |             split_part(b.pair, ' ', 2) || chr(1),
       |           chr(1) || replace(b.pair, ' ', '') || chr(1)), p.syms) AS syms, p.n
       |  FROM $prev p LEFT JOIN b$i b ON TRUE)""".stripMargin

  /** Word-frequency table, char-level symbol strings, and three unrolled
    * learning rounds (b1..b3 hold the learned merges) — shared by the
    * text_bpe_* mirrors. */
  private val bpeLearnCtes: String = bpeLearnCtesWhere("")

  /** [[bpeLearnCtes]] with a doc-level WHERE on the learning corpus (e.g.
    * the train-split predicate for text_bpe_eval). */
  private def bpeLearnCtesWhere(where: String): String =
    s"""tkw AS (SELECT unnest(toks) AS word FROM base $where),
       |w AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM tkw
       |  WHERE word <> '' AND strpos(word, chr(1)) = 0 GROUP BY word),
       |s0 AS (
       |  SELECT chr(1) || chr(1) ||
       |         regexp_replace(word, '(.)', '\\1' || chr(1) || chr(1), 'g') AS syms, n
       |  FROM w),
       |${bpeRoundCtes(1, "s0")},
       |${bpeRoundCtes(2, "s1")},
       |${bpeRoundCtes(3, "s2")}""".stripMargin

  /** One merge application to the distinct-word symbol table (mirrors the
    * tokenizeSummary fold step). LEFT JOIN + COALESCE so an empty b$i
    * (merge learning exhausted early) leaves the symbols unchanged —
    * exactly like the Spark fold over only the learned merges. */
  private def bpeApplyCte(i: Int, prev: String): String =
    s"""sy$i AS (
       |  SELECT word, COALESCE(replace(p.syms,
       |           chr(1) || split_part(b.pair, ' ', 1) || chr(1) || chr(1) ||
       |             split_part(b.pair, ' ', 2) || chr(1),
       |           chr(1) || replace(b.pair, ' ', '') || chr(1)), p.syms) AS syms
       |  FROM $prev p LEFT JOIN b$i b ON TRUE)""".stripMargin

  /** Positional (multiplicity-preserving) word 8-grams over aug (mirrors
    * Passages.gramStrings: word_ngrams(text, 8), one row per occurrence). */
  private val passageGramCtes: String = {
    val n = graft.operators.Passages.PassageN
    s"""pg AS (
       |  SELECT doc_id,
       |         list_transform(range(1, len(toks) - ${n - 2}),
       |           i -> array_to_string(toks[i::INT:(i + ${n - 1})::INT], ' ')) AS gl
       |  FROM aug WHERE len(toks) >= $n),
       |gr AS (SELECT doc_id, unnest(gl) AS gram FROM pg)""".stripMargin
  }

  /** Duplicated-window positions + gaps-and-islands merge over pg (mirrors
    * Passages.duplicatedSpansRaw): zip-unnest positions with gram hashes,
    * keep hashes occurring ≥2 times corpus-wide, open a new island when the
    * start gap exceeds the window length (NULL first-row gap stays in
    * island 0 on both engines: CASE WHEN NULL THEN 1 ELSE 0 → 0). */
  private val passageSpanCtes: String = {
    val n = graft.operators.Passages.PassageN
    s"""pp AS (SELECT doc_id,
       |              unnest(range(1, len(gl) + 1)) AS pos,
       |              unnest(list_transform(gl, g -> ${h64("g")})) AS h
       |       FROM pg),
       |dup AS (SELECT h FROM pp GROUP BY h HAVING COUNT(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM pp JOIN dup USING (h)),
       |isl AS (
       |  SELECT doc_id, pos,
       |         SUM(CASE WHEN pos - prev > $n THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM (SELECT doc_id, pos,
       |               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM dp) t)""".stripMargin
  }

  /** Distinct 8-gram hash sets over aug (mirrors
    * Contamination.withNgramHashes: word_shingles(text, 8) → hash64). */
  private val ngram8Cte: String = {
    val n = graft.operators.Contamination.NgramN
    val gram = (0 until n).map(k => s"toks[(i+$k)::INT]").mkString(" || ' ' || ")
    s"""ng AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(
       |           list_distinct(list_transform(range(1, len(toks) - ${n - 2}),
       |             i -> $gram)),
       |           s -> ${h64("s")})) AS shl
       |  FROM aug WHERE len(toks) >= $n),
       |ngn AS (SELECT doc_id, shl, len(shl) AS nsh FROM ng)""".stripMargin
  }

  /** One BM25 term's score contribution (mirrors TextAnalysis.bm25Scores;
    * k1/b literals written as the same arithmetic expressions Spark folds,
    * so both engines produce bit-identical doubles). */
  private def bm25Term(t: String): String =
    s"""ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0)
       |         * (tf_$t * (1.2 + 1.0))
       |         / (tf_$t + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (sum_dl / n_docs)))""".stripMargin

  /** Snapshot-vs-batch digest labeling (mirrors Dedup.incrementalStatus;
    * incrementalStatusBloom is output-identical by construction — blooms
    * have no false negatives and positives are re-checked by the join —
    * so both queries share this oracle). */
  private val incrementalSql: String =
    s"""WITH $baseCte, $augCte,
       |snap AS (
       |  SELECT DISTINCT md5(text) AS digest FROM aug WHERE doc_id < 100000),
       |batch AS (
       |  SELECT doc_id, md5(text) AS digest FROM aug WHERE doc_id >= 100000)
       |SELECT b.doc_id,
       |       CASE WHEN s.digest IS NOT NULL THEN 'duplicate' ELSE 'new' END AS status
       |FROM batch b LEFT JOIN snap s ON b.digest = s.digest
       |ORDER BY b.doc_id""".stripMargin

  private val baseOracleSql: Map[String, String] = Map(
    "pii_scan" ->
      s"""WITH $piiCte, $piiCountsCte
         |SELECT doc_id, n_email, n_phone, n_ip, n_ssn,
         |       ${h64(piiRedacted)} AS redacted_fp
         |FROM pc
         |WHERE n_email + n_phone + n_ip + n_ssn > 0
         |ORDER BY doc_id""".stripMargin,

    "pii_summary" ->
      s"""WITH $piiCte, $piiCountsCte,
         |s AS (
         |  SELECT ${Seq("email", "ip", "phone", "ssn").map(k =>
              s"CAST(SUM(n_$k) AS BIGINT) AS s_$k, " +
              s"CAST(SUM(CASE WHEN n_$k > 0 THEN 1 ELSE 0 END) AS BIGINT) AS d_$k")
              .mkString(",\n         ")}
         |  FROM pc)
         |${Seq("email", "ip", "phone", "ssn").map(k =>
            s"SELECT '$k' AS kind, s_$k AS n_spans, d_$k AS n_docs FROM s")
            .mkString("\n|UNION ALL\n|").stripMargin}
         |ORDER BY kind""".stripMargin,

    "text_bm25" ->
      s"""WITH $baseCte,
         |t AS (SELECT doc_id, toks, len(toks)::DOUBLE AS dl FROM base),
         |stats AS (
         |  SELECT COUNT(*)::DOUBLE AS n_docs, SUM(dl) AS sum_dl,
         |         ${TextAnalysis.Bm25Terms.map(t =>
              s"SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END)::DOUBLE AS df_$t")
              .mkString(",\n         ")}
         |  FROM t),
         |tf AS (
         |  SELECT t.doc_id, t.dl, s.n_docs, s.sum_dl,
         |         ${TextAnalysis.Bm25Terms.map(t => s"s.df_$t AS df_$t").mkString(", ")},
         |         ${TextAnalysis.Bm25Terms.map(t =>
              s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf_$t")
              .mkString(",\n         ")}
         |  FROM t, stats s),
         |scored AS (
         |  SELECT doc_id,
         |         ROUND(${TextAnalysis.Bm25Terms.map(bm25Term).mkString("\n         + ")}, 4) AS bm25
         |  FROM tf)
         |SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "decon_overlap" ->
      s"""WITH $baseCte, $augCte, $ngram8Cte,
         |ev AS (
         |  SELECT doc_id AS eval_doc_id, unnest(shl) AS h FROM ngn
         |  WHERE doc_id < 100000 AND doc_id % ${graft.operators.Contamination.EvalModulus} = 0),
         |tr AS (
         |  SELECT doc_id, nsh, unnest(shl) AS h FROM ngn
         |  WHERE NOT (doc_id < 100000 AND doc_id % ${graft.operators.Contamination.EvalModulus} = 0))
         |SELECT t.doc_id,
         |       CAST(COUNT(DISTINCT t.h) AS BIGINT) AS n_shared_ngrams,
         |       CAST(COUNT(DISTINCT e.eval_doc_id) AS BIGINT) AS n_eval_docs,
         |       ROUND(COUNT(DISTINCT t.h)::DOUBLE / t.nsh, 4) AS contaminated_share
         |FROM tr t JOIN ev e ON t.h = e.h
         |GROUP BY t.doc_id, t.nsh
         |ORDER BY t.doc_id""".stripMargin,

    "dedup_incremental" -> incrementalSql,
    "dedup_incremental_bloom" -> incrementalSql,

    "dedup_winnow" ->
      s"""WITH $baseCte, $augCte, $winnowCtes
         |SELECT doc_id, CAST(ng AS BIGINT) AS n_grams,
         |       CAST(len(fps) AS BIGINT) AS n_fps,
         |       ROUND(len(fps)::DOUBLE / ng, 4) AS density
         |FROM fpd ORDER BY doc_id""".stripMargin,

    "dedup_winnow_pairs" ->
      s"""WITH $baseCte, $augCte, $winnowCtes,
         |exf AS (SELECT doc_id, len(fps) AS nf, unnest(fps) AS f FROM fpd),
         |tot AS (SELECT COUNT(*) AS n_docs_total FROM fpd),
         |freq AS (SELECT f, COUNT(*) AS fp_docs FROM exf GROUP BY f),
         |ex AS (
         |  SELECT exf.doc_id, exf.nf, exf.f
         |  FROM exf JOIN freq USING (f), tot
         |  WHERE freq.fp_docs <=
         |    greatest(2, ceil(${graft.operators.Winnow.MaxFpDocFrac} * tot.n_docs_total)))
         |SELECT doc_a, doc_b, n_shared,
         |       ROUND(n_shared::DOUBLE / nfa, 4) AS contain_a,
         |       ROUND(n_shared::DOUBLE / nfb, 4) AS contain_b
         |FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(COUNT(*) AS BIGINT) AS n_shared,
         |         MAX(a.nf) AS nfa, MAX(b.nf) AS nfb
         |  FROM ex a JOIN ex b ON a.f = b.f AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 3) t
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_snapshot_diff" ->
      s"""WITH $baseCte, $augCte,
         |v1 AS (SELECT DISTINCT md5(text) AS digest FROM aug WHERE doc_id < 100000),
         |v2 AS (SELECT DISTINCT md5(text) AS digest FROM aug
         |       WHERE NOT (doc_id < 100000 AND doc_id % 17 = 0))
         |SELECT CASE WHEN v1.digest IS NULL THEN 'added'
         |            WHEN v2.digest IS NULL THEN 'removed'
         |            ELSE 'common' END AS status,
         |       CAST(COUNT(*) AS BIGINT) AS n_digests
         |FROM v1 FULL OUTER JOIN v2 ON v1.digest = v2.digest
         |GROUP BY 1 ORDER BY status""".stripMargin,

    "dedup_incremental_near" ->
      s"""WITH $baseCte, $augCte, $shCte, $sigCte,
         |banded AS (
         |  SELECT doc_id, sig, b.band AS band,
         |         array_to_string(sig[(b.band * 4 + 1)::INT:(b.band * 4 + 4)::INT], ',') AS band_key
         |  FROM sig, (SELECT unnest(range(0, 3)) AS band) b),
         |hits AS (
         |  SELECT DISTINCT a.doc_id AS doc_id, a.sig AS sig_a, b2.sig AS sig_b
         |  FROM banded a JOIN banded b2
         |    ON a.band = b2.band AND a.band_key = b2.band_key
         |  WHERE a.doc_id >= 100000 AND b2.doc_id < 100000),
         |near AS (
         |  SELECT doc_id,
         |         MAX(len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE) AS best_est
         |  FROM hits
         |  WHERE len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE >= 0.5
         |  GROUP BY doc_id),
         |snapd AS (
         |  SELECT DISTINCT md5(text) AS digest FROM aug WHERE doc_id < 100000),
         |batch AS (
         |  SELECT doc_id, md5(text) AS digest FROM aug WHERE doc_id >= 100000)
         |SELECT b.doc_id,
         |       CASE WHEN s.digest IS NOT NULL THEN 'duplicate'
         |            WHEN n.doc_id IS NOT NULL THEN 'near_duplicate'
         |            ELSE 'new' END AS status,
         |       ROUND(n.best_est, 4) AS best_est
         |FROM batch b
         |LEFT JOIN snapd s ON b.digest = s.digest
         |LEFT JOIN near n ON b.doc_id = n.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    "text_perplexity" ->
      s"""WITH $baseCte,
         |tk AS (SELECT doc_id, tok FROM
         |         (SELECT doc_id, unnest(toks) AS tok FROM base) WHERE tok <> ''),
         |v AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
         |tot AS (SELECT COUNT(*)::DOUBLE AS total FROM tk),
         |sc AS (
         |  SELECT doc_id,
         |         CAST(ROUND(-ln(cnt::DOUBLE / total) * 1000000) AS BIGINT) AS nm
         |  FROM tk JOIN v USING (tok) CROSS JOIN tot)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       ROUND(SUM(nm)::DOUBLE / (COUNT(*) * 1000000.0), 4) AS avg_nll,
         |       ROUND(exp(SUM(nm)::DOUBLE / (COUNT(*) * 1000000.0)), 4) AS ppl
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_fertility" ->
      s"""WITH $baseCte,
         |f AS (
         |  SELECT lang,
         |         CAST(len(list_filter(toks, t -> t <> '')) AS BIGINT) AS n_words,
         |         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_sub,
         |         CAST(strlen(text) AS BIGINT) AS n_bytes
         |  FROM base)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_words) AS BIGINT) AS n_words,
         |       CAST(SUM(n_sub) AS BIGINT) AS n_subtokens,
         |       CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
         |       ROUND(SUM(n_sub)::DOUBLE / SUM(n_words), 4) AS fertility,
         |       ROUND(SUM(n_bytes)::DOUBLE / SUM(n_sub), 4) AS bytes_per_token
         |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    "cur_dataset_card" ->
      s"""WITH card AS (
         |  SELECT doc_id, trim(text) AS text, lang, source,
         |         regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents),
         |b AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
         |         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |         CAST(COUNT(DISTINCT md5(COALESCE(trim(text), ''))) AS BIGINT) AS n_distinct_texts
         |  FROM card),
         |q AS (
         |  SELECT CAST(SUM(CAST(ROUND(
         |           ROUND(least(len(toks)::DOUBLE / 100.0, 1.0::DOUBLE) * 0.5
         |             + (len(list_filter(toks, t -> list_contains($stopArr, t)))::DOUBLE
         |                / len(toks)) * 0.5, 4) * 10000) AS BIGINT)) AS BIGINT) AS q_micro
         |  FROM card),
         |gw AS (
         |  SELECT list_filter(toks, t -> t <> '') AS words,
         |         len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS n_sym
         |  FROM card),
         |g2 AS (
         |  SELECT CAST(len(words) AS BIGINT) AS n_words,
         |         ROUND(${fold("list_transform(words, t -> strlen(t))", "0::BIGINT", "(x, y) -> x + y")}::DOUBLE
         |           / greatest(len(words), 1), 4) AS mean_word_len,
         |         ROUND(n_sym::DOUBLE / greatest(len(words), 1), 4) AS symbol_ratio,
         |         ROUND(len(list_filter(words, t -> regexp_matches(t, '[a-z]')))::DOUBLE
         |           / greatest(len(words), 1), 4) AS alpha_word_ratio,
         |         CAST(len(list_filter(words, t -> list_contains($stopArr, t))) AS BIGINT) AS n_stop
         |  FROM gw),
         |g AS (
         |  SELECT CAST(SUM(CASE WHEN
         |           n_words >= ${TextAnalysis.GopherMinWords}
         |           AND n_words <= ${TextAnalysis.GopherMaxWords}
         |           AND mean_word_len >= ${TextAnalysis.GopherMinMeanLen}
         |           AND mean_word_len <= ${TextAnalysis.GopherMaxMeanLen}
         |           AND symbol_ratio <= ${TextAnalysis.GopherMaxSymbolRatio}
         |           AND alpha_word_ratio >= ${TextAnalysis.GopherMinAlphaRatio}
         |           AND n_stop >= ${TextAnalysis.GopherMinStopHits}
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_keep FROM g2)
         |SELECT b.n_docs, b.n_tokens, b.n_langs, b.n_sources, b.n_distinct_texts,
         |       ROUND(1.0::DOUBLE - b.n_distinct_texts::DOUBLE / b.n_docs, 4) AS dup_rate,
         |       ROUND(q.q_micro::DOUBLE / (b.n_docs * 10000.0), 4) AS avg_quality,
         |       ROUND(g.n_keep::DOUBLE / b.n_docs, 4) AS gopher_keep_rate
         |FROM b CROSS JOIN q CROSS JOIN g""".stripMargin,

    "cur_doremi" ->
      s"""WITH b2 AS (
         |  SELECT doc_id, source,
         |         regexp_split_to_array(trim(text), '\\s+') AS toks
         |  FROM documents),
         |tk AS (SELECT doc_id, source, tok FROM
         |         (SELECT doc_id, source, unnest(toks) AS tok FROM b2)
         |       WHERE tok <> ''),
         |v AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
         |tot AS (SELECT COUNT(*)::DOUBLE AS total FROM tk),
         |sc AS (
         |  SELECT source, doc_id,
         |         CAST(ROUND(-ln(cnt::DOUBLE / total) * 1000000) AS BIGINT) AS nm
         |  FROM tk JOIN v USING (tok) CROSS JOIN tot),
         |ps AS (
         |  SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |         CAST(SUM(nm) AS BIGINT) AS nll_sum
         |  FROM sc GROUP BY source),
         |g AS (
         |  SELECT *,
         |         CAST(ROUND(nll_sum::DOUBLE / n_tokens) AS BIGINT) AS avg_micro,
         |         CAST(SUM(n_tokens) OVER () AS BIGINT) AS all_tokens,
         |         CAST(SUM(nll_sum) OVER () AS BIGINT) AS all_nll
         |  FROM ps),
         |x AS (
         |  SELECT *,
         |         GREATEST(0, avg_micro -
         |           CAST(ROUND(all_nll::DOUBLE / all_tokens) AS BIGINT)) AS excess_micro,
         |         CAST(ROUND(n_tokens::DOUBLE * 1000000 / all_tokens) AS BIGINT) AS ts_micro
         |  FROM g),
         |r AS (
         |  SELECT *,
         |         CAST(ROUND(ts_micro::DOUBLE *
         |           exp(1.0 * excess_micro::DOUBLE / 1000000)) AS BIGINT) AS raw_micro
         |  FROM x)
         |SELECT source, n_docs, n_tokens,
         |       ROUND(ts_micro::DOUBLE / 1000000, 6) AS token_share,
         |       ROUND(nll_sum::DOUBLE / (n_tokens * 1000000.0), 4) AS avg_nll,
         |       ROUND(excess_micro::DOUBLE / 1000000, 4) AS excess_nll,
         |       ROUND(raw_micro::DOUBLE / CAST(SUM(raw_micro) OVER () AS DOUBLE), 6)
         |         AS doremi_weight
         |FROM r ORDER BY source""".stripMargin,

    "text_feature_hash" ->
      s"""WITH $baseCte,
         |f AS (
         |  SELECT doc_id, ${h64("tok")} % 16 AS dim,
         |         CASE WHEN ${h64("'s#' || tok")} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM base) t
         |  WHERE tok <> '')
         |SELECT doc_id, CAST(dim AS BIGINT) AS dim, CAST(SUM(sgn) AS BIGINT) AS val
         |FROM f GROUP BY 1, 2 ORDER BY doc_id, dim""".stripMargin,

    "text_vocab_kmv" ->
      s"""WITH $baseCte,
         |tkd AS (
         |  SELECT DISTINCT tok FROM (SELECT unnest(toks) AS tok FROM base) t
         |  WHERE tok <> ''),
         |hs AS (SELECT ${h64("tok")} AS h FROM tkd),
         |kk AS (
         |  SELECT MAX(h)::DOUBLE AS hk, COUNT(*) AS n
         |  FROM (SELECT h FROM hs ORDER BY h LIMIT 256) s),
         |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM tkd)
         |SELECT 256 AS k, ex.n_exact,
         |       ROUND(CASE WHEN kk.n < 256 THEN kk.n::DOUBLE
         |                  ELSE 255.0 * 1152921504606846976.0 / kk.hk END, 4) AS kmv_est,
         |       ROUND(abs((CASE WHEN kk.n < 256 THEN kk.n::DOUBLE
         |                       ELSE 255.0 * 1152921504606846976.0 / kk.hk END)
         |                 - ex.n_exact::DOUBLE) / ex.n_exact::DOUBLE, 4) AS rel_err
         |FROM kk, ex""".stripMargin,

    "text_perplexity2" ->
      s"""WITH $baseCte,
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i::INT] || ' ' || toks[(i+1)::INT])) AS bg
         |  FROM base WHERE len(toks) >= 2),
         |cb AS (SELECT bg, COUNT(*) AS cbg FROM bg GROUP BY bg),
         |cw AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS cw1 FROM bg GROUP BY 1),
         |sc AS (
         |  SELECT b.doc_id,
         |         CAST(ROUND(-ln(cb.cbg::DOUBLE / cw.cw1) * 1000000) AS BIGINT) AS nm
         |  FROM bg b
         |  JOIN cb ON b.bg = cb.bg
         |  JOIN cw ON split_part(b.bg, ' ', 1) = cw.w1)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |       ROUND(SUM(nm)::DOUBLE / (COUNT(*) * 1000000.0), 4) AS avg_nll,
         |       ROUND(exp(SUM(nm)::DOUBLE / (COUNT(*) * 1000000.0)), 4) AS ppl
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_gopher" ->
      s"""WITH $baseCte,
         |g AS (
         |  SELECT doc_id,
         |         list_filter(toks, t -> t <> '') AS words,
         |         len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS n_sym
         |  FROM base),
         |g2 AS (
         |  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
         |         ROUND(${fold("list_transform(words, t -> strlen(t))", "0::BIGINT", "(x, y) -> x + y")}::DOUBLE
         |           / greatest(len(words), 1), 4) AS mean_word_len,
         |         ROUND(n_sym::DOUBLE / greatest(len(words), 1), 4) AS symbol_ratio,
         |         ROUND(len(list_filter(words, t -> regexp_matches(t, '[a-z]')))::DOUBLE
         |           / greatest(len(words), 1), 4) AS alpha_word_ratio,
         |         CAST(len(list_filter(words, t -> list_contains($stopArr, t))) AS BIGINT) AS n_stop
         |  FROM g)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio, n_stop,
         |       (n_words >= ${TextAnalysis.GopherMinWords}
         |          AND n_words <= ${TextAnalysis.GopherMaxWords}) AS r_words,
         |       (mean_word_len >= ${TextAnalysis.GopherMinMeanLen}
         |          AND mean_word_len <= ${TextAnalysis.GopherMaxMeanLen}) AS r_mean_len,
         |       (symbol_ratio <= ${TextAnalysis.GopherMaxSymbolRatio}) AS r_symbol,
         |       (alpha_word_ratio >= ${TextAnalysis.GopherMinAlphaRatio}) AS r_alpha,
         |       (n_stop >= ${TextAnalysis.GopherMinStopHits}) AS r_stop,
         |       (n_words >= ${TextAnalysis.GopherMinWords}
         |          AND n_words <= ${TextAnalysis.GopherMaxWords}
         |          AND mean_word_len >= ${TextAnalysis.GopherMinMeanLen}
         |          AND mean_word_len <= ${TextAnalysis.GopherMaxMeanLen}
         |          AND symbol_ratio <= ${TextAnalysis.GopherMaxSymbolRatio}
         |          AND alpha_word_ratio >= ${TextAnalysis.GopherMinAlphaRatio}
         |          AND n_stop >= ${TextAnalysis.GopherMinStopHits}) AS keep
         |FROM g2 ORDER BY doc_id""".stripMargin,

    "text_zipf" -> {
      def fsum(term: String) =
        fold(s"list_transform(range(1, len(pts) + 1), i -> $term)",
          "0.0::DOUBLE", "(a, x) -> a + x")
      s"""WITH $baseCte,
         |tk AS (SELECT tok FROM (SELECT unnest(toks) AS tok FROM base) WHERE tok <> ''),
         |v AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
         |top AS (SELECT tok, cnt FROM v ORDER BY cnt DESC, tok LIMIT 100),
         |p AS (SELECT list(struct_pack(nc := -cnt, tok := tok) ORDER BY -cnt, tok) AS pts
         |      FROM top),
         |s AS (
         |  SELECT len(pts)::DOUBLE AS n,
         |         ${fsum("ln(i::DOUBLE)")} AS sx,
         |         ${fsum("ln((-pts[i::INT].nc)::DOUBLE)")} AS sy,
         |         ${fsum("ln(i::DOUBLE) * ln(i::DOUBLE)")} AS sxx,
         |         ${fsum("ln(i::DOUBLE) * ln((-pts[i::INT].nc)::DOUBLE)")} AS sxy
         |  FROM p)
         |SELECT CAST(n AS BIGINT) AS n_fit,
         |       ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 4) AS slope,
         |       ROUND((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n, 4)
         |         AS intercept
         |FROM s""".stripMargin
    },

    "text_perplexity_interp" -> {
      val lambda = 0.7
      val oneMinus = 1.0 - lambda
      s"""WITH $baseCte,
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i::INT] || ' ' || toks[(i+1)::INT])) AS bg
         |  FROM base WHERE len(toks) >= 2),
         |cb AS (SELECT bg, COUNT(*) AS cbg FROM bg GROUP BY bg),
         |cw AS (SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS cw1 FROM bg GROUP BY 1),
         |tk AS (SELECT tok FROM (SELECT unnest(toks) AS tok FROM base) WHERE tok <> ''),
         |cu AS (SELECT tok AS w2, COUNT(*) AS cu FROM tk GROUP BY 1),
         |tot AS (SELECT COUNT(*)::DOUBLE AS total FROM tk),
         |sc AS (
         |  SELECT b.doc_id,
         |         CAST(ROUND(-ln($lambda * (cb.cbg::DOUBLE / cw.cw1)
         |                        + $oneMinus * (cu.cu::DOUBLE / tot.total))
         |           * 1000000) AS BIGINT) AS nm
         |  FROM bg b
         |  JOIN cb ON b.bg = cb.bg
         |  JOIN cw ON split_part(b.bg, ' ', 1) = cw.w1
         |  JOIN cu ON split_part(b.bg, ' ', -1) = cu.w2
         |  CROSS JOIN tot)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |       ROUND(SUM(nm)::DOUBLE / (COUNT(*) * 1000000.0), 4) AS avg_nll,
         |       ROUND(exp(SUM(nm)::DOUBLE / (COUNT(*) * 1000000.0)), 4) AS ppl
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "text_gopher_summary" ->
      s"""WITH $baseCte,
         |g AS (
         |  SELECT doc_id,
         |         list_filter(toks, t -> t <> '') AS words,
         |         len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS n_sym
         |  FROM base),
         |g2 AS (
         |  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
         |         ROUND(${fold("list_transform(words, t -> strlen(t))", "0::BIGINT", "(x, y) -> x + y")}::DOUBLE
         |           / greatest(len(words), 1), 4) AS mean_word_len,
         |         ROUND(n_sym::DOUBLE / greatest(len(words), 1), 4) AS symbol_ratio,
         |         ROUND(len(list_filter(words, t -> regexp_matches(t, '[a-z]')))::DOUBLE
         |           / greatest(len(words), 1), 4) AS alpha_word_ratio,
         |         CAST(len(list_filter(words, t -> list_contains($stopArr, t))) AS BIGINT) AS n_stop
         |  FROM g),
         |fl AS (
         |  SELECT (n_words >= ${TextAnalysis.GopherMinWords}
         |            AND n_words <= ${TextAnalysis.GopherMaxWords}) AS r_words,
         |         (mean_word_len >= ${TextAnalysis.GopherMinMeanLen}
         |            AND mean_word_len <= ${TextAnalysis.GopherMaxMeanLen}) AS r_mean_len,
         |         (symbol_ratio <= ${TextAnalysis.GopherMaxSymbolRatio}) AS r_symbol,
         |         (alpha_word_ratio >= ${TextAnalysis.GopherMinAlphaRatio}) AS r_alpha,
         |         (n_stop >= ${TextAnalysis.GopherMinStopHits}) AS r_stop
         |  FROM g2)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN NOT r_words THEN 1 ELSE 0 END) AS BIGINT) AS kill_words,
         |       CAST(SUM(CASE WHEN NOT r_mean_len THEN 1 ELSE 0 END) AS BIGINT) AS kill_mean_len,
         |       CAST(SUM(CASE WHEN NOT r_symbol THEN 1 ELSE 0 END) AS BIGINT) AS kill_symbol,
         |       CAST(SUM(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS kill_alpha,
         |       CAST(SUM(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT) AS kill_stop,
         |       CAST(SUM(CASE WHEN r_words AND r_mean_len AND r_symbol
         |                       AND r_alpha AND r_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       ROUND(SUM(CASE WHEN r_words AND r_mean_len AND r_symbol
         |                        AND r_alpha AND r_stop THEN 1 ELSE 0 END)::DOUBLE
         |             / COUNT(*), 4) AS keep_rate
         |FROM fl""".stripMargin,

    "text_nb_quality" ->
      s"""WITH $nbCtes
         |SELECT doc_id, label, nll_keep, nll_toss, (nll_keep <= nll_toss) AS pred
         |FROM fin ORDER BY doc_id""".stripMargin,

    "text_nb_calibration" ->
      s"""WITH $nbCtes,
         |dec AS (
         |  SELECT doc_id, label, (nll_keep <= nll_toss) AS pred,
         |         nll_toss - nll_keep AS margin,
         |         ntile(10) OVER (ORDER BY nll_toss - nll_keep DESC, doc_id) AS decile
         |  FROM fin)
         |SELECT CAST(decile AS BIGINT) AS decile,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_label_keep,
         |       CAST(SUM(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_keep,
         |       ROUND(SUM(CASE WHEN label THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4) AS keep_rate,
         |       ROUND(AVG(margin), 2) AS avg_margin
         |FROM dec GROUP BY decile ORDER BY decile""".stripMargin,

    "text_heavy_hitters" ->
      s"""WITH $baseCte,
         |tk AS (SELECT tok FROM (SELECT unnest(toks) AS tok FROM base) WHERE tok <> ''),
         |top AS (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM tk
         |  GROUP BY tok ORDER BY exact_cnt DESC, tok LIMIT 20),
         |cells AS (
         |  SELECT row_i, bucket, CAST(COUNT(*) AS BIGINT) AS cell_cnt FROM (
         |    SELECT r.i AS row_i,
         |           ${h64("r.i::VARCHAR || '#' || tk.tok")} % ${TextAnalysis.CmsWidth} AS bucket
         |    FROM tk, (SELECT unnest(range(0, ${TextAnalysis.CmsDepth})) AS i) r)
         |  GROUP BY row_i, bucket),
         |probe AS (
         |  SELECT top.tok, top.exact_cnt, r.i AS row_i,
         |         ${h64("r.i::VARCHAR || '#' || top.tok")} % ${TextAnalysis.CmsWidth} AS bucket
         |  FROM top, (SELECT unnest(range(0, ${TextAnalysis.CmsDepth})) AS i) r)
         |SELECT p.tok, p.exact_cnt, MIN(c.cell_cnt) AS cms_est,
         |       MIN(c.cell_cnt) - p.exact_cnt AS overestimate
         |FROM probe p JOIN cells c USING (row_i, bucket)
         |GROUP BY p.tok, p.exact_cnt
         |ORDER BY p.exact_cnt DESC, p.tok""".stripMargin,

    "text_bpe_merges" ->
      s"""WITH $baseCte,
         |$bpeLearnCtes
         |SELECT * FROM (
         |  SELECT 1 AS merge_rank, split_part(pair, ' ', 1) AS lhs,
         |         split_part(pair, ' ', 2) AS rhs, replace(pair, ' ', '') AS merged,
         |         CAST(cnt AS BIGINT) AS pair_count FROM b1
         |  UNION ALL
         |  SELECT 2, split_part(pair, ' ', 1), split_part(pair, ' ', 2),
         |         replace(pair, ' ', ''), CAST(cnt AS BIGINT) FROM b2
         |  UNION ALL
         |  SELECT 3, split_part(pair, ' ', 1), split_part(pair, ' ', 2),
         |         replace(pair, ' ', ''), CAST(cnt AS BIGINT) FROM b3)
         |ORDER BY merge_rank""".stripMargin,

    "text_bpe_tokenize" ->
      s"""WITH $baseCte,
         |$bpeLearnCtes,
         |tkd AS (SELECT doc_id, unnest(toks) AS word FROM base),
         |tkf AS (
         |  SELECT doc_id, word FROM tkd
         |  WHERE word <> '' AND strpos(word, chr(1)) = 0),
         |sy0 AS (
         |  SELECT word, chr(1) || chr(1) ||
         |         regexp_replace(word, '(.)', '\\1' || chr(1) || chr(1), 'g') AS syms
         |  FROM (SELECT DISTINCT word FROM tkf)),
         |${bpeApplyCte(1, "sy0")},
         |${bpeApplyCte(2, "sy1")},
         |${bpeApplyCte(3, "sy2")},
         |cnt AS (
         |  SELECT word, length(word)::BIGINT AS n_chars,
         |         len(string_split(trim(replace(syms, chr(1) || chr(1), ' ')), ' '))::BIGINT AS n_syms
         |  FROM sy3)
         |SELECT t.doc_id,
         |       CAST(SUM(c.n_chars) AS BIGINT) AS n_base_syms,
         |       CAST(SUM(c.n_syms) AS BIGINT) AS n_bpe_syms,
         |       ROUND(SUM(c.n_chars)::DOUBLE / SUM(c.n_syms), 4) AS compression
         |FROM tkf t JOIN cnt c USING (word)
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    "text_bpe_eval" ->
      s"""WITH $baseCte,
         |${bpeLearnCtesWhere(
             s"WHERE NOT (${h64("doc_id::VARCHAR || '#split1'")} % 1000 < 100)")},
         |tkd AS (SELECT doc_id, unnest(toks) AS word FROM base),
         |tkf AS (
         |  SELECT doc_id, word,
         |         CASE WHEN ${h64("doc_id::VARCHAR || '#split1'")} % 1000 < 100
         |           THEN 'heldout' ELSE 'train' END AS split
         |  FROM tkd
         |  WHERE word <> '' AND strpos(word, chr(1)) = 0),
         |sy0 AS (
         |  SELECT word, chr(1) || chr(1) ||
         |         regexp_replace(word, '(.)', '\\1' || chr(1) || chr(1), 'g') AS syms
         |  FROM (SELECT DISTINCT word FROM tkf)),
         |${bpeApplyCte(1, "sy0")},
         |${bpeApplyCte(2, "sy1")},
         |${bpeApplyCte(3, "sy2")},
         |cnt AS (
         |  SELECT word, length(word)::BIGINT AS n_chars,
         |         len(string_split(trim(replace(syms, chr(1) || chr(1), ' ')), ' '))::BIGINT AS n_syms
         |  FROM sy3)
         |SELECT t.split,
         |       CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
         |       CAST(SUM(c.n_chars) AS BIGINT) AS n_base_syms,
         |       CAST(SUM(c.n_syms) AS BIGINT) AS n_bpe_syms,
         |       ROUND(SUM(c.n_chars)::DOUBLE / SUM(c.n_syms), 4) AS compression
         |FROM tkf t JOIN cnt c USING (word)
         |GROUP BY t.split ORDER BY split""".stripMargin,

    "cur_dsir" ->
      s"""WITH $baseCte,
         |tk AS (
         |  SELECT doc_id, tok, (doc_id % 50 = 0) AS is_target
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM base) t
         |  WHERE tok <> ''),
         |m AS (
         |  SELECT tok,
         |         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t,
         |         CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS cnt_r
         |  FROM tk GROUP BY tok),
         |st AS (
         |  SELECT CAST(SUM(cnt_t) AS BIGINT) AS tot_t,
         |         CAST(SUM(cnt_r) AS BIGINT) AS tot_r,
         |         CAST(COUNT(*) AS BIGINT) AS v
         |  FROM m),
         |sc AS (
         |  SELECT tk.doc_id,
         |         CAST(ROUND(-ln((m.cnt_r + 1)::DOUBLE / (st.tot_r + st.v)::DOUBLE)
         |           * 1000000) AS BIGINT)
         |       - CAST(ROUND(-ln((m.cnt_t + 1)::DOUBLE / (st.tot_t + st.v)::DOUBLE)
         |           * 1000000) AS BIGINT) AS w
         |  FROM tk JOIN m USING (tok) CROSS JOIN st
         |  WHERE NOT tk.is_target)
         |SELECT doc_id, CAST(SUM(w) AS BIGINT) AS weight_micro,
         |       CAST(COUNT(*) AS BIGINT) AS n_tokens
         |FROM sc GROUP BY doc_id
         |ORDER BY weight_micro DESC, doc_id LIMIT 50""".stripMargin,

    "text_pmi" ->
      s"""WITH $baseCte,
         |bg0 AS (
         |  SELECT unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i::INT] || ' ' || toks[(i+1)::INT])) AS bg
         |  FROM base WHERE len(toks) >= 2),
         |uni AS (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(toks) AS tok FROM base) t
         |  WHERE tok <> '' GROUP BY tok),
         |bigc AS (
         |  SELECT bg, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg0 GROUP BY bg
         |  HAVING COUNT(*) >= 5),
         |tots AS (
         |  SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS tt,
         |         (SELECT CAST(COUNT(*) AS BIGINT) FROM bg0) AS bb),
         |sc AS (
         |  SELECT b.bg, b.c_ab, ua.c AS c_a, ub.c AS c_b,
         |         CAST(ROUND(ln((b.c_ab::DOUBLE / t.bb) /
         |           ((ua.c::DOUBLE / t.tt) * (ub.c::DOUBLE / t.tt)))
         |           * 1000000) AS BIGINT) AS pmi_micro
         |  FROM bigc b
         |  JOIN uni ua ON split_part(b.bg, ' ', 1) = ua.tok
         |  JOIN uni ub ON split_part(b.bg, ' ', 2) = ub.tok
         |  CROSS JOIN tots t)
         |SELECT bg, c_ab, c_a, c_b, pmi_micro
         |FROM sc ORDER BY pmi_micro DESC, bg LIMIT 30""".stripMargin,

    "passage_top" ->
      s"""WITH $baseCte, $augCte, $passageGramCtes
         |SELECT gram,
         |       CAST(COUNT(*) AS BIGINT) AS n_occ,
         |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM gr GROUP BY gram
         |HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY n_docs DESC, n_occ DESC, gram LIMIT 20""".stripMargin,

    "passage_doc_share" ->
      s"""WITH $baseCte, $augCte, $passageGramCtes,
         |grh AS (SELECT doc_id, ${h64("gram")} AS h FROM gr),
         |rep AS (SELECT h FROM grh GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id))
         |SELECT g.doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_grams,
         |       CAST(SUM(CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated,
         |       ROUND(SUM(CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |             / COUNT(*), 4) AS repeated_share
         |FROM grh g LEFT JOIN rep r ON g.h = r.h
         |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    "passage_spans" ->
      s"""WITH $baseCte, $augCte, $passageGramCtes,
         |$passageSpanCtes
         |SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
         |       CAST(MAX(pos) + ${graft.operators.Passages.PassageN - 1} AS BIGINT) AS span_end,
         |       CAST(MAX(pos) + ${graft.operators.Passages.PassageN - 1} - MIN(pos) + 1 AS BIGINT) AS span_words,
         |       CAST(COUNT(*) AS BIGINT) AS n_windows
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin,

    "passage_span_stats" ->
      s"""WITH $baseCte, $augCte, $passageGramCtes,
         |$passageSpanCtes,
         |sp AS (SELECT doc_id,
         |              MAX(pos) + ${graft.operators.Passages.PassageN - 1} - MIN(pos) + 1 AS span_words
         |       FROM isl GROUP BY doc_id, island),
         |tw AS (SELECT SUM(len(list_filter(toks, t -> t <> ''))) AS total_words FROM aug)
         |SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_affected,
         |       CAST(COUNT(*) AS BIGINT) AS n_spans,
         |       CAST(COALESCE(SUM(span_words), 0) AS BIGINT) AS dup_words,
         |       ROUND(COALESCE(SUM(span_words), 0)::DOUBLE / tw.total_words, 4) AS dup_word_share
         |FROM sp, tw GROUP BY tw.total_words""".stripMargin,

    "passage_excise" ->
      s"""WITH $baseCte, $augCte, $passageGramCtes,
         |$passageSpanCtes,
         |spd AS (SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS s,
         |               CAST(MAX(pos) + ${graft.operators.Passages.PassageN - 1} AS BIGINT) AS e
         |        FROM isl GROUP BY doc_id, island),
         |spl AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS spans
         |        FROM spd GROUP BY doc_id),
         |exf AS (
         |  SELECT a.doc_id, list_filter(a.toks, t -> t <> '') AS ftoks, p.spans
         |  FROM aug a LEFT JOIN spl p USING (doc_id)),
         |ex AS (
         |  SELECT doc_id, ftoks,
         |         CASE WHEN spans IS NULL THEN ftoks
         |              ELSE list_transform(
         |                     list_filter(range(1, len(ftoks) + 1),
         |                       i -> len(list_filter(spans,
         |                              sp -> i >= sp.s AND i <= sp.e)) = 0),
         |                     i -> ftoks[i::INT]) END AS kept
         |  FROM exf)
         |SELECT doc_id,
         |       CAST(len(ftoks) AS BIGINT) AS n_words,
         |       CAST(len(kept) AS BIGINT) AS kept_words,
         |       CAST(len(ftoks) - len(kept) AS BIGINT) AS removed_words,
         |       md5(COALESCE(array_to_string(kept, ' '), '')) AS cleaned_digest
         |FROM ex ORDER BY doc_id""".stripMargin,

    "cur_shuffle" ->
      s"""WITH k AS (
         |  SELECT ${h64("doc_id::VARCHAR || '#shuffle1'")} AS skey FROM documents)
         |SELECT (skey % 16)::INT AS shard,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       MIN(skey) AS min_key,
         |       MAX(skey) AS max_key
         |FROM k GROUP BY 1 ORDER BY shard""".stripMargin,

    "cur_source_mix" ->
      s"""WITH t AS (
         |  SELECT source,
         |         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
         |  FROM documents),
         |ps AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |         ROUND(AVG(n_tokens), 4) AS avg_tokens
         |  FROM t GROUP BY source)
         |SELECT source, n_docs, total_tokens, avg_tokens,
         |       ROUND(total_tokens::DOUBLE / SUM(total_tokens) OVER (), 4) AS token_share
         |FROM ps ORDER BY source""".stripMargin,

    "cur_source_cap" ->
      s"""WITH q AS (
         |  SELECT doc_id, source,
         |         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
         |         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |             t -> list_contains($stopArr, t))) AS n_stop
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, source,
         |         ROUND(least(n_tokens::DOUBLE / 100.0, 1.0::DOUBLE) * 0.5
         |               + (n_stop::DOUBLE / n_tokens) * 0.5, 4) AS quality_score
         |  FROM q),
         |r AS (
         |  SELECT source, doc_id, quality_score,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY quality_score DESC, doc_id) AS rk
         |  FROM s)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       (COUNT(*) > 15) AS cap_hit,
         |       ROUND(MIN(CASE WHEN rk <= 15 THEN quality_score END), 4) AS min_kept_quality
         |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "cur_chunks" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |         list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |                     t -> t <> '') AS words
         |  FROM documents),
         |w2 AS (
         |  SELECT doc_id, words, len(words) AS n_words,
         |         CAST(greatest(ceil((len(words) - 64) / 48.0), 0) AS INT) + 1 AS n_chunks
         |  FROM w WHERE len(words) > 0),
         |c AS (
         |  SELECT doc_id, words, unnest(range(0, n_chunks)) AS i FROM w2),
         |c2 AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |         CAST(i * 48 AS BIGINT) AS start_word,
         |         words[(i * 48 + 1)::INT:(i * 48 + 64)::INT] AS chunk_toks
         |  FROM c)
         |SELECT doc_id, chunk_idx, start_word,
         |       CAST(len(chunk_toks) AS BIGINT) AS n_tokens,
         |       md5(array_to_string(chunk_toks, ' ')) AS chunk_digest
         |FROM c2 ORDER BY doc_id, chunk_idx""".stripMargin,

    "cur_split_leakage" ->
      s"""WITH $baseCte, $augCte, $shCte, $sigCte,
         |banded AS (
         |  SELECT doc_id, sig, b.band AS band,
         |         array_to_string(sig[(b.band * 4 + 1)::INT:(b.band * 4 + 4)::INT], ',') AS band_key
         |  FROM sig, (SELECT unnest(range(0, 3)) AS band) b),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |         a.sig AS sig_a, b2.sig AS sig_b
         |  FROM banded a JOIN banded b2
         |    ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id),
         |pj AS (
         |  SELECT doc_a, doc_b,
         |         ROUND(len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE, 4) AS est_jaccard
         |  FROM pairs
         |  WHERE len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE >= 0.5),
         |sp AS (
         |  SELECT est_jaccard,
         |         CASE WHEN ${h64("doc_a::VARCHAR || '#split1'")} % 1000 < 100
         |           THEN 'val' ELSE 'train' END AS split_a,
         |         CASE WHEN ${h64("doc_b::VARCHAR || '#split1'")} % 1000 < 100
         |           THEN 'val' ELSE 'train' END AS split_b
         |  FROM pj)
         |SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       ROUND(AVG(est_jaccard), 4) AS avg_est_jaccard
         |FROM sp GROUP BY split_a, split_b ORDER BY split_a, split_b""".stripMargin,

    "cur_sample" ->
      s"""WITH r AS (
         |  SELECT doc_id, lang,
         |         ${Curation.SampleRatesBp.toSeq.sortBy(_._1).map { case (l, bp) =>
              s"WHEN '$l' THEN $bp" }.mkString("CASE lang ", " ", " ELSE 0 END")} AS rate_bp
         |  FROM documents),
         |s AS (
         |  SELECT lang, rate_bp,
         |         CASE WHEN ${h64("doc_id::VARCHAR || '#sample1'")} % 10000 < rate_bp
         |           THEN 1 ELSE 0 END AS keep
         |  FROM r)
         |SELECT lang, MAX(rate_bp) AS rate_bp,
         |       CAST(COUNT(*) AS BIGINT) AS n_total,
         |       CAST(SUM(keep) AS BIGINT) AS n_kept,
         |       ROUND(SUM(keep)::DOUBLE / COUNT(*), 4) AS realized_rate
         |FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    "sim_kmeans_cells" ->
      s"""WITH $vecCte,
         |c0 AS (
         |  SELECT vec_id - 100 AS cell, vec AS cvec, sq AS csq
         |  FROM vn WHERE vec_id >= 100 AND vec_id < 100 + ${kCentSub("vn")}),
         |${kmeansIterCtes(1, "c0")},
         |${kmeansIterCtes(2, "c1n")},
         |final_assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vn.vec_id, c.cell,
         |           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${dotD("vn.vec", "c.cvec")} / sqrt(vn.sq * c.csq) DESC,
         |                      c.cell) AS rn
         |    FROM vn, c2n c) t WHERE rn = 1),
         |sizes AS (SELECT cell, COUNT(*) AS n FROM final_assign GROUP BY cell)
         |SELECT c.cell, CAST(d.d - 1 AS BIGINT) AS dim,
         |       ROUND(c.cvec[d.d::INT], 6) AS centroid_val,
         |       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_members
         |FROM c2n c
         |CROSS JOIN (SELECT unnest(range(1, 65)) AS d) d
         |LEFT JOIN sizes s ON s.cell = c.cell
         |ORDER BY c.cell, dim""".stripMargin,

    "sim_topk_pq" ->
      s"""WITH $vecCte,
         |ms AS (SELECT unnest(range(0, ${Similarity.PqM})) AS m),
         |cb AS (
         |  SELECT ms.m, (vn.vec_id - 100)::INT AS j,
         |         vn.vec[(ms.m*16+1)::INT:(ms.m*16+16)::INT] AS cvec
         |  FROM vn, ms WHERE vn.vec_id >= 100 AND vn.vec_id < ${100 + Similarity.PqK}),
         |cbn AS (SELECT m, j, cvec, ${dotD("cvec", "cvec", 16)} AS csq FROM cb),
         |sub AS (
         |  SELECT vec_id, ms.m, vec[(ms.m*16+1)::INT:(ms.m*16+16)::INT] AS sub
         |  FROM vn, ms),
         |cscore AS (
         |  SELECT s.vec_id, s.m, c.j, ${dotD("s.sub", "c.cvec", 16)} * 2 - c.csq AS sc
         |  FROM sub s JOIN cbn c ON s.m = c.m),
         |code AS (
         |  SELECT vec_id, m, j AS code FROM (
         |    SELECT vec_id, m, j,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY sc DESC, j) AS rn
         |    FROM cscore) t WHERE rn = 1),
         |cand AS (
         |  SELECT vec_id,
         |         MAX(CASE WHEN m = 0 THEN code END) AS c0,
         |         MAX(CASE WHEN m = 1 THEN code END) AS c1,
         |         MAX(CASE WHEN m = 2 THEN code END) AS c2,
         |         MAX(CASE WHEN m = 3 THEN code END) AS c3
         |  FROM code GROUP BY vec_id),
         |dt AS (
         |  SELECT s.vec_id AS query_id, c.m, c.j,
         |         c.csq - ${dotD("s.sub", "c.cvec", 16)} * 2 AS dv
         |  FROM sub s JOIN cbn c ON s.m = c.m WHERE s.vec_id < 5),
         |qq AS (SELECT vec_id AS query_id, sq AS qsq FROM vn WHERE vec_id < 5),
         |scored AS (
         |  SELECT qq.query_id, cd.vec_id,
         |         qq.qsq + d0.dv + d1.dv + d2.dv + d3.dv AS adist
         |  FROM qq, cand cd
         |  JOIN dt d0 ON d0.m = 0 AND d0.j = cd.c0
         |  JOIN dt d1 ON d1.m = 1 AND d1.j = cd.c1
         |  JOIN dt d2 ON d2.m = 2 AND d2.j = cd.c2
         |  JOIN dt d3 ON d3.m = 3 AND d3.j = cd.c3
         |  WHERE d0.query_id = qq.query_id AND d1.query_id = qq.query_id
         |    AND d2.query_id = qq.query_id AND d3.query_id = qq.query_id
         |    AND cd.vec_id <> qq.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, adist,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY adist, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
         |       ROUND(adist, 6) AS adist
         |FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    "sim_topk_ivfpq" ->
      s"""WITH $vecCte,
         |cents AS (
         |  SELECT vec_id - 100 AS centroid_id, vec AS cvec, sq AS csq
         |  FROM vn WHERE vec_id >= 100 AND vec_id < 100 + ${kCentQuerySub("vn")}),
         |assign AS (
         |  SELECT vec_id, centroid_id AS cell FROM (
         |    SELECT vn.vec_id, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${dotD("vn.vec", "c.cvec")} / sqrt(vn.sq * c.csq) DESC,
         |                      c.centroid_id) AS crank
         |    FROM vn, cents c) t WHERE crank = 1),
         |probes AS (
         |  SELECT query_id, qsq, centroid_id AS cell FROM (
         |    SELECT q.vec_id AS query_id, q.sq AS qsq, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${dotD("q.vec", "c.cvec")} / sqrt(q.sq * c.csq) DESC,
         |                      c.centroid_id) AS crank
         |    FROM vn q, cents c WHERE q.vec_id < 5) t WHERE crank <= 2),
         |ms AS (SELECT unnest(range(0, ${Similarity.PqM})) AS m),
         |cb AS (
         |  SELECT ms.m, (vn.vec_id - 100)::INT AS j,
         |         vn.vec[(ms.m*16+1)::INT:(ms.m*16+16)::INT] AS cvec
         |  FROM vn, ms WHERE vn.vec_id >= 100 AND vn.vec_id < ${100 + Similarity.PqK}),
         |cbn AS (SELECT m, j, cvec, ${dotD("cvec", "cvec", 16)} AS csq FROM cb),
         |sub AS (
         |  SELECT vec_id, ms.m, vec[(ms.m*16+1)::INT:(ms.m*16+16)::INT] AS sub
         |  FROM vn, ms),
         |cscore AS (
         |  SELECT s.vec_id, s.m, c.j, ${dotD("s.sub", "c.cvec", 16)} * 2 - c.csq AS sc
         |  FROM sub s JOIN cbn c ON s.m = c.m),
         |code AS (
         |  SELECT vec_id, m, j AS code FROM (
         |    SELECT vec_id, m, j,
         |           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY sc DESC, j) AS rn
         |    FROM cscore) t WHERE rn = 1),
         |cand AS (
         |  SELECT vec_id,
         |         MAX(CASE WHEN m = 0 THEN code END) AS c0,
         |         MAX(CASE WHEN m = 1 THEN code END) AS c1,
         |         MAX(CASE WHEN m = 2 THEN code END) AS c2,
         |         MAX(CASE WHEN m = 3 THEN code END) AS c3
         |  FROM code GROUP BY vec_id),
         |dt AS (
         |  SELECT s.vec_id AS query_id, c.m, c.j,
         |         c.csq - ${dotD("s.sub", "c.cvec", 16)} * 2 AS dv
         |  FROM sub s JOIN cbn c ON s.m = c.m WHERE s.vec_id < 5),
         |scored AS (
         |  SELECT p.query_id, a.vec_id,
         |         p.qsq + d0.dv + d1.dv + d2.dv + d3.dv AS adist
         |  FROM probes p
         |  JOIN assign a ON a.cell = p.cell
         |  JOIN cand cd ON cd.vec_id = a.vec_id
         |  JOIN dt d0 ON d0.query_id = p.query_id AND d0.m = 0 AND d0.j = cd.c0
         |  JOIN dt d1 ON d1.query_id = p.query_id AND d1.m = 1 AND d1.j = cd.c1
         |  JOIN dt d2 ON d2.query_id = p.query_id AND d2.m = 2 AND d2.j = cd.c2
         |  JOIN dt d3 ON d3.query_id = p.query_id AND d3.m = 3 AND d3.j = cd.c3
         |  WHERE a.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, adist,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY adist, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id,
         |       ROUND(adist, 6) AS adist
         |FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    "dedup_clusters" ->
      s"""WITH RECURSIVE $baseCte, $augCte, $shCte, $sigCte, $fpairsCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM fpairs
         |  UNION ALL SELECT doc_b, doc_a FROM fpairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a)
         |SELECT a AS doc_id, CAST(least(a, MIN(b)) AS BIGINT) AS cluster
         |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,

    "cur_keeper" ->
      s"""WITH RECURSIVE $baseCte, $augCte, $shCte, $sigCte, $fpairsCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM fpairs
         |  UNION ALL SELECT doc_b, doc_a FROM fpairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a),
         |clusters AS (
         |  SELECT a AS doc_id, CAST(least(a, MIN(b)) AS BIGINT) AS cluster
         |  FROM reach GROUP BY a),
         |q AS (
         |  SELECT doc_id,
         |         ROUND(least(len(toks)::DOUBLE / 100.0::DOUBLE, 1.0::DOUBLE) * 0.5::DOUBLE
         |               + (len(list_filter(toks, t -> list_contains($stopArr, t)))::DOUBLE
         |                  / len(toks)) * 0.5::DOUBLE, 4) AS quality_score
         |  FROM aug),
         |ranked AS (
         |  SELECT c.cluster, c.doc_id, q.quality_score,
         |         COUNT(*) OVER (PARTITION BY c.cluster) AS n_members,
         |         ROW_NUMBER() OVER (PARTITION BY c.cluster
         |           ORDER BY q.quality_score DESC, c.doc_id) AS rn
         |  FROM clusters c JOIN q USING (doc_id))
         |SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
         |       doc_id AS keep_doc_id, quality_score AS keep_quality
         |FROM ranked WHERE rn = 1 ORDER BY cluster""".stripMargin,

    "cur_temperature" ->
      s"""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
         |tot AS (
         |  SELECT SUM(n)::DOUBLE AS totn,
         |         ${fold("list(sqrt(n::DOUBLE) ORDER BY lang)", "0.0::DOUBLE",
                "(x, y) -> x + y")} AS sumw
         |  FROM c),
         |r AS (
         |  SELECT c.lang,
         |         CAST(least(10000.0,
         |           floor(((t.totn * 0.5 * sqrt(c.n::DOUBLE) / t.sumw) / c.n::DOUBLE)
         |                 * 10000.0)) AS INT) AS rate_bp
         |  FROM c, tot t),
         |s AS (
         |  SELECT d.lang, r.rate_bp,
         |         CASE WHEN ${h64("d.doc_id::VARCHAR || '#temp1'")} % 10000 < r.rate_bp
         |           THEN 1 ELSE 0 END AS keep
         |  FROM documents d JOIN r ON d.lang = r.lang)
         |SELECT lang, MAX(rate_bp) AS rate_bp,
         |       CAST(COUNT(*) AS BIGINT) AS n_total,
         |       CAST(SUM(keep) AS BIGINT) AS n_kept,
         |       ROUND(SUM(keep)::DOUBLE / COUNT(*), 4) AS realized_rate
         |FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    "cur_funnel" ->
      s"""WITH RECURSIVE $baseCte, $augCte, $shCte, $sigCte, $fpairsCtes,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM fpairs
         |  UNION ALL SELECT doc_b, doc_a FROM fpairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a),
         |clusters AS (
         |  SELECT a AS doc_id, CAST(least(a, MIN(b)) AS BIGINT) AS cluster
         |  FROM reach GROUP BY a),
         |q AS (
         |  SELECT doc_id,
         |         ROUND(least(len(toks)::DOUBLE / 100.0::DOUBLE, 1.0::DOUBLE) * 0.5::DOUBLE
         |               + (len(list_filter(toks, t -> list_contains($stopArr, t)))::DOUBLE
         |                  / len(toks)) * 0.5::DOUBLE, 4) AS quality_score
         |  FROM aug),
         |ranked AS (
         |  SELECT c.doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY c.cluster
         |           ORDER BY q.quality_score DESC, c.doc_id) AS rn
         |  FROM clusters c JOIN q USING (doc_id)),
         |keepers AS (SELECT doc_id FROM ranked WHERE rn = 1),
         |dg AS (SELECT doc_id, md5(text) AS digest, lang FROM aug),
         |mn AS (
         |  SELECT doc_id, lang,
         |         MIN(doc_id) OVER (PARTITION BY digest) AS min_id
         |  FROM dg),
         |fl AS (
         |  SELECT m.doc_id,
         |         (m.doc_id = m.min_id) AS s2,
         |         (m.doc_id = m.min_id)
         |           AND (c.doc_id IS NULL OR k.doc_id IS NOT NULL) AS s3,
         |         q.quality_score >= ${Curation.QualityFloor} AS qok,
         |         ${h64("m.doc_id::VARCHAR || '#sample1'")} % 10000 <
         |           ${Curation.SampleRatesBp.toSeq.sortBy(_._1).map { case (l, bp) =>
                s"WHEN '$l' THEN $bp" }.mkString("CASE m.lang ", " ", " ELSE 0 END")} AS sok
         |  FROM mn m
         |  LEFT JOIN clusters c ON c.doc_id = m.doc_id
         |  LEFT JOIN keepers k ON k.doc_id = m.doc_id
         |  JOIN q ON q.doc_id = m.doc_id)
         |SELECT 1 AS stage_idx, 'ingest' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM fl
         |UNION ALL SELECT 2, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM fl WHERE s2
         |UNION ALL SELECT 3, 'near_dedup', CAST(COUNT(*) AS BIGINT) FROM fl WHERE s3
         |UNION ALL SELECT 4, 'quality', CAST(COUNT(*) AS BIGINT) FROM fl WHERE s3 AND qok
         |UNION ALL SELECT 5, 'sample', CAST(COUNT(*) AS BIGINT) FROM fl WHERE s3 AND qok AND sok
         |ORDER BY stage_idx""".stripMargin,

    "cur_split" ->
      s"""WITH $baseCte,
         |s AS (
         |  SELECT doc_id, lang, len(toks) AS n_tokens,
         |         CASE WHEN ${h64("doc_id::VARCHAR || '#split1'")} % 1000 < 100
         |           THEN 'val' ELSE 'train' END AS split
         |  FROM base)
         |SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM s GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "cur_packing" ->
      s"""WITH $baseCte,
         |sh AS (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |         ${h64("doc_id::VARCHAR || '#pack1'")} % 8 AS shard
         |  FROM base),
         |o AS (
         |  SELECT shard, n_tokens,
         |         COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
         |  FROM sh)
         |SELECT shard, CAST(start_offset // 2048 AS BIGINT) AS seq_index,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
         |FROM o GROUP BY 1, 2 ORDER BY shard, seq_index""".stripMargin,

    "text_token_count" ->
      s"""WITH $baseCte
         |SELECT doc_id,
         |       CAST(len(toks) AS BIGINT) AS n_tokens,
         |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
         |       CAST(strlen(text) AS BIGINT) AS n_bytes
         |FROM base ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH $baseCte,
         |q AS (
         |  SELECT doc_id,
         |         CAST(len(toks) AS BIGINT) AS n_tokens,
         |         CAST(len(list_filter(toks, t -> list_contains($stopArr, t))) AS BIGINT) AS n_stop,
         |         CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS n_alpha,
         |         ${fold("list_transform(toks, t -> len(t))", "0", "(x, y) -> x + y")} AS tok_chars,
         |         len(text) AS n_chars
         |  FROM base)
         |SELECT doc_id, n_tokens,
         |       ROUND(n_stop::DOUBLE / n_tokens, 4) AS stop_ratio,
         |       ROUND(tok_chars::DOUBLE / n_tokens, 4) AS avg_token_len,
         |       ROUND(n_alpha::DOUBLE / greatest(n_chars, 1), 4) AS alpha_ratio,
         |       ROUND(least(n_tokens::DOUBLE / 100.0, 1.0::DOUBLE) * 0.5
         |             + (n_stop::DOUBLE / n_tokens) * 0.5, 4) AS quality_score
         |FROM q ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""WITH $baseCte,
         |scored AS (
         |  SELECT doc_id, lang,
         |         $langScoreCols
         |  FROM base)
         |SELECT lang, $langLadder AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n
         |FROM scored GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,

    "text_fingerprint" ->
      s"""WITH $baseCte, $augCte
         |SELECT doc_id,
         |  ${fold(s"list_transform(toks, t -> ${h64("t")} % 1000000007)",
             "0::BIGINT", "(acc, h) -> (acc * 1000003 + h) % 1000000007")} AS fingerprint
         |FROM aug ORDER BY doc_id""".stripMargin,

    "text_vocab" ->
      s"""WITH $baseCte,
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM base)
         |SELECT token, CAST(COUNT(*) AS BIGINT) AS occurrences,
         |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
         |FROM tok WHERE token <> '' GROUP BY token
         |ORDER BY occurrences DESC, token LIMIT 50""".stripMargin,

    "text_repetition" ->
      s"""WITH $baseCte,
         |r AS (
         |  SELECT doc_id, len(toks) - 4 AS total_ngrams,
         |         len(list_distinct(list_transform(range(1, len(toks) - 3),
         |           i -> toks[i::INT] || ' ' || toks[(i+1)::INT] || ' ' || toks[(i+2)::INT]
         |                || ' ' || toks[(i+3)::INT] || ' ' || toks[(i+4)::INT]))) AS distinct_ngrams
         |  FROM base WHERE len(toks) - 4 > 0)
         |SELECT doc_id, CAST(total_ngrams AS BIGINT) AS total_ngrams,
         |       CAST(distinct_ngrams AS BIGINT) AS distinct_ngrams,
         |       ROUND(1.0::DOUBLE - distinct_ngrams::DOUBLE / total_ngrams, 4) AS repetition_ratio
         |FROM r ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      s"""WITH $baseCte, $augCte
         |SELECT md5(text) AS digest, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_copies
         |FROM aug GROUP BY 1 ORDER BY digest""".stripMargin,

    "cur_weighted_sample" ->
      s"""WITH $baseCte,
         |w AS (SELECT doc_id,
         |        CAST(len(list_filter(toks, t -> t <> '')) AS BIGINT) AS n_words
         |      FROM base),
         |s AS (SELECT doc_id, n_words,
         |        CAST(ROUND(ln((((${h64("CAST(doc_id AS VARCHAR) || '#ws1'")} % 2147483647)
         |                        + 2147483647) % 2147483647 + 1)::DOUBLE / 2147483648.0)
         |             / n_words * 1000000) AS BIGINT) AS key_micro
         |      FROM w WHERE n_words > 0)
         |SELECT doc_id, n_words, key_micro FROM s
         |ORDER BY key_micro DESC, doc_id LIMIT 50""".stripMargin,

    "text_ccnet_buckets" ->
      s"""WITH $baseCte,
         |tk AS (SELECT doc_id, tok FROM
         |         (SELECT doc_id, unnest(toks) AS tok FROM base) WHERE tok <> ''),
         |v AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
         |tot AS (SELECT COUNT(*)::DOUBLE AS total FROM tk),
         |sc AS (SELECT doc_id,
         |         CAST(ROUND(-ln(cnt::DOUBLE / total) * 1000000) AS BIGINT) AS nm
         |       FROM tk JOIN v USING (tok) CROSS JOIN tot),
         |pd AS (SELECT doc_id,
         |         ROUND(SUM(nm)::DOUBLE / (COUNT(*) * 1000000.0), 4) AS avg_nll
         |       FROM sc GROUP BY doc_id),
         |k AS (SELECT p.doc_id, b.lang,
         |        CAST(ROUND(p.avg_nll * 10000) AS BIGINT) AS key
         |      FROM pd p JOIN base b USING (doc_id)),
         |nt AS (SELECT lang, key, doc_id,
         |         ntile(3) OVER (PARTITION BY lang ORDER BY key, doc_id) AS bucket
         |       FROM k)
         |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(MIN(key) AS BIGINT) AS min_nll_e4,
         |       CAST(MAX(key) AS BIGINT) AS max_nll_e4,
         |       ROUND(CAST(SUM(key) AS BIGINT)::DOUBLE / (COUNT(*) * 10000.0), 4) AS avg_nll
         |FROM nt GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    "diag_dup_source" ->
      """WITH b AS (SELECT doc_id, text, source FROM documents),
        |m AS (SELECT doc_id + 200000 AS doc_id, text, 'mirror' AS source
        |      FROM b WHERE doc_id % 13 = 0),
        |a AS (SELECT doc_id, text, source, md5(COALESCE(trim(text), '')) AS digest
        |      FROM (SELECT * FROM b UNION ALL SELECT * FROM m)),
        |pd AS (SELECT digest, COUNT(DISTINCT source) AS n_sources,
        |         COUNT(*) AS n_copies
        |       FROM a GROUP BY digest)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        |       CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_source,
        |       ROUND(SUM(CASE WHEN n_copies > 1 THEN 1.0 ELSE 0.0 END) / COUNT(*), 4) AS dup_rate
        |FROM a JOIN pd USING (digest)
        |GROUP BY source ORDER BY source""".stripMargin,

    "dedup_lsh_scurve" ->
      s"""WITH $baseCte, $augCte, $shCte, $sigCte,
         |shh AS (
         |  SELECT doc_id, lang, tok0,
         |         list_distinct(list_transform(sh, s -> ${h64("s")})) AS shl
         |  FROM sh),
         |shn AS (SELECT doc_id, lang, tok0, shl, len(shl) AS nsh FROM shh),
         |tp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         ROUND(len(list_intersect(a.shl, b.shl))::DOUBLE
         |           / (a.nsh + b.nsh - len(list_intersect(a.shl, b.shl))), 4) AS jaccard
         |  FROM shn a JOIN shn b
         |    ON a.lang = b.lang AND a.tok0 = b.tok0 AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.shl, b.shl))::DOUBLE
         |        / (a.nsh + b.nsh - len(list_intersect(a.shl, b.shl))) >= 0.5),
         |banded AS (
         |  SELECT doc_id, sig, b.band AS band,
         |         array_to_string(sig[(b.band * 4 + 1)::INT:(b.band * 4 + 4)::INT], ',') AS band_key
         |  FROM sig, (SELECT unnest(range(0, 3)) AS band) b),
         |cp AS (
         |  SELECT doc_a, doc_b, 1::BIGINT AS c FROM (
         |    SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |           a.sig AS sig_a, b2.sig AS sig_b
         |    FROM banded a JOIN banded b2
         |      ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id)
         |  WHERE len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE >= 0.5),
         |bu AS (
         |  SELECT CAST(floor(jaccard * 10) AS BIGINT) AS bucket,
         |         CAST(COUNT(*) AS BIGINT) AS n_truth,
         |         CAST(SUM(COALESCE(c, 0)) AS BIGINT) AS n_caught
         |  FROM tp LEFT JOIN cp USING (doc_a, doc_b)
         |  GROUP BY 1)
         |SELECT bucket, n_truth, n_caught,
         |       ROUND(n_caught::DOUBLE / n_truth, 4) AS recall_measured,
         |       ROUND(1.0 - pow(1.0 - pow(least((bucket::DOUBLE + 0.5) / 10.0, 1.0), 4.0), 3.0), 4) AS p_theory
         |FROM bu ORDER BY bucket""".stripMargin,

    "diag_corpus_drift" ->
      s"""WITH $baseCte,
         |tk AS (SELECT doc_id, tok FROM
         |         (SELECT doc_id, unnest(toks) AS tok FROM base) WHERE tok <> ''),
         |sd AS (SELECT tok,
         |         (${h64("'drift1#' || CAST(doc_id AS VARCHAR)")} % 2) AS side
         |       FROM tk),
         |c AS (SELECT tok,
         |        CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |        CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |      FROM sd GROUP BY tok),
         |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta, CAST(SUM(cb) AS BIGINT) AS tb FROM c),
         |e AS (SELECT ca, cb, ta, tb,
         |        CASE WHEN ca > 0 THEN ca * CAST(ROUND(ln(2.0 * ca * tb
         |          / (ca * tb + cb * ta)) * 1000000) AS BIGINT) ELSE 0 END AS jp,
         |        CASE WHEN cb > 0 THEN cb * CAST(ROUND(ln(2.0 * cb * ta
         |          / (ca * tb + cb * ta)) * 1000000) AS BIGINT) ELSE 0 END AS jq,
         |        abs(ca * tb - cb * ta) AS tvn
         |      FROM c CROSS JOIN t),
         |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
         |        CAST(SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_vocab_a,
         |        CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_vocab_b,
         |        MAX(ta) AS ta, MAX(tb) AS tb,
         |        CAST(SUM(jp) AS BIGINT) AS sjp, CAST(SUM(jq) AS BIGINT) AS sjq,
         |        CAST(SUM(tvn) AS BIGINT) AS stv
         |      FROM e)
         |SELECT n_vocab, n_vocab_a, n_vocab_b,
         |       ROUND((sjp::DOUBLE / ta + sjq::DOUBLE / tb) / 2000000.0, 6) AS js,
         |       ROUND(stv::DOUBLE / (2.0 * ta * tb), 6) AS tv
         |FROM f""".stripMargin,

    "diag_table_profile" -> {
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      val sums = cols.flatMap { c => Seq(
        s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_$c",
        s"CAST(COUNT(DISTINCT $c) AS BIGINT) AS nd_$c")
      }.mkString(",\n         ")
      val melt = cols.map(c =>
        s"SELECT '$c' AS column_name, nn_$c AS n_null, nd_$c AS n_distinct FROM s")
        .mkString("\nUNION ALL\n")
      s"""WITH s AS (SELECT $sums FROM documents)
         |$melt
         |ORDER BY column_name""".stripMargin
    },

    "dedup_threshold_sweep" ->
      s"""WITH $baseCte, $augCte, $shCte,
         |shh AS (
         |  SELECT doc_id, lang, tok0,
         |         list_distinct(list_transform(sh, s -> ${h64("s")})) AS shl
         |  FROM sh),
         |shn AS (SELECT doc_id, lang, tok0, shl, len(shl) AS nsh FROM shh),
         |pj AS (
         |  SELECT len(list_intersect(a.shl, b.shl))::DOUBLE
         |           / (a.nsh + b.nsh - len(list_intersect(a.shl, b.shl))) AS j,
         |         ROUND(len(list_intersect(a.shl, b.shl))::DOUBLE
         |           / (a.nsh + b.nsh - len(list_intersect(a.shl, b.shl))), 4) AS j4
         |  FROM shn a JOIN shn b
         |    ON a.lang = b.lang AND a.tok0 = b.tok0 AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.shl, b.shl))::DOUBLE
         |        / (a.nsh + b.nsh - len(list_intersect(a.shl, b.shl))) >= 0.5),
         |th AS (SELECT unnest([0.5::DOUBLE, 0.6::DOUBLE,
         |         0.7::DOUBLE, 0.8::DOUBLE, 0.9::DOUBLE]) AS threshold),
         |sw AS (SELECT t.threshold, j4
         |       FROM pj CROSS JOIN th t
         |       WHERE pj.j >= t.threshold),
         |ag AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       ROUND(CAST(SUM(CAST(ROUND(j4 * 10000) AS BIGINT)) AS BIGINT)::DOUBLE
         |             / (COUNT(*) * 10000.0), 4) AS mean_jaccard
         |       FROM sw GROUP BY threshold)
         |SELECT t.threshold, CAST(COALESCE(ag.n_pairs, 0) AS BIGINT) AS n_pairs,
         |       ag.mean_jaccard
         |FROM th t LEFT JOIN ag ON t.threshold = ag.threshold
         |ORDER BY t.threshold""".stripMargin,

    "cur_split_grouped" ->
      s"""WITH $baseCte, $augCte, $shCte, $sigCte,
         |banded AS (
         |  SELECT doc_id, sig, b.band AS band,
         |         array_to_string(sig[(b.band * 4 + 1)::INT:(b.band * 4 + 4)::INT], ',') AS band_key
         |  FROM sig, (SELECT unnest(range(0, 3)) AS band) b),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |         a.sig AS sig_a, b2.sig AS sig_b
         |  FROM banded a JOIN banded b2
         |    ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id),
         |cp AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  WHERE len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE >= 0.5),
         |ws AS (
         |  SELECT c.doc_a, c.doc_b, sa.source AS src_a, sb.source AS src_b
         |  FROM cp c
         |  JOIN documents sa ON c.doc_a % 100000 = sa.doc_id
         |  JOIN documents sb ON c.doc_b % 100000 = sb.doc_id),
         |fl AS (
         |  SELECT ((${h64("doc_a::VARCHAR || '#split1'")} % 1000 < 100) <>
         |          (${h64("doc_b::VARCHAR || '#split1'")} % 1000 < 100)) AS cross_doc,
         |         ((${h64("'src#' || src_a || '#split1'")} % 1000 < 300) <>
         |          (${h64("'src#' || src_b || '#split1'")} % 1000 < 300)) AS cross_src
         |  FROM ws),
         |ag AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |         CAST(SUM(CASE WHEN cross_doc THEN 1 ELSE 0 END) AS BIGINT) AS c_doc,
         |         CAST(SUM(CASE WHEN cross_src THEN 1 ELSE 0 END) AS BIGINT) AS c_src
         |  FROM fl)
         |SELECT 'doc_hash' AS mode, n_pairs, c_doc AS n_cross,
         |       ROUND(c_doc::DOUBLE / n_pairs, 4) AS leak_rate FROM ag
         |UNION ALL
         |SELECT 'source_group', n_pairs, c_src,
         |       ROUND(c_src::DOUBLE / n_pairs, 4) FROM ag
         |ORDER BY mode""".stripMargin,

    "diag_filter_agreement" -> {
      val names = Seq("gopher", "nb", "ppl", "quality")
      val idx = for (i <- names.indices; j <- i until names.size)
        yield (names(i), names(j))
      val sums = idx.flatMap { case (a, b) => Seq(
        s"CAST(SUM(CASE WHEN f_$a AND f_$b THEN 1 ELSE 0 END) AS BIGINT) AS bk_${a}_$b",
        s"CAST(SUM(CASE WHEN f_$a = f_$b THEN 1 ELSE 0 END) AS BIGINT) AS ag_${a}_$b")
      }.mkString(",\n         ")
      val melt = idx.map { case (a, b) =>
        s"""SELECT '$a' AS filter_a, '$b' AS filter_b, bk_${a}_$b AS n_both_keep,
           |       ag_${a}_$b AS n_agree,
           |       ROUND(ag_${a}_$b::DOUBLE / n_docs, 4) AS agree_rate FROM mm""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $nbCtes,
         |uv AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
         |ut AS (SELECT COUNT(*)::DOUBLE AS total FROM tk),
         |usc AS (SELECT doc_id, CAST(ROUND(-ln(cnt::DOUBLE / total) * 1000000) AS BIGINT) AS nm
         |        FROM tk JOIN uv USING (tok) CROSS JOIN ut),
         |upd AS (SELECT doc_id, ROUND(SUM(nm)::DOUBLE / (COUNT(*) * 1000000.0), 4) AS avg_nll
         |        FROM usc GROUP BY doc_id),
         |ua AS (SELECT doc_id, CAST(ROUND(avg_nll * 10000) AS BIGINT) AS a_e4 FROM upd),
         |ust AS (SELECT CAST(SUM(a_e4) AS BIGINT) AS s_e4, CAST(COUNT(*) AS BIGINT) AS n_u FROM ua),
         |qf AS (SELECT doc_id,
         |         ROUND(least(CAST(len(toks) AS BIGINT)::DOUBLE / 100.0, 1.0::DOUBLE) * 0.5
         |           + (len(list_filter(toks, t -> list_contains($stopArr, t)))::DOUBLE
         |              / len(toks)) * 0.5, 4) AS quality_score
         |       FROM base),
         |ff AS (SELECT f.doc_id,
         |         f.label AS f_gopher,
         |         (f.nll_keep <= f.nll_toss) AS f_nb,
         |         (ua.a_e4 * ust.n_u <= ust.s_e4) AS f_ppl,
         |         (qf.quality_score >= ${graft.operators.Curation.QualityFloor}) AS f_quality
         |       FROM fin f JOIN ua USING (doc_id) JOIN qf USING (doc_id) CROSS JOIN ust),
         |mm AS (SELECT $sums,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs FROM ff)
         |$melt
         |ORDER BY filter_a, filter_b""".stripMargin
    },

    "sim_dim_stats" ->
      s"""WITH m AS (
         |  SELECT i.dim AS dim,
         |         CAST(ROUND(e.embedding[(i.dim + 1)::INT]::DOUBLE * 1000000) AS BIGINT) AS xe6
         |  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) i),
         |p AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
         |        CAST(SUM(xe6) AS BIGINT) AS sx,
         |        SUM(CAST(xe6 AS HUGEINT) * xe6) AS sx2
         |      FROM m GROUP BY dim)
         |SELECT CAST(dim AS BIGINT) AS dim, n,
         |       ROUND(sx::DOUBLE / (n * 1000000.0), 6) AS mean,
         |       ROUND((n::DOUBLE * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE)
         |         / (n::DOUBLE * n * 1e12), 6) AS variance,
         |       ROUND(sqrt((n::DOUBLE * sx2::DOUBLE - sx::DOUBLE * sx::DOUBLE)
         |         / (n::DOUBLE * n * 1e12)), 6) AS std
         |FROM p ORDER BY dim""".stripMargin,

    "sim_pair_stats" ->
      s"""WITH $vecCte,
         |bk AS (SELECT vec_id, vec, sq,
         |         (${h64("'pair#' || CAST(vec_id AS VARCHAR)")} % 256) AS bucket
         |       FROM vn),
         |pr AS (SELECT CAST(ROUND(${dotD("a.vec", "b.vec")}
         |         / sqrt(a.sq * b.sq) * 1000000) AS BIGINT) AS cos_e6
         |       FROM bk a JOIN bk b
         |         ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       ROUND(CAST(SUM(cos_e6) AS BIGINT)::DOUBLE / (COUNT(*) * 1000000.0), 4) AS mean_cos,
         |       ROUND(sqrt((COUNT(*)::DOUBLE * SUM(CAST(cos_e6 AS HUGEINT) * cos_e6)::DOUBLE
         |         - CAST(SUM(cos_e6) AS BIGINT)::DOUBLE * CAST(SUM(cos_e6) AS BIGINT)::DOUBLE)
         |         / (COUNT(*)::DOUBLE * COUNT(*) * 1e12)), 4) AS std_cos,
         |       ROUND(MIN(cos_e6)::DOUBLE / 1000000.0, 4) AS min_cos,
         |       ROUND(MAX(cos_e6)::DOUBLE / 1000000.0, 4) AS max_cos
         |FROM pr""".stripMargin,

    "text_entropy" ->
      s"""WITH $baseCte,
         |tk AS (SELECT doc_id, tok FROM
         |         (SELECT doc_id, unnest(toks) AS tok FROM base) WHERE tok <> ''),
         |c AS (SELECT doc_id, ${h64("tok")} AS th, COUNT(*) AS c
         |      FROM tk GROUP BY 1, 2),
         |d AS (SELECT doc_id,
         |        CAST(SUM(c) AS BIGINT) AS n_words,
         |        CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |        CAST(SUM(c * CAST(ROUND(ln(c::DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_clnc
         |      FROM c GROUP BY doc_id),
         |e AS (SELECT doc_id, n_words, n_distinct, sum_clnc,
         |        CAST(ROUND(ln(n_words::DOUBLE) * 1000000) AS BIGINT) AS ln_n_e6
         |      FROM d)
         |SELECT doc_id, n_words, n_distinct,
         |       ROUND((n_words * ln_n_e6 - sum_clnc)::DOUBLE / (n_words * 1000000.0), 4)
         |         AS entropy,
         |       CASE WHEN n_words <= 1 THEN 0.0
         |            ELSE ROUND((n_words * ln_n_e6 - sum_clnc)::DOUBLE
         |                       / (n_words * ln_n_e6), 4) END AS norm_entropy
         |FROM e ORDER BY doc_id""".stripMargin,

    "text_novelty" ->
      s"""WITH $baseCte, $augCte, $shCte,
         |shh AS (
         |  SELECT doc_id, list_distinct(list_transform(sh, s -> ${h64("s")})) AS shl
         |  FROM sh),
         |g AS (SELECT doc_id, unnest(shl) AS gh FROM shh),
         |f AS (SELECT gh, COUNT(*) AS nd FROM g GROUP BY gh)
         |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |       CAST(SUM(CASE WHEN f.nd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |       ROUND(SUM(CASE WHEN f.nd = 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4)
         |         AS novelty
         |FROM g JOIN f USING (gh) GROUP BY g.doc_id ORDER BY doc_id""".stripMargin,

    "text_length_histogram" ->
      s"""WITH $baseCte,
         |w AS (SELECT doc_id,
         |        CAST(len(list_filter(toks, t -> t <> '')) AS BIGINT) AS n_words
         |      FROM base),
         |w2 AS (SELECT doc_id, n_words,
         |         CAST(length(printf('%b', n_words)) - 1 AS BIGINT) AS bucket
         |       FROM w WHERE n_words > 0),
         |h AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |        CAST(SUM(n_words) AS BIGINT) AS n_words_total
         |      FROM w2 GROUP BY bucket),
         |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS t_docs,
         |        CAST(SUM(n_words_total) AS BIGINT) AS t_words FROM h)
         |SELECT bucket, n_docs, n_words_total,
         |       ROUND(n_docs::DOUBLE / t.t_docs, 4) AS doc_share,
         |       ROUND(n_words_total::DOUBLE / t.t_words, 4) AS word_share,
         |       ROUND(CAST(SUM(n_words_total) OVER (ORDER BY bucket) AS BIGINT)::DOUBLE
         |             / t.t_words, 4) AS cum_word_share
         |FROM h CROSS JOIN t ORDER BY bucket""".stripMargin,

    "text_linear_probe" -> {
      val d = TextAnalysis.ProbeDims
      def xExpr(i: Int) = fold(
        s"""list_transform(list_filter(words, t -> ${h64("t")} % $d = $i),
           |           t -> CASE WHEN ${h64("'s#' || t")} % 2 = 0
           |                THEN 1::BIGINT ELSE -1::BIGINT END)""".stripMargin,
        "0::BIGINT", "(a, x) -> a + x")
      val idx = for (i <- 0 to d + 1; j <- i to d + 1) yield (i, j)
      val sums = idx.map { case (i, j) =>
        s"CAST(SUM(v$i * v$j) AS BIGINT) AS m_${i}_$j" }.mkString(",\n         ")
      val structs = idx.map { case (i, j) =>
        s"struct_pack(i := $i, j := $j, m := m_${i}_$j)" }.mkString(", ")
      val xCols = (0 until d).map(i => s"${xExpr(i)} AS v$i").mkString(",\n         ")
      s"""WITH $baseCte,
         |g AS (
         |  SELECT doc_id, text, list_filter(toks, t -> t <> '') AS words,
         |         len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS n_sym
         |  FROM base),
         |g2 AS (
         |  SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n_words,
         |         ROUND(${fold("list_transform(words, t -> strlen(t))", "0::BIGINT", "(x, y) -> x + y")}::DOUBLE
         |           / greatest(len(words), 1), 4) AS mean_word_len,
         |         ROUND(n_sym::DOUBLE / greatest(len(words), 1), 4) AS symbol_ratio,
         |         ROUND(len(list_filter(words, t -> regexp_matches(t, '[a-z]')))::DOUBLE
         |           / greatest(len(words), 1), 4) AS alpha_word_ratio,
         |         CAST(len(list_filter(words, t -> list_contains($stopArr, t))) AS BIGINT) AS n_stop
         |  FROM g),
         |lab AS (
         |  SELECT doc_id, words,
         |         (n_words >= ${TextAnalysis.GopherMinWords}
         |          AND n_words <= ${TextAnalysis.GopherMaxWords}
         |          AND mean_word_len >= ${TextAnalysis.GopherMinMeanLen}
         |          AND mean_word_len <= ${TextAnalysis.GopherMaxMeanLen}
         |          AND symbol_ratio <= ${TextAnalysis.GopherMaxSymbolRatio}
         |          AND alpha_word_ratio >= ${TextAnalysis.GopherMinAlphaRatio}
         |          AND n_stop >= ${TextAnalysis.GopherMinStopHits}) AS keep
         |  FROM g2),
         |wide AS (
         |  SELECT doc_id,
         |         $xCols,
         |         1::BIGINT AS v$d,
         |         CASE WHEN keep THEN 1::BIGINT ELSE 0::BIGINT END AS v${d + 1}
         |  FROM lab),
         |mm AS (
         |  SELECT $sums
         |  FROM wide)
         |SELECT CAST(u.i AS BIGINT) AS i, CAST(u.j AS BIGINT) AS j,
         |       CAST(u.m AS BIGINT) AS m
         |FROM (SELECT unnest([$structs]) AS u FROM mm) t
         |ORDER BY i, j""".stripMargin
    },

    "dedup_lsh_eval" ->
      s"""WITH $baseCte, $augCte, $shCte, $sigCte,
         |shh AS (
         |  SELECT doc_id, lang, tok0,
         |         list_distinct(list_transform(sh, s -> ${h64("s")})) AS shl
         |  FROM sh),
         |shn AS (SELECT doc_id, lang, tok0, shl, len(shl) AS nsh FROM shh),
         |tp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM shn a JOIN shn b
         |    ON a.lang = b.lang AND a.tok0 = b.tok0 AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.shl, b.shl))::DOUBLE
         |        / (a.nsh + b.nsh - len(list_intersect(a.shl, b.shl))) >= 0.6),
         |banded AS (
         |  SELECT doc_id, sig, b.band AS band,
         |         array_to_string(sig[(b.band * 4 + 1)::INT:(b.band * 4 + 4)::INT], ',') AS band_key
         |  FROM sig, (SELECT unnest(range(0, 3)) AS band) b),
         |cp AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |           a.sig AS sig_a, b2.sig AS sig_b
         |    FROM banded a JOIN banded b2
         |      ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id)
         |  WHERE len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE >= 0.5),
         |j AS (
         |  SELECT tp.doc_a IS NOT NULL AS t, cp.doc_a IS NOT NULL AS c
         |  FROM tp FULL OUTER JOIN cp
         |    ON tp.doc_a = cp.doc_a AND tp.doc_b = cp.doc_b)
         |SELECT CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
         |       CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
         |       CAST(SUM(CASE WHEN t AND c THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |       ROUND(SUM(CASE WHEN t AND c THEN 1 ELSE 0 END)::DOUBLE
         |             / SUM(CASE WHEN c THEN 1 ELSE 0 END), 4) AS precision,
         |       ROUND(SUM(CASE WHEN t AND c THEN 1 ELSE 0 END)::DOUBLE
         |             / SUM(CASE WHEN t THEN 1 ELSE 0 END), 4) AS recall
         |FROM j""".stripMargin,

    "diag_source_scorecard" ->
      s"""WITH b0 AS (SELECT doc_id, text, lang, source FROM documents),
         |m0 AS (SELECT doc_id + 200000 AS doc_id, text, lang, 'mirror' AS source
         |       FROM b0 WHERE doc_id % 13 = 0),
         |u AS (SELECT * FROM b0 UNION ALL SELECT * FROM m0),
         |tb AS (SELECT doc_id, source, trim(text) AS text,
         |         regexp_split_to_array(trim(text), '\\s+') AS toks
         |       FROM u),
         |q AS (SELECT doc_id, source, text,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_filter(toks, t -> list_contains($stopArr, t))) AS BIGINT) AS n_stop,
         |        list_filter(toks, t -> t <> '') AS words,
         |        len(regexp_extract_all(text, '[^a-z0-9\\s]')) AS n_sym
         |      FROM tb),
         |q2 AS (SELECT doc_id, source, md5(COALESCE(trim(text), '')) AS digest,
         |        CAST(ROUND(ROUND(least(n_tokens::DOUBLE / 100.0, 1.0::DOUBLE) * 0.5
         |          + (n_stop::DOUBLE / n_tokens) * 0.5, 4) * 10000) AS BIGINT) AS q_e4,
         |        CAST(len(words) AS BIGINT) AS n_words,
         |        ROUND(${fold("list_transform(words, t -> strlen(t))", "0::BIGINT", "(x, y) -> x + y")}::DOUBLE
         |          / greatest(len(words), 1), 4) AS mean_word_len,
         |        ROUND(n_sym::DOUBLE / greatest(len(words), 1), 4) AS symbol_ratio,
         |        ROUND(len(list_filter(words, t -> regexp_matches(t, '[a-z]')))::DOUBLE
         |          / greatest(len(words), 1), 4) AS alpha_word_ratio,
         |        CAST(len(list_filter(words, t -> list_contains($stopArr, t))) AS BIGINT) AS n_stop2
         |      FROM q),
         |lb AS (SELECT doc_id, source, digest, q_e4, n_words,
         |         CASE WHEN (n_words >= ${TextAnalysis.GopherMinWords}
         |           AND n_words <= ${TextAnalysis.GopherMaxWords}
         |           AND mean_word_len >= ${TextAnalysis.GopherMinMeanLen}
         |           AND mean_word_len <= ${TextAnalysis.GopherMaxMeanLen}
         |           AND symbol_ratio <= ${TextAnalysis.GopherMaxSymbolRatio}
         |           AND alpha_word_ratio >= ${TextAnalysis.GopherMinAlphaRatio}
         |           AND n_stop2 >= ${TextAnalysis.GopherMinStopHits})
         |           THEN 1 ELSE 0 END AS kept
         |       FROM q2),
         |pd AS (SELECT digest, COUNT(*) AS n_copies FROM lb GROUP BY digest)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |       ROUND(SUM(CASE WHEN n_copies > 1 THEN 1.0 ELSE 0.0 END) / COUNT(*), 4) AS dup_rate,
         |       ROUND(CAST(SUM(kept) AS BIGINT)::DOUBLE / COUNT(*), 4) AS keep_rate,
         |       ROUND(CAST(SUM(q_e4) AS BIGINT)::DOUBLE / (COUNT(*) * 10000.0), 4) AS avg_quality,
         |       ROUND(CAST(SUM(n_words) AS BIGINT)::DOUBLE / COUNT(*), 4) AS avg_words
         |FROM lb JOIN pd USING (digest)
         |GROUP BY source ORDER BY source""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH $baseCte, $augCte, $shCte,
         |shh AS (
         |  SELECT doc_id, lang, tok0,
         |         list_distinct(list_transform(sh, s -> ${h64("s")})) AS shl
         |  FROM sh),
         |shn AS (SELECT doc_id, lang, tok0, shl, len(shl) AS nsh FROM shh)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       ROUND(len(list_intersect(a.shl, b.shl))::DOUBLE
         |             / (a.nsh + b.nsh - len(list_intersect(a.shl, b.shl))), 4) AS jaccard
         |FROM shn a JOIN shn b
         |  ON a.lang = b.lang AND a.tok0 = b.tok0 AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.shl, b.shl))::DOUBLE
         |      / (a.nsh + b.nsh - len(list_intersect(a.shl, b.shl))) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_minhash_sig" ->
      s"""WITH $baseCte, $augCte, $shCte, $sigCte
         |SELECT doc_id, array_to_string(sig, ',') AS sig
         |FROM sig ORDER BY doc_id""".stripMargin,

    "dedup_minhash_pairs" ->
      s"""WITH $baseCte, $augCte, $shCte, $sigCte,
         |banded AS (
         |  SELECT doc_id, sig, b.band AS band,
         |         array_to_string(sig[(b.band * 4 + 1)::INT:(b.band * 4 + 4)::INT], ',') AS band_key
         |  FROM sig, (SELECT unnest(range(0, 3)) AS band) b),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |         a.sig AS sig_a, b2.sig AS sig_b
         |  FROM banded a JOIN banded b2
         |    ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id)
         |SELECT doc_a, doc_b,
         |       ROUND(len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE, 4) AS est_jaccard
         |FROM pairs
         |WHERE len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_edit_verify" ->
      s"""WITH $baseCte, $augCte, $shCte, $sigCte,
         |banded AS (
         |  SELECT doc_id, sig, b.band AS band,
         |         array_to_string(sig[(b.band * 4 + 1)::INT:(b.band * 4 + 4)::INT], ',') AS band_key
         |  FROM sig, (SELECT unnest(range(0, 3)) AS band) b),
         |cpairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         |         a.sig AS sig_a, b2.sig AS sig_b
         |  FROM banded a JOIN banded b2
         |    ON a.band = b2.band AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id),
         |cand AS (
         |  SELECT doc_a, doc_b,
         |         ROUND(len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE, 4) AS est_jaccard
         |  FROM cpairs
         |  WHERE len(list_filter(range(1, 13), i -> sig_a[i::INT] = sig_b[i::INT])) / 12.0::DOUBLE >= 0.5),
         |txt AS (SELECT doc_id, substr(text, 1, 400) AS txt FROM aug)
         |SELECT doc_a, doc_b, est_jaccard,
         |       CAST(levenshtein(ta.txt, tb.txt) AS BIGINT) AS edit_dist,
         |       ROUND(1 - levenshtein(ta.txt, tb.txt)::DOUBLE /
         |             GREATEST(GREATEST(length(ta.txt), length(tb.txt)), 1), 4) AS edit_sim,
         |       (ROUND(1 - levenshtein(ta.txt, tb.txt)::DOUBLE /
         |             GREATEST(GREATEST(length(ta.txt), length(tb.txt)), 1), 4) >= 0.8) AS verified
         |FROM cand JOIN txt ta ON cand.doc_a = ta.doc_id
         |          JOIN txt tb ON cand.doc_b = tb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $baseCte, $augCte,
         |hs AS (SELECT doc_id, list_transform(toks, t -> ${h64("t")}) AS hs FROM aug)
         |SELECT doc_id,
         |  ${fold(
             s"""list_transform(range(0, 48), b ->
                |    CASE WHEN ${fold(
                       "list_transform(hs, h -> CASE WHEN (h >> b::INT) % 2 = 1 THEN 1 ELSE -1 END)",
                       "0", "(x, y) -> x + y")} > 0
                |      THEN (1::BIGINT << b::INT) ELSE 0::BIGINT END)""".stripMargin,
             "0::BIGINT", "(x, y) -> x + y")} AS simhash
         |FROM hs ORDER BY doc_id""".stripMargin,

    "dedup_simhash_pairs" ->
      s"""WITH $baseCte, $augCte,
         |hs AS (SELECT doc_id, list_transform(toks, t -> ${h64("t")}) AS hs FROM aug),
         |sim AS (
         |  SELECT doc_id,
         |    ${fold(
             s"""list_transform(range(0, 48), b ->
                |      CASE WHEN ${fold(
                       "list_transform(hs, h -> CASE WHEN (h >> b::INT) % 2 = 1 THEN 1 ELSE -1 END)",
                       "0", "(x, y) -> x + y")} > 0
                |        THEN (1::BIGINT << b::INT) ELSE 0::BIGINT END)""".stripMargin,
             "0::BIGINT", "(x, y) -> x + y")} AS simhash
         |  FROM hs),
         |chunked AS (
         |  SELECT doc_id, simhash, c.chunk AS chunk,
         |         (simhash >> (c.chunk * 12)::INT) % 4096 AS chunk_val
         |  FROM sim, (SELECT unnest(range(0, 4)) AS chunk) c),
         |tot AS (SELECT COUNT(*) AS n_docs_total FROM sim),
         |freq AS (
         |  SELECT chunk, chunk_val, COUNT(*) AS bucket_docs
         |  FROM chunked GROUP BY chunk, chunk_val),
         |capped AS (
         |  SELECT c.doc_id, c.simhash, c.chunk, c.chunk_val
         |  FROM chunked c JOIN freq f USING (chunk, chunk_val), tot
         |  WHERE f.bucket_docs <= GREATEST(2, CEIL(0.05 * tot.n_docs_total))),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM capped a JOIN capped b
         |    ON a.chunk = b.chunk AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
         |FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 6
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_embedding" ->
      s"""WITH ve AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
         |vaug AS (
         |  SELECT vec_id, label, vec FROM ve
         |  UNION ALL
         |  SELECT vec_id + 100000, label,
         |         list_concat([vec[1] + 0.05::DOUBLE], vec[2:len(vec)])
         |  FROM ve WHERE vec_id % 11 = 0),
         |vs AS (SELECT vec_id, label, vec, ${dotD("vec", "vec")} AS sq FROM vaug)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       ROUND(${dotD("a.vec", "b.vec")} / sqrt(a.sq * b.sq), 6) AS cos
         |FROM vs a JOIN vs b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${dotD("a.vec", "b.vec")} / sqrt(a.sq * b.sq) >= 0.995
         |ORDER BY vec_a, vec_b""".stripMargin,

    "dedup_embedding_lsh" ->
      s"""WITH ve AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
         |vaug AS (
         |  SELECT vec_id, label, vec FROM ve
         |  UNION ALL
         |  SELECT vec_id + 100000, label,
         |         list_concat([vec[1] + 0.05::DOUBLE], vec[2:len(vec)])
         |  FROM ve WHERE vec_id % 11 = 0),
         |vs AS (SELECT vec_id, vec, ${dotD("vec", "vec")} AS sq FROM vaug),
         |planes AS (
         |  SELECT p.p AS p, list_transform(range(0, 64),
         |    d -> ((${h64("'hp' || p.p || '_' || d")} % 2001) - 1000)::DOUBLE / 1000.0::DOUBLE) AS w
         |  FROM (SELECT unnest(range(0, 6)) AS p) p),
         |vb AS (
         |  SELECT vs.vec_id, vs.vec, vs.sq,
         |         SUM(CASE WHEN ${dotD("vs.vec", "planes.w")} > 0.0::DOUBLE
         |               THEN (1 << planes.p::INT) ELSE 0 END) AS bucket
         |  FROM vs, planes GROUP BY vs.vec_id, vs.vec, vs.sq)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       ROUND(${dotD("a.vec", "b.vec")} / sqrt(a.sq * b.sq), 6) AS cos
         |FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${dotD("a.vec", "b.vec")} / sqrt(a.sq * b.sq) >= 0.995
         |ORDER BY vec_a, vec_b""".stripMargin,

    "decon_spans" -> {
      val n = graft.operators.Contamination.NgramN
      s"""WITH $baseCte, $augCte, $ngram8Cte,
         |ev AS (
         |  SELECT DISTINCT unnest(shl) AS h FROM ngn
         |  WHERE doc_id < 100000 AND doc_id % ${graft.operators.Contamination.EvalModulus} = 0),
         |pgx AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(toks) - ${n - 2}),
         |           i -> {'pos': i - 1,
         |                 'gram': array_to_string(toks[i::INT:(i + ${n - 1})::INT], ' ')})) AS pg
         |  FROM aug
         |  WHERE len(toks) >= $n
         |    AND NOT (doc_id < 100000 AND doc_id % ${graft.operators.Contamination.EvalModulus} = 0)),
         |px AS (SELECT doc_id, pg.pos AS pos, ${h64("pg.gram")} AS h FROM pgx),
         |j AS (SELECT px.doc_id, px.pos FROM px JOIN ev ON px.h = ev.h),
         |g AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_positions,
         |         CAST(MIN(pos) AS BIGINT) AS first_word,
         |         CAST(MAX(pos) + ${n - 1} AS BIGINT) AS last_word,
         |         list_sort(list(pos)) AS ps
         |  FROM j GROUP BY doc_id)
         |SELECT doc_id, n_hit_positions, first_word, last_word,
         |       CAST(CASE WHEN len(ps) < 2 THEN 1
         |         ELSE 1 + len(list_filter(
         |           list_transform(range(1, len(ps)),
         |             k -> ps[(k + 1)::INT] - ps[k::INT]),
         |           d -> d > $n)) END AS BIGINT) AS n_spans
         |FROM g ORDER BY doc_id""".stripMargin
    },

    "dedup_semdedup" ->
      s"""WITH ve AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
         |vaug AS (
         |  SELECT vec_id, label, vec FROM ve
         |  UNION ALL
         |  SELECT vec_id + 100000, label,
         |         list_concat([vec[1] + 0.05::DOUBLE], vec[2:len(vec)])
         |  FROM ve WHERE vec_id % 11 = 0),
         |vs AS (SELECT vec_id, vec, ${dotD("vec", "vec")} AS sq FROM vaug),
         |cents AS (
         |  SELECT vec_id - 100 AS centroid_id, vec AS cvec, sq AS csq
         |  FROM vs WHERE vec_id >= 100 AND vec_id < 100 + ${kCentSub("vs")}),
         |assign AS (
         |  SELECT vec_id, vec, sq, centroid_id AS cell, cs AS cent_cos FROM (
         |    SELECT vs.vec_id, vs.vec, vs.sq, c.centroid_id,
         |           ${dotD("vs.vec", "c.cvec")} / sqrt(vs.sq * c.csq) AS cs,
         |           ROW_NUMBER() OVER (PARTITION BY vs.vec_id
         |             ORDER BY ${dotD("vs.vec", "c.cvec")} / sqrt(vs.sq * c.csq) DESC,
         |                      c.centroid_id) AS crank
         |    FROM vs, cents c) t WHERE crank = 1),
         |assignb AS (
         |  SELECT *, $cellBlkExpr AS cell_blk FROM assign),
         |dropped AS (
         |  SELECT DISTINCT a.vec_id
         |  FROM assignb a JOIN assignb b ON a.cell_blk = b.cell_blk AND a.vec_id <> b.vec_id
         |  WHERE ${dotD("a.vec", "b.vec")} / sqrt(a.sq * b.sq) >= 0.96
         |    AND (b.cent_cos < a.cent_cos
         |         OR (b.cent_cos = a.cent_cos AND b.vec_id < a.vec_id)))
         |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
         |       ROUND(a.cent_cos, 6) AS cent_cos, (d.vec_id IS NULL) AS kept
         |FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    "sim_doc_topk" -> {
      val cells = (0 until 16)
        .map(d => s"SUM(CASE WHEN dim = $d THEN val ELSE 0 END)")
        .mkString("[", ", ", "]::DOUBLE[]")
      s"""WITH $baseCte,
         |f AS (
         |  SELECT doc_id, ${h64("tok")} % 16 AS dim,
         |         CASE WHEN ${h64("'s#' || tok")} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM base) t
         |  WHERE tok <> ''),
         |fh AS (SELECT doc_id, dim, SUM(sgn) AS val FROM f GROUP BY 1, 2),
         |dense AS (SELECT doc_id, $cells AS vec FROM fh GROUP BY doc_id),
         |vv AS (
         |  SELECT doc_id, vec, ${dotD("vec", "vec", 16)} AS sq FROM dense
         |  WHERE ${dotD("vec", "vec", 16)} > 0.0),
         |q AS (SELECT doc_id AS query_id, vec AS qvec, sq AS qsq FROM vv WHERE doc_id < 3),
         |scored AS (
         |  SELECT q.query_id, vv.doc_id,
         |         ${dotD("vv.vec", "q.qvec", 16)} / sqrt(vv.sq * q.qsq) AS cos
         |  FROM vv, q WHERE vv.doc_id <> q.query_id),
         |r AS (SELECT query_id, doc_id, cos,
         |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, ROUND(cos, 6) AS cos
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    // Hybrid retrieval: BM25 leg (identical expressions to text_bm25) +
    // semantic leg (identical hashed-dense/cosine expressions to
    // sim_doc_topk, query vector built from the same fixed query text),
    // fused with reciprocal-rank fusion over the top-legK of each leg.
    "ret_hybrid_rrf" -> {
      val cells = (0 until 16)
        .map(d => s"SUM(CASE WHEN dim = $d THEN val ELSE 0 END)")
        .mkString("[", ", ", "]::DOUBLE[]")
      val qterms = TextAnalysis.Bm25Terms.map(t => s"'$t'").mkString("[", ", ", "]")
      val legK = Similarity.RrfLegK
      val rrfK = Similarity.RrfConst
      s"""WITH $baseCte,
         |t AS (SELECT doc_id, toks, len(toks)::DOUBLE AS dl FROM base),
         |stats AS (
         |  SELECT COUNT(*)::DOUBLE AS n_docs, SUM(dl) AS sum_dl,
         |         ${TextAnalysis.Bm25Terms.map(t =>
              s"SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END)::DOUBLE AS df_$t")
              .mkString(",\n         ")}
         |  FROM t),
         |tf AS (
         |  SELECT t.doc_id, t.dl, s.n_docs, s.sum_dl,
         |         ${TextAnalysis.Bm25Terms.map(t => s"s.df_$t AS df_$t").mkString(", ")},
         |         ${TextAnalysis.Bm25Terms.map(t =>
              s"len(list_filter(toks, x -> x = '$t'))::DOUBLE AS tf_$t")
              .mkString(",\n         ")}
         |  FROM t, stats s),
         |scored AS (
         |  SELECT doc_id,
         |         ROUND(${TextAnalysis.Bm25Terms.map(bm25Term).mkString("\n         + ")}, 4) AS bm25
         |  FROM tf),
         |lex AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
         |  FROM scored WHERE bm25 > 0 QUALIFY lex_rank <= $legK),
         |f AS (
         |  SELECT doc_id, ${h64("tok")} % 16 AS dim,
         |         CASE WHEN ${h64("'s#' || tok")} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM base) x WHERE tok <> ''),
         |fh AS (SELECT doc_id, dim, SUM(sgn) AS val FROM f GROUP BY 1, 2),
         |dense AS (SELECT doc_id, $cells AS vec FROM fh GROUP BY doc_id),
         |vv AS (
         |  SELECT doc_id, vec, ${dotD("vec", "vec", 16)} AS sq FROM dense
         |  WHERE ${dotD("vec", "vec", 16)} > 0.0),
         |qf AS (
         |  SELECT ${h64("tok")} % 16 AS dim,
         |         CASE WHEN ${h64("'s#' || tok")} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT unnest($qterms) AS tok) qt),
         |qfh AS (SELECT dim, SUM(sgn) AS val FROM qf GROUP BY dim),
         |qv AS (SELECT $cells AS qvec FROM qfh),
         |qvn AS (SELECT qvec, ${dotD("qvec", "qvec", 16)} AS qsq FROM qv),
         |cs AS (
         |  SELECT vv.doc_id,
         |         ${dotD("vv.vec", "q.qvec", 16)} / sqrt(vv.sq * q.qsq) AS cos
         |  FROM vv, qvn q),
         |sem AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
         |  FROM cs QUALIFY sem_rank <= $legK),
         |fu AS (
         |  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
         |         ROUND(COALESCE(1.0::DOUBLE / ($rrfK + l.lex_rank), 0.0::DOUBLE)
         |             + COALESCE(1.0::DOUBLE / ($rrfK + s.sem_rank), 0.0::DOUBLE), 6) AS rrf
         |  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
         |SELECT doc_id, COALESCE(lex_rank, -1)::BIGINT AS lex_rank,
         |       COALESCE(sem_rank, -1)::BIGINT AS sem_rank, rrf
         |FROM fu ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
    },

    "sim_topk_brute" ->
      s"""WITH $vecCte,
         |q AS (SELECT vec_id AS query_id, vec AS qvec, sq AS qsq FROM vn WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, vn.vec_id,
         |         ${dotD("vn.vec", "q.qvec")} / sqrt(vn.sq * q.qsq) AS cos
         |  FROM vn, q WHERE vn.vec_id <> q.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, ROUND(cos, 6) AS cos
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_topk_lsh" ->
      s"""WITH $vecCte, $lshBucketCtes,
         |scored AS (
         |  SELECT q.query_id, vb.vec_id,
         |         ${dotD("vb.vec", "q.qvec")} / sqrt(vb.sq * q.qsq) AS cos
         |  FROM vb, q WHERE vb.bucket = q.qbucket AND vb.vec_id <> q.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, ROUND(cos, 6) AS cos
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_rp_project" ->
      s"""WITH $vecCte, $rpCte
         |SELECT vn.vec_id, CAST(rp.j AS BIGINT) AS dim,
         |       ROUND(${dotD("vn.vec", "rp.w")} / sqrt(${Similarity.RpDims}.0), 6) AS proj_val
         |FROM vn, rp ORDER BY vec_id, dim""".stripMargin,

    "sim_topk_rp" ->
      s"""WITH $vecCte, $rpCte,
         |pv AS (
         |  SELECT vn.vec_id, vn.vec, vn.sq,
         |         list(${dotD("vn.vec", "rp.w")} ORDER BY rp.j) AS pvec
         |  FROM vn, rp GROUP BY vn.vec_id, vn.vec, vn.sq),
         |pvn AS (
         |  SELECT vec_id, vec, sq, pvec,
         |         ${dotD("pvec", "pvec", Similarity.RpDims)} AS psq
         |  FROM pv),
         |q AS (
         |  SELECT vec_id AS query_id, vec AS qvec, sq AS qsq,
         |         pvec AS qpvec, psq AS qpsq
         |  FROM pvn WHERE vec_id < 5),
         |coarse AS (
         |  SELECT q.query_id, v.vec_id, v.vec, v.sq, q.qvec, q.qsq,
         |         ROW_NUMBER() OVER (PARTITION BY q.query_id
         |           ORDER BY ${dotD("v.pvec", "q.qpvec", Similarity.RpDims)}
         |                    / sqrt(v.psq * q.qpsq) DESC, v.vec_id) AS prank
         |  FROM pvn v, q WHERE v.vec_id <> q.query_id),
         |rer AS (
         |  SELECT query_id, vec_id,
         |         ${dotD("vec", "qvec")} / sqrt(sq * qsq) AS cos
         |  FROM coarse WHERE prank <= 100),
         |r AS (SELECT query_id, vec_id, cos,
         |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
         |      FROM rer)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, ROUND(cos, 6) AS cos
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_topk_sq8" ->
      s"""WITH $vecCte,
         |s8 AS (
         |  SELECT vec_id, sq, vec,
         |         greatest(${fold("list_transform(vec, x -> abs(x))",
                   "0.0::DOUBLE", "(m, x) -> greatest(m, x)")}, 1e-12)
         |           / CAST(127 AS DOUBLE) AS scale
         |  FROM vn),
         |c8 AS (
         |  SELECT vec_id, sq, scale,
         |         list_transform(vec, x -> floor(x / scale + CAST(0.5 AS DOUBLE))) AS code
         |  FROM s8),
         |q AS (SELECT vec_id AS query_id, code AS qcode, scale AS qscale, sq AS qsq
         |      FROM c8 WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, c.vec_id,
         |         (c.scale * q.qscale) * ${dotD("c.code", "q.qcode")}
         |           / sqrt(c.sq * q.qsq) AS cos
         |  FROM c8 c, q WHERE c.vec_id <> q.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, ROUND(cos, 6) AS cos
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_topk_lsh_mp" ->
      s"""WITH $vecCte, $lshBucketCtes,
         |probes AS (
         |  SELECT query_id, qvec, qsq,
         |         unnest([qbucket, xor(qbucket, 1), xor(qbucket, 2), xor(qbucket, 4),
         |                 xor(qbucket, 8), xor(qbucket, 16), xor(qbucket, 32)]) AS bucket
         |  FROM q),
         |scored AS (
         |  SELECT p.query_id, vb.vec_id,
         |         ${dotD("vb.vec", "p.qvec")} / sqrt(vb.sq * p.qsq) AS cos
         |  FROM vb, probes p WHERE vb.bucket = p.bucket AND vb.vec_id <> p.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, ROUND(cos, 6) AS cos
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_topk_ivf" ->
      s"""WITH $vecCte,
         |cents AS (
         |  SELECT vec_id - 100 AS centroid_id, vec AS cvec, sq AS csq
         |  FROM vn WHERE vec_id >= 100 AND vec_id < 100 + ${kCentQuerySub("vn")}),
         |assign AS (
         |  SELECT vec_id, vec, sq, centroid_id AS cell FROM (
         |    SELECT vn.vec_id, vn.vec, vn.sq, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${dotD("vn.vec", "c.cvec")} / sqrt(vn.sq * c.csq) DESC,
         |                      c.centroid_id) AS crank
         |    FROM vn, cents c) t WHERE crank = 1),
         |probes AS (
         |  SELECT query_id, qvec, qsq, centroid_id AS cell FROM (
         |    SELECT q.vec_id AS query_id, q.vec AS qvec, q.sq AS qsq, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${dotD("q.vec", "c.cvec")} / sqrt(q.sq * c.csq) DESC,
         |                      c.centroid_id) AS crank
         |    FROM vn q, cents c WHERE q.vec_id < 5) t WHERE crank <= 2),
         |scored AS (
         |  SELECT p.query_id, a.vec_id,
         |         ${dotD("a.vec", "p.qvec")} / sqrt(a.sq * p.qsq) AS cos
         |  FROM assign a JOIN probes p ON a.cell = p.cell
         |  WHERE a.vec_id <> p.query_id),
         |r AS (SELECT query_id, vec_id, cos,
         |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, ROUND(cos, 6) AS cos
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "mm_decode_meta" ->
      s"""WITH $mediaCte
         |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(CASE WHEN kind = 'image'
         |                     THEN width::BIGINT * height * 3
         |                     WHEN kind = 'audio'
         |                     THEN (${Multimodal.AudioBaseSamples} + media_id % ${Multimodal.AudioSampleMod}) * 2
         |                     ELSE strlen(payload) END) AS BIGINT) AS total_bytes,
         |       ROUND(AVG(width), 4) AS avg_width,
         |       ROUND(AVG(height), 4) AS avg_height,
         |       ROUND(AVG(duration_ms), 4) AS avg_duration_ms
         |FROM m GROUP BY kind ORDER BY kind""".stripMargin,

    // Image rows: the Spark side ImageIO-decodes a real PNG; PNG is
    // lossless, so the decoded pixel statistics must equal the synthetic
    // raster's closed form, which is what this computes — green here IS
    // the proof the codec round trip recovered every pixel. Coefficients
    // forced ::DOUBLE (DuckDB parses bare 0.299 as DECIMAL) so the luma
    // arithmetic is the identical IEEE expression the operator runs.
    // Audio rows: same structure — the Spark side AudioSystem-decodes a
    // real WAV, and the sample statistics here come from the shared
    // closed form (audioSampleValueSql), so green proves the PCM round
    // trip recovered every sample.
    "mm_features" ->
      s"""WITH $mediaCte,
         |xs AS (SELECT unnest(range(0, 32 + 97)) AS i),
         |ys AS (SELECT unnest(range(0, 32 + 53)) AS j),
         |px AS (
         |  SELECT media_id,
         |         $imgChannelCols
         |  FROM m, xs x, ys y
         |  WHERE m.kind = 'image' AND x.i < m.width AND y.j < m.height),
         |ist AS (
         |  SELECT media_id,
         |         SUM(r)::DOUBLE / COUNT(*) AS mr,
         |         SUM(g)::DOUBLE / COUNT(*) AS mg,
         |         SUM(b)::DOUBLE / COUNT(*) AS mb,
         |         MIN(0.299::DOUBLE * r + 0.587::DOUBLE * g + 0.114::DOUBLE * b) AS minl,
         |         MAX(0.299::DOUBLE * r + 0.587::DOUBLE * g + 0.114::DOUBLE * b) AS maxl
         |  FROM px GROUP BY media_id),
         |img AS (
         |  SELECT m.media_id, m.kind,
         |         (m.width::BIGINT * m.height * 3) AS n_bytes,
         |         ROUND(m.width::DOUBLE, 6) AS f0, ROUND(m.height::DOUBLE, 6) AS f1,
         |         ROUND(mr, 6) AS f2, ROUND(mg, 6) AS f3, ROUND(mb, 6) AS f4,
         |         ROUND(0.299::DOUBLE * mr + 0.587::DOUBLE * mg + 0.114::DOUBLE * mb, 6) AS f5,
         |         ROUND(minl, 6) AS f6, ROUND(maxl, 6) AS f7
         |  FROM m JOIN ist USING (media_id)),
         |sm AS (
         |  SELECT media_id, (${Multimodal.AudioBaseSamples} + media_id % ${Multimodal.AudioSampleMod})::BIGINT AS ns,
         |         unnest(range(0, ${Multimodal.AudioBaseSamples} + media_id % ${Multimodal.AudioSampleMod})) AS i
         |  FROM m WHERE kind = 'audio'),
         |sv AS (
         |  SELECT media_id, ns, i,
         |         ${Multimodal.audioSampleValueSql("i")} AS v,
         |         CASE WHEN i > 0 THEN ${Multimodal.audioSampleValueSql("(i-1)")} END AS pv
         |  FROM sm),
         |ast AS (
         |  SELECT media_id, MAX(ns) AS ns,
         |         SUM(v)::DOUBLE / COUNT(*) AS mean,
         |         SUM(abs(v))::DOUBLE / COUNT(*) AS meanabs,
         |         MIN(v) AS minv, MAX(v) AS maxv,
         |         SUM(CASE WHEN pv IS NOT NULL
         |                   AND ((pv < 0 AND v >= 0) OR (pv >= 0 AND v < 0))
         |                  THEN 1 ELSE 0 END) AS zc,
         |         sqrt(SUM(v*v)::DOUBLE / COUNT(*)) AS rms
         |  FROM sv GROUP BY media_id),
         |aud AS (
         |  SELECT m.media_id, m.kind, (a.ns * 2)::BIGINT AS n_bytes,
         |         ROUND(a.ns::DOUBLE, 6) AS f0,
         |         ROUND(${Multimodal.AudioSampleRate.toDouble}::DOUBLE, 6) AS f1,
         |         ROUND(mean, 6) AS f2, ROUND(meanabs, 6) AS f3,
         |         ROUND(minv::DOUBLE, 6) AS f4, ROUND(maxv::DOUBLE, 6) AS f5,
         |         ROUND(zc::DOUBLE, 6) AS f6, ROUND(rms, 6) AS f7
         |  FROM m JOIN ast a USING (media_id)),
         |m2 AS (SELECT media_id, kind, payload, strlen(payload) AS n,
         |              greatest((strlen(payload) + 7) // 8, 1) AS cl
         |       FROM m WHERE kind = 'video'),
         |av AS (SELECT media_id, kind, CAST(n AS BIGINT) AS n_bytes,
         |       $featureCols
         |       FROM m2)
         |SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM av
         |ORDER BY media_id""".stripMargin,

    "mm_frame_sample" ->
      s"""WITH $mediaCte,
         |m2 AS (SELECT media_id, payload, strlen(payload) AS n FROM m WHERE kind = 'video')
         |SELECT media_id, CAST(f.i AS BIGINT) AS frame_idx,
         |       md5(substr(payload, (f.i * (n // 8) + 1)::INT, 16)) AS frame_md5
         |FROM m2, (SELECT unnest(range(0, 8)) AS i) f
         |ORDER BY media_id, frame_idx""".stripMargin,

    "mm_frame_dedup" ->
      s"""WITH $mediaCte,
         |m2 AS (SELECT media_id, payload, strlen(payload) AS n FROM m WHERE kind = 'video'),
         |fr AS (
         |  SELECT media_id,
         |         md5(substr(payload, (f.i * (n // 8) + 1)::INT, 16)) AS frame_md5
         |  FROM m2, (SELECT unnest(range(0, 8)) AS i) f)
         |SELECT frame_md5, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         |       CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
         |       MIN(media_id) AS first_media_id
         |FROM fr GROUP BY frame_md5 HAVING COUNT(*) > 1
         |ORDER BY frame_md5""".stripMargin,

    "clean_boilerplate" ->
      s"""WITH $baseCte, $augCte,
         |w AS (
         |  SELECT doc_id, list_filter(toks, t -> t <> '') AS words FROM aug
         |  WHERE len(list_filter(toks, t -> t <> '')) > 0),
         |ci AS (
         |  SELECT doc_id, words,
         |         unnest(range(0, CAST(ceil(len(words) / 8.0) AS INT))) AS i
         |  FROM w),
         |cd AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |         words[(i*8+1)::INT:(i*8+8)::INT] AS chunk_toks,
         |         md5(array_to_string(words[(i*8+1)::INT:(i*8+8)::INT], ' ')) AS digest
         |  FROM ci),
         |bad AS (
         |  SELECT digest FROM cd GROUP BY digest
         |  HAVING COUNT(DISTINCT doc_id) >= ${graft.operators.Cleaning.MinDocs}),
         |mk AS (SELECT cd.*, cd.digest IN (SELECT digest FROM bad) AS boiler FROM cd)
         |SELECT doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |       CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |       CAST(SUM(CASE WHEN boiler THEN 0 ELSE len(chunk_toks) END) AS BIGINT) AS clean_n_words,
         |       md5(coalesce(string_agg(array_to_string(chunk_toks, ' '), ' '
         |                               ORDER BY chunk_idx)
         |                      FILTER (WHERE NOT boiler), '')) AS clean_digest
         |FROM mk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "decon_fuzzy" ->
      s"""WITH $baseCte, $augCte, $shCte, $sigCte,
         |banded AS (
         |  SELECT doc_id, sig, b.band AS band,
         |         array_to_string(sig[(b.band * 4 + 1)::INT:(b.band * 4 + 4)::INT], ',') AS band_key
         |  FROM sig, (SELECT unnest(range(0, 3)) AS band) b),
         |ev AS (
         |  SELECT band, band_key, doc_id AS eval_doc_id, sig AS eval_sig FROM banded
         |  WHERE doc_id < 100000 AND doc_id % 50 = 0),
         |tr AS (
         |  SELECT band, band_key, doc_id, sig FROM banded
         |  WHERE NOT (doc_id < 100000 AND doc_id % 50 = 0)),
         |pairs AS (
         |  SELECT DISTINCT tr.doc_id, ev.eval_doc_id, tr.sig, ev.eval_sig
         |  FROM tr JOIN ev USING (band, band_key)),
         |est AS (
         |  SELECT doc_id, eval_doc_id,
         |         len(list_filter(range(1, 13), i -> sig[i::INT] = eval_sig[i::INT])) / 12.0::DOUBLE AS est
         |  FROM pairs)
         |SELECT doc_id,
         |       CAST(COUNT(DISTINCT eval_doc_id) AS BIGINT) AS n_eval_hits,
         |       ROUND(MAX(est), 4) AS best_est_jaccard
         |FROM est WHERE est >= 0.5
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      s"""WITH $baseCte,
         |tk AS (SELECT doc_id, tok FROM
         |         (SELECT doc_id, unnest(toks) AS tok FROM base) WHERE tok <> ''),
         |tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2),
         |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
         |sc AS (
         |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |         CAST(ROUND(ln((n.n_docs + 1)::DOUBLE / (df.df + 1)::DOUBLE)
         |           * 1000000) AS BIGINT) AS idf_micro
         |  FROM tf JOIN df USING (tok) CROSS JOIN n),
         |rk AS (
         |  SELECT doc_id, tok, tf, df,
         |         CAST(tf * idf_micro AS BIGINT) AS tfidf_micro,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY tf * idf_micro DESC, tok) AS rk
         |  FROM sc)
         |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tf, df, tfidf_micro
         |FROM rk WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "cur_epochs" ->
      s"""WITH c AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS tokens
         |  FROM documents GROUP BY source),
         |tot AS (
         |  SELECT SUM(tokens)::DOUBLE AS tott,
         |         ${fold("list(sqrt(tokens::DOUBLE) ORDER BY source)", "0.0::DOUBLE",
                "(x, y) -> x + y")} AS sumw
         |  FROM c),
         |r AS (
         |  SELECT c.source,
         |         CAST(floor((t.tott * 2.0 * (sqrt(c.tokens::DOUBLE) / t.sumw)
         |                     / c.tokens::DOUBLE) * 1000000) AS BIGINT) AS epochs_micro
         |  FROM c, tot t),
         |e AS (
         |  SELECT d.source, r.epochs_micro,
         |         len(regexp_split_to_array(trim(d.text), '\\s+')) AS n_toks,
         |         (r.epochs_micro // 1000000) +
         |           CASE WHEN ${h64("d.doc_id::VARCHAR || '#epoch1'")} % 1000000
         |                     < r.epochs_micro % 1000000
         |             THEN 1 ELSE 0 END AS n_emit
         |  FROM documents d JOIN r ON d.source = r.source)
         |SELECT source, MAX(epochs_micro) AS epochs_micro,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
         |       CAST(SUM(n_emit) AS BIGINT) AS n_emitted,
         |       ROUND(SUM(n_emit)::DOUBLE / COUNT(*), 4) AS realized_epochs
         |FROM e GROUP BY source ORDER BY source""".stripMargin,

    // identical SQL to sim_ivf_stats on purpose: DuckDB computes the flat
    // argmax while Spark runs the two-level plan, so green = bit-identical
    "sim_ivf_twolevel" ->
      s"""WITH $vecCte,
         |cents AS (
         |  SELECT vec_id - 100 AS centroid_id, vec AS cvec, sq AS csq
         |  FROM vn WHERE vec_id >= 100 AND vec_id < 100 + ${kCentSub("vn")}),
         |assign AS (
         |  SELECT vec_id, centroid_id AS cell FROM (
         |    SELECT vn.vec_id, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${dotD("vn.vec", "c.cvec")} / sqrt(vn.sq * c.csq) DESC,
         |                      c.centroid_id) AS crank
         |    FROM vn, cents c) t WHERE crank = 1),
         |a AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM assign GROUP BY cell)
         |SELECT cell, n_vecs,
         |       ROUND(n_vecs::DOUBLE / SUM(n_vecs) OVER (), 6) AS share,
         |       ROUND(n_vecs::DOUBLE * COUNT(*) OVER () / SUM(n_vecs) OVER (), 4) AS balance
         |FROM a ORDER BY cell""".stripMargin,

    // per-cell geometric quality: cosine to own + runner-up centroid per
    // vector (crank 1 and 2 of the same (cos desc, centroid_id) ranking
    // the argmax uses), means as exact micro-unit integer sums — mirrors
    // Similarity.cellQuality
    "sim_cell_quality" ->
      s"""WITH $vecCte,
         |cents AS (
         |  SELECT vec_id - 100 AS centroid_id, vec AS cvec, sq AS csq
         |  FROM vn WHERE vec_id >= 100 AND vec_id < 100 + ${kCentSub("vn")}),
         |ranked AS (
         |  SELECT vn.vec_id, c.centroid_id,
         |         ${dotD("vn.vec", "c.cvec")} / sqrt(vn.sq * c.csq) AS cos,
         |         ROW_NUMBER() OVER (PARTITION BY vn.vec_id
         |           ORDER BY ${dotD("vn.vec", "c.cvec")} / sqrt(vn.sq * c.csq) DESC,
         |                    c.centroid_id) AS crank
         |  FROM vn, cents c),
         |t2 AS (
         |  SELECT vec_id,
         |         MAX(CASE WHEN crank = 1 THEN centroid_id END) AS cell,
         |         MAX(CASE WHEN crank = 1
         |               THEN CAST(FLOOR(cos * 1000000) AS BIGINT) END) AS own_u,
         |         MAX(CASE WHEN crank = 2
         |               THEN CAST(FLOOR(cos * 1000000) AS BIGINT) END) AS nn_u
         |  FROM ranked WHERE crank <= 2 GROUP BY vec_id)
         |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |       ROUND(SUM(own_u)::DOUBLE / COUNT(*) / 1000000, 6) AS intra_cos,
         |       ROUND(SUM(nn_u)::DOUBLE / COUNT(*) / 1000000, 6) AS nn_cos,
         |       ROUND((SUM(own_u) - SUM(nn_u))::DOUBLE / COUNT(*) / 1000000, 6) AS margin
         |FROM t2 GROUP BY cell ORDER BY cell""".stripMargin,

    "sim_ivf_stats" ->
      s"""WITH $vecCte,
         |cents AS (
         |  SELECT vec_id - 100 AS centroid_id, vec AS cvec, sq AS csq
         |  FROM vn WHERE vec_id >= 100 AND vec_id < 100 + ${kCentSub("vn")}),
         |assign AS (
         |  SELECT vec_id, centroid_id AS cell FROM (
         |    SELECT vn.vec_id, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${dotD("vn.vec", "c.cvec")} / sqrt(vn.sq * c.csq) DESC,
         |                      c.centroid_id) AS crank
         |    FROM vn, cents c) t WHERE crank = 1),
         |a AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM assign GROUP BY cell)
         |SELECT cell, n_vecs,
         |       ROUND(n_vecs::DOUBLE / SUM(n_vecs) OVER (), 6) AS share,
         |       ROUND(n_vecs::DOUBLE * COUNT(*) OVER () / SUM(n_vecs) OVER (), 4) AS balance
         |FROM a ORDER BY cell""".stripMargin,

    "sim_chunk_topk" -> {
      val cells = (0 until 16)
        .map(d => s"SUM(CASE WHEN dim = $d THEN val ELSE 0 END)")
        .mkString("[", ", ", "]::DOUBLE[]")
      s"""WITH $baseCte,
         |wd AS (
         |  SELECT doc_id, list_filter(toks, t -> t <> '') AS words FROM base
         |  WHERE len(list_filter(toks, t -> t <> '')) > 0),
         |ci AS (
         |  SELECT doc_id, words,
         |         unnest(range(0, CAST(ceil(len(words) / 32.0) AS INT))) AS i
         |  FROM wd),
         |cf AS (
         |  SELECT cid, ${h64("tok")} % 16 AS dim,
         |         CASE WHEN ${h64("'s#' || tok")} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT doc_id * ${Similarity.ChunkIdStride} + i AS cid,
         |               unnest(words[(i*32+1)::INT:(i*32+32)::INT]) AS tok
         |        FROM ci) t
         |  WHERE tok <> ''),
         |cfh AS (SELECT cid, dim, SUM(sgn) AS val FROM cf GROUP BY 1, 2),
         |cdense AS (SELECT cid, $cells AS vec FROM cfh GROUP BY cid),
         |cv AS (
         |  SELECT cid, vec, ${dotD("vec", "vec", 16)} AS sq FROM cdense
         |  WHERE ${dotD("vec", "vec", 16)} > 0.0),
         |qf AS (
         |  SELECT doc_id, ${h64("tok")} % 16 AS dim,
         |         CASE WHEN ${h64("'s#' || tok")} % 2 = 0 THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM base) t
         |  WHERE tok <> ''),
         |qfh AS (SELECT doc_id, dim, SUM(sgn) AS val FROM qf GROUP BY 1, 2),
         |qdense AS (SELECT doc_id, $cells AS vec FROM qfh GROUP BY doc_id),
         |q AS (
         |  SELECT doc_id AS query_id, vec AS qvec, ${dotD("vec", "vec", 16)} AS qsq
         |  FROM qdense WHERE doc_id < 3 AND ${dotD("vec", "vec", 16)} > 0.0),
         |scored AS (
         |  SELECT q.query_id, cv.cid,
         |         ${dotD("cv.vec", "q.qvec", 16)} / sqrt(cv.sq * q.qsq) AS cos
         |  FROM cv, q WHERE cv.cid // ${Similarity.ChunkIdStride} <> q.query_id),
         |r AS (SELECT query_id, cid, cos,
         |        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cid) AS rank
         |      FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank,
         |       cid // ${Similarity.ChunkIdStride} AS doc_id, cid % ${Similarity.ChunkIdStride} AS chunk_idx, ROUND(cos, 6) AS cos
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },

    "sim_hard_negatives" ->
      s"""WITH $vecCte,
         |cents AS (
         |  SELECT vec_id - 100 AS centroid_id, vec AS cvec, sq AS csq
         |  FROM vn WHERE vec_id >= 100 AND vec_id < 100 + ${kCentSub("vn")}),
         |assign AS (
         |  SELECT vec_id, label, vec, sq, centroid_id AS cell FROM (
         |    SELECT vn.vec_id, vn.label, vn.vec, vn.sq, c.centroid_id,
         |           ROW_NUMBER() OVER (PARTITION BY vn.vec_id
         |             ORDER BY ${dotD("vn.vec", "c.cvec")} / sqrt(vn.sq * c.csq) DESC,
         |                      c.centroid_id) AS crank
         |    FROM vn, cents c) t WHERE crank = 1),
         |assignb AS (
         |  SELECT *, $cellBlkExpr AS cell_blk FROM assign),
         |p AS (
         |  SELECT a.vec_id, a.label, a.cell, b.vec_id AS neg_id, b.label AS neg_label,
         |         ${dotD("a.vec", "b.vec")} / sqrt(a.sq * b.sq) AS cos
         |  FROM assignb a JOIN assignb b
         |    ON a.cell_blk = b.cell_blk AND a.vec_id <> b.vec_id AND a.label <> b.label),
         |r AS (SELECT vec_id, label, cell, neg_id, neg_label, cos,
         |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, neg_id) AS rk
         |      FROM p)
         |SELECT vec_id, label, cell, neg_id, neg_label, ROUND(cos, 6) AS cos
         |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin
  )

  /** One greedy k-center round for the `cur_kcenter` mirror: s{r} picks the
    * farthest-point center out of d{r} (max min-distance, vec_id
    * tie-break); d{r+1} folds the new center into every vector's
    * min-distance. min is exact in any order, so the unrolled chain equals
    * the Spark driver loop bit-for-bit. */
  private def kcenterRoundCtes(r: Int): String =
    s"""s$r AS (
       |  SELECT vec_id, vec, sq, dist FROM (
       |    SELECT d.vec_id, vn.vec, vn.sq, d.dist,
       |           ROW_NUMBER() OVER (ORDER BY d.dist DESC, d.vec_id) AS rn
       |    FROM d$r d JOIN vn USING (vec_id)) t WHERE rn = 1),
       |d${r + 1} AS (
       |  SELECT d.vec_id,
       |         least(d.dist,
       |               1 - ${dotD("vn.vec", "s.vec")} / sqrt(vn.sq * s.sq)) AS dist
       |  FROM d$r d JOIN vn USING (vec_id) CROSS JOIN s$r s)""".stripMargin

  private def kcenterOracleSql(k: Int = 8): String = {
    val rounds = (1 until k).map(kcenterRoundCtes).mkString(",\n")
    val sel = (1 until k).map { r =>
      s"UNION ALL SELECT $r::BIGINT, s$r.vec_id, ROUND(s$r.dist, 6) FROM s$r"
    }.mkString("\n")
    s"""WITH $vecCte,
       |s0 AS (SELECT vec_id, vec, sq FROM vn WHERE vec_id = 0),
       |d1 AS (
       |  SELECT vn.vec_id,
       |         1 - ${dotD("vn.vec", "s.vec")} / sqrt(vn.sq * s.sq) AS dist
       |  FROM vn CROSS JOIN s0 s),
       |$rounds
       |SELECT round, center_id, radius FROM (
       |SELECT 0::BIGINT AS round, (SELECT vec_id FROM s0) AS center_id,
       |       NULL::DOUBLE AS radius
       |$sel
       |) ORDER BY round""".stripMargin
  }

  /** recall@10 mirror (Similarity.recallReport): composes the per-method
    * top-k mirrors verbatim as derived tables — any divergence in a method's
    * mirror shows up here too, so the recall number is verified against the
    * exact same SQL the per-method gates use. 50.0 = k·nQueries = 10·5. */
  private def recallOracleSql: String = {
    val methods = Seq("ivf" -> "sim_topk_ivf", "ivfpq" -> "sim_topk_ivfpq",
      "lsh" -> "sim_topk_lsh", "lsh_mp" -> "sim_topk_lsh_mp",
      "pq" -> "sim_topk_pq", "rp_rerank" -> "sim_topk_rp",
      "sq8" -> "sim_topk_sq8")
    val union = methods.map { case (m, q) =>
      s"SELECT '$m' AS method, query_id, vec_id FROM (\n${baseOracleSql(q)}\n)"
    }.mkString("\nUNION ALL\n")
    s"""WITH brute AS (SELECT query_id, vec_id, 1 AS hit FROM (
       |${baseOracleSql("sim_topk_brute")}
       |)),
       |cand AS (
       |$union
       |)
       |SELECT method, CAST(COUNT(*) AS BIGINT) AS n_returned,
       |       CAST(COALESCE(SUM(hit), 0) AS BIGINT) AS n_hits,
       |       ROUND(COALESCE(SUM(hit), 0) / 50.0, 4) AS recall_at_10
       |FROM cand LEFT JOIN brute USING (query_id, vec_id)
       |GROUP BY method ORDER BY method""".stripMargin
  }

  val oracleSql: Map[String, String] =
    baseOracleSql +
      ("sim_recall" -> recallOracleSql) +
      ("cur_kcenter" -> kcenterOracleSql())
}
