package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/**
 * Text-analysis operators for a large-scale training-data pipeline, over the
 * `documents` table (`doc_id, text, lang, source, n_chars`).
 *
 * Everything is a narrow per-row projection built from codegen'd Catalyst
 * expressions (split / transform / filter / aggregate higher-order functions
 * — no UDFs), so at 100 TB these run map-side with zero shuffle; any
 * aggregation on top shuffles only group keys after partial aggregation.
 *
 * Determinism: token rules and hashes are engine-portable (see
 * [[graft.functions.Hashing]]) so every operator is verified value-for-value
 * against the DuckDB oracle, not just row counts.
 */
object TextAnalysis {

  /** documents with a normalized `text` + tokens column. Tokenization is
    * trim + split on whitespace runs — the portable baseline tokenizer. */
  def withTokens(docs: DataFrame): DataFrame =
    docs
      // null-safe: a null text would otherwise poison every downstream
      // count (size(split(null)) = -1); empty string is the sane identity
      // and matches what the oracle corpus (which has no nulls) computes
      .withColumn("text", coalesce(trim(col("text")), lit("")))
      .withColumn("toks", split(col("text"), "\\s+"))

  /** BPE-ish regex token pattern: letter runs, digit runs, single other
    * non-space glyphs — the classic pre-tokenizer shape. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Token counting: whitespace tokens + BPE-ish regex tokens + bytes. */
  def tokenCounts(docs: DataFrame): DataFrame =
    withTokens(docs).select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      regexp_count(lower(col("text")), lit(BpePattern))
        .cast("long").as("n_bpe_tokens"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** Stopword list used by quality scoring and language ID. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "in", "to", "is", "on", "for")

  /** Adds `n_tokens`, `n_stop`, and the composite `quality_score` columns —
    * a fully narrow projection, so it runs identically on batch frames and
    * unbounded streams (see [[graft.streaming.DocStream.qualityMonitor]]). */
  def withQualityScore(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    withTokens(docs)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop",
        // native kernel = size(filter(toks, t -> array_contains(stop, t)))
        call_function("count_in_set", col("toks"), typedLit(Stopwords)).cast("long"))
      .withColumn("quality_score",
        round(
          least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.5
            + (col("n_stop").cast("double") / col("n_tokens")) * 0.5,
          4))
  }

  /** Quality scoring: length, stopword ratio, mean token length, alphabetic
    * ratio, and a bounded composite score — the standard cheap pre-filter
    * for pretraining corpora. */
  def qualityScores(docs: DataFrame): DataFrame = {
    withQualityScore(docs)
      // regexp_count = size(regexp_extract_all(…)) without materializing
      // the per-match array it only ever counted
      .withColumn("n_alpha",
        regexp_count(col("text"), lit("[a-z]")).cast("long"))
      .withColumn("tok_chars",
        call_function("sum_char_lengths", col("toks")).cast("long"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round(col("n_stop").cast("double") / col("n_tokens"), 4).as("stop_ratio"),
        round(col("tok_chars").cast("double") / col("n_tokens"), 4).as("avg_token_len"),
        // greatest(len, 1): identity for non-empty text, and an empty
        // (or null→"") document scores 0 instead of dividing by zero
        round(col("n_alpha").cast("double") / greatest(length(col("text")), lit(1)), 4)
          .as("alpha_ratio"),
        col("quality_score"))
  }

  /** Gopher-style rule thresholds (Rae et al. 2021 §A1.1, adapted to this
    * corpus's scale — the reference rule set filters 50..100k words; the
    * synthetic docs run shorter, so the floor is 10). Each rule is a named
    * boolean so downstream ablation can measure per-rule kill rates. */
  val GopherMinWords = 10
  val GopherMaxWords = 100000
  val GopherMinMeanLen = 3.0
  val GopherMaxMeanLen = 10.0
  val GopherMaxSymbolRatio = 0.1
  val GopherMinAlphaRatio = 0.8
  val GopherMinStopHits = 2

  /** Rule-based document filter in the Gopher style: per-document word
    * count, mean word length, symbol-to-word ratio, alphabetic-word ratio,
    * and stop-word hits, each thresholded into a named rule flag plus the
    * conjunctive `keep`. The per-rule booleans are the point — corpus
    * curation tunes and ablates rules individually, and the summary of
    * kill rates per rule is one aggregation over this frame.
    *
    * Scale shape: one fully narrow projection (token stats are per-row
    * lambdas over the split column) — no shuffle at any corpus size until
    * a consumer aggregates. Report ordering lives in [[gopherRules]];
    * pipeline consumers ([[nbQuality]]) use this unsorted form so no Sort
    * Exchange sits under their joins. */
  def gopherFlags(docs: DataFrame): DataFrame =
    withGopherFlags(docs)
      .select(
        col("doc_id"), col("n_words"), col("mean_word_len"),
        col("symbol_ratio"), col("alpha_word_ratio"), col("n_stop"),
        col("r_words"), col("r_mean_len"), col("r_symbol"), col("r_alpha"),
        col("r_stop"), col("keep"))

  /** [[gopherFlags]] with EVERY input column retained (text, toks, words,
    * and whatever the caller's frame carries) — the composition entry
    * point for consumers that need the `keep` label NEXT TO other
    * per-document work ([[linearProbeMoments]],
    * [[graft.operators.Curation.sourceScorecard]]) without paying a
    * doc-keyed self-join to glue two projections back together. Still one
    * narrow projection. */
  def withGopherFlags(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    withTokens(docs)
      .withColumn("words", expr("filter(toks, t -> t <> '')"))
      .withColumn("n_words", size(col("words")).cast("long"))
      // the three per-word reductions below ran as interpreted HOF lambdas
      // (a MutableProjection call per word per rule); the native kernels
      // compute the identical values in one pass each (§4)
      .withColumn("mean_word_len",
        round(call_function("sum_char_lengths", col("words")).cast("double") /
          greatest(col("n_words"), lit(1L)), 4))
      .withColumn("symbol_ratio",
        round(regexp_count(col("text"), lit("[^a-z0-9\\s]"))
          .cast("double") / greatest(col("n_words"), lit(1L)), 4))
      .withColumn("alpha_word_ratio",
        round(call_function("count_rlike", col("words"), lit("[a-z]")).cast("double") /
          greatest(col("n_words"), lit(1L)), 4))
      .withColumn("n_stop",
        call_function("count_in_set", col("words"), typedLit(Stopwords)).cast("long"))
      .withColumn("r_words",
        col("n_words") >= GopherMinWords && col("n_words") <= GopherMaxWords)
      .withColumn("r_mean_len",
        col("mean_word_len") >= GopherMinMeanLen &&
          col("mean_word_len") <= GopherMaxMeanLen)
      .withColumn("r_symbol", col("symbol_ratio") <= GopherMaxSymbolRatio)
      .withColumn("r_alpha", col("alpha_word_ratio") >= GopherMinAlphaRatio)
      .withColumn("r_stop", col("n_stop") >= GopherMinStopHits)
      .withColumn("keep",
        col("r_words") && col("r_mean_len") && col("r_symbol") &&
          col("r_alpha") && col("r_stop"))
  }

  /** The Gopher rule report, doc-ordered (the `text_gopher` query). */
  def gopherRules(docs: DataFrame): DataFrame =
    gopherFlags(docs).orderBy(col("doc_id"))

  /** Per-rule ablation summary over [[gopherFlags]]: how many documents
    * each rule kills on its own, plus the conjunctive keep rate — the
    * one-row report a curation run reads before tuning thresholds. One
    * aggregation over the narrow rule projection. */
  def gopherSummary(docs: DataFrame): DataFrame = {
    def kills(rule: String) = sum(when(!col(rule), 1L).otherwise(0L))
    gopherFlags(docs).agg(
      count(lit(1)).as("n_docs"),
      kills("r_words").as("kill_words"),
      kills("r_mean_len").as("kill_mean_len"),
      kills("r_symbol").as("kill_symbol"),
      kills("r_alpha").as("kill_alpha"),
      kills("r_stop").as("kill_stop"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("keep_rate",
        round(col("n_kept").cast("double") / col("n_docs"), 4))
  }

  /** Multinomial Naive-Bayes quality classifier — the fastText-style
    * "train a filter on pseudo-labels, score the whole corpus" step every
    * CCNet-descended pipeline runs. Here the pseudo-labels come from the
    * Gopher rule set ([[gopherRules]]' conjunctive `keep`); in production
    * they come from a curated seed (wiki = keep, raw crawl = toss) — the
    * training and scoring machinery is identical.
    *
    * Model: Laplace-smoothed per-class token likelihoods
    * p(t|c) = (cnt(t,c)+1) / (tot_c + V) plus class priors. All scores are
    * integer micro-nat NLLs (the [[unigramScores]] trick), so the per-doc
    * sums are associative/order-free and the DuckDB mirror reproduces them
    * bit-for-bit. `pred` keeps the doc iff the keep-class NLL is ≤ the
    * toss-class NLL.
    *
    * Scale shape: training = ONE (tok) aggregation over the token rows
    * (the model table is vocab-sized); scoring = the same hash join the
    * perplexity kernels use; stats and priors are 1-row broadcasts. No
    * Exchange ever carries text. */
  def nbQuality(docs: DataFrame): DataFrame = {
    val labels = gopherFlags(docs).select(col("doc_id"), col("keep"))
    val toks = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .join(labels, Seq("doc_id"))
    val model = toks.groupBy(col("tok")).agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("cnt_keep"),
      sum(when(col("keep"), 0L).otherwise(1L)).as("cnt_toss"))
    val stats = model.agg(
      sum("cnt_keep").as("tot_keep"), sum("cnt_toss").as("tot_toss"),
      count(lit(1)).as("v"))
    val priors = labels.agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      count(lit(1)).as("n_docs"))
    toks.join(model, Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("nk_micro",
        round(-log((col("cnt_keep") + 1).cast("double") /
          (col("tot_keep") + col("v")).cast("double")) * 1e6).cast("long"))
      .withColumn("nt_micro",
        round(-log((col("cnt_toss") + 1).cast("double") /
          (col("tot_toss") + col("v")).cast("double")) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum("nk_micro").as("sk"), sum("nt_micro").as("st"))
      .join(labels, Seq("doc_id"))
      .crossJoin(broadcast(priors))
      .select(
        col("doc_id"), col("keep").as("label"),
        // priors are Laplace-smoothed like the token likelihoods: a corpus
        // whose Gopher labels are uniform (n_keep = 0 or = n_docs) would
        // otherwise evaluate ln(0) — NULL in Spark, an ERROR in DuckDB —
        // and silently empty the downstream calibration report
        (col("sk") + round(-log((col("n_keep") + 1).cast("double") /
          (col("n_docs") + 2).cast("double")) * 1e6).cast("long")).as("nll_keep"),
        (col("st") + round(-log((col("n_docs") - col("n_keep") + 1).cast("double") /
          (col("n_docs") + 2).cast("double")) * 1e6).cast("long")).as("nll_toss"))
      .withColumn("pred", col("nll_keep") <= col("nll_toss"))
      .orderBy(col("doc_id"))
  }

  /** Marker-token sets for the n-gram/heuristic language identifier. Kept
    * deliberately tiny — the operator contract is the scoring + argmax
    * machinery; swap real profiles in production. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "merge"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "y", "scan"),
    "fr" -> Seq("le", "la", "les", "et", "sort"),
    "zh" -> Seq("de", "shi", "bu", "le", "data"))

  /** Language ID: score = marker-token hits per language, prediction =
    * argmax with alphabetical tie-break; output is the (actual, predicted)
    * confusion matrix.
    *
    * Adds `pred_lang` (marker-scored language prediction, deterministic
    * alphabetical tie-break; `und` when NO marker of any language hits —
    * an all-zero score row carries no signal and must not default to the
    * alphabetically-first language) — the per-document tagging entry
    * point a pipeline runs when ingested documents carry no language
    * label; a fully narrow projection, so it streams as-is. */
  def withPredictedLang(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val scored = LangMarkers.foldLeft(withTokens(docs)) { case (df, (code, markers)) =>
      df.withColumn(s"s_$code",
        call_function("count_in_set", col("toks"), typedLit(markers)))
    }
    val best = greatest(LangMarkers.map { case (c, _) => col(s"s_$c") }: _*)
    // alphabetical CASE ladder — first matching code wins, so ties are
    // deterministic in every engine
    val predLadder = LangMarkers.reverse.foldLeft(lit("und")) { case (els, (code, _)) =>
      when(col(s"s_$code") === best, lit(code)).otherwise(els)
    }
    // zero-hit guard: best always equals SOME score, so without it the
    // ladder's first arm fires on all-zero rows and 'und' is unreachable
    scored.withColumn("pred_lang", when(best === 0, lit("und")).otherwise(predLadder))
  }

  def langIdConfusion(docs: DataFrame): DataFrame = {
    withPredictedLang(docs)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Corpus vocabulary stats: explode tokens → per-token document and
    * occurrence counts, top-k by frequency. The high-cardinality
    * explode→aggregate shape: the shuffle carries (token) keys after
    * map-side partial aggregation — at 100 TB this is the word-count
    * pattern, linear in corpus size. */
  def vocabulary(docs: DataFrame, k: Int = 50): DataFrame =
    withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("token"))
      .filter(col("token") =!= "") // empty docs tokenize to [""] — not vocabulary
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("token"))
      .limit(k)

  /** Repetition ratio: 1 − distinct/total word 5-grams — the standard
    * degenerate-text pre-filter (looping generations, boilerplate spam
    * score near 1; natural text near 0). Single-pass native shingling. */
  def repetitionRatio(docs: DataFrame, n: Int = 5): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    withTokens(docs)
      .withColumn("total", (size(col("toks")) - (n - 1)).cast("long"))
      .filter(col("total") > 0)
      .select(
        col("doc_id"),
        col("total").as("total_ngrams"),
        size(call_function("word_shingles", col("text"), lit(n)))
          .cast("long").as("distinct_ngrams"))
      .withColumn("repetition_ratio",
        round(lit(1.0) - col("distinct_ngrams").cast("double") / col("total_ngrams"), 4))
      .orderBy(col("doc_id"))
  }

  /** Order-sensitive document fingerprint (rolling polynomial hash over the
    * token stream) — exact-dup detection that survives re-serialization. */
  def fingerprints(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    withTokens(docs).select(
      col("doc_id"),
      Hashing.rollingFingerprint("toks").as("fingerprint"))
  }

  // ── BM25 relevance scoring ───────────────────────────────────────────────

  /** Query term set for the BM25 ranking operator (any literal term list;
    * these occur throughout the synthetic corpus). */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "window", "stream")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 ranking of the corpus against a fixed query-term set — the
    * quality/relevance scorer used to select in-domain training data
    * (e.g. "books-like" or "wiki-like" filtering by exemplar terms).
    *
    * Scale shape: the corpus statistics BM25 needs (N, avgdl, per-term
    * document frequency) collapse to ONE row via partial aggregation —
    * per-term df is `sum(contains)` so there is no token explode and no
    * token shuffle — and that row is broadcast back over the corpus with a
    * crossJoin. The per-doc score is then a narrow projection; the only
    * full shuffle is the final global top-k (TakeOrderedAndProject — sort
    * truncated to k rows per partition before the single-stage merge).
    *
    * Determinism: tf/df/dl are exact integers in doubles, the per-term sum
    * is written in fixed left-associated term order, and the score is
    * rounded — the DuckDB oracle reproduces it bit-for-bit. */
  def bm25Scores(docs: DataFrame, topK: Int = 20): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val toks = withTokens(docs)
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("double").as("dl"))
    val statCols =
      count(lit(1)).cast("double").as("n_docs") +:
      sum(col("dl")).as("sum_dl") +:
      Bm25Terms.map(t =>
        sum(when(array_contains(col("toks"), t), 1L).otherwise(0L))
          .cast("double").as(s"df_$t"))
    val stats = toks.agg(statCols.head, statCols.tail: _*)
    val scored = toks.crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl") / col("n_docs"))
    val termScores = Bm25Terms.map { t =>
      // count_in_set with a one-term set ⇔ size(filter(toks, x -> x = t))
      val tf = call_function("count_in_set", col("toks"), typedLit(Seq(t))).cast("double")
      val idf = log((col("n_docs") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(Bm25K1 + 1.0)) /
        (tf + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))
    }
    scored
      .withColumn("bm25", round(termScores.reduceLeft(_ + _), 4))
      .filter(col("bm25") > 0)
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Unigram language-model perplexity per document — the CCNet-style
    * quality filter: train a unigram LM on the corpus itself (token
    * frequencies), score each document by its average per-token negative
    * log-likelihood; gibberish and rare-token soup score high, fluent text
    * low. Output: (doc_id, n_tokens, avg_nll, ppl = e^avg_nll).
    *
    * Scale shape: the vocabulary is one word-count aggregation (map-side
    * combined, tokens shuffle once as keys); the total-token count is a
    * 1-row aggregate broadcast back; the scoring join of exploded tokens
    * to the vocabulary is a plain hash equi-join on the token — the
    * standard word-count shape end-to-end, no pairwise step anywhere.
    *
    * Determinism: floating sums over shuffled rows are order-sensitive, so
    * the per-token NLL is rounded to integer MICRO-NATS
    * (`round(-ln(p)·10⁶) :: long`) and the per-doc sum runs over integers —
    * associative, order-free, exactly reproduced by the DuckDB mirror; the
    * final averages divide integer sums and round. */
  def unigramScores(docs: DataFrame): DataFrame = {
    // filter '' (split of an empty/whitespace-only text) so the unigram
    // vocabulary matches the featureHash/vocabKmv token semantics — an
    // empty document contributes nothing, not a zero-width token
    val toks = withTokens(docs).select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // == sum of vocab counts, but needs no second vocabulary aggregation —
    // one count over the token rows collapses to the 1-row broadcast
    val total = toks.agg(count(lit(1)).cast("double").as("total"))
    toks
      .join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("nll_micro",
        round(-log(col("cnt").cast("double") / col("total")) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("nll_micro")).as("nll_sum"))
      .select(
        col("doc_id"), col("n_tokens"),
        round(col("nll_sum").cast("double") / (col("n_tokens") * 1e6), 4).as("avg_nll"),
        round(exp(col("nll_sum").cast("double") / (col("n_tokens") * 1e6)), 4).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer-fertility report per language — the number a tokenizer
    * choice is judged by before a single GPU-hour is spent: subword tokens
    * per whitespace word (fertility; multilingual corpora routinely show
    * 2-4× for scripts a vocab underserves, directly inflating training
    * cost per word) and bytes per subword token (compression). Uses the
    * [[BpePattern]] proxy tokenizer this pipeline tokenizes with
    * everywhere; swapping a real vocab changes only the token kernel.
    * All-integer aggregation — one lang-keyed groupBy, exact ratios. */
  def fertility(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    withTokens(docs)
      .select(col("lang"),
        call_function("count_nonempty", col("toks")).cast("long").as("n_words"),
        regexp_count(lower(col("text")), lit(BpePattern))
          .cast("long").as("n_sub"),
        // bytes, not chars: the oracle's strlen is octet count and the
        // metric (bytes/token compression) is only truthful in bytes —
        // chars and bytes diverge on every non-ASCII script this report
        // exists to surface (same kernel as tokenCounts.n_bytes)
        octet_length(col("text")).cast("long").as("n_bytes"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_sub")).as("n_subtokens"),
        sum(col("n_bytes")).as("n_bytes"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_subtokens"),
        col("n_bytes"),
        round(col("n_subtokens").cast("double") / col("n_words"), 4).as("fertility"),
        round(col("n_bytes").cast("double") / col("n_subtokens"), 4).as("bytes_per_token"))
      .orderBy(col("lang"))
  }

  /** Zipf-law fit over the token frequency spectrum — the corpus-health
    * diagnostic: least-squares slope of ln(count) vs ln(rank) for the top
    * `topN` tokens. Natural text sits near slope −1; a spam-flooded or
    * template-heavy corpus bends away from it, so the single number is a
    * cheap drift check between snapshots.
    *
    * Determinism: the top-N spectrum is a TakeOrdered (never a full-vocab
    * sort), collected into ONE sorted array, and every regression sum is
    * an ordered fold over that array — bit-identical in Spark and the
    * DuckDB mirror, like the dot-product kernels. */
  def zipfFit(docs: DataFrame, topN: Int = 100): DataFrame = {
    val toks = withTokens(docs)
      .select(explode(col("toks")).as("tok")).filter(col("tok") =!= "")
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(topN)
    def foldSum(term: String) =
      s"""aggregate(transform(sequence(1, size(pts)), i -> $term),
         |  cast(0.0 as double), (a, x) -> a + x)""".stripMargin
    top
      .agg(sort_array(collect_list(struct((-col("cnt")).as("nc"), col("tok").as("tok"))))
        .as("pts"))
      .select(
        size(col("pts")).cast("double").as("n"),
        // folds only run with ≥2 points: sequence(1, 0) is DESCENDING
        // [1, 0] (not empty), so an empty vocabulary would index
        // element_at(pts, 0) — `when` keeps the fold unevaluated instead
        when(size(col("pts")) >= 2,
          expr(foldSum("ln(cast(i as double))"))).as("sx"),
        when(size(col("pts")) >= 2,
          expr(foldSum("ln(cast(-element_at(pts, i).nc as double))"))).as("sy"),
        when(size(col("pts")) >= 2,
          expr(foldSum("ln(cast(i as double)) * ln(cast(i as double))"))).as("sxx"),
        when(size(col("pts")) >= 2,
          expr(foldSum("ln(cast(i as double)) * ln(cast(-element_at(pts, i).nc as double))")))
          .as("sxy"))
      .select(
        col("n").cast("long").as("n_fit"),
        // a regression needs ≥2 points with nonzero x-variance: on an
        // empty/1-token vocabulary the folds would index element_at(pts, 0)
        // (sequence(1, 0) is DESCENDING [1, 0]) or divide by zero variance
        when(col("n") >= 2,
          round((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n")), 4))
          .as("slope"),
        when(col("n") >= 2,
          round((col("sy") - (col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n")) * col("sx")) / col("n"), 4))
          .as("intercept"))
  }

  /** Jelinek–Mercer interpolated bigram/unigram LM perplexity — the
    * smoothing step between [[bigramScores]] (raw conditional, infinite
    * surprise on unseen bigrams) and a production KenLM: per bigram
    * position, p = λ·p(w₂|w₁) + (1−λ)·p(w₂), so novel word pairs back off
    * to the unigram prior instead of dominating the score. Same integer
    * micro-nat NLL trick as the siblings; 1−λ is computed ONCE host-side
    * and the same double literal feeds both engines (0.7 + 0.3 of a
    * float-naive mirror would diverge in the last bit).
    *
    * Scale shape: the perplexity join shape twice over (bigram table +
    * prefix table + unigram table, all word-count-sized) plus the 1-row
    * total broadcast; no text in any Exchange. */
  def interpolatedScores(docs: DataFrame, lambda: Double = 0.7): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val oneMinus = 1.0 - lambda
    val bi = withTokens(docs)
      .select(col("doc_id"),
        explode(call_function("word_ngrams", col("text"), lit(2))).as("bg"))
    val bgCounts = bi.groupBy(col("bg")).agg(count(lit(1)).as("cbg"))
    val prefCounts = bi.select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cw1"))
    val toks = withTokens(docs)
      .select(explode(col("toks")).as("tok")).filter(col("tok") =!= "")
    val uniCounts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
      .withColumnRenamed("tok", "w2")
    val total = toks.agg(count(lit(1)).cast("double").as("total"))
    bi
      .join(bgCounts, Seq("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(prefCounts, Seq("w1"))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(uniCounts, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("nll_micro",
        round(-log(
          lit(lambda) * (col("cbg").cast("double") / col("cw1")) +
            lit(oneMinus) * (col("cu").cast("double") / col("total"))) * 1e6)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_micro")).as("nll_sum"))
      .select(
        col("doc_id"), col("n_bigrams"),
        round(col("nll_sum").cast("double") / (col("n_bigrams") * 1e6), 4).as("avg_nll"),
        round(exp(col("nll_sum").cast("double") / (col("n_bigrams") * 1e6)), 4).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** Feature-hashing (hashing-trick) document vectorizer: token t
    * contributes ±1 (sign from an independent hash bit) to dimension
    * `hash64(t) mod dims` — the classic fixed-width text embedding that
    * needs NO vocabulary table, so it streams and shards trivially at any
    * corpus size. Values are signed integer counts — exactly portable, no
    * float normalization — and the output is sparse (absent (doc, dim)
    * rows are zeros). One (doc_id, dim) aggregation; tokens never carry
    * past the map-side partial sum. */
  def featureHash(docs: DataFrame, dims: Int = 16): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"),
        pmod(call_function("hash64", col("tok")), lit(dims.toLong)).as("dim"))
      .agg(sum(
        when(pmod(call_function("hash64", concat(lit("s#"), col("tok"))), lit(2L)) === 0,
          1L).otherwise(-1L)).as("val"))
      .select(col("doc_id"), col("dim").cast("long").as("dim"), col("val"))
      .orderBy(col("doc_id"), col("dim"))
  }

  /** K-minimum-values distinct-count sketch over the corpus vocabulary —
    * the mergeable cardinality estimator a 1000-executor pipeline uses
    * when exact `COUNT(DISTINCT)` over billions of tokens is too
    * expensive: each partition keeps its k smallest hashes, sketches merge
    * by union+truncate, and the estimate is `(k−1)·2⁶⁰ / h₍ₖ₎` (hash64 is
    * uniform on [0, 2⁶⁰)). Hand-rolled on the portable hash — unlike
    * engine HLL sketches — so the DuckDB oracle reproduces the estimate
    * bit-for-bit, and the query reports it NEXT TO the exact count, making
    * the error measurable. Plan: one distinct-token aggregation, then
    * `TakeOrdered(k)` — the k-row sketch is the only thing the driver
    * sees. */
  def vocabKmv(docs: DataFrame, k: Int = 256): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val toksD = withTokens(docs)
      .select(explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "").distinct()
    val sketch = toksD
      .select(call_function("hash64", col("tok")).as("h"))
      .orderBy(col("h")).limit(k)
      .agg(max(col("h")).cast("double").as("hk"), count(lit(1)).as("n"))
    val exact = toksD.agg(count(lit(1)).as("n_exact"))
    val est = when(col("n") < k, col("n").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60)) / col("hk"))
    sketch.crossJoin(exact)
      .select(
        lit(k).as("k"), col("n_exact"),
        round(est, 4).as("kmv_est"),
        round(abs(est - col("n_exact").cast("double")) /
          col("n_exact").cast("double"), 4).as("rel_err"))
  }

  /** Count-Min sketch geometry: [[CmsDepth]] independent hash rows ×
    * [[CmsWidth]] buckets. ~2 KiB of longs summarizes any token stream. */
  val CmsDepth = 4
  val CmsWidth = 512

  /** Margin-domain range-bin count for [[nbCalibration]]'s exact
    * distributed rank: bounds every post-classifier control frame (bin
    * counts, offsets) and sets the per-bin window parallelism. */
  val RankBins = 1024

  /** Count-Min-sketch heavy hitters: build a depth×width counter sketch
    * over the token stream, then report the top-k tokens with their exact
    * count, the sketch estimate (min over rows — classic CMS point query),
    * and the overestimate, so the sketch's error contract is measured
    * against truth, not assumed.
    *
    * Scale shape: the sketch is a FIXED-SIZE (≤ depth·width rows),
    * MERGEABLE summary — per-partition sketches add cell-wise (the groupBy
    * partial aggregation IS the merge), so at 100 TB each executor reduces
    * its split to 2048 counters and only those merge; streaming ingest
    * merges batch sketches the same way (tested associativity). The exact
    * top-k here is the word-count plan shape and exists to verify the
    * estimates; a production deployment at scale keeps only the sketch +
    * a candidate set. Hash rows use the portable hash64 so the DuckDB
    * oracle rebuilds the identical sketch. */
  def heavyHitters(docs: DataFrame, k: Int = 20): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val toks = withTokens(docs)
      .select(explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok")).limit(k)
    val probed = top.select(col("tok"), col("exact_cnt"),
      explode(expr(s"sequence(0, ${CmsDepth - 1})")).as("row_i"))
      .withColumn("bucket", cmsBucket(col("row_i"), col("tok")))
    probed
      .join(broadcast(cmsSketch(toks)), Seq("row_i", "bucket"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("cell_cnt")).as("cms_est"))
      .select(col("tok"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overestimate"))
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** The (row_i, bucket, cell_cnt) sketch table for a token-row frame —
    * exposed so tests can assert mergeability (sketch(a ∪ b) =
    * cell-wise sketch(a) + sketch(b)). */
  private[graft] def cmsSketch(toks: DataFrame): DataFrame =
    toks
      .select(col("tok"), explode(expr(s"sequence(0, ${CmsDepth - 1})")).as("row_i"))
      .withColumn("bucket", cmsBucket(col("row_i"), col("tok")))
      .groupBy(col("row_i"), col("bucket"))
      .agg(count(lit(1)).as("cell_cnt"))

  /** Row-seeded portable bucket hash: hash64("<row>#<tok>") mod width. */
  private def cmsBucket(rowI: org.apache.spark.sql.Column,
      tok: org.apache.spark.sql.Column) =
    pmod(call_function("hash64",
      concat(rowI.cast("string"), lit("#"), tok)), lit(CmsWidth.toLong))

  /** Bigram-LM perplexity — the context-aware upgrade of
    * [[unigramScores]]: each bigram position scores
    * −ln p(w₂|w₁) = −ln(c(w₁w₂)/c(w₁·)), so text whose word ORDER is
    * corpus-typical scores low even when its vocabulary is common (the
    * failure mode a unigram LM cannot see: shuffled-word salad scores
    * fluent under unigrams, high-perplexity here).
    *
    * Scale shape: positional bigrams from the single-pass `word_ngrams`
    * kernel; bigram and prefix counts are two word-count aggregations; the
    * scoring joins are hash equi-joins on the bigram/prefix strings.
    * Integer micro-nat NLLs keep the per-doc sum order-free (see
    * [[unigramScores]]). Documents under 2 tokens have no bigram and are
    * absent by contract. */
  /** TF-IDF top terms per document — the classic sparse lexical document
    * representation (and the model-free ranking signal BM25 refines). Per
    * (doc, token): tf = in-doc occurrences, df = documents containing the
    * token, idf = ln((N+1)/(df+1)) in integer MICRO-NATS (one rounding of
    * the one transcendental, so tf·idf stays exact-integer and the DuckDB
    * mirror is bit-identical — the [[unigramScores]] trick). Emits each
    * doc's `topK` terms by score, ties broken by token.
    *
    * Scale shape: the word-count shape end to end — (doc, tok) partial-agg
    * shuffle, vocabulary-sized df aggregation, tf⋈df on the token key
    * (counts only, never text), corpus-wide N broadcast as a 1-row stats
    * frame, and one doc-keyed window for the top-k. No step carries more
    * than (id, token, count) rows. */
  def tfidfTop(docs: DataFrame, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
    tf.join(df, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("idf_micro",
        round(log((col("n_docs") + 1).cast("double") /
          (col("df") + 1).cast("double")) * 1e6).cast("long"))
      .withColumn("tfidf_micro", col("tf") * col("idf_micro"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf_micro").desc, col("tok"))))
      .filter(col("rk") <= topK)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("tok"),
        col("tf"), col("df"), col("tfidf_micro"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Calibration report for the [[nbQuality]] classifier — the
    * threshold-picking table a pipeline builds before acting on a learned
    * quality score: documents are ranked by the NB margin
    * (nll_toss − nll_keep, higher = more keep-ish), cut into score
    * deciles, and each decile reports its Gopher-label keep rate and
    * prediction agreement. A monotone keep_rate column = a usable score;
    * the decile where it crosses the target retention IS the threshold.
    *
    * Scale shape: rides the [[nbQuality]] plan (word-count shaped), then an
    * EXACT distributed ntile replay with no global window: the per-doc
    * frame never passes through a single partition. The integer margins are
    * cut into ≤ [[RankBins]] deterministic order-preserving ranges (bin 0 =
    * largest margins) from a 1-row (min, max, n) broadcast; per-bin counts
    * (≤ RankBins rows) turn into bin rank offsets via a tiny triangle
    * join; each doc's exact global rank = its bin offset + a row_number
    * over the KEYED per-bin window (margin desc, doc_id) — bins partition
    * the margin domain into disjoint descending ranges, so the sum is the
    * total-order rank, and the closed-form ntile formula (first n mod b
    * buckets carry one extra row) reproduces the window function
    * bit-for-bit. Every post-classifier frame is ≤ RankBins rows except
    * the per-doc frame itself, which only ever shuffles on `bin` —
    * RankBins-way parallel. The scored per-doc frame (five narrow columns)
    * feeds four plan branches (stats, bin counts, offsets, final rank), so
    * it is persisted MEMORY_AND_DISK — one classifier evaluation, shared
    * lazily by every branch of the same job; at 100 TB this is the
    * standard persist-the-collapsed-frame step, a few bytes per document. */
  def nbCalibration(docs: DataFrame, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // lifecycle: the persist entry is plan-keyed, so repeat invocations on
    // one corpus share a single materialization; a long-lived session that
    // walks MANY corpora reclaims the accumulated entries via
    // spark.catalog.clearCache() (the bench does exactly this between ramp
    // rungs) — the same contract Behavioral.clearGraphCaches documents
    val scored = nbQuality(docs)
      .withColumn("margin", col("nll_toss") - col("nll_keep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = scored.agg(
      min(col("margin")).as("mn"), max(col("margin")).as("mx"),
      count(lit(1)).as("n_total"))
    // Deterministic binning: margin ∈ (mx-(b+1)·w, mx-b·w] ⇒ bin b, so
    // bins are disjoint ranges in DESCENDING margin order. Width divides
    // first (no (mx-mn)·RankBins overflow for extreme margin domains).
    val binned = scored.crossJoin(broadcast(stats))
      .withColumn("bin_w", greatest(lit(1L),
        ceil((col("mx") - col("mn") + 1).cast("double") / RankBins).cast("long")))
      .withColumn("bin", expr("(mx - margin) div bin_w"))
    val binCounts = binned.groupBy(col("bin")).agg(count(lit(1)).as("bc"))
    // Rank offset of bin b = rows in bins before it (tiny triangle join
    // over the ≤ RankBins-row frame — never a global cumulative window).
    val offsets = binCounts.as("a")
      .join(binCounts.as("b"), col("b.bin") < col("a.bin"), "left_outer")
      .groupBy(col("a.bin").as("bin"))
      .agg(coalesce(sum(col("b.bc")), lit(0L)).as("bin_off"))
    binned
      .join(broadcast(offsets), Seq("bin"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("bin"))
          .orderBy(col("margin").desc, col("doc_id"))))
      .withColumn("rank", col("bin_off") + col("rn"))
      // Closed-form ntile over the exact rank: q=n div b rows per bucket,
      // the first r=n mod b buckets take one extra.
      .withColumn("decile", expr(
        s"""case when rank <= (n_total % $buckets) * ((n_total div $buckets) + 1)
           then (rank - 1) div ((n_total div $buckets) + 1) + 1
           else (n_total % $buckets) +
             (rank - (n_total % $buckets) * ((n_total div $buckets) + 1) - 1)
               div greatest(n_total div $buckets, 1L) + 1 end""").cast("long"))
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_label_keep"),
        sum(when(col("pred"), 1L).otherwise(0L)).as("n_pred_keep"),
        round(avg(col("margin")), 2).as("avg_margin"))
      .withColumn("keep_rate",
        round(col("n_label_keep").cast("double") / col("n_docs"), 4))
      .select(col("decile"), col("n_docs"), col("n_label_keep"),
        col("n_pred_keep"), col("keep_rate"), col("avg_margin"))
      .orderBy(col("decile"))
  }

  /** CCNet-style per-language perplexity terciles (Wenzek et al. 2020,
    * the head/middle/tail cut): within each LANGUAGE, documents rank by
    * their unigram-LM NLL ([[unigramScores]]) and split into `buckets`
    * rank-equal slices — head = most corpus-typical text, the keep slice
    * of a language-balanced quality cut (cutting on a global threshold
    * would gut low-resource languages; per-language ranks cannot).
    *
    * Scale shape: the [[nbCalibration]] exact-rank machinery GENERALIZED
    * TO KEYED GROUPS — a naive `ntile(3) over (partition by lang)` funnels
    * each language through ONE task, and English IS the corpus at 100 TB.
    * Instead: per-language (min, max, n) stats (#langs rows, broadcast),
    * deterministic per-language key bins, per-(lang, bin) counts → rank
    * offsets via a lang-keyed triangle join (≤ #langs·RankBins rows),
    * rank = offset + per-(lang, bin) KEYED row_number, bucket from the
    * closed-form ntile formula. The per-doc frame shuffles only on
    * (lang, bin) — #langs×RankBins-way parallel. The rank key is the
    * micro-nat average NLL scaled to an integer from the already
    * hash-verified `avg_nll` double, so the DuckDB mirror — a plain
    * windowed ntile — sorts identical integers and proves the replay
    * exact. */
  def ccnetBuckets(docs: DataFrame, buckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // lifecycle: plan-keyed entry per corpus; multi-corpus sessions reclaim
    // via spark.catalog.clearCache() (see nbCalibration's note)
    val scored = unigramScores(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("key", round(col("avg_nll") * 1e4).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = scored.groupBy(col("lang")).agg(
      min(col("key")).as("mn"), max(col("key")).as("mx"),
      count(lit(1)).as("n_lang"))
    val binned = scored.join(broadcast(stats), Seq("lang"))
      .withColumn("bin_w", greatest(lit(1L),
        ceil((col("mx") - col("mn") + 1).cast("double") / RankBins).cast("long")))
      .withColumn("bin", expr("(key - mn) div bin_w")) // ASC: head = low NLL
    val binCounts = binned.groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("bc"))
    val offsets = binCounts.as("a")
      .join(binCounts.as("b"),
        col("a.lang") === col("b.lang") && col("b.bin") < col("a.bin"),
        "left_outer")
      .groupBy(col("a.lang").as("lang"), col("a.bin").as("bin"))
      .agg(coalesce(sum(col("b.bc")), lit(0L)).as("bin_off"))
    binned
      .join(broadcast(offsets), Seq("lang", "bin"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang"), col("bin"))
          .orderBy(col("key"), col("doc_id"))))
      .withColumn("rank", col("bin_off") + col("rn"))
      .withColumn("bucket", expr(
        s"""case when rank <= (n_lang % $buckets) * ((n_lang div $buckets) + 1)
           then (rank - 1) div ((n_lang div $buckets) + 1) + 1
           else (n_lang % $buckets) +
             (rank - (n_lang % $buckets) * ((n_lang div $buckets) + 1) - 1)
               div greatest(n_lang div $buckets, 1L) + 1 end""").cast("long"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("key")).as("min_nll_e4"),
        max(col("key")).as("max_nll_e4"),
        round(sum(col("key")).cast("double") / (count(lit(1)) * 1e4), 4)
          .as("avg_nll"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** PMI collocations — the corpus's strongest two-word associations
    * (pointwise mutual information over bigram vs unigram frequencies),
    * the classic phrase-mining / tokenizer-vocab-seeding signal. A
    * min-support floor keeps rare-pair noise out (PMI's known failure
    * mode); the single transcendental is computed from exact integer
    * counts with an expression written identically in both engines, then
    * rounded once to micro-nats.
    *
    * Scale shape: the word-count shape twice (bigram + unigram
    * aggregations via the positional `word_ngrams` kernel), the two corpus
    * totals ride a 1-row broadcast, candidate pairs (support ≥ floor) join
    * their unigram counts on the token key, and the report is a TakeOrdered
    * top-k. No text in any Exchange. */
  def pmiCollocations(docs: DataFrame, minCount: Int = 5,
      topK: Int = 30): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val uni = withTokens(docs)
      .select(explode(col("toks")).as("tok")).filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val bi = withTokens(docs)
      .select(explode(call_function("word_ngrams", col("text"), lit(2))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val totals = uni.agg(sum(col("c")).as("tt"))
      .crossJoin(withTokens(docs)
        .select(explode(call_function("word_ngrams", col("text"), lit(2))).as("bg"))
        .agg(count(lit(1)).as("bb")))
    bi
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(uni.select(col("tok").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi_micro",
        round(log((col("c_ab").cast("double") / col("bb")) /
          ((col("c_a").cast("double") / col("tt")) *
            (col("c_b").cast("double") / col("tt")))) * 1e6).cast("long"))
      .select(col("bg"), col("c_ab"), col("c_a"), col("c_b"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("bg"))
      .limit(topK)
  }

  def bigramScores(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val bi = withTokens(docs)
      .select(col("doc_id"),
        explode(call_function("word_ngrams", col("text"), lit(2))).as("bg"))
    val bgCounts = bi.groupBy(col("bg")).agg(count(lit(1)).as("cbg"))
    val prefCounts = bi.select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cw1"))
    bi
      .join(bgCounts, Seq("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(prefCounts, Seq("w1"))
      .withColumn("nll_micro",
        round(-log(col("cbg").cast("double") / col("cw1")) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_micro")).as("nll_sum"))
      .select(
        col("doc_id"), col("n_bigrams"),
        round(col("nll_sum").cast("double") / (col("n_bigrams") * 1e6), 4).as("avg_nll"),
        round(exp(col("nll_sum").cast("double") / (col("n_bigrams") * 1e6)), 4).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** Per-document token Shannon entropy — the gibberish/boilerplate axis
    * the cross-entropy scores ([[unigramScores]]) cannot see: a doc of one
    * word repeated 500× has LOW corpus NLL (the word is common) but ZERO
    * internal entropy, and machine-generated spam lives at both extremes.
    * Reports H = ln n − (Σ c·ln c)/n over the doc's own token counts plus
    * H/ln n ∈ [0,1] (normalized: 1 = all tokens distinct, 0 = one token).
    *
    * Exact-replay arithmetic: every ln is rounded ONCE to integer
    * micro-nats, so both engines aggregate integers — H's numerator is
    * n·lnE6(n) − Σ c·lnE6(c), a BIGINT, and the normalized form divides
    * the same two integer numerators (micro-nat scale cancels), so no
    * float ever crosses an aggregation boundary.
    *
    * Scale shape: two keyed aggregations — (doc_id, hash64(token)) then
    * doc_id — with map-side combine; token STRINGS never shuffle, each
    * Exchange row is (doc_id, 8-byte hash, count). The 60-bit hash can in
    * principle merge two tokens within one doc; both engines hash
    * identically so the report stays replay-exact regardless. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val counts = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), call_function("hash64", col("tok")).as("th"))
      .agg(count(lit(1)).as("c"))
    counts
      .withColumn("ln_c_e6",
        round(log(col("c").cast("double")) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("ln_c_e6")).as("sum_clnc"))
      .withColumn("ln_n_e6",
        round(log(col("n_words").cast("double")) * 1e6).cast("long"))
      .select(
        col("doc_id"), col("n_words"), col("n_distinct"),
        round((col("n_words") * col("ln_n_e6") - col("sum_clnc"))
          .cast("double") / (col("n_words") * 1e6), 4).as("entropy"),
        when(col("n_words") <= 1, lit(0.0))
          .otherwise(round((col("n_words") * col("ln_n_e6") - col("sum_clnc"))
            .cast("double") / (col("n_words") * col("ln_n_e6")), 4))
          .as("norm_entropy"))
      .orderBy(col("doc_id"))
  }

  /** Per-document n-gram novelty — the memorization-risk / templating
    * signal: what fraction of a doc's distinct word trigrams appear in NO
    * other document? Injected exact copies ([[Dedup.augmentedDocs]]) score
    * 0.0 by construction (every gram exists twice), templated text scores
    * low, original prose scores high — the inverse of the boilerplate
    * axis, used to pick held-out-worthy or dedup-resistant content.
    *
    * Scale shape: the inverted-index pattern — grams hash to 8 bytes
    * before ANY shuffle; the corpus gram-frequency aggregation and the
    * mark-back join are co-partitioned on the same gram-hash key (the join
    * reuses the aggregation's Exchange; `shuffle_hash` keeps AQE from
    * inserting a sort), then one doc-keyed aggregation. Identical shape to
    * [[graft.operators.Cleaning.rewriteRaw]]'s bad-digest mark-back, which
    * is the scale-proven form — the gram-frequency table GROWS with the
    * corpus and must never be broadcast. */
  def noveltyScores(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val grams = Dedup.augmentedDocs(docs)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(
        // native one-pass kernel = array_distinct(transform(…, hash64))
        call_function("hash64_set",
          call_function("word_shingles", col("text"), lit(3))))
        .as("gh"))
    val freq = grams.groupBy(col("gh")).agg(count(lit(1)).as("nd"))
    grams
      .join(freq.hint("shuffle_hash"), Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("nd") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_grams"), 4))
      .orderBy(col("doc_id"))
  }

  /** Log₂ token-length histogram with document/word shares and the
    * cumulative word share — the one-page corpus profile a packing run
    * ([[Curation.packingSummary]]) reads to size its context window:
    * "what share of my TOKENS lives in docs longer than 2ᵏ words" is
    * exactly the cum_word_share column read from the right.
    *
    * Scale shape: one narrow projection into a ≤64-row aggregation
    * (buckets are log₂ of a long), totals ride a 1-row broadcast
    * cross-join, and the cumulative sum is a window over the COLLAPSED
    * ≤64-row frame — on the [[graft.PlanShapeSpec]] global-window
    * allowlist for exactly that reason (input cardinality is bounded by
    * construction, not by data). */
  def lengthHistogram(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val w = withTokens(docs)
      .withColumn("n_words",
        call_function("count_nonempty", col("toks")).cast("long"))
      .filter(col("n_words") > 0)
      // floor(log2) via binary-string length: exact integer math, no
      // float edge at powers of two
      .withColumn("bucket", (length(expr("bin(n_words)")) - 1).cast("long"))
    val hist = w.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words_total"))
    val tot = hist.agg(
      sum(col("n_docs")).as("t_docs"), sum(col("n_words_total")).as("t_words"))
    hist.crossJoin(broadcast(tot))
      .withColumn("cum_words",
        sum(col("n_words_total")).over(Window.orderBy(col("bucket"))))
      .select(
        col("bucket"), col("n_docs"), col("n_words_total"),
        round(col("n_docs").cast("double") / col("t_docs"), 4).as("doc_share"),
        round(col("n_words_total").cast("double") / col("t_words"), 4)
          .as("word_share"),
        round(col("cum_words").cast("double") / col("t_words"), 4)
          .as("cum_word_share"))
      .orderBy(col("bucket"))
  }

  /** Token-distribution drift between two corpus sides — the ingest
    * monitoring number: yesterday's crawl vs today's, shard A vs shard B,
    * or (here, deterministically) the two halves of a hash split. Reports
    * Jensen–Shannon divergence (bounded [0, ln 2], symmetric, defined
    * even for disjoint vocabularies — why it beats raw KL for monitoring)
    * and total-variation distance, plus per-side vocabulary counts.
    *
    * Exact-replay arithmetic: p/m = 2·ca·tb/(ca·tb + cb·ta) is a ratio
    * of exact integer products, each ln is rounded ONCE to micro-nats and
    * weighted by the integer count, so both divergences aggregate BIGINTs
    * (TV's numerator Σ\|ca·tb − cb·ta\| likewise). Count products fit the
    * double mantissa up to ~9·10¹⁵ — per-token × side-total products at
    * extreme corpus sizes would switch the production form to per-side
    * probabilities, documented here.
    *
    * Scale shape: the DSIR shape — ONE token-keyed aggregation with two
    * conditional sums, a 1-row totals broadcast, then a 1-row collapse.
    * Token strings appear in exactly one Exchange (the vocab groupBy). */
  def corpusDrift(docs: DataFrame, salt: String = "drift1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val tk = withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("side", pmod(call_function("hash64",
        concat(lit(salt + "#"), col("doc_id").cast("string"))), lit(2L)))
    driftOf(tk)
  }

  /** Drift core over an explicit (tok, side) stream — the spec drives it
    * with a deliberately disjoint-vocabulary split to pin js → ln 2. */
  private[graft] def driftOf(tk: DataFrame): DataFrame = {
    val counts = tk.groupBy(col("tok")).agg(
      sum(when(col("side") === 0, 1L).otherwise(0L)).as("ca"),
      sum(when(col("side") === 1, 1L).otherwise(0L)).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
    counts.crossJoin(broadcast(tot))
      .select(
        col("ca"), col("cb"), col("ta"), col("tb"),
        when(col("ca") > 0, col("ca") *
          round(log(lit(2.0) * col("ca") * col("tb") /
            (col("ca") * col("tb") + col("cb") * col("ta"))) * 1e6).cast("long"))
          .otherwise(0L).as("jp"),
        when(col("cb") > 0, col("cb") *
          round(log(lit(2.0) * col("cb") * col("ta") /
            (col("ca") * col("tb") + col("cb") * col("ta"))) * 1e6).cast("long"))
          .otherwise(0L).as("jq"),
        abs(col("ca") * col("tb") - col("cb") * col("ta")).as("tvn"))
      .agg(
        count(lit(1)).as("n_vocab"),
        sum(when(col("ca") > 0, 1L).otherwise(0L)).as("n_vocab_a"),
        sum(when(col("cb") > 0, 1L).otherwise(0L)).as("n_vocab_b"),
        max(col("ta")).as("ta"), max(col("tb")).as("tb"),
        sum(col("jp")).as("sjp"), sum(col("jq")).as("sjq"),
        sum(col("tvn")).as("stv"))
      .select(
        col("n_vocab"), col("n_vocab_a"), col("n_vocab_b"),
        round((col("sjp").cast("double") / col("ta") +
          col("sjq").cast("double") / col("tb")) / 2e6, 6).as("js"),
        round(col("stv").cast("double") /
          (lit(2.0) * col("ta") * col("tb")), 6).as("tv"))
  }

  /** Quality-filter ensemble agreement matrix — before stacking four
    * filters in a funnel, measure whether they are redundant (agreement
    * ≈ 1: drop one) or contradictory (agreement ≈ 0.5: investigate).
    * Filters: Gopher rules, the NB classifier, the composite
    * quality-score floor, and a corpus-typicality cut (unigram NLL below
    * the corpus mean). Upper-triangle rows (filter_a, filter_b,
    * n_both_keep, n_agree, agree_rate); the diagonal carries each
    * filter's own keep count.
    *
    * Scale shape: Gopher + quality ride ONE narrow projection; NB and
    * unigram scores are the word-count-shaped frames the pipeline
    * already computes; gluing is two doc-keyed joins of four-column
    * frames plus a 1-row broadcast for the corpus-mean cut (compared in
    * EXACT integers: a_e4·n ≤ Σa_e4 — no float mean crosses engines);
    * the matrix is one collapsed aggregation melted by `stack`. */
  def filterAgreement(docs: DataFrame): DataFrame = {
    val gq = withGopherFlags(withQualityScore(docs))
      .select(col("doc_id"), col("keep").as("f_gopher"),
        (col("quality_score") >= graft.operators.Curation.QualityFloor)
          .as("f_quality"))
    val nb = nbQuality(docs)
      .select(col("doc_id"), col("pred").as("f_nb"))
    val uni = unigramScores(docs)
      .select(col("doc_id"), round(col("avg_nll") * 1e4).cast("long").as("a_e4"))
    val uniStats = uni.agg(sum(col("a_e4")).as("s_e4"), count(lit(1)).as("n_u"))
    val uniF = uni.crossJoin(broadcast(uniStats))
      .select(col("doc_id"), (col("a_e4") * col("n_u") <= col("s_e4")).as("f_ppl"))
    val f = gq.join(nb, Seq("doc_id")).join(uniF, Seq("doc_id"))
    val names = Seq("gopher", "nb", "ppl", "quality")
    val idx = for (i <- names.indices; j <- i until names.size)
      yield (names(i), names(j))
    val aggs = idx.flatMap { case (a, b) => Seq(
      sum(when(col(s"f_$a") && col(s"f_$b"), 1L).otherwise(0L)).as(s"bk_${a}_$b"),
      sum(when(col(s"f_$a") === col(s"f_$b"), 1L).otherwise(0L)).as(s"ag_${a}_$b"))
    } :+ count(lit(1)).as("n_docs")
    val stacked = idx.map { case (a, b) =>
      s"'$a', '$b', bk_${a}_$b, ag_${a}_$b, round(ag_${a}_$b / cast(n_docs as double), 4)"
    }.mkString(", ")
    f.agg(aggs.head, aggs.tail: _*)
      .select(expr(
        s"stack(${idx.size}, $stacked) as (filter_a, filter_b, n_both_keep, n_agree, agree_rate)"))
      .orderBy(col("filter_a"), col("filter_b"))
  }

  /** Hashed feature dimensionality for [[linearProbeMoments]]. */
  val ProbeDims = 8

  /** Distributed least squares the sufficient-statistics way: the moment
    * matrix [X 1 y]ᵀ[X 1 y] over signed hashed token-count features
    * (the [[featureHash]] formula at [[ProbeDims]] dims), an intercept,
    * and the Gopher keep pseudo-label. Solving the normal equations
    * (X̃ᵀX̃)β = X̃ᵀy on the ~(d+2)² driver-side matrix yields a linear
    * quality probe trained in ONE pass over the corpus — the pattern every
    * on-cluster linear/logistic trainer reduces to, and the distributed
    * half is this operator. The spec solves it and checks the probe beats
    * the majority class, proving the moments carry real signal.
    *
    * Scale shape: the features, intercept, and label are per-row lambdas
    * (no tokenize-explode-shuffle); the 55 upper-triangle sums reduce in
    * ONE partial-aggregated collapse — bytes shuffled are 55 longs per
    * partition, independent of corpus size. Every entry is an exact
    * integer (counts × counts), so the oracle matches bit-for-bit with no
    * float discipline needed. */
  /** The probe's per-document design row: signed hashed token counts
    * v0..v{d−1}, intercept v{d}, label v{d+1}. Exposed for the spec that
    * solves the normal equations and measures the probe's accuracy. */
  private[graft] def probeFeatures(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val d = ProbeDims
    // ONE native pass computes all d signed hashed-token counts (the SQL
    // form re-hashed every word d times through two interpreted lambdas
    // per dim) — probe_features(words, d)[i+1] equals the old v_i fold
    (0 until d).foldLeft(
      withGopherFlags(docs)
        .withColumn("pf", call_function("probe_features", col("words"), lit(d)))
        .withColumn(s"v${d + 1}", when(col("keep"), 1L).otherwise(0L))
        .withColumn(s"v$d", lit(1L))) { (f, i) =>
      f.withColumn(s"v$i", element_at(col("pf"), i + 1))
    }.drop("pf")
  }

  def linearProbeMoments(docs: DataFrame): DataFrame = {
    val d = ProbeDims
    val wide = probeFeatures(docs)
    val idx = for (i <- 0 to d + 1; j <- i to d + 1) yield (i, j)
    val sums = idx.map { case (i, j) =>
      sum(col(s"v$i") * col(s"v$j")).as(s"m_${i}_$j")
    }
    val stacked = idx
      .map { case (i, j) => s"${i}L, ${j}L, m_${i}_$j" }
      .mkString(", ")
    wide.agg(sums.head, sums.tail: _*)
      .select(expr(
        s"stack(${idx.size}, $stacked) as (i, j, m)"))
      .orderBy(col("i"), col("j"))
  }
}
