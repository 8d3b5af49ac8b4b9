package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Repeated-passage detection — substring-level dedup, the pass that targets
 * boilerplate (license headers, navigation chrome, templated paragraphs)
 * that whole-document dedup never sees because the surrounding documents
 * differ. The scalable formulation of suffix-array substring dedup
 * ("Deduplicating Training Data Makes Language Models Better", Lee et al.
 * 2021): fixed-length positional word n-grams stand in for arbitrary
 * repeated substrings — any repeated passage of ≥ n words contains a
 * repeated n-gram, so n-gram-level counting finds every such passage.
 *
 * Two products over the augmented corpus (the injected exact/truncated
 * copies guarantee cross-document repeats to verify against):
 *
 *  - [[topRepeatedPassages]]: the boilerplate report — the n-grams occurring
 *    in the most documents, with occurrence counts;
 *  - [[docRepeatedShare]]: the per-document filter score — the fraction of a
 *    document's n-gram positions that are corpus-repeated (cross-document).
 *    Documents above a threshold are boilerplate-heavy and get dropped or
 *    trimmed by the curation stage.
 *
 * Scale shape: n-grams are computed by the single-pass [[graft.functions.Signatures.wordNgrams]]
 * kernel (positional — multiplicity matters here, unlike the dedup
 * shingle sets) and immediately hashed, so every shuffle moves 8-byte
 * hashes + doc ids, never text. The repeated-hash table is built with one
 * map-side-combined aggregation; the share join is hash-equi on the gram
 * hash where each gram row matches at most one repeated-set row — no
 * pairwise blowup anywhere. The top-passages report keeps gram STRINGS
 * through its aggregation (the report is for humans), but partial
 * aggregation collapses per-partition duplicates before the shuffle and
 * the result is capped by TakeOrderedAndProject.
 */
object Passages {

  /** Passage length in words. 8 at test scale; production substring dedup
    * uses ~50 (Lee et al. §4) — the plan shape is identical. */
  val PassageN = 8

  /** (doc_id, gram) — positional n-gram STRINGS over an arbitrary
    * (doc_id, text) corpus, one row per occurrence. */
  private def gramStrings(corpus: DataFrame, n: Int): DataFrame = {
    graft.GraftExtensions.ensureRegistered(corpus.sparkSession)
    corpus
      .select(col("doc_id"),
        explode(call_function("word_ngrams", trim(col("text")), lit(n))).as("gram"))
  }

  /** The boilerplate report over an ARBITRARY (doc_id, text) corpus — the
    * production entry point (mirrors [[Pii.scanRaw]] / [[Dedup]] exposing
    * both raw-input and oracle-harness APIs): passages (word n-grams)
    * occurring in ≥ 2 distinct documents, ranked by document reach then
    * total occurrences. Deterministic total order
    * (n_docs desc, n_occ desc, gram asc). */
  def topRepeatedPassagesRaw(corpus: DataFrame, n: Int = PassageN,
      topK: Int = 20): DataFrame =
    gramStrings(corpus, n)
      .groupBy(col("gram"))
      .agg(
        count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram"))
      .limit(topK)

  /** The per-document filter score over an ARBITRARY (doc_id, text)
    * corpus: of a document's n-gram positions, how many are cross-document
    * repeats (the n-gram also appears in ANOTHER document —
    * within-document repetition is [[TextAnalysis.repetitionRatio]]'s
    * signal, not this one). Emits every document long enough to have an
    * n-gram; `repeated_share` is the curation threshold input. */
  def docRepeatedShareRaw(corpus: DataFrame, n: Int = PassageN): DataFrame = {
    val grams = gramStrings(corpus, n)
      .select(col("doc_id"), call_function("hash64", col("gram")).as("h"))
    // hashes appearing in ≥2 distinct docs; 8-byte keys only past this
    // point. min(doc)≠max(doc) ⟺ ≥2 distinct docs, in ONE partial-agg
    // shuffle — countDistinct would plan a second (h, doc_id) exchange
    val repeated = grams
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("dmin"), max(col("doc_id")).as("dmax"))
      .filter(col("dmin") =!= col("dmax"))
      .select(col("h"), lit(1).as("rep"))
    grams
      .join(repeated, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("rep").isNotNull, 1L).otherwise(0L)).as("n_repeated"))
      .withColumn("repeated_share",
        round(col("n_repeated").cast("double") / col("n_grams"), 4))
      .orderBy(col("doc_id"))
  }

  /** [[topRepeatedPassagesRaw]] over the deterministically duplicated
    * corpus — the oracle-verifiable harness entry point (the injected
    * exact/truncated copies guarantee cross-document repeats). */
  def topRepeatedPassages(docs: DataFrame, n: Int = PassageN,
      topK: Int = 20): DataFrame =
    topRepeatedPassagesRaw(Dedup.augmentedDocs(docs), n, topK)

  /** [[docRepeatedShareRaw]] over the duplicated corpus (oracle twin). */
  def docRepeatedShare(docs: DataFrame, n: Int = PassageN): DataFrame =
    docRepeatedShareRaw(Dedup.augmentedDocs(docs), n)

  /** Maximal duplicated spans — the CUT LIST of ExactSubstr dedup (Lee et
    * al. §4.1): per document, every maximal word range covered by n-gram
    * windows whose hash occurs ≥ 2 times anywhere in the corpus (within- OR
    * cross-document — unlike [[docRepeatedShareRaw]], which deliberately
    * counts only cross-document repeats: a removal pass must also cut the
    * second copy of a passage repeated inside one document). A window
    * starting at word p covers [p, p+n−1]; two duplicated windows belong to
    * one span when their start gap ≤ n (overlapping or touching coverage),
    * so each emitted row is a contiguous duplicated region
    * [span_start, span_end] in 1-based word positions.
    *
    * Scale shape — linear end-to-end, with NO pairwise stage (a stronger
    * contract than the pair-emitting dedups): positional n-grams come from
    * the single-pass `word_ngrams` kernel and are hashed immediately, so
    * shuffle rows are (8-byte hash, doc_id, pos); the duplicated-hash set is
    * ONE map-side-combined count aggregation (per-partition duplicate
    * windows collapse before the exchange); membership is a hash semi-join
    * where each gram row meets at most one hash row — a corpus-frequent
    * boilerplate hash makes a LARGE PROBE side but never a product; the
    * island merge re-shuffles only the duplicated positions to (doc_id)
    * partitions where a sort-window runs per document — per-key state is
    * bounded by document length, the same bound every per-doc kernel
    * already carries. */
  def duplicatedSpansRaw(corpus: DataFrame, n: Int = PassageN): DataFrame = {
    graft.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val grams = corpus
      .select(col("doc_id"),
        posexplode(call_function("word_ngrams", trim(col("text")), lit(n))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        call_function("hash64", col("col")).as("h"))
    val dup = grams
      .groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .select(col("h"))
    val dpos = grams.join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // gaps-and-islands: a NULL gap (first duplicated window of the doc)
    // opens island 0 on both engines (NULL > n is false in the CASE)
    val islands = dpos
      .withColumn("gap", col("pos") - lag(col("pos"), 1).over(byDoc))
      .withColumn("island",
        sum(when(col("gap") > n, 1L).otherwise(0L)).over(byDoc))
    islands
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_words"),
        col("n_windows"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** One-row removal budget for [[duplicatedSpansRaw]]'s cut list: documents
    * touched, span count, total duplicated words, and the corpus-level share
    * of words sitting inside a duplicated span — the number that decides
    * whether substring dedup is worth a rewrite pass at all (Lee et al.
    * report ~3% for C4; boilerplate-heavy crawls run far higher). The totals
    * side is a second single-pass aggregation; the two 1-row frames meet in
    * a broadcast cross join. */
  def duplicatedSpanStatsRaw(corpus: DataFrame, n: Int = PassageN): DataFrame = {
    val spans = duplicatedSpansRaw(corpus, n)
      .agg(count_distinct(col("doc_id")).as("n_docs_affected"),
        count(lit(1)).as("n_spans"),
        coalesce(sum(col("span_words")), lit(0L)).as("dup_words"))
    // word count uses the SAME whitespace-skipping convention as the
    // word_ngrams kernel the span positions come from: a bare
    // split(trim(text)) keeps a leading empty token on tab/newline-headed
    // text (SQL trim strips spaces only) and counts [""] = 1 for empty docs
    val totals = corpus.select(
      sum(size(expr("filter(split(text, '\\\\s+'), t -> t <> '')")).cast("long"))
        .as("total_words"))
    spans.crossJoin(broadcast(totals))
      .select(col("n_docs_affected"), col("n_spans"), col("dup_words"),
        round(col("dup_words").cast("double") / col("total_words"), 4)
          .as("dup_word_share"))
  }

  /** The REWRITE pass that applies [[duplicatedSpansRaw]]'s cut list —
    * ExactSubstr's actual output corpus: every duplicated span is excised
    * from every document carrying one (Lee et al. §4.1 remove ALL matched
    * occurrences; aggressive but deterministic and policy-free). Emits the
    * per-document removal accounting plus an md5 digest of the cleaned
    * text, so a full rewritten corpus never has to be materialized to
    * verify the pass.
    *
    * Scale shape: the cut list collapses to one (doc_id → span array) row
    * per AFFECTED document (bounded by doc length, usually a handful), so
    * the apply step is an equi join where the corpus side dominates and the
    * excision itself is a narrow higher-order-function projection over the
    * token array — no shuffle sees text except the final doc_id exchange
    * of the corpus itself. */
  def excisedRaw(corpus: DataFrame, n: Int = PassageN): DataFrame = {
    graft.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val spans = duplicatedSpansRaw(corpus, n)
      .groupBy(col("doc_id"))
      .agg(collect_list(
        struct(col("span_start").as("s"), col("span_end").as("e"))).as("spans"))
    corpus
      .join(spans, Seq("doc_id"), "left")
      // tokenize exactly as the word_ngrams kernel the span POSITIONS came
      // from (skip ALL whitespace runs, no empty tokens — a split(trim())
      // formulation would keep a leading "" on tab/newline-headed text and
      // shift every 1-based span position off by one), drop tokens covered
      // by any span, and join the survivors — ONE native codegen pass
      // (excise_stats) instead of the filter∘transform∘exists lambda tower
      // (each an interpreted CodegenFallback HOF); null spans (no cut-list
      // entry) keep every token, as the old `spans IS NULL OR` arm did
      .withColumn("ex", call_function("excise_stats", col("text"), col("spans")))
      .select(col("doc_id"),
        col("ex.n_words").as("n_words"),
        col("ex.kept_words").as("kept_words"),
        (col("ex.n_words") - col("ex.kept_words")).as("removed_words"),
        md5(col("ex.cleaned")).as("cleaned_digest"))
      .orderBy(col("doc_id"))
  }

  /** [[duplicatedSpansRaw]] over the duplicated corpus (oracle twin): the
    * injected exact copies yield full-document spans on both members and
    * the 80%-prefix copies yield prefix spans. */
  def duplicatedSpans(docs: DataFrame, n: Int = PassageN): DataFrame =
    duplicatedSpansRaw(Dedup.augmentedDocs(docs), n)

  /** [[excisedRaw]] over the duplicated corpus (oracle twin): injected
    * copies and their bases excise to (near-)empty documents. */
  def excised(docs: DataFrame, n: Int = PassageN): DataFrame =
    excisedRaw(Dedup.augmentedDocs(docs), n)

  /** [[duplicatedSpanStatsRaw]] over the duplicated corpus (oracle twin). */
  def duplicatedSpanStats(docs: DataFrame, n: Int = PassageN): DataFrame =
    duplicatedSpanStatsRaw(Dedup.augmentedDocs(docs), n)
}
