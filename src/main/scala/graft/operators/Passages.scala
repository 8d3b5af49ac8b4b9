package graft.operators

import org.apache.spark.sql.DataFrame
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
}
