package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark-decontamination operator — the training-data pipeline step that
 * flags training documents sharing long n-grams with a held-out evaluation
 * set (the standard leakage check run before pretraining: any training doc
 * carrying a verbatim benchmark n-gram is excluded or cleaned).
 *
 * Shape: the eval set is tiny relative to the corpus (benchmarks are
 * thousands of documents; the corpus is billions), so its n-gram hash set
 * is BROADCAST and the training corpus is never shuffled — each corpus
 * partition computes its shingle hashes map-side (narrow, codegen'd
 * [[graft.functions.SignatureExpressions]] kernel), probes the broadcast
 * hash table, and only the matching (train-doc, eval-doc, ngram) hits —
 * a vanishingly small subset — flow into the final per-doc aggregation.
 * At 100 TB that is one map pass plus an aggregation over hits only.
 *
 * Here the held-out set is carved deterministically out of the `documents`
 * table (`doc_id % EvalModulus == 0` on base ids) so the DuckDB oracle can
 * reproduce the whole computation value-for-value; the augmented corpus
 * (see [[Dedup.augmentedDocs]]) guarantees contaminated train docs exist —
 * exact and truncated copies of eval documents.
 */
object Contamination {

  /** Contamination n-gram length — long enough that no n-gram recurs by
    * chance (industry decontamination uses 8–13-grams). */
  val NgramN = 8

  /** Base doc_id stride carving the held-out eval set. */
  val EvalModulus = 50

  /** True for members of the held-out eval set: base documents only (the
    * augmented +100000/+200000 copies are corpus members even when their
    * id is a multiple of the stride). */
  private def isEval = col("doc_id") < 100000 && col("doc_id") % EvalModulus === 0

  /** Per-doc distinct n-gram hash sets over the augmented corpus. */
  private def withNgramHashes(aug: DataFrame, n: Int): DataFrame =
    aug
      .filter(size(col("toks")) >= n)
      .withColumn("shl",
        // native one-pass kernel = array_distinct(transform(…, hash64))
        call_function("hash64_set",
          call_function("word_shingles", col("text"), lit(n))))
      .withColumn("nsh", size(col("shl")).cast("long"))

  /** Decontamination over an ARBITRARY (train, eval) corpus pair — the
    * production entry point: `train` and `eval` each carry (doc_id, text)
    * plus whitespace-tokenized `toks` is derived here; the eval side is
    * broadcast (benchmarks are thousands of docs), the train corpus never
    * shuffles. Output as [[contaminatedDocs]]. */
  def scanRaw(train: DataFrame, eval: DataFrame, n: Int = NgramN): DataFrame = {
    graft.GraftExtensions.ensureRegistered(train.sparkSession)
    val trainSh = withNgramHashes(TextAnalysis.withTokens(train), n)
      .select(col("doc_id"), col("nsh"), explode(col("shl")).as("h"))
    val evalSh = withNgramHashes(TextAnalysis.withTokens(eval), n)
      .select(col("doc_id").as("eval_doc_id"), explode(col("shl")).as("h"))
    joined(trainSh, evalSh)
  }

  /** Training documents contaminated by the eval set: for each train doc
    * sharing ≥1 distinct `n`-gram with any eval doc — the number of shared
    * distinct n-grams, the number of eval docs hit, and the contaminated
    * share of the doc's own n-gram set. Harness entry point: the eval set
    * is carved out of the corpus on the deterministic stride (oracle twin
    * of [[scanRaw]]). */
  def contaminatedDocs(docs: DataFrame, n: Int = NgramN): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val hashed = withNgramHashes(Dedup.augmentedDocs(docs), n)
    val evalSh = hashed.filter(isEval)
      .select(col("doc_id").as("eval_doc_id"), explode(col("shl")).as("h"))
    val trainSh = hashed.filter(!isEval)
      .select(col("doc_id"), col("nsh"), explode(col("shl")).as("h"))
    joined(trainSh, evalSh)
  }

  /** Span-level contamination report — the surgical-removal upgrade of
    * [[contaminatedDocs]]: instead of a per-doc verdict, the WHERE of each
    * hit. For every contaminated train doc: how many n-gram positions
    * matched the eval set, the first/last contaminated word index, and the
    * number of maximal contiguous spans (hits whose word ranges touch or
    * overlap merge into one span) — enough for a cleaner to cut the
    * benchmark text out of the document instead of dropping it (the
    * modern pipeline's choice for long documents with one embedded
    * benchmark quote).
    *
    * Same scale shape as the scan: eval hash set broadcast, positional
    * grams narrow ([[graft.functions.SignatureExpressions]] `word_ngrams`
    * kernel), only hit positions reach the aggregation. */
  def contaminationSpans(docs: DataFrame, n: Int = NgramN): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val aug = Dedup.augmentedDocs(docs)
    val evalSh = withNgramHashes(aug.filter(isEval), n)
      .select(explode(col("shl")).as("h")).distinct()
    val trainPos = aug.filter(!isEval).filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode(call_function("word_ngrams", trim(col("text")), lit(n))))
      .select(col("doc_id"), col("pos"),
        call_function("hash64", col("col")).as("h"))
    trainPos.join(broadcast(evalSh), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_hit_positions"),
        min(col("pos")).cast("long").as("first_word"),
        (max(col("pos")) + n - 1).cast("long").as("last_word"),
        sort_array(collect_set(col("pos"))).as("ps"))
      .withColumn("n_spans",
        expr(s"""if(size(ps) < 2, 1,
                |  1 + size(filter(
                |    transform(sequence(1, size(ps) - 1),
                |      k -> element_at(ps, k + 1) - element_at(ps, k)),
                |    d -> d > $n)))""".stripMargin).cast("long"))
      .select(col("doc_id"), col("n_hit_positions"), col("first_word"),
        col("last_word"), col("n_spans"))
      .orderBy(col("doc_id"))
  }

  /** Fuzzy (MinHash-LSH) decontamination — the paraphrase-tolerant sibling
    * of the exact n-gram scan: a training document is flagged when its
    * MinHash signature collides with an eval document in an LSH band AND
    * the signature-agreement Jaccard estimate clears `estThreshold`. This
    * catches lightly edited / truncated benchmark copies whose long n-grams
    * no longer match verbatim (the PaLM/Llama-style "fuzzy dedup against
    * eval" check), at the price of n-gram-level precision — run both.
    *
    * Scale shape: signatures are the narrow codegen'd
    * [[graft.functions.SignatureExpressions]] kernel; the eval side
    * collapses to its band table (bands × ~30 B per benchmark doc —
    * thousands of docs, so broadcast); the corpus probes it map-side and
    * only banded candidates reach the estimate verify + per-doc
    * aggregation. The corpus never shuffles its text or signatures. */
  def fuzzyScanRaw(train: DataFrame, eval: DataFrame,
      estThreshold: Double = 0.5): DataFrame = {
    graft.GraftExtensions.ensureRegistered(train.sparkSession)
    val trainBands = Dedup.bandedSigs(Dedup.sigsOf(TextAnalysis.withTokens(train)))
    val evalBands = Dedup.bandedSigs(Dedup.sigsOf(TextAnalysis.withTokens(eval)))
      .select(col("band"), col("band_key"), col("doc_id").as("eval_doc_id"),
        col("sig").as("eval_sig"))
    trainBands
      .join(broadcast(evalBands), Seq("band", "band_key"))
      .select(col("doc_id"), col("eval_doc_id"), col("sig"), col("eval_sig"))
      .distinct() // a (train, eval) pair can collide in >1 band
      .withColumn("est_jaccard",
        // native kernel = size(filter(zip_with(…, (x,y) -> x = y), v -> v))
        expr(s"zip_eq_count(sig, eval_sig) / cast(${Dedup.MinhashK} as double)"))
      .filter(col("est_jaccard") >= estThreshold)
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("eval_doc_id")).as("n_eval_hits"),
        round(max(col("est_jaccard")), 4).as("best_est_jaccard"))
      .orderBy(col("doc_id"))
  }

  /** [[fuzzyScanRaw]] harness twin on the deterministic eval carve: the
    * augmented corpus's truncated (+100000) copies of eval-stride docs are
    * exactly the "edited benchmark copy" the fuzzy scan exists to catch
    * (and the exact scan under-reports). */
  def fuzzyContaminatedDocs(docs: DataFrame,
      estThreshold: Double = 0.5): DataFrame = {
    val aug = Dedup.augmentedDocs(docs)
    fuzzyScanRaw(aug.filter(!isEval), aug.filter(isEval), estThreshold)
  }

  private def joined(trainSh: DataFrame, evalSh: DataFrame): DataFrame =
    trainSh.join(broadcast(evalSh), Seq("h"))
      .groupBy(col("doc_id"), col("nsh"))
      .agg(
        countDistinct(col("h")).as("n_shared_ngrams"),
        countDistinct(col("eval_doc_id")).as("n_eval_docs"))
      .select(
        col("doc_id"),
        col("n_shared_ngrams"),
        col("n_eval_docs"),
        round(col("n_shared_ngrams").cast("double") / col("nsh"), 4)
          .as("contaminated_share"))
      .orderBy(col("doc_id"))
}
