package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
 * MOSS algorithm): from each document's positional k-gram hash sequence,
 * keep the MINIMUM hash of every w-length window. The guarantee MinHash
 * does not give: any shared substring of at least w+k−1 words contributes
 * at least one IDENTICAL selected fingerprint to both documents, so local
 * overlap (quotes, plagiarized passages, shared boilerplate runs) is
 * detected positionally, with a fingerprint density of ~2/(w+1) instead of
 * every position.
 *
 * Scale shape: selection is a narrow per-row projection (the k-gram
 * hashes come from the single-pass `word_ngrams` kernel; the window
 * minima are array ops over that column — the hash column is referenced,
 * never recomputed per element); the pair stage blocks on the shared
 * fingerprint VALUE, so the self-join shuffles (fingerprint, doc_id)
 * pairs and only documents sharing a selected fingerprint ever meet —
 * the same no-O(n²) contract as the rest of the dedup suite.
 */
object Winnow {

  /** k-gram length in words and winnowing window width. Guarantee
    * threshold: shared runs of ≥ w+k−1 = 8 words are always caught —
    * aligned with [[Passages.PassageN]]. */
  val K = 5
  val W = 4

  /** Per-document winnowed fingerprint sets over the augmented corpus:
    * (doc_id, n_grams, fps). */
  private def withFingerprints(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    Dedup.augmentedDocs(docs)
      .withColumn("hl",
        // native per-element kernel = transform(…, hash64), order kept
        call_function("hash64_array",
          call_function("word_ngrams", col("text"), lit(K))))
      .filter(size(col("hl")) >= W)
      // winnow_min: single-pass monotonic-deque kernel — the
      // array_min(slice(...)) SQL form is O(n·w) with a per-window
      // allocation and was the corpus sweep's slowest projection
      .select(col("doc_id"), size(col("hl")).cast("long").as("n_grams"),
        call_function("winnow_min", col("hl"), lit(W)).as("fps"))
  }

  /** Fraction of documents a fingerprint may appear in before the pair
    * stage drops it (with a floor of 2 docs so tiny corpora still pair).
    * A fingerprint present in a large share of the corpus is boilerplate —
    * site chrome, license headers — and carries no discriminative signal,
    * exactly like a stop-gram; worse, it makes its bucket quadratic in the
    * pair join (every doc meets every doc). Same fix class as the minhash
    * path's banding: cap the blocking key's posting-list size. */
  val MaxFpDocFrac = 0.05

  /** Fingerprint accounting per document: positions, selected fingerprint
    * count, and the selection density. Note `density` is computed over
    * DISTINCT selected fingerprint values per document (winnow_min
    * deduplicates), so on documents with internal repetition it reads
    * BELOW the paper's positional ~2/(w+1) selection density — it is a
    * lower bound on it, not the same metric. */
  def fingerprintSummary(docs: DataFrame): DataFrame =
    withFingerprints(docs)
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("long").as("n_fps"),
        round(size(col("fps")).cast("double") / col("n_grams"), 4).as("density"))
      .orderBy(col("doc_id"))

  /** Document pairs sharing ≥ `minShared` winnowed fingerprints — the
    * local-overlap report, with ASYMMETRIC containment on both sides:
    * `contain_a = n_shared/|fp_a|` ≈ how much of A's content appears in B
    * (near 1.0 when A is a quote/subset of a larger B — the signal
    * symmetric Jaccard dilutes away). Blocked on the fingerprint value
    * (8-byte hashes), counts via one groupBy per pair; the per-doc
    * fingerprint counts ride the exploded rows, no extra join. */
  def overlapPairs(docs: DataFrame, minShared: Int = 3): DataFrame = {
    val wf = withFingerprints(docs)
    val all = wf
      .select(col("doc_id"), size(col("fps")).cast("long").as("nf"),
        explode(col("fps")).as("f"))
    // frequency cap: a fingerprint in > max(2, ceil(frac·N)) documents is
    // corpus boilerplate — drop it BEFORE the self-join so no bucket goes
    // quadratic. The freq join shuffles on the same 8-byte key as the pair
    // join (co-partitioned); the 1-row total is broadcast.
    val total = wf.agg(count(lit(1)).as("n_docs_total"))
    val freq = all.groupBy(col("f")).agg(count(lit(1)).as("fp_docs"))
    val fp = all.join(freq, Seq("f"))
      .crossJoin(broadcast(total))
      .filter(col("fp_docs") <=
        greatest(lit(2L), ceil(lit(MaxFpDocFrac) * col("n_docs_total"))))
      .select(col("doc_id"), col("nf"), col("f"))
    fp.as("a").join(fp.as("b"),
        col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"),
        max(col("a.nf")).as("nfa"), max(col("b.nf")).as("nfb"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        round(col("n_shared").cast("double") / col("nfa"), 4).as("contain_a"),
        round(col("n_shared").cast("double") / col("nfb"), 4).as("contain_b"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
