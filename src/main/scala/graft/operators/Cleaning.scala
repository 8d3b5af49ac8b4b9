package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Global duplicated-span removal with document REWRITE — the C4 /
 * RefinedWeb cleaning step that document-level dedup cannot express:
 * instead of keeping or dropping whole documents, every span that recurs
 * across the corpus (site chrome, cookie banners, license boilerplate) is
 * cut out of every document carrying it, and the document is rebuilt from
 * its surviving spans. (C4 removes lines occurring ≥3 times; RefinedWeb
 * removes duplicated spans — reference behavior per Raffel et al. 2020 §2.2
 * and Penedo et al. 2023 §3.3. The reference engine has no equivalent; this
 * is part of the training-data surface beyond it.)
 *
 * The corpus here has no newlines, so the "line" unit is a fixed-width
 * NON-overlapping token chunk (the stride = size degenerate of
 * [[Curation.chunkDocs]]): identical repeated passages land on identical
 * chunk boundaries for the exact/truncated duplicates [[Dedup.augmentedDocs]]
 * injects, which is what makes the operator oracle-verifiable end to end.
 *
 * Scale shape (100 TB):
 *  - chunking is narrow, per-row lambda work; the chunk-frequency
 *    aggregation shuffles (digest) pairs only — never chunk text;
 *  - the boilerplate set (digests in ≥ minDocs distinct docs) is the
 *    REPEATED subset — usually small, but its size is corpus-dependent and
 *    UNBOUNDED (a boilerplate-heavy crawl can have millions of shared
 *    digests), so it is NOT broadcast: the mark-back is a shuffle hash
 *    join co-partitioned on digest. The chunk stream already shuffles on
 *    digest for the frequency count, so the join adds no new shuffle of
 *    chunk text beyond the digest-keyed exchange it needs anyway, and the
 *    per-partition hash map holds only that partition's slice of the bad
 *    set — no driver collect, no single-executor broadcast build;
 *  - the rebuild is the one inherent doc-keyed shuffle: the output IS a
 *    rewritten corpus, so each document's surviving chunks must meet once.
 *    On a recurring pipeline, store the corpus bucketed by doc_id
 *    ([[graft.export.Bucketed]]) and the rebuild is shuffle-free too.
 */
object Cleaning {

  /** Non-overlapping chunk width (words). Two sites sharing ≥ 2·ChunkWords
    * words of boilerplate are guaranteed ≥ 1 identical chunk when aligned;
    * the augmented corpus duplicates whole prefixes, so alignment holds. */
  val ChunkWords = 8

  /** A chunk digest present in ≥ MinDocs distinct documents is boilerplate. */
  val MinDocs = 2

  /** (doc_id, chunk_idx, chunk_toks, digest) — narrow. */
  private def chunked(corpus: DataFrame, chunkWords: Int): DataFrame =
    corpus
      .withColumn("words", expr("filter(toks, t -> t <> '')"))
      .withColumn("n_words", size(col("words")))
      .filter(col("n_words") > 0)
      .withColumn("n_chunks",
        expr(s"cast(ceil(n_words / cast($chunkWords as double)) as int)"))
      .select(col("doc_id"), col("words"),
        posexplode(expr("sequence(0, n_chunks - 1)")).as(Seq("pos", "i")))
      .select(
        col("doc_id"),
        col("i").cast("long").as("chunk_idx"),
        expr(s"slice(words, i * $chunkWords + 1, $chunkWords)").as("chunk_toks"))
      .withColumn("digest", md5(array_join(col("chunk_toks"), " ")))

  /** Production entry point over an arbitrary (doc_id, text) corpus:
    * per-document rewrite summary after cutting every chunk whose digest
    * occurs in ≥ `minDocs` distinct documents. Emits the surviving word
    * count and the md5 of the rebuilt text (the rebuilt text itself is one
    * `array_join` away; the digest keeps the oracle compare narrow). */
  def rewriteRaw(corpus: DataFrame, chunkWords: Int = ChunkWords,
      minDocs: Int = MinDocs): DataFrame = {
    val chunks = chunked(TextAnalysis.withTokens(corpus), chunkWords)
    // Boilerplate digests: the repeated subset. Its size is unbounded in a
    // boilerplate-heavy corpus, so it must never be broadcast — the
    // shuffle_hash hint forces a digest-co-partitioned hash join (the bad
    // side reuses its aggregation exchange; each partition builds a hash
    // map over only its slice of the bad set).
    val bad = chunks.groupBy(col("digest"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("digest"), lit(true).as("is_boiler"))
    chunks
      .join(bad.hint("shuffle_hash"), Seq("digest"), "left_outer")
      .withColumn("keep", col("is_boiler").isNull)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        sum(when(col("keep"), size(col("chunk_toks")).cast("long"))
          .otherwise(0L)).as("clean_n_words"),
        md5(array_join(
          flatten(sort_array(collect_list(
            when(col("keep"), struct(col("chunk_idx"), col("chunk_toks")))))
            .getField("chunk_toks")), " ")).as("clean_digest"))
      .orderBy(col("doc_id"))
  }

  /** Harness twin: the augmented corpus guarantees cross-document repeated
    * chunks (exact + truncated-prefix copies), so removal is exercised on
    * every fixture scale. */
  def boilerplateRewrite(docs: DataFrame): DataFrame =
    rewriteRaw(Dedup.augmentedDocs(docs))
}
