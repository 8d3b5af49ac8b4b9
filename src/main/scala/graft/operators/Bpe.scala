package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BPE merge learning — tokenizer training, the step that turns a raw corpus
 * into the merge table a byte-pair-encoding tokenizer runs: start from
 * characters, repeatedly count adjacent symbol pairs (weighted by word
 * frequency) and merge the most frequent pair.
 *
 * Scale shape: classic BPE trains on the WORD-FREQUENCY table, not the
 * corpus — one word-count aggregation reduces 100 TB of text to a vocab of
 * distinct words with counts, and every subsequent round runs over that
 * (much smaller, but still distributed) table: positional bigrams via the
 * `word_ngrams` kernel, one map-side-combined count, and a 1-row argmax
 * collected to the driver (the only driver step — bounded by nMerges rows).
 * The merge application is a narrow literal `replace` projection.
 *
 * Representation: a word's symbol sequence is a single U+0001-delimited
 * string with every boundary DOUBLED (`<s><s>l<s><s>o<s><s>w<s><s>` with
 * `<s>` = the separator); applying merge (a,b) is
 * `replace(syms, sep+a+sep+sep+b+sep, sep+ab+sep)` — the pattern consumes
 * only the INNER half of each doubled boundary, so adjacent occurrences
 * never share matched characters and one greedy left-to-right
 * non-overlapping `replace` (both engines' semantics) merges every
 * occurrence in canonical BPE leftmost order: 'banana' under (a,n) becomes
 * [b,an,an,a], 'aaaaa' under (a,a) becomes [aa,aa,a]. (With single
 * boundaries the second of two adjacent occurrences shares its leading
 * delimiter with the first match and is skipped — 'banana' came out
 * [b,an,a,n,a].) Single-pass is canonical because merging (a,b) can never
 * create a NEW (a,b) occurrence: the merged token ab equals neither a
 * (b is non-empty) nor b (a is non-empty). Words containing the delimiter
 * itself are excluded up front.
 */
object Bpe {

  /** Symbol delimiter — a control char that never appears in normal text;
    * words containing it are filtered out rather than corrupting state. */
  val Sep = "\u0001"

  /** Merge rounds between lineage-truncating localCheckpoints. */
  val CheckpointEvery = 16

  /** Test seam (the driver-collect ledger discipline): rows materialized
    * on the driver by the merge loop since last reset. `learnMerges` is a
    * documented-carried 1-row collect PER ROUND (the k-means sync-point
    * shape) — the ledger makes that contract machine-checkable: a
    * regression to collecting the pair-count table (vocab-sized, corpus-
    * dependent) blows the ≤1-row-per-round bound `DriverStateGateSpec`
    * asserts. */
  private[graft] val driverCollectRows = new java.util.concurrent.atomic.AtomicLong

  private def spacedSyms =
    trim(call_function("replace", col("syms"), lit(Sep + Sep), lit(" ")))

  /** Char-level doubled-boundary symbol string for a word column. */
  private def charSyms(word: org.apache.spark.sql.Column) =
    concat(lit(Sep + Sep), regexp_replace(word, "(.)", "$1" + Sep + Sep))

  /** One merge application: consume the inner half of each boundary so
    * adjacent occurrences merge in the same pass (see class doc). */
  private def applyMerge(syms: org.apache.spark.sql.Column, a: String, b: String) =
    call_function("replace", syms,
      lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + (a + b) + Sep))

  /** The learned merge table: (merge_rank, lhs, rhs, merged, pair_count),
    * one row per round in learn order. Stops early if no pair remains. */
  def learnMerges(docs: DataFrame, nMerges: Int = 3): DataFrame =
    learnMergesAndSyms(docs, nMerges)._1

  /** [[learnMerges]] plus the final word-symbol table — exposed so tests
    * can assert the checkpoint cadence keeps its plan depth constant. */
  private[graft] def learnMergesAndSyms(docs: DataFrame, nMerges: Int = 3): (DataFrame, DataFrame) = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    val spark = docs.sparkSession
    import spark.implicits._
    // the corpus-to-vocab reduction happens ONCE: without the persist,
    // every round's 1-row collect would replay tokenize → explode →
    // word-count from the raw corpus (nMerges+1 full passes at 100 TB)
    val words = TextAnalysis.withTokens(docs)
      .select(explode(col("toks")).as("word"))
      .filter(col("word") =!= "" && !col("word").contains(Sep))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var syms = words.select(charSyms(col("word")).as("syms"), col("n"))
      val merges = Seq.newBuilder[(Int, String, String, String, Long)]
      var r = 1
      var exhausted = false
      while (r <= nMerges && !exhausted) {
        val best = syms
          .select(explode(call_function("word_ngrams", spacedSyms, lit(2))).as("pair"),
            col("n"))
          .groupBy(col("pair")).agg(sum(col("n")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair"))
          .limit(1).collect()
        driverCollectRows.addAndGet(best.length)
        if (best.isEmpty) exhausted = true
        else {
          val pair = best(0).getString(0)
          val cnt = best(0).getLong(1)
          val Array(a, b) = pair.split(" ", 2)
          merges += ((r, a, b, a + b, cnt))
          syms = syms.select(applyMerge(col("syms"), a, b).as("syms"), col("n"))
          // `syms` rebinds through the loop, so the plan lineage grows one
          // projection per round — fine at demo nMerges, an analyzer blowup
          // at a realistic 30k-merge vocab (and in production the standard
          // split applies: Spark reduces corpus → word counts once, the
          // tokenizer trains off-cluster on that table). localCheckpoint
          // every 16 rounds caps plan depth at a constant; the table is
          // vocab-sized, so the materialization is cheap.
          if (r % CheckpointEvery == 0) syms = syms.localCheckpoint()
          r += 1
        }
      }
      (merges.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
        .orderBy(col("merge_rank")), syms)
    } finally words.unpersist(blocking = false)
  }

  /** Per-document tokenization accounting under the learned merge table —
    * the encode step plus the metric tokenizer training optimizes: base
    * symbol (character) count vs post-merge token count and the compression
    * ratio.
    *
    * Scale shape: merges apply to the DISTINCT-word table (vocab-sized, not
    * corpus-sized — applying a deep merge chain per token occurrence would
    * redo identical work corpus-wide), then per-word counts join back to
    * the exploded corpus on the word — the word-count join shape again.
    * The merge list itself is the bounded driver-side learnMerges output. */
  def tokenizeSummary(docs: DataFrame, nMerges: Int = 3): DataFrame = {
    val merges = learnMerges(docs, nMerges).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val tokens = TextAnalysis.withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .filter(col("word") =!= "" && !col("word").contains(Sep))
    val wordSyms0 = tokens.select(col("word")).distinct()
      .withColumn("syms", charSyms(col("word")))
    val applied = merges.foldLeft(wordSyms0) { case (df, (a, b)) =>
      df.withColumn("syms", applyMerge(col("syms"), a, b))
    }
    val counts = applied.select(
      col("word"),
      length(col("word")).cast("long").as("n_chars"),
      size(split(trim(call_function("replace", col("syms"), lit(Sep + Sep), lit(" "))),
        " ")).cast("long").as("n_syms"))
    tokens.join(counts, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_chars")).as("n_base_syms"), sum(col("n_syms")).as("n_bpe_syms"))
      .withColumn("compression",
        round(col("n_base_syms").cast("double") / col("n_bpe_syms"), 4))
      .orderBy(col("doc_id"))
  }

  /** Tokenizer generalization check — learn the merges on the TRAIN split
    * only, tokenize everything, and report compression per split. A
    * held-out compression well below train means the merge table memorized
    * its corpus (too many merges / corpus too small) — the tokenizer
    * sibling of a train/val loss gap, run before freezing a vocab.
    *
    * Same scale shape as [[tokenizeSummary]]: learning sees the vocab-sized
    * word table (of the train split), application is vocab-sized + the
    * word-count join; the split is a narrow doc_id hash
    * ([[graft.operators.Curation.withSplit]]'s formula — no RNG, no join). */
  def tokenizeEval(docs: DataFrame, nMerges: Int = 3, valPermille: Int = 100,
      salt: String = "split1"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    def isVal(c: org.apache.spark.sql.Column) =
      call_function("hash64", concat(c.cast("string"), lit("#" + salt))) % 1000 <
        valPermille
    val merges = learnMerges(docs.filter(!isVal(col("doc_id"))), nMerges)
      .collect().map(r => (r.getString(1), r.getString(2)))
    val tokens = TextAnalysis.withTokens(docs)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .filter(col("word") =!= "" && !col("word").contains(Sep))
      .withColumn("split",
        when(isVal(col("doc_id")), "heldout").otherwise("train"))
    val wordSyms0 = tokens.select(col("word")).distinct()
      .withColumn("syms", charSyms(col("word")))
    val applied = merges.foldLeft(wordSyms0) { case (df, (a, b)) =>
      df.withColumn("syms", applyMerge(col("syms"), a, b))
    }
    val counts = applied.select(
      col("word"),
      length(col("word")).cast("long").as("n_chars"),
      size(split(trim(call_function("replace", col("syms"), lit(Sep + Sep), lit(" "))),
        " ")).cast("long").as("n_syms"))
    tokens.join(counts, Seq("word"))
      .groupBy(col("split"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_chars")).as("n_base_syms"),
        sum(col("n_syms")).as("n_bpe_syms"),
        round(sum(col("n_chars")).cast("double") / sum(col("n_syms")), 4)
          .as("compression"))
      .orderBy(col("split"))
  }
}
