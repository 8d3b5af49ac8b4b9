package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench soak promoted to a failing test (r8 verdict ask #4): run the
  * dedup/diag/calibration family against the adversarially-skewed corpus
  * ([[Bench.soakCorpus]]: 5× hot-twin docs collapsed onto one language, one
  * hot custkey) and ASSERT the per-query max single-task shuffle stays
  * bounded — a reverted blocking cap (SimHash bucket frequency cap,
  * boilerplate co-partitioned join, keyed ntile replay, winnow frequency
  * cap) funnels the corpus through ONE task and trips the bound here,
  * instead of waiting for a human to read BENCH_r{N}.
  *
  * Bounds are ~5–10× the values measured at this corpus size (sf0.001 × 5
  * copies, measured 0.01–0.35 MB per task) — loose enough for partition
  * scheduling jitter, tight enough that quadratic-in-the-hot-family blowup
  * (the failure mode: the 5× twins make every hot bucket/digest group 5×
  * larger, so unblocked pair output grows 25×) lands far past them.
  */
class SoakSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // (query, max single-task shuffle-read bound in MB) — each ~5× the value
  // measured on this corpus (0.002–1.12 MB; shuffle bytes are
  // data-determined and hash-stable, so the slack covers partition-count
  // drift, not timing). The hot-twin corpus text alone is ~1.3 MB: a
  // reverted blocking cap that funnels the corpus (or a quadratic pair
  // family, 25× on the 5× twins) through one task lands far past these.
  private val family = Seq(
    "dedup_exact" -> 0.4,
    "clean_boilerplate" -> 0.2,
    // r16 pair restructure: simhash scores per collision map-side and
    // dedupes narrow (doc_a, doc_b, score) rows AFTER an explicit
    // cluster-width fanout, so the partial distinct collapses less per
    // partition — measured max task 0.56 MB on this corpus (was 0.06).
    // Still ~5× headroom below: a funneled/unblocked pair family on the
    // 5× twins is 25× the pair space, far past 3 MB.
    "dedup_simhash_pairs" -> 3.0,
    "dedup_winnow_pairs" -> 4.5,
    "text_nb_calibration" -> 5.5,
    "diag_skew" -> 0.1,
    // hot twins are the span kernel's worst case — EVERY window duplicated,
    // the dup set at its maximum — yet shuffles stay (hash, doc_id, pos);
    // measured 1.37 MB on this corpus
    "passage_spans" -> 7.0)

  test("no soak-family query funnels the hot-twin corpus through one task") {
    val dir = graft.bench.Corpora.soakCorpus(spark, "/root/testdata/sf0.001", copies = 5)
    val listener = new graft.bench.MaxTaskListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val over = family.flatMap { case (name, boundMb) =>
        listener.reset()
        SparkEntry.queries(name)(spark, dir).count()
        // deterministic drain: barrier on the listener bus, so straggler
        // task-end events can neither be missed nor bleed into the next
        // query's window after reset()
        org.apache.spark.graftutil.ListenerDrain.drain(spark.sparkContext)
        val gotMb = listener.maxShuffleRead / 1e6
        info(f"$name: max task shuffle $gotMb%.3f MB (bound $boundMb)")
        if (gotMb > boundMb) Some(f"$name: $gotMb%.2f MB > $boundMb MB") else None
      }
      assert(over.isEmpty, s"max-task shuffle bound exceeded:\n${over.mkString("\n")}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
