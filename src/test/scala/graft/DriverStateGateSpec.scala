package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Curation, Dedup}

/** Driver-state no-regression gates for the two adjudicated-carried driver
  * sync points OUTSIDE the ANN family (r12 verdict stretch #7 — the
  * [[AnnGateSpec]] discipline extended):
  *
  *  1. **Dedup cluster union-find** (`Dedup.duplicateClusters`): the edge
  *     collect may fire ONLY under the `DriverCcMaxEdges` gate. The
  *     distributed pointer-doubling path must ledger ZERO driver rows and
  *     stay under a driver-bytes bound on a corpus whose edge list is far
  *     above it — and both paths must produce identical labels.
  *  2. **BPE merge loop** (`Bpe.learnMerges`): one 1-row collect per merge
  *     round, never a vocab- or corpus-sized pull.
  *
  * Each checker is seed-proven: forcing the collect (raised threshold /
  * planted corpus pull) must trip the same measurement. */
class DriverStateGateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Hot-twin corpus (the soak discipline): 16 copies where copies 1..15
    * are byte-identical near-dups ⇒ a dense LSH pair graph (tens of
    * thousands of edges — MBs if collected, well over the gate bound). */
  private lazy val docs = {
    val dir = graft.bench.Corpora.soakCorpus(spark, "/root/testdata/sf0.001", copies = 16)
    spark.read.parquet(s"$dir/documents.parquet")
  }

  private class ResultBytesListener
      extends org.apache.spark.scheduler.SparkListener {
    @volatile var total = 0L
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) total += m.resultSize
    }
  }

  private def measured[T](body: => T): (T, Long) = {
    val l = new ResultBytesListener
    spark.sparkContext.addSparkListener(l)
    try {
      val v = body
      org.apache.spark.graftutil.ListenerDrain.drain(spark.sparkContext)
      (v, l.total)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("distributed cluster path ledgers zero driver rows; union-find fires only under the gate; labels identical") {
    // distributed path: threshold 0 forces the pointer-doubling loop
    val led0 = Dedup.driverCollectRows.get()
    val (distRows, distBytes) = measured {
      Dedup.duplicateClusters(docs, driverMaxEdges = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    val distLedger = Dedup.driverCollectRows.get() - led0
    assert(distLedger === 0L,
      s"distributed path ledgered $distLedger driver rows — an edge collect leaked past the gate")
    assert(distRows.nonEmpty, "hot-twin corpus produced no duplicate clusters")

    // seed-proof: the SAME measurement sees the gated union-find collect.
    // (On this corpus the edge list is under DriverCcMaxEdges, so the
    // public path legitimately collects — which is exactly the planted
    // "regression" signal the distributed run must NOT show.)
    val (seedRows, seedBytes) = measured {
      Dedup.duplicateClusters(docs, driverMaxEdges = Dedup.DriverCcMaxEdges)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    val seedLedger = Dedup.driverCollectRows.get() - led0 - distLedger
    // the LEDGER is the gate (the AnnGateSpec driverCollectRows
    // discipline): raw result-bytes can't discriminate here because the
    // distributed loop's many per-round jobs accumulate more task-metric
    // overhead than one edge collect (measured 9.2 MB vs 4.2 MB on this
    // corpus) — whereas the ledger counts exactly the rows the union-find
    // pulls, and a regression that collects edges on the distributed path
    // flips distLedger from 0 to ≥ seedLedger
    info(s"edges ledgered by union-find: $seedLedger; " +
      s"bytes dist=$distBytes seed=$seedBytes (info only)")
    assert(seedLedger > 1000L,
      s"seed collected only $seedLedger edges — corpus too small to separate the gate")
    assert(seedLedger <= Dedup.DriverCcMaxEdges,
      "union-find collected MORE edges than the gate allows")
    // differential: both paths are the same operator
    assert(distRows === seedRows, "distributed and union-find labels differ")
  }

  test("stratum-rate builders ledger one row per stratum; a corpus-keyed stratum collect trips the same ledger") {
    // legit: temperature rates collect one row per LANGUAGE, epoch rates
    // one row per SOURCE — domain-bounded handfuls at any corpus size
    val led0 = Curation.driverCollectRows.get()
    val nLangs = docs.select("lang").distinct().count()
    val nSources = docs.select("source").distinct().count()
    val tempRates = Curation.temperatureRatesBp(docs)
    val tempLedger = Curation.driverCollectRows.get() - led0
    assert(tempRates.nonEmpty)
    assert(tempLedger === nLangs,
      s"temperature rates ledgered $tempLedger driver rows for $nLangs language strata")

    val epochRates = Curation.epochsRatesMicro(docs)
    val epochLedger = Curation.driverCollectRows.get() - led0 - tempLedger
    assert(epochRates.nonEmpty)
    assert(epochLedger === nSources,
      s"epoch rates ledgered $epochLedger driver rows for $nSources source strata")

    // seed-proof (VERDICT r13 #6): the regression class is a stratum
    // collect keyed on a CORPUS-cardinality column — route one through the
    // shared ledger site and assert the same measurement sees it blow the
    // per-stratum bound the legit paths just met
    val corpusRows = docs.count()
    val seed0 = Curation.driverCollectRows.get()
    Curation.ledgeredStrata(docs, col("doc_id").cast("string"), count(lit(1)))
    val seedLedger = Curation.driverCollectRows.get() - seed0
    assert(seedLedger === corpusRows,
      s"seed ledgered $seedLedger rows — the ledger site missed a corpus-keyed collect")
    assert(seedLedger > 100L * math.max(nLangs, nSources),
      "corpus too small to separate a stratum collect from a corpus collect")
  }

  test("BPE merge loop pulls exactly one row per round; a corpus-sized pull trips the bytes witness") {
    val led0 = Bpe.driverCollectRows.get()
    val rounds = 5
    val ((merges, _), legitBytes) = measured {
      val m = Bpe.learnMerges(docs, nMerges = rounds)
      (m.collect(), ())
    }
    val ledger = Bpe.driverCollectRows.get() - led0
    info(s"bpe rounds=$rounds ledger=$ledger bytes=$legitBytes")
    assert(merges.length === rounds, "merge loop exhausted early on this corpus")
    assert(ledger <= rounds.toLong,
      s"BPE ledgered $ledger driver rows over $rounds rounds — " +
        "the per-round collect outgrew limit(1)")

    // seed: the regression class — pulling the corpus-scale token frame
    // to the driver — must be visible to the same bytes witness. The
    // floor is ABSOLUTE (the 16×-corpus token pull measures a stable
    // ~2.8 MB): a relative margin over legitBytes proved flaky because
    // per-task metric overhead varies 5× with suite-order/session state
    // (181 KB standalone vs 1.07 MB mid-suite) while the ledger — the
    // actual gate above — does not.
    val (_, seedBytes) = measured {
      graft.operators.TextAnalysis.withTokens(docs)
        .select(explode(col("toks")).as("w")).collect()
    }
    info(s"bpe seed bytes=$seedBytes (legit $legitBytes)")
    assert(seedBytes > 2L * 1024 * 1024,
      s"seed pull measured only $seedBytes bytes — " +
        "the witness cannot see a corpus collect")
  }
}
