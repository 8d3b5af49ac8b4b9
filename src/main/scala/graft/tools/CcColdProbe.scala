package graft.tools

import org.apache.spark.sql.SparkSession

/** Decomposes `graph_cc_labelprop`'s cold-run bill (VERDICT r12 stretch
  * #8: "cold pays ~17–24 s on a fresh JVM — split it or document it").
  *
  * Hypothesis under test: the cold bill is NOT the CC plan's own
  * whole-stage codegen but the SHARED co-purchase edge frame
  * (`Behavioral.coPurchaseEdges` — lineitem scan → basket self-join →
  * distinct → degree join, persisted once per corpus and reused by all
  * five graph queries) plus first-query JVM warmup. Protocol, fresh JVM:
  *
  *   1. `graph_degree_stats` — touches ONLY the edge frame (trivial agg on
  *      top), so its cold time ≈ the edge-frame materialization bill;
  *   2. `graph_cc_labelprop` cold — edge frame already cached;
  *   3. `graph_cc_labelprop` again — steady state.
  *
  * If (2) ≈ (3), the CC query's own one-time cost is small and the
  * headline "cc cold" is really the shared-build bill landing on
  * whichever graph query runs first — an amortized cost by design, to be
  * documented rather than optimized. Run:
  * `sbt "runMain graft.tools.CcColdProbe [sfDir]"`. */
object CcColdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-24s ${s}%8.2f s")
      s
    }
    val edgeBill = time("graph_degree_stats") // ≈ shared edge-frame build
    val ccCold = time("graph_cc_labelprop") // edge frame already cached
    val ccSteady = time("graph_cc_labelprop")
    println(f"edge-frame bill ≈ $edgeBill%.2f s; cc cold-after-edges " +
      f"$ccCold%.2f s vs steady $ccSteady%.2f s " +
      f"(ratio ${ccCold / math.max(0.001, ccSteady)}%.2f)")
    spark.stop()
  }
}
