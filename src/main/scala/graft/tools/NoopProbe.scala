package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures guide §1.4's count()-vs-noop gap on this repo's own queries
  * (optimization r16): `df.count()` lets the optimizer prune unreferenced
  * aggregate expressions and projections (a groupBy(k).agg(sum(x)) under
  * count() plans as a distinct-key count — the sums never run), while the
  * noop sink computes every column of every row. If the gap is material,
  * the sweep's timed action under-measures expression cost and the bench
  * needs a noop-sink arm. Best-of-2 per action (run 1 pays codegen JIT),
  * count first then noop on a fresh plan each time. Run:
  * `sbt "runMain graft.tools.NoopProbe [sfDir] [q1,q2,...]"`. */
object NoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("agg_pricing", "agg_stats_by_type", "agg_percentile",
        "era_fork_summary", "text_tfidf", "cur_split_grouped",
        "win_zscore_anomaly", "rec_item_sim", "dedup_minhash_pairs",
        "evt_markov_chain")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def bestOf2(act: => Unit): Double = {
      def once: Double = {
        val t0 = System.nanoTime(); act; (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }
    println(f"${"query"}%-24s ${"count"}%8s ${"noop"}%8s  noop/count")
    for (n <- names) {
      try {
        spark.sparkContext.setJobDescription(s"noopprobe: $n count")
        val c = bestOf2(graft.SparkEntry.queries(n)(spark, sfDir).count())
        spark.sparkContext.setJobDescription(s"noopprobe: $n noop")
        val w = bestOf2(graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
        println(f"$n%-24s $c%8.3f $w%8.3f  ${w / math.max(1e-9, c)}%6.2f")
      } catch {
        case e: Throwable => println(f"$n%-24s ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
