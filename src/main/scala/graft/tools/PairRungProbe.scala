package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off pricing probe for the dedup pair families' 512× deep rung
  * (VERDICT r15 #5): builds the deep ramp corpus once and times ONE pass
  * of each pair query, so the deep-run budget is planned from a measured
  * number instead of an extrapolation. (The ramp itself runs two spaced
  * passes; double the printed seconds for the in-run cost.)
  *
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.PairRungProbe 512"` */
object PairRungProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = if (args.nonEmpty) args(0).toInt else 512
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("dedup_minhash_pairs", "dedup_simhash_pairs")
    val dir = graft.bench.Corpora.rampCorpus(spark, sfDir, copies)
    try qs.foreach { q =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"PAIR_RUNG copies=$copies q=$q sec=$sec%.1f rows=$n")
    } finally graft.Bench.deleteRecursively(dir)
    spark.stop()
  }
}
