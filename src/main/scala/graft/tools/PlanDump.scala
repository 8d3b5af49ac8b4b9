package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print executed-plan strings for chosen queries so plan-shape
  * assertions (PlanShapeSpec) are written against reality, not guesses. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.tail.toSeq else Seq(
      "join_star_revenue", "sim_topk_brute", "text_bm25", "pii_scan",
      "decon_overlap", "dedup_exact", "dedup_incremental", "cur_sample",
      "sim_topk_ivf", "dedup_minhash_pairs")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(s"\n========== $n ==========")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
