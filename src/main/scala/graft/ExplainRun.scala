package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: `runMain graft.PlanAudit <query> [sfDir]` prints the
  * formatted physical plan of a SparkEntry query — the loop used to check
  * that scans prune/push down, small sides broadcast, and aggregates stay
  * partial before their exchange (the 100 TB checklist). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
