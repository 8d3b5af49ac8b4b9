package graft.tools

import org.apache.spark.sql.SparkSession

/** Executed-plan reuse diagnostic: runs each named query once and reports
  * how many `Scan parquet` nodes and reuse markers the FINAL adaptive plan
  * contains. Caveat: a plan string repeats an `InMemoryRelation`'s build
  * plan at every cache reference, so `scans` OVERCOUNTS for cached plans
  * (the build executes once); the number is exact for uncached plans —
  * which is the case it exists for: proving when a derivation re-executes
  * per use (e.g. the pre-r10 graph family re-scanned lineitem 14–36× per
  * query because AQE found no reusable exchanges across the iteration
  * lineage).
  *
  * `runMain graft.tools.ReuseProbe <query> [query ...]`
  */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // actual bytes read from sources across all tasks of the query's jobs —
    // the ground truth the plan string can't give: N× the input size means
    // the plan re-scanned N times, whatever the tree printed
    val in = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          in.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { q =>
      in.set(0L)
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.count()
      org.apache.spark.graftutil.ListenerDrain.drain(spark.sparkContext)
      val plan = df.queryExecution.executedPlan.toString
      val reused =
        "ReusedExchange|ReusedQueryStage|TableCacheQueryStage".r.findAllIn(plan).size
      val scans = "Scan parquet".r.findAllIn(plan).size
      val mb = math.rint(in.get() / 1e5) / 10
      println(s"[reuse] $q reused=$reused scans=$scans input_mb=$mb")
    }
    spark.stop()
  }
}
