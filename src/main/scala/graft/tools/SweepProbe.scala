package graft.tools
import org.apache.spark.sql.SparkSession
object SweepProbe {
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
    val qs = args.toSeq
    qs.foreach { q => // warmup-free single shots, 2 rounds
      val f = graft.SparkEntry.queries(q)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f(spark, sfDir).count(); (System.nanoTime()-t0)/1e9
      }
      println(f"[sweep] $q%-24s ${times.map(t => f"$t%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
