package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-count scaling probe for the CC label-prop kernel: where does the
  * fixed cost come from — the edge frame, the per-round joins, or the
  * final jump fan-in? */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CP", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val li = graft.queries.Tables.load(spark, sfDir, "lineitem")
    val op = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var t0 = System.nanoTime()
    println(f"[cc] edges: ${e.count()} rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    for (r <- 0 to 4) {
      t0 = System.nanoTime()
      val n = graft.queries.Behavioral.ccLabelProp(e, r)
        .groupBy(col("comp")).agg(count(lit(1))).count()
      println(f"[cc] rounds=$r: $n comps, ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
      // re-persist the edge frame for the next rounds config
      op.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
    }
    spark.stop()
  }
}
