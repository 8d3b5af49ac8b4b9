package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone ramp runner — the scale-curve measurement without the rest
  * of the bench (decode, ETL, 200-query sweep). With
  * `SPARK_GRAFT_RAMP=deep` it adds the 512× rung (64× the largest
  * driver-provided corpus) and writes `BENCH_RAMP_DEEP.json`; otherwise
  * it reproduces the per-round 1×/8×/64× block.
  *
  * `SPARK_GRAFT_RAMP=deep SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.RampProbe"`
  */
object RampProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[ramp] ${graft.bench.Ramp.ramp(spark, sfDir)}")
    spark.stop()
  }
}
