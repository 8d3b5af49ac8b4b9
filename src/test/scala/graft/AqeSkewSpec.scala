package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proof that `join_skew_aqe`'s declarative plan self-heals under skew: with
  * broadcast disabled (the 100 TB shape — a dim table too big to broadcast
  * becomes a shuffle join) and AQE skew thresholds scaled to the test data,
  * the executed plan must show OptimizeSkewedJoin splitting the hot
  * partition (`skew=true` on the sort-merge join). The query's VALUES are
  * oracle-gated at default conf; this spec pins the RUNTIME cure. */
class AqeSkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("AQE splits the hot-key partition of the skewed shuffle join") {
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE re-checks broadcastability with its OWN threshold at runtime —
      // leave either enabled and the join becomes a broadcast join and the
      // skew machinery (correctly) never engages
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // sf0.1 partitions are KB-scale; scale the detector down with the data
      // (factor 2 over a 32 KB floor instead of 5 over 256 MB)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // AQE splits a skewed reduce partition at MAP-OUTPUT granularity; the
      // sf0.1 single-file tables produce one map task = one indivisible
      // block. Rewrite the inputs as multi-file parquet (what any real
      // 100 TB table is) so the hot partition is actually divisible.
      val dir = java.nio.file.Files.createTempDirectory("graft-aqe-skew").toString
      spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
        .repartition(8).write.parquet(s"$dir/orders.parquet")
      spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
        .repartition(4).write.parquet(s"$dir/customer.parquet")
      val df = SparkEntry.queries("join_skew_aqe")(spark, dir)
      df.collect() // AQE finalizes the physical plan only on execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n${plan.take(4000)}")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
