package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the 100 TB complement to static
  * predicate pushdown: when a fact ⋈ dim shuffle join has a SELECTIVE dim
  * filter, Catalyst's `InjectRuntimeFilter` builds a bloom filter from the
  * dim side's join keys at runtime and applies `might_contain` on the fact
  * side BEFORE its shuffle, so most fact rows drop at the scan instead of
  * riding the Exchange to be discarded by the join. Static pushdown can't
  * do this (the qualifying key set only exists at runtime); at a 100 TB
  * fact table this is the difference between shuffling 100 TB and
  * shuffling the matching fraction.
  *
  * This spec pins that the engine configuration the library runs under
  * actually injects the filter for the canonical dim-filtered star shape
  * (the `join_inner`/`join_star_revenue` family with broadcast disabled —
  * i.e. exactly the case where the dim is too big to broadcast and the
  * join must shuffle), and that injection never changes the answer.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("a selective dim filter injects a bloom filter on the fact side of a shuffle join") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // local test tables are KBs; drop the size gates so the local plan
      // takes the same decision the default thresholds take at warehouse
      // scale (dim under 10 MB, fact over 10 GB)
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // broadcast off = the join genuinely shuffles, the case the filter exists for
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      def shape() = {
        val o = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
        val c = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
          .filter(col("c_mktsegment") === "BUILDING")
        o.join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("rev"))
          .orderBy(col("c_nationkey"))
      }

      val filtered = shape()
      val plan = filtered.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n${plan.take(2000)}")
      val withFilter = filtered.collect()

      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val without = shape()
      assert(!without.queryExecution.optimizedPlan.toString.contains("might_contain"))
      assert(withFilter.toSeq === without.collect().toSeq,
        "runtime filter changed the join result")
      assert(withFilter.nonEmpty)
    } finally restore()
  }
}
