package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Scale gate for the persisted co-purchase edge frame: the graph family
  * must read the lineitem SOURCE once per corpus, not once per
  * iteration/consumer. Before r10 the adaptive plans re-executed the
  * scan + self-join + distinct derivation at every use (14 source scans
  * for 3-iteration PageRank, 36 for the triangle closure, zero reused
  * stages) — locally invisible because the file sits in page cache, a
  * 14–36× corpus read at warehouse scale. The assertion is on EXECUTED
  * scan-node metrics (rows actually produced by FileSourceScan nodes,
  * deduplicated by metric accumulator), so a regression to lazy
  * re-derivation fails loudly rather than resurfacing as an unexplained
  * bench slope. */
class ScanOnceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Sum of `numOutputRows` over every DISTINCT executed FileSourceScan
    * node reachable from the plan — through AQE wrappers and into cached
    * relations' build plans — deduplicated by accumulator id so a node
    * referenced from many places counts its executions once. */
  private def sourceRowsRead(plan: SparkPlan): Long = {
    val seen = scala.collection.mutable.Set[Long]()
    var total = 0L
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case s: FileSourceScanExec =>
        val m = s.metrics("numOutputRows")
        if (seen.add(m.id)) total += m.value
      case im: InMemoryTableScanExec =>
        walk(im.relation.cachedPlan)
        im.children.foreach(walk)
      case other =>
        other.children.foreach(walk)
        other.subqueries.foreach(walk)
    }
    walk(plan)
    total
  }

  /** Source rows THIS execution read: the scan accumulators inside a
    * cached relation's build plan keep their values from the run that
    * materialized the cache, so the gate measures the delta across the
    * action, not the absolute value. */
  private def runAndMeasure(name: String): Long = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    val before = sourceRowsRead(df.queryExecution.executedPlan)
    df.count()
    org.apache.spark.graftutil.ListenerDrain.drain(spark.sparkContext)
    sourceRowsRead(df.queryExecution.executedPlan) - before
  }

  test("PageRank reads the lineitem source at most once despite 3 iterations") {
    // fresh cache so THIS query pays (and exposes) the one materialization
    spark.sharedState.cacheManager.clearCache()
    val lineitemRows = spark.read
      .parquet(s"${TestSpark.sf}/lineitem.parquet").count()
    val read = runAndMeasure("graph_pagerank")
    // one full pass builds the persisted edge frame; nothing else should
    // touch the source (the pre-fix plan read it 14×)
    assert(read <= lineitemRows,
      s"pagerank read $read source rows for a $lineitemRows-row lineitem — " +
        "the edge derivation is re-executing instead of riding the persisted frame")
    assert(read > 0L, "expected the edge-frame build to scan the source once")
  }

  test("triangle closure rides the same persisted frame — zero further source reads") {
    // cache is warm from the previous test (the sweep-order benefit this
    // gate documents): the closure's three reads of the edge frame must
    // hit the cache, never the source
    val read = runAndMeasure("graph_triangles")
    assert(read == 0L,
      s"triangles read $read source rows with a warm edge cache — " +
        "expected every edge consumer to read the persisted frame")
  }
}
