package graft.tools

import org.apache.spark.sql.SparkSession

/** Full-surface plan audit (optimization r16): formats the physical plan
  * of EVERY declared query and greps it for the 100 TB red flags the
  * optimization guide names — cartesian products / broadcast nested-loop
  * joins where an equi-join was intended, scans whose PushedFilters list
  * is empty despite filters in the query, and outlier Exchange counts.
  * One line per query: `name  exchanges  joins  flags`. Queries whose
  * construction is eager (CC loop, BPE merge ledger, k-means) execute
  * their driver loops during the build — expected, the sweep still sees
  * their FINAL frame's plan. Run:
  * `sbt "runMain graft.tools.PlanSweep [sfDir]"`. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    var flagged = 0
    for (n <- names) {
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // count the detail-section form "(n) Operator" only — FormattedMode
        // prints every node twice (tree header + detail section), so the
        // bare operator name counts double
        def c(s: String): Int = ("\\(\\d+\\) " + s).r.findAllIn(p).length
        val exch = c("Exchange\\b") + c("BroadcastExchange\\b")
        val cart = c("CartesianProduct")
        val bnlj = c("BroadcastNestedLoopJoin")
        val smj = c("SortMergeJoin")
        val wind = c("Window\\b")
        val flags = new StringBuilder
        if (cart > 0) flags.append(" CARTESIAN")
        if (bnlj > 0) flags.append(" BNLJ")
        // a parquet scan with an empty pushdown list while the plan also
        // carries Filter nodes — a manual-inspection HINT, not a verdict
        // (an empty list is correct when no predicate targets that scan,
        // and the Filter may sit above a different subtree)
        if (p.contains("PushedFilters: []") && c("Filter\\b") > 0)
          flags.append(" NOPUSH?")
        if (flags.nonEmpty) flagged += 1
        println(f"$n%-28s exch=$exch%2d smj=$smj%d win=$wind%d$flags")
      } catch {
        case e: Throwable =>
          println(f"$n%-28s ERROR ${e.getClass.getSimpleName}")
      }
    }
    println(s"[plansweep] ${names.size} queries, $flagged flagged")
    spark.stop()
  }
}
