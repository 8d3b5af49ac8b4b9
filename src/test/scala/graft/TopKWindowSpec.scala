package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Measured witness for the rank-limit pushdown the ANN rankings stand on
  * (r13 Similarity review): every per-query top-k in
  * [[graft.operators.Similarity]] is a `row_number() ≤ k` filter over a
  * query-keyed window, and Spark's `InferWindowGroupLimit` rewrites that
  * into a partial WindowGroupLimit BELOW the Exchange — each task truncates
  * to k rows per query before anything shuffles. Without it, the window
  * funnels the whole scored corpus into nQueries tasks: a corpus-sized
  * single-task sort at 100 TB.
  *
  * PlanShapeSpec pins the plan shape on the registered sim_* queries; this
  * spec pins the BYTES — and seed-proves the witness by excluding the rule
  * and showing the same query then ships the corpus. */
class TopKWindowSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** 200k scored candidates, ONE query group — the window's worst case. */
  private def hotScored(): DataFrame = {
    import spark.implicits._
    (0 until 200000).map { i =>
      (0L, (graft.functions.Signatures.hash64String(s"b$i") % 1000L) / 1000.0, i.toLong)
    }.toDF("query_id", "cos", "vec_id").repartition(8)
  }

  private def topK(df: DataFrame, k: Int): Array[(Long, Double)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("vec_id"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
  }

  test("rank-limit pushdown truncates the ranking shuffle map-side; excluding the rule ships the corpus") {
    val df = hotScored().cache()
    try {
      df.count()
      val listener = new graft.bench.MaxTaskListener
      spark.sparkContext.addSparkListener(listener)
      try {
        listener.reset()
        val got = topK(df, 10)
        org.apache.spark.graftutil.ListenerDrain.drain(spark.sparkContext)
        val pushedBytes = listener.maxShuffleRead
        // value sanity against a driver-side sort of the same data
        val expect = df.collect()
          .map(r => (r.getDouble(1), r.getLong(2)))
          .sortBy { case (s, id) => (-s, id) }.take(10)
          .map { case (s, id) => (id, s) }
        assert(got.toSeq === expect.toSeq)
        // ≤ k rows per (task, query) survive the partial WindowGroupLimit:
        // 8 map partitions × 10 rows × ~26 B ≈ 2 KB; bound leaves headroom
        assert(pushedBytes < 64 * 1024,
          s"rank-limit pushdown lost: ranking shuffled $pushedBytes B")

        // seed-proof: exclude InferWindowGroupLimit and the identical query
        // must shuffle the full 200k-row group — the regression class this
        // witness exists to catch reads ≫ the bound above
        val key = "spark.sql.optimizer.excludedRules"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key,
          "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit")
        try {
          listener.reset()
          val gotSlow = topK(df, 10)
          org.apache.spark.graftutil.ListenerDrain.drain(spark.sparkContext)
          val fullBytes = listener.maxShuffleRead
          assert(gotSlow.toSeq === expect.toSeq) // same values either way
          assert(fullBytes > 20 * math.max(pushedBytes, 1L),
            s"witness cannot tell pushed ($pushedBytes B) from full " +
              s"($fullBytes B) — the seed-proof is broken")
        } finally prior match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      } finally spark.sparkContext.removeSparkListener(listener)
    } finally df.unpersist()
  }
}
