package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.export.Bucketed

/** Bucketed-layout plan guarantee: a join of two tables bucketed on the
  * join key must read co-partitioned buckets and plan WITHOUT any
  * Exchange — the storage-side answer to the recurring-join shuffle at
  * 100 TB. Broadcast is disabled for the assertion so the plan can't
  * sidestep the question with a tiny-side broadcast. */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("join of two tables bucketed on the key plans zero Exchange; unbucketed twin shuffles both sides") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val scores = graft.operators.TextAnalysis.qualityScores(docs)
    Bucketed.saveBucketed(docs, "docs_bkt", "doc_id", 8)
    Bucketed.saveBucketed(scores, "scores_bkt", "doc_id", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.colocatedJoin(spark, "docs_bkt", "scores_bkt", "doc_id")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n${p.take(2000)}")
      assert(p.contains("SortMergeJoin"), p.take(2000))
      assert(joined.count() === docs.count())
      // the same join over plain parquet pays an Exchange on both sides
      val plain = docs.join(scores, Seq("doc_id"))
      val pp = plain.queryExecution.executedPlan.toString
      assert(pp.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2, pp.take(2000))
      // values identical either way
      assert(joined.agg(sum(col("n_tokens"))).collect()(0).getLong(0) ===
        plain.agg(sum(col("n_tokens"))).collect()(0).getLong(0))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS docs_bkt")
      spark.sql("DROP TABLE IF EXISTS scores_bkt")
    }
  }

  test("sessionization over a user-bucketed events table plans with ZERO Exchange") {
    // the at-rest layout for an event-log warehouse: bucketed by user_id,
    // so the user-keyed window pair AND the (user_id, session_seq)
    // aggregation — whose ClusteredDistribution a user_id HashPartitioning
    // already satisfies — all reuse the storage partitioning
    val ev = graft.queries.Tables.load(spark, TestSpark.sf, "events")
    Bucketed.saveBucketed(ev, "events_bkt", "user_id", 8)
    val out = graft.queries.Relational.sessionize(spark.table("events_bkt"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucketed sessionization still shuffles:\n${p.take(3000)}")
    assert(p.contains("Window"), p.take(2000))
    // same body over plain parquet pays the user_id Exchange — and values match
    val plain = graft.queries.Relational.sessionize(ev)
    assert(plain.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(key(out) === key(plain))
  }

  test("digest-bucketed snapshot: the ingest gate shuffles only the arriving batch") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val aug = Dedup.augmentedDocs(docs)
    Dedup.saveSnapshotDigests(aug.filter(col("doc_id") < 100000), "snap_digests", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val batch = aug.filter(col("doc_id") >= 100000)
      val gated = Dedup.incrementalStatusBucketed(batch, "snap_digests")
      val p = gated.queryExecution.executedPlan.toString
      // one hash Exchange (the batch side + the final sort's range exchange
      // are all that's allowed); the snapshot side reads its buckets
      assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
        s"snapshot side shuffled:\n${p.take(3000)}")
      // labeling identical to the self-contained operator
      val viaBucketed = gated.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val viaPlain = Dedup.incrementalStatus(docs)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(viaBucketed === viaPlain)
      assert(viaBucketed.valuesIterator.contains("duplicate") &&
        viaBucketed.valuesIterator.contains("new"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS snap_digests")
    }
  }
}
