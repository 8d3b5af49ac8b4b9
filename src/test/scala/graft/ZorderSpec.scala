package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Measured row-group-skipping gate for the Z-order clustering layout
  * ([[graft.operators.Layout]]).
  *
  * Three layouts of the same lineitem corpus, written with small parquet
  * block sizes so every file carries several row groups (file footers then
  * hold several prunable min/max ranges):
  *  - `natural` — clustered by l_orderkey (the ingest order): partkey and
  *    suppkey are random within every row group, nothing prunes;
  *  - `pksorted` — linear sort by l_partkey: partkey predicates prune
  *    hard, suppkey predicates read everything — the single-column-sort
  *    failure mode;
  *  - `zorder` — Morton-interleaved (partkey, suppkey): every row group
  *    covers a small rectangle, so EITHER column's range predicate skips
  *    most row groups.
  *
  * The measurement is the file-scan node's `numOutputRows` after
  * execution — rows surviving parquet row-group statistics pruning under
  * the pushed filter (the exact Filter node above the scan re-applies the
  * predicate, so correctness is layout-independent and asserted too).
  */
class ZorderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Scan-node output rows for a pushed-down-filter read (no aggregate —
    * the plan stays scan+filter, non-adaptive, metrics on the same tree). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val rows = df.queryExecution.executedPlan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numOutputRows").value
    }
    assert(rows.nonEmpty, "no FileSourceScanExec in the plan")
    rows.sum
  }

  test("z-order prunes row groups for BOTH dimensions; a linear sort only for its own") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val total = li.count()

    val b = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).collect()(0)
    val (pkMn, pkMx) = (b.getLong(0), b.getLong(1))
    val (skMn, skMx) = (b.getLong(2), b.getLong(3))
    // ~5%-of-range boxes, away from the edges
    def box(mn: Long, mx: Long): (Long, Long) = {
      val r = mx - mn
      (mn + (r * 40) / 100, mn + (r * 45) / 100)
    }
    val (pkLo, pkHi) = box(pkMn, pkMx)
    val (skLo, skHi) = box(skMn, skMx)

    val root = java.nio.file.Files.createTempDirectory("zorder").toString
    val smallGroups = Map("parquet.block.size" -> "65536")
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.options(smallGroups).parquet(s"$root/natural")
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.options(smallGroups).parquet(s"$root/pksorted")
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", s"$root/zorder",
      files = 16, writerOptions = smallGroups)

    def read(layout: String, pred: org.apache.spark.sql.Column): DataFrame =
      spark.read.parquet(s"$root/$layout").filter(pred).select("l_orderkey")

    val bothDims = col("l_partkey").between(pkLo, pkHi) &&
      col("l_suppkey").between(skLo, skHi)
    val skOnly = col("l_suppkey").between(skLo, skHi)

    // correctness first: pruning must never change the answer
    val nBoth = read("natural", bothDims).count()
    val nSk = read("natural", skOnly).count()
    for (l <- Seq("pksorted", "zorder")) {
      assert(read(l, bothDims).count() === nBoth, s"$l changed the both-dims answer")
      assert(read(l, skOnly).count() === nSk, s"$l changed the suppkey answer")
    }

    // the measured pruning: natural reads ~everything for both predicates
    val natBoth = scanRows(read("natural", bothDims))
    val natSk = scanRows(read("natural", skOnly))
    val zBoth = scanRows(read("zorder", bothDims))
    val zSk = scanRows(read("zorder", skOnly))
    val pkSk = scanRows(read("pksorted", skOnly))
    val pkBoth = scanRows(read("pksorted", bothDims))

    assert(natBoth > total / 2, s"natural layout unexpectedly pruned: $natBoth/$total")
    // z-order prunes the 2-D box AND the suppkey-only predicate
    assert(zBoth * 2 < natBoth, s"zorder both-dims read $zBoth vs natural $natBoth")
    assert(zSk * 2 < natSk, s"zorder suppkey-only read $zSk vs natural $natSk")
    // the linear partkey sort prunes its own column…
    assert(pkBoth * 2 < natBoth, s"pksorted both-dims read $pkBoth vs natural $natBoth")
    // …but cannot prune the other: it reads essentially everything
    assert(pkSk * 10 > natSk * 9, s"pksorted suppkey-only read $pkSk vs natural $natSk")

    graft.Bench.deleteRecursively(root)
  }

  test("zorderProfile buckets carry tight per-dimension rectangles vs a random layout") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val prof = Layout.zorderProfile(li, "l_partkey", "l_suppkey").collect()
    val b = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).collect()(0)
    val pkRange = (b.getLong(1) - b.getLong(0)).toDouble
    val skRange = (b.getLong(3) - b.getLong(2)).toDouble
    assert(prof.map(_.getLong(1)).sum === li.count(), "profile lost rows")
    // mean rectangle side ≪ full range on both dimensions: each z-bucket
    // is a genuinely 2-D-local slab, not a stripe
    val meanPkSpan = prof.map(r => (r.getLong(3) - r.getLong(2)).toDouble).sum / prof.length
    val meanSkSpan = prof.map(r => (r.getLong(5) - r.getLong(4)).toDouble).sum / prof.length
    assert(meanPkSpan < pkRange * 0.5, s"mean partkey span $meanPkSpan vs range $pkRange")
    assert(meanSkSpan < skRange * 0.5, s"mean suppkey span $meanSkSpan vs range $skRange")
  }
}
