package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Normalizer
import graft.queries.EraQueries

/** The concurrent 15-table fan-out must be a pure latency optimization:
  * identical table contents, counts, and SUMMARY as the sequential path. */
class ExportParallelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("parallel fan-out equals the sequential export table-for-table") {
    val blocks = EraQueries.blocks(spark)
    val datasets = Normalizer.allDatasets(blocks)
    val seqDir = java.nio.file.Files.createTempDirectory("graft-exp-seq").toString
    val parDir = java.nio.file.Files.createTempDirectory("graft-exp-par").toString
    val seqCounts = graft.export.Sinks.exportSeparateFiles(
      datasets, s"$seqDir/out.parquet")
    val parTimed = graft.export.Sinks.exportSeparateFilesTimed(
      datasets, s"$parDir/out.parquet", parallelism = 8)
    assert(parTimed.keySet === seqCounts.keySet)
    parTimed.foreach { case (name, (rows, sec)) =>
      assert(rows === seqCounts(name), s"$name row count differs")
      assert(sec > 0.0)
    }
    // value-level equality on a populated child table and on blocks
    Seq("blocks", "attestations").foreach { t =>
      // total order: sort fully-rendered rows (slot alone is not unique
      // in the child tables)
      val a = spark.read.parquet(s"$seqDir/out_$t.parquet")
        .collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
      val b = spark.read.parquet(s"$parDir/out_$t.parquet")
        .collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
      assert(a === b, s"$t contents differ between sequential and parallel export")
    }
    // SUMMARY files byte-identical
    def summary(dir: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out_SUMMARY.txt")), "UTF-8")
    assert(summary(seqDir) === summary(parDir))
  }
}
