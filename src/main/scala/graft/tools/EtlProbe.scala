package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Normalizer

/** Focused ETL-path experiment: where does the 15-table extract's wall
  * clock go, and which fan-out shape is fastest on the 12-era deep bench
  * corpus? Variants (measured results that picked the bench/production
  * shape are recorded in `StagedExport`'s scaladoc):
  *
  *  - cached:  cached `Dataset[DecodedBlock]` + concurrent writes. Every
  *    table job re-deserializes the whole in-memory `body` column (the
  *    cache stores the struct as ONE column), so 16 jobs ≈ 16 full
  *    corpus passes — 1.9–3.5k blocks/s however parallel/coalesced.
  *  - staged:  decode → parquet stage once, then concurrent writes over
  *    nested-schema-pruned stage scans — 11–15k blocks/s; the winner and
  *    the production path ([[graft.export.StagedExport]]).
  */
object EtlProbe {
  def main(args: Array[String]): Unit = {
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
    val (eraDirDeep, _) = graft.testkit.BenchEras.ensureGenerated(
      dir = "target/bench-eras-deep", filesPerFork = 32, blocksPerFile = 512)
    val recordsDeep = spark.read.format("era").load(eraDirDeep)
    val nBlocks = Normalizer.decodeBlocks(recordsDeep).count()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[etlprobe] $label%-12s ${sec}%8.2f s  ${nBlocks / sec}%9.0f blocks/s")
    }
    def tmp() = java.nio.file.Files.createTempDirectory("etlprobe").toString

    def cachedRun(label: String, parallelism: Int, coalesceTo: Int): Unit =
      time(label) {
        val blocks = Normalizer.decodeBlocks(recordsDeep).cache()
        blocks.foreachPartition((_: Iterator[graft.model.DecodedBlock]) => ())
        try graft.export.Sinks.exportSeparateFilesTimed(
          Normalizer.allDatasets(blocks).map { case (n, df) =>
            n -> (if (coalesceTo > 0) df.coalesce(coalesceTo) else df)
          }, s"${tmp()}/out.parquet", parallelism = parallelism)
        finally blocks.unpersist()
      }

    def stagedRun(label: String, parallelism: Int): Unit =
      time(label) {
        val per = graft.export.StagedExport.exportAll(
          Normalizer.decodeBlocks(recordsDeep), s"${tmp()}/stage",
          s"${tmp()}/out.parquet", parallelism = parallelism)
        per.toSeq.sortBy(-_._2._2).take(4).foreach { case (n, (_, s)) =>
          println(f"[etlprobe]     table $n%-22s ${s}%6.2f s") }
      }

    stagedRun("warmup", 16)
    stagedRun("staged_a", 16)
    stagedRun("staged_b", 16)
    cachedRun("cached_par16", 16, 0)
    cachedRun("cached_seq", 1, 4)
    spark.stop()
  }
}
