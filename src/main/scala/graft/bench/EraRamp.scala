package graft.bench

import org.apache.spark.sql.SparkSession

/** The era-domain scale ramp (decode + staged ETL at 512-block and
  * production 8,192-block geometry). Extracted from `graft.Bench`
  * (VERDICT r15 #6). */
object EraRamp {

  /** Era-domain scale ramp (closes the "scale story above one fixture
    * corpus" gap): decode + staged 15-table export at 1×/4×/16× of a
    * 12k-block era archive — the top rung is 384 era files / ~197k blocks
    * / ~2.4 GB, 2× the deep decode corpus — with per-4×-step growth
    * factors (sec[i+1] / (4·sec[i]); 1.0 = perfectly linear). One era
    * FILE = one scan partition, so the archive fans out exactly `files`
    * ways at every rung — `scan_partitions` is recorded next to `files`
    * so a reader can check the parallelism claim, not take it on faith.
    * Both measurements are best-of-2 per rung, RUNG-SPACED (r14 — the
    * sweep's spacing discipline): pass 1 visits every rung, pass 2
    * revisits them, so one steal/writeback window (this sandbox's parquet
    * write path occasionally stalls 10–20× on page-cache writeback, and
    * its steal windows run minutes) can no longer cover both reps of the
    * same rung and fake a superlinear step. Corpora are
    * marker-cached under target/ (generated once per machine); the ETL
    * outputs are temp dirs deleted per run. */
  def eraRamp(spark: SparkSession): String = {
    def r3(d: Double) = math.rint(d * 1000) / 1000
    // one pass = every rung measured once (decode + ETL); per-rep: temp
    // dirs are created/deleted OUTSIDE the timed window (multi-GB
    // recursive deletes were previously inside it, conflating export
    // throughput with filesystem delete cost that grows with rung size),
    // and each ETL rep carries a stage-write MB/s WITNESS so a rep that
    // hit this sandbox's bimodal writeback stall is labeled environment
    // IN the artifact, not relitigated from memory.
    def measure(rungs: Seq[Int], blocksPerFile: Int, dirPrefix: String): String = {
      val corpora = rungs.map { fpf =>
        val (dir, _) = graft.testkit.BenchEras.ensureGenerated(
          dir = s"$dirPrefix$fpf", filesPerFork = fpf,
          blocksPerFile = blocksPerFile)
        fpf -> spark.read.format("era").load(dir)
      }
      def pass(): Seq[(Long, Double, Double, Double)] = corpora.map { case (_, records) =>
        var blocks = 0L
        System.gc()
        val decodeSec = graft.Bench.best(1) {
          blocks = graft.operators.Normalizer.decodeBlocks(records).count()
        }
        val stage = java.nio.file.Files.createTempDirectory("graft-era-ramp-stage").toString
        val out = java.nio.file.Files.createTempDirectory("graft-era-ramp-out").toString
        val t0 = System.nanoTime()
        val perTable = graft.export.StagedExport.exportAll(
          graft.operators.Normalizer.decodeBlocks(records),
          s"$stage/blocks", s"$out/out.parquet")
        val etlSec = (System.nanoTime() - t0) / 1e9
        val stageSec = math.max(0.001, etlSec - perTable.values.map(_._2).max)
        val mbps = graft.Bench.dirBytes(stage) / 1e6 / stageSec
        graft.Bench.deleteRecursively(stage); graft.Bench.deleteRecursively(out)
        (blocks, decodeSec, etlSec, mbps)
      }
      val p1 = pass()
      val p2 = pass()
      val per = rungs.indices.map { i =>
        val fpf = rungs(i)
        val (blocks, d1, e1, m1) = p1(i)
        val (_, d2, e2, m2) = p2(i)
        val (etlSec, etlMbps) = if (e1 <= e2) (e1, m1) else (e2, m2)
        (fpf * 6, corpora(i)._2.rdd.getNumPartitions, blocks,
          math.min(d1, d2), etlSec, etlMbps, Seq(e1, e2), Seq(d1, d2))
      }
      def growth(xs: Seq[Double]) =
        xs.sliding(2).map { case Seq(a, b) => r3(b / (4 * a)) }.toSeq
      val decodeSecs = per.map(_._4)
      val etlSecs = per.map(_._5)
      s""""scales":[${rungs.indices.map(i => math.pow(4, i).toInt).mkString(",")}],""" +
        s""""blocks_per_file":$blocksPerFile,""" +
        s""""files":[${per.map(_._1).mkString(",")}],""" +
        s""""scan_partitions":[${per.map(_._2).mkString(",")}],""" +
        s""""blocks":[${per.map(_._3).mkString(",")}],""" +
        s""""decode_sec":[${decodeSecs.map(r3).mkString(",")}],""" +
        s""""decode_reps_sec":[${per.map(_._8.map(r3).mkString("[", ",", "]")).mkString(",")}],""" +
        s""""decode_blocks_per_sec":[${per.map(p => math.rint(p._3 / p._4)).mkString(",")}],""" +
        s""""decode_step_growth":[${growth(decodeSecs).mkString(",")}],""" +
        s""""etl_sec":[${etlSecs.map(r3).mkString(",")}],""" +
        s""""etl_step_growth":[${growth(etlSecs).mkString(",")}],""" +
        s""""etl_stage_mbps":[${per.map(p => r3(p._6)).mkString(",")}],""" +
        s""""etl_reps_sec":[${per.map(_._7.map(r3).mkString("[", ",", "]")).mkString(",")}]"""
    }
    // 512-block rungs (comparable to every earlier round) + PRODUCTION-
    // GEOMETRY rungs at 8,192 blocks/era (config/networks.py:6 — the real
    // gnosis era size; VERDICT r14 #3): raw scan→decode and the staged ETL
    // measured at real era-file size, so reader streaming and partition
    // sizing are witnessed at the geometry a 100 TB archive actually has,
    // not only at 16× smaller test files. (Corpora are marker-cached under
    // target/ like every other bench corpus — generated once per machine.)
    val std = measure(Seq(4, 16, 64), 512, "target/bench-eras-ramp")
    // the 16× prod rung (96 files on 32 cores — VERDICT r15 #4): the 4×
    // rung's gap to the 512-block corpora was EXPLAINED as 24-files-on-32-
    // cores granularity; at 96 files the explanation predicts the gap
    // closes — this rung measures the prediction instead of arguing it
    val prod = measure(Seq(1, 4, 16), 8192, "target/bench-eras-prod-ramp")
    s"""{$std,"prod":{$prod}}"""
  }

}
