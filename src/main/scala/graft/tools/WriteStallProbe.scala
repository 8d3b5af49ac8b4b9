package graft.tools

import org.apache.spark.sql.SparkSession

/** Calibration for [[graft.Bench.WriteProbeStallMbps]] and live proof that
  * the bench's per-rep write-probe bracketing actually labels a stalled
  * rung (VERDICT r13 #1's "verified by deliberately running one rung under
  * induced load"): measures the fixed-size write probe idle, then under an
  * fsync-heavy background writer (the closest reproducible stand-in for
  * this sandbox's page-cache writeback stalls), then runs ONE standard
  * wh_loop rung under that same load and reports whether its bracketing
  * probes label it. One JSON line; findings recorded in BENCH_NOTES.md. */
object WriteStallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def probe3() = (1 to 3).map(_ => graft.Bench.writeProbeMbps(spark))

    graft.Bench.writeProbeMbps(spark) // discard: first-write JIT/codegen
    val idle = probe3()

    // induced load: 4 dirty-page flooders, each looping "write a fresh
    // 512 MB file, no fsync, delete" — drives the kernel past its dirty
    // ratio so writeback throttling hits every other writer, which is the
    // sandbox's documented stall mode (an fsync-heavy loop was tried
    // first and did NOT move the probe: this box absorbs syncs fine, it
    // is dirty-page pressure that collapses writes)
    @volatile var stop = false
    val loaders = (1 to 4).map { i =>
      val t = new Thread(() => {
        val buf = new Array[Byte](16 << 20)
        java.util.Arrays.fill(buf, i.toByte)
        var n = 0
        try while (!stop) {
          val f = java.io.File.createTempFile(s"graft-stall$i-$n", ".bin")
          n += 1
          val out = new java.io.FileOutputStream(f)
          try (0 until 32).foreach(_ => if (!stop) out.write(buf))
          finally out.close()
          f.delete()
        } catch { case _: Exception => () }
      })
      t.setDaemon(true); t.start(); t
    }
    Thread.sleep(3000) // let the flood build dirty pressure first
    val loaded = probe3()

    // one standard wh_loop rung under the same load, bracketed exactly as
    // the bench brackets it — the end-to-end proof the label fires
    val (eraDir, _) = graft.testkit.BenchEras.ensureGenerated()
    val eras = new java.io.File(eraDir).listFiles().toSeq
      .filter(_.getName.endsWith(".era"))
      .map(_.getName.split("-")(1).toLong).distinct.sorted
    val pre = graft.Bench.writeProbeMbps(spark)
    val root = java.nio.file.Files.createTempDirectory("graft-stallprobe-wh").toString
    val state = java.nio.file.Files.createTempDirectory("graft-stallprobe-whstate").toString
    val t0 = System.nanoTime()
    graft.export.IncrementalExporter.runWarehouse(spark,
      new graft.export.EraStateManager(spark, state), "gnosis", eras, root) { era =>
      spark.read.format("era").load(f"$eraDir/gnosis-$era%05d-*.era")
    }
    val whSec = (System.nanoTime() - t0) / 1e9
    val post = graft.Bench.writeProbeMbps(spark)
    graft.Bench.deleteRecursively(root); graft.Bench.deleteRecursively(state)
    stop = true
    loaders.foreach(_.join(2000))

    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    val labeled = math.min(pre, post) < graft.Bench.WriteProbeStallMbps
    println(s"""{"idle_probe_mbps":${arr(idle)},"loaded_probe_mbps":${arr(loaded)},""" +
      s""""threshold_mbps":${graft.Bench.WriteProbeStallMbps},""" +
      s""""wh_under_load_sec":${math.rint(whSec * 10) / 10},""" +
      s""""wh_probe_pre":$pre,"wh_probe_post":$post,"wh_labeled_stalled":$labeled}""")
    spark.stop()
  }
}
