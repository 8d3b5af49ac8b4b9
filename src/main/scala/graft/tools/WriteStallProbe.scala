package graft.tools

import org.apache.spark.sql.SparkSession

/** Calibration for [[graft.bench.Probes.WriteProbeStallMbps]] /
  * [[graft.bench.Probes.CpuProbeStallSec]] and live proof that the bench's
  * per-rep probe bracketing actually labels a stalled rung (VERDICT r13
  * #1's "verified by deliberately running one rung under induced load";
  * r14 #1 extends the drill to CPU starvation): measures the probes idle,
  * then under an induced flood, then runs ONE standard wh_loop rung under
  * that same load and reports whether its bracketing probes label it.
  *
  * Mode arg: `write` (default) floods dirty pages — the sandbox's
  * documented writeback stall; `cpu` floods every core with spin threads —
  * the steal/pressure mechanism both final r14 runs exhibited with HEALTHY
  * write probes, which is exactly what the per-rep CPU microprobe exists
  * to name. One JSON line; findings recorded in BENCH_NOTES.md. */
object WriteStallProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("write")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def probe3() = (1 to 3).map(_ => graft.bench.Probes.writeProbeMbps(spark))
    def cpuProbe3() = (1 to 3).map(_ => graft.bench.Probes.cpuProbeSec())

    graft.bench.Probes.writeProbeMbps(spark) // discard: first-write JIT/codegen
    graft.bench.Probes.cpuProbeSec() // discard: hashLoop JIT
    val idle = probe3()
    val idleCpu = cpuProbe3()
    // the drill calibrates the CPU threshold exactly like the bench does
    // (2× the warm single-thread baseline, floored)
    graft.bench.Probes.CpuProbeStallSec = math.max(0.2, 2.0 * idleCpu.min)

    @volatile var stop = false
    val loaders =
      if (mode == "cpu") {
        // induced load: 2 spin threads per advertised core — the probe and
        // every Spark task time-slice against them, which is what steal /
        // CPU-quota pressure looks like from inside the sandbox
        val n = Runtime.getRuntime.availableProcessors() * 2
        (1 to n).map { i =>
          val t = new Thread(() => {
            var x = i.toLong | 1L
            while (!stop) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
            WriteStallProbe.sink = x
          })
          t.setDaemon(true); t.setPriority(Thread.MAX_PRIORITY); t.start(); t
        }
      } else {
        // induced load: 4 dirty-page flooders, each looping "write a fresh
        // 512 MB file, no fsync, delete" — drives the kernel past its dirty
        // ratio so writeback throttling hits every other writer, which is
        // the sandbox's documented stall mode (an fsync-heavy loop was
        // tried first and did NOT move the probe: this box absorbs syncs
        // fine, it is dirty-page pressure that collapses writes)
        (1 to 4).map { i =>
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
      }
    Thread.sleep(3000) // let the flood build pressure first
    val loaded = probe3()
    val loadedCpu = cpuProbe3()

    // one standard wh_loop rung under the same load, bracketed exactly as
    // the bench brackets it — the end-to-end proof the label fires
    val (eraDir, _) = graft.testkit.BenchEras.ensureGenerated()
    val eras = new java.io.File(eraDir).listFiles().toSeq
      .filter(_.getName.endsWith(".era"))
      .map(_.getName.split("-")(1).toLong).distinct.sorted
    val pre = graft.bench.Probes.writeProbeMbps(spark)
    val cpre = graft.bench.Probes.cpuProbeSec()
    val root = java.nio.file.Files.createTempDirectory("graft-stallprobe-wh").toString
    val state = java.nio.file.Files.createTempDirectory("graft-stallprobe-whstate").toString
    val t0 = System.nanoTime()
    graft.export.IncrementalExporter.runWarehouse(spark,
      new graft.export.EraStateManager(spark, state), "gnosis", eras, root) { era =>
      spark.read.format("era").load(f"$eraDir/gnosis-$era%05d-*.era")
    }
    val whSec = (System.nanoTime() - t0) / 1e9
    val cpost = graft.bench.Probes.cpuProbeSec()
    val post = graft.bench.Probes.writeProbeMbps(spark)
    graft.Bench.deleteRecursively(root); graft.Bench.deleteRecursively(state)
    stop = true
    loaders.foreach(_.join(2000))

    def arr(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    val rep = graft.bench.ProbedRep(whSec, pre, post, cpre, cpost)
    println(s"""{"mode":"$mode","idle_probe_mbps":${arr(idle)},"loaded_probe_mbps":${arr(loaded)},""" +
      s""""idle_cpu_probe_sec":${arr(idleCpu)},"loaded_cpu_probe_sec":${arr(loadedCpu)},""" +
      s""""threshold_mbps":${graft.bench.Probes.WriteProbeStallMbps},""" +
      s""""cpu_threshold_sec":${math.rint(graft.bench.Probes.CpuProbeStallSec * 1000) / 1000},""" +
      s""""wh_under_load_sec":${math.rint(whSec * 10) / 10},""" +
      s""""wh_probe_pre":$pre,"wh_probe_post":$post,""" +
      s""""wh_cpu_probe_pre":$cpre,"wh_cpu_probe_post":$cpost,""" +
      s""""wh_labeled_stalled":${rep.stalled},"wh_stall_kind":"${rep.stallKind}"}""")
    spark.stop()
  }

  @volatile private var sink = 0L // keeps the CPU-flood loop from folding away
}
