package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EraFilePruning
import org.apache.spark.sql.sources

/** Unit gates for the bench's per-rep adjudication primitives (VERDICT r14
  * #1/#5) and the shared slot-window fold (ADVICE r14 #3) — the logic that
  * DECIDES how rounds are graded, pinned at the unit level so a future
  * edit to a threshold or a boolean can't silently flip a label's
  * direction. */
class BenchProbeSpec extends AnyFunSuite {

  test("ProbedRep labels name the mechanism: write, cpu, both, none") {
    val saved = graft.bench.Probes.CpuProbeStallSec
    graft.bench.Probes.CpuProbeStallSec = 0.6
    try {
      // healthy: both write probes above 8 MB/s, both cpu probes under 0.6 s
      val clean = graft.bench.ProbedRep(10.0, wpre = 20.0, wpost = 25.0, cpre = 0.3, cpost = 0.3)
      assert(!clean.stalled && clean.stallKind === "none")
      // EITHER write probe collapsing labels the rep (min < threshold)
      val w = graft.bench.ProbedRep(10.0, wpre = 20.0, wpost = 3.0, cpre = 0.3, cpost = 0.3)
      assert(w.writeStalled && !w.cpuStalled && w.stallKind === "write")
      // EITHER cpu probe slow labels the rep (max > threshold) — the r14
      // blind spot: healthy write probes, CPU-starved rep
      val c = graft.bench.ProbedRep(10.0, wpre = 20.0, wpost = 25.0, cpre = 0.3, cpost = 1.4)
      assert(c.cpuStalled && !c.writeStalled && c.stallKind === "cpu")
      val both = graft.bench.ProbedRep(10.0, wpre = 2.0, wpost = 25.0, cpre = 1.4, cpost = 0.3)
      assert(both.stalled && both.stallKind === "write+cpu")
      // the MID-REP sampler closes the bracket blind spot: a steal window
      // that recovered before the post-probe (clean brackets, slow rep —
      // the live r15 73 s tmpfs shape) still labels via the in-rep MEAN
      val mid = graft.bench.ProbedRep(73.0, wpre = 23.0, wpost = 22.0,
        cpre = 0.3, cpost = 0.31, cmid = 0.9, cmidMax = 1.2)
      assert(mid.cpuStalled && mid.stallKind === "cpu")
      // …while a GC spike of the rep's OWN workload (high max, low mean)
      // does NOT label — that is workload, not environment
      val gcSpike = graft.bench.ProbedRep(10.0, wpre = 23.0, wpost = 22.0,
        cpre = 0.3, cpost = 0.31, cmid = 0.35, cmidMax = 1.5)
      assert(!gcSpike.stalled)
      // the kernel steal counter labels independently of every probe: a
      // rep whose window saw >10% of the machine stolen is "steal" even
      // with clean write/cpu probes (the residual the probes can't see)
      val stolen = graft.bench.ProbedRep(31.6, wpre = 30.5, wpost = 13.3,
        cpre = 0.28, cpost = 0.29, cmid = 0.30, cmidMax = 1.0, stealCores = 8.5)
      assert(stolen.stealStalled && stolen.stallKind === "steal")
      val mildSteal = graft.bench.ProbedRep(10.0, wpre = 30.0, wpost = 25.0,
        cpre = 0.28, cpost = 0.29, cmid = 0.30, cmidMax = 0.4, stealCores = 1.0)
      assert(!mildSteal.stalled)
    } finally graft.bench.Probes.CpuProbeStallSec = saved
  }

  test("the /proc/stat steal reader parses this box's counter and the delta helper scales ticks") {
    // live counter (Linux): present and monotone non-negative here
    val t = graft.bench.Probes.stealTicks()
    assert(t.isDefined && t.get >= 0L, "steal ticks should parse on this box")
    // 200 ticks over 10 s at USER_HZ=100 = 2.0 core-seconds/sec
    assert(graft.bench.Probes.stealCoresOver(Some(1000L), Some(3000L), 10.0) === 2.0)
    assert(graft.bench.Probes.stealCoresOver(None, Some(3000L), 10.0) === 0.0)
    assert(graft.bench.Probes.stealCoresOver(Some(1000L), None, 10.0) === 0.0)
  }

  test("bestClean prefers a slower clean rep over a faster stall-labeled one") {
    val saved = graft.bench.Probes.CpuProbeStallSec
    graft.bench.Probes.CpuProbeStallSec = 0.6
    try {
      val fastStalled = graft.bench.ProbedRep(5.0, 20.0, 3.0, 0.3, 0.3)
      val slowClean = graft.bench.ProbedRep(9.0, 20.0, 25.0, 0.3, 0.3)
      assert(graft.bench.Reps.bestClean(Seq(fastStalled, slowClean))(_.sec, _.stalled) eq slowClean)
      // every rep stalled → fall back to the fastest (there is no clean
      // witness to prefer, and hiding the number would be worse)
      val slowStalled = graft.bench.ProbedRep(9.0, 2.0, 3.0, 0.3, 0.3)
      assert(graft.bench.Reps.bestClean(Seq(fastStalled, slowStalled))(_.sec, _.stalled) eq fastStalled)
      // tie on labels → fastest
      val fastClean = graft.bench.ProbedRep(4.0, 20.0, 25.0, 0.3, 0.3)
      assert(graft.bench.Reps.bestClean(Seq(slowClean, fastClean))(_.sec, _.stalled) eq fastClean)
    } finally graft.bench.Probes.CpuProbeStallSec = saved
  }

  test("the shared slot-window fold: AND-tightening, overflow-conservative, None without bounds") {
    def gt(v: Long): sources.Filter = sources.GreaterThan("slot", v)
    def gte(v: Long): sources.Filter = sources.GreaterThanOrEqual("slot", v)
    def lt(v: Long): sources.Filter = sources.LessThan("slot", v)
    def lte(v: Long): sources.Filter = sources.LessThanOrEqual("slot", v)

    // no comparison bounds → None (equality/IN are the probe-set's job)
    assert(EraFilePruning.slotWindow(Array(sources.EqualTo("slot", 5L))) === None)
    // conjunction tightens: the window is the intersection of all bounds
    assert(EraFilePruning.slotWindow(Array(gte(10L), lte(20L), gt(11L), lt(19L)))
      === Some((12L, 18L)))
    // int operands fold like longs
    assert(EraFilePruning.slotWindow(
      Array(sources.GreaterThanOrEqual("slot", 3), sources.LessThanOrEqual("slot", 7)))
      === Some((3L, 7L)))
    // overflow drops the bound in the CONSERVATIVE direction: a wrapped
    // lower bound leaves lo at MinValue (file kept / no fast path) …
    assert(EraFilePruning.slotWindow(Array(gt(Long.MaxValue), lte(100L)))
      === Some((Long.MinValue, 100L)))
    // … and a wrapped upper bound leaves hi at MaxValue symmetrically
    assert(EraFilePruning.slotWindow(Array(lt(Long.MinValue), gte(5L)))
      === Some((5L, Long.MaxValue)))
    // contradictory bounds yield an empty window (lo > hi) rather than a
    // crash — consumers treat it as "nothing provably matches"
    val Some((lo, hi)) = EraFilePruning.slotWindow(Array(gte(50L), lte(10L)))
    assert(lo > hi)
  }
}
