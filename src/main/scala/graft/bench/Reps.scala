package graft.bench

/** One write-heavy rep's bracketing evidence: seconds, both probe
  * pairs, the in-rep sampler mean/max, the /proc/stat steal delta, and
  * the derived labels. `stallKind` NAMES the mechanism(s) — "write"
  * (probe MB/s collapse at EITHER bracket), "cpu" (microprobe 2× slow at
  * a bracket or sustained mid-rep), "steal" (kernel-counted hypervisor
  * steal over 10% of the machine for the rep's duration), any "+"-joined
  * combination, or "none" — so a slow rep adjudicates itself without
  * an out-of-band run. */
case class ProbedRep(sec: Double, wpre: Double, wpost: Double,
    cpre: Double, cpost: Double, cmid: Double = 0.0, cmidMax: Double = 0.0,
    stealCores: Double = 0.0) {
  def writeStalled: Boolean =
    math.min(wpre, wpost) < Probes.WriteProbeStallMbps
  def cpuStalled: Boolean =
    math.max(math.max(cpre, cpost), cmid) > Probes.CpuProbeStallSec
  def stealStalled: Boolean = stealCores > Probes.StealStallCores
  def stalled: Boolean = writeStalled || cpuStalled || stealStalled
  def stallKind: String = {
    val kinds = Seq("write" -> writeStalled, "cpu" -> cpuStalled,
      "steal" -> stealStalled).collect { case (k, true) => k }
    if (kinds.isEmpty) "none" else kinds.mkString("+")
  }
}

/** Headline selection + spacing policy over probed reps. */
object Reps {

  /** Headline selector: the fastest CLEAN-labeled rep when one exists,
    * else the fastest overall (every rep stalled ⇒ there is no clean
    * witness to prefer). The r14 driver artifact's ETL headline was a
    * stall-LABELED 20.6 s disk rep that only `etl_committed_sec`
    * adjudicated — the headline field itself should not need
    * adjudicating (VERDICT r14 #1). */
  def bestClean[A](reps: Seq[A])(sec: A => Double,
      stalled: A => Boolean): A = {
    val clean = reps.filterNot(stalled)
    (if (clean.nonEmpty) clean else reps).minBy(sec)
  }

  /** Minimum wall-clock gap before a soak entry's adjudication rerun —
    * this box's steal windows run minutes, so a rep2 seconds after rep1
    * is a weak witness (ADVICE r14 #2). */
  val SoakMinGapSec = 60.0

  /** Committed-baseline ratio gate for the warehouse-loop keys
    * (VERDICT r15 #3): the sweep queries have a 3× committed-baseline
    * adjudication, the wh family only had in-run spaced reps — so a −19%
    * round-to-round drift had no in-artifact adjudicator. A clean-rep
    * seconds above `WhCommittedRatio` × the committed value triggers a
    * THIRD spaced rep, and the ratio itself rides the artifact. */
  val WhCommittedRatio = 1.3

  /** Rep-vs-rep dispersion label (VERDICT r16 #2): a rep slower than this
    * ratio × the family's fastest same-run rep is labeled even when every
    * probe on it reads clean — the catch-all for mechanisms the probes
    * don't see (BENCH_r16: two 68 s tmpfs ETL reps, 4.7× the 14 s disk
    * rep, all probes healthy, stall_kind "none"). Identical code + data
    * + process within one run means a 3× spread IS environment; the label
    * only demotes a rep from headline eligibility, never hides it. */
  val EtlDispersionRatio = 3.0
}
