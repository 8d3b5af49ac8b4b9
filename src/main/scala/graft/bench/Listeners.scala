package graft.bench

/** Per-task maxima over a measured query — the skew detector: a
  * quadratic blocking bucket or a single-partition window shows up as
  * ONE task reading/shuffling the whole corpus, which wall-clock alone
  * can hide behind 31 idle cores. Shared by the bench soak and
  * `graft.SoakSpec`, which turns the same measurement into a failing
  * test. */
class MaxTaskListener extends org.apache.spark.scheduler.SparkListener {
  @volatile var maxInput = 0L
  @volatile var maxShuffleRead = 0L
  def reset(): Unit = { maxInput = 0L; maxShuffleRead = 0L }
  override def onTaskEnd(
      te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      maxInput = math.max(maxInput, m.inputMetrics.bytesRead)
      maxShuffleRead =
        math.max(maxShuffleRead, m.shuffleReadMetrics.totalBytesRead)
    }
  }
}
