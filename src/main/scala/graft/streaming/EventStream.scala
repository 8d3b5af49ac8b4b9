package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event — the streaming-side shape of the `events` table. */
case class Event(user_id: Long, event_id: Long, event_type: String,
    ts: Timestamp, value: Double)

/** Closed user session emitted by [[EventStream.sessionize]]. */
case class UserSession(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, total_value: Double)

private[streaming] case class SessionAcc(start: Long, end: Long, n: Long, total: Double)

/**
 * Stream operators over event streams: watermarked tumbling-window
 * aggregation and custom session state via `flatMapGroupsWithState` — the
 * Structured-Streaming surface a training-data ingest pipeline needs
 * (the reference is batch-only; SURVEY.md §2.9).
 *
 * Both operators run identically over a bounded batch DataFrame (for
 * backfill) and an unbounded stream (for tailing) — that is the Spark
 * contract these are written against.
 */
object EventStream {

  /** Tumbling-window counts with a watermark: late events beyond the
    * allowed lateness are dropped, windows finalize incrementally. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming volume-anomaly monitor — the stream twin of the batch
    * `win_zscore_anomaly` query: per (event-time window, event_type)
    * volumes z-scored against a REFERENCE profile (mean/std per type,
    * fit offline by the batch query over history and passed in as
    * config, exactly like [[graft.streaming.DocStream.mixDriftMonitor]]'s
    * reference shares). An event type absent from the reference profile
    * is itself anomalous (a never-seen traffic class). Watermarked
    * tumbling windows — append-safe, state bounded by live windows ×
    * types; the reference is a literal CASE chain, so the whole monitor
    * is one windowed aggregation plus narrow arithmetic. */
  // LIMITATION (by streaming construction): a type whose volume collapses
  // to ZERO emits no (window, type) row, so a total outage cannot alert
  // from inside the windowed aggregation — detecting absence needs
  // stateful timers per type. Run the batch twin (win_zscore_anomaly)
  // on a schedule for source-went-dark coverage; this monitor owns
  // spikes and partial drops.
  def volumeAnomalyMonitor(events: DataFrame,
      ref: Map[String, (Double, Double)], windowLen: String = "1 hour",
      lateness: String = "10 minutes", zThreshold: Double = 3.0): DataFrame = {
    require(ref.nonEmpty, "reference volume profile is empty")
    require(ref.values.forall(_._2 > 0), "reference stddev must be positive")
    def lookup(f: ((Double, Double)) => Double) =
      ref.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
        case (acc, (t, ms)) => when(col("event_type") === t, lit(f(ms))).otherwise(acc)
      }
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("ref_mean", lookup(_._1))
      .withColumn("ref_std", lookup(_._2))
      .withColumn("z",
        round((col("n_events") - col("ref_mean")) / col("ref_std"), 4))
      .withColumn("anomalous",
        col("ref_mean").isNull || abs(col("z")) > zThreshold)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("z"), col("anomalous"))
  }

  /** Event-time sessionization with a gap timeout: a user's session closes
    * after `gapMinutes` without events (or on watermark timeout), emitting
    * one [[UserSession]] row. Custom state via flatMapGroupsWithState —
    * state per user_id is O(1), so keys scale horizontally. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    // batch mode (backfill) calls the state function ONCE per key and
    // never fires timeouts, so the trailing open session must be emitted
    // inline — the data ended, so the session is closed by definition.
    // Streaming keeps it open in state for the event-time timeout. Without
    // this, a backfill silently dropped every user's FINAL session while
    // sessionizeNative emitted it.
    val bounded = !events.isStreaming

    def update(userId: Long, it: Iterator[Event],
        state: GroupState[SessionAcc]): Iterator[UserSession] = {
      val out = Seq.newBuilder[UserSession]
      if (state.hasTimedOut) {
        val s = state.get
        out += UserSession(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
        state.remove()
      } else {
        val sorted = it.toSeq.sortBy(_.ts.getTime)
        var acc = state.getOption.orNull
        sorted.foreach { e =>
          val t = e.ts.getTime
          if (acc == null) acc = SessionAcc(t, t, 1, e.value)
          else if (t - acc.end > gapMs) {
            out += UserSession(userId, new Timestamp(acc.start), new Timestamp(acc.end), acc.n, acc.total)
            acc = SessionAcc(t, t, 1, e.value)
          } else acc = SessionAcc(math.min(acc.start, t), math.max(acc.end, t),
            acc.n + 1, acc.total + e.value) // min: an in-watermark late event can PRECEDE the open session's start
        }
        if (acc != null) {
          if (bounded) {
            out += UserSession(userId, new Timestamp(acc.start),
              new Timestamp(acc.end), acc.n, acc.total)
            if (state.exists) state.remove()
          } else {
            state.update(acc)
            state.setTimeoutTimestamp(acc.end + gapMs)
          }
        }
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** The same gap sessionization via Spark's NATIVE `session_window`
    * aggregation — the built-in-operator form preferred when the session
    * payload is expressible as plain aggregates (no custom state code, and
    * the engine's session-merge state store does the bookkeeping). Kept
    * alongside [[sessionize]] deliberately: flatMapGroupsWithState is the
    * escape hatch for session payloads the built-in can't express
    * (first-N events, per-session dedup, ML features); this is the
    * shape to reach for first. Identical session boundaries: both close a
    * session after `gapMinutes` of inactivity by event time. */
  def sessionizeNative(events: DataFrame, gapMinutes: Int = 30,
      lateness: String = "1 minute"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
}
