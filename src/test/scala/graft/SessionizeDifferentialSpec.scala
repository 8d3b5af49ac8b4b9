package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Differential gate between the TWO sessionization implementations over
  * the SAME full corpus: the batch lag+running-sum idiom
  * (`Relational.sessionize`, the `win_sessionize` oracle query) and the
  * native `session_window` aggregation (`EventStream.sessionizeNative`,
  * the streaming-first form, here run in batch mode — the operator is
  * defined on both). Both close a session after 30 min of inactivity, so
  * per user they must produce the SAME session sequence: same count, same
  * per-session event count and span.
  *
  * Boundary note: the two disagree only on a gap of EXACTLY the timeout
  * (batch keeps `gap > 30min` strictly as a split; `session_window` merges
  * events strictly inside `[ts, ts+30min)`), which microsecond event times
  * make unobservable — and this spec would catch it if the corpus ever
  * grew such a pair. */
class SessionizeDifferentialSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("batch lag+running-sum sessions equal native session_window sessions") {
    val events = graft.queries.Tables.load(spark, sfDir, "events")

    val batch = graft.queries.Relational.sessionize(events)
      .select(col("user_id"), col("session_seq"), col("n_events"), col("duration_s"))

    // native sessions → the batch grain: session_seq by start order within
    // the user; duration from first event to last event (the native window
    // end is last-event + gap, so subtract the gap back out)
    val w = Window.partitionBy(col("user_id")).orderBy(col("session_start"))
    val native = EventStream.sessionizeNative(events, gapMinutes = 30)
      .withColumn("session_seq", row_number().over(w).cast("long"))
      .withColumn("duration_s",
        (unix_micros(col("session_end") - expr("INTERVAL 30 MINUTES")) -
          unix_micros(col("session_start"))) .divide(1000000L).cast("long"))
      .select(col("user_id"), col("session_seq"), col("n_events"), col("duration_s"))

    val a = batch.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val b = native.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(a.nonEmpty)
    assert(a.size === b.size,
      s"session counts differ: batch ${a.size} vs native ${b.size}")
    assert(a === b, "per-session (user, seq, n_events, duration) differ")
  }

  test("custom-state sessionize over a BOUNDED dataset emits every trailing session") {
    // batch backfill mode: flatMapGroupsWithState runs once per key and no
    // timeout ever fires, so the trailing open session must be emitted
    // inline — it used to be silently dropped (every user lost their FINAL
    // session vs the batch/native twins)
    import spark.implicits._
    val events = graft.queries.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .as[graft.streaming.Event]
    val custom = EventStream.sessionize(events, gapMinutes = 30)
      .toDF()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
    val batch = graft.queries.Relational.sessionize(events.toDF())
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
    val c = custom.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val d = batch.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(c.nonEmpty && c === d,
      "bounded custom-state sessionization must equal the batch twin, trailing sessions included")
  }
}
