package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EraStream, Event, EventStream}
import graft.testkit.EraFixtures

/** Structured-Streaming layer: era-directory monitoring (AvailableNow),
  * watermarked windows, and stateful sessionization via MemoryStream. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("era directory stream drains available files into parquet (AvailableNow)") {
    val inDir = EraFixtures.ensureGenerated()
    val outDir = Files.createTempDirectory("era-stream-out").toString
    val cp = Files.createTempDirectory("era-stream-cp").toString
    val q = EraStream.runAvailableNow(spark, inDir, outDir, cp)
    q.awaitTermination(120000)
    val got = spark.read.parquet(outDir)
    assert(got.count() === EraFixtures.fixtures.size) // one block per fixture era
    assert(got.columns.contains("transaction_count"))
    // exactly-once: a second AvailableNow run with the same checkpoint adds nothing
    val q2 = EraStream.runAvailableNow(spark, inDir, outDir, cp)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(outDir).count() === EraFixtures.fixtures.size)
  }

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = EventStream.windowedCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def ev(h: Int, m: Int, typ: String, v: Double) =
      Event(1L, h * 100L + m, typ, Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00"), v)
    mem.addData(ev(1, 5, "click", 1.0), ev(1, 20, "click", 2.0), ev(1, 40, "purchase", 5.0))
    query.processAllAvailable()
    mem.addData(ev(3, 0, "click", 1.0)) // advances watermark past hour 1
    query.processAllAvailable()
    mem.addData(ev(4, 0, "click", 1.0)) // push watermark further so hour-1 windows finalize
    query.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n_events, sum_value FROM win_counts ORDER BY event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    query.stop()
    assert(rows.contains(("click", 2L, 3.0)))
    assert(rows.contains(("purchase", 1L, 5.0)))
  }

  test("sessionization closes sessions on gap timeout and aggregates state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def at(min: Int) = new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    // user 7: two bursts 90 min apart → two sessions
    mem.addData(
      Event(7L, 1, "click", at(0), 1.0),
      Event(7L, 2, "click", at(10), 2.0))
    query.processAllAvailable()
    mem.addData(Event(7L, 3, "click", at(100), 4.0)) // gap > 30 min → first session closes
    query.processAllAvailable()
    mem.addData(Event(9L, 9, "click", at(300), 0.5)) // watermark push closes session 2
    query.processAllAvailable()
    val sessions = spark.sql("SELECT user_id, n_events, total_value FROM sessions WHERE user_id = 7")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    query.stop()
    assert(sessions.contains((7L, 2L, 3.0))) // first burst: 2 events, value 3
  }

  test("windowed counts run identically on the batch events table") {
    // the same operator body over a bounded DataFrame — backfill path;
    // totals must reconcile with a plain aggregation of the same table
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    val out = EventStream.windowedCounts(df, "24 hours", "0 seconds")
    val windowedTotal = out.agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect()(0).getLong(0)
    assert(windowedTotal === df.count())
  }
}
