package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{call_function, coalesce, col, lit, split, trim}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{DocStream, EraStream, Event, EventStream, StreamDoc}
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

  test("sessionization: an in-watermark late event EXTENDS the open session's start backward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // lateness default: sessionize watermarks at 1 minute — deliver the
    // late event in the SAME batch-epoch window so it is in-watermark
    val query = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def at(sec: Int) = new Timestamp(Timestamp.valueOf("2024-01-01 10:00:00").getTime + sec * 1000L)
    mem.addData(Event(5L, 1, "click", at(10), 1.0))
    query.processAllAvailable()
    // 10 seconds EARLIER than the open session's start, still in-watermark:
    // session_window would report start 10:00:00 — the custom state must too
    mem.addData(Event(5L, 2, "click", at(0), 2.0))
    query.processAllAvailable()
    mem.addData(Event(6L, 9, "click", at(7200), 0.5)) // watermark push closes it
    query.processAllAvailable()
    val s = spark.sql(
      "SELECT session_start, n_events FROM late_sessions WHERE user_id = 5")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    query.stop()
    assert(s.length === 1)
    assert(s.head._1 === at(0), "session_start must move back to the late event")
    assert(s.head._2 === 2L)
  }

  test("native session_window sessionization matches the custom-state boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = EventStream.sessionizeNative(mem.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def at(min: Int) = new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L)
    try {
      mem.addData(
        Event(7L, 1, "click", at(0), 1.0),
        Event(7L, 2, "click", at(10), 2.0))
      query.processAllAvailable()
      mem.addData(Event(7L, 3, "click", at(100), 4.0)) // gap > 30 min → new session
      query.processAllAvailable()
      mem.addData(Event(9L, 9, "click", at(300), 0.5)) // watermark push finalizes
      query.processAllAvailable()
      val rows = spark.sql(
        """SELECT user_id, session_start, session_end, n_events, total_value
           FROM native_sessions WHERE user_id = 7 ORDER BY session_start""")
        .collect()
      assert(rows.length === 1 || rows.length === 2) // session 2 closes only if watermark passed
      val first = rows(0)
      assert(first.getTimestamp(1) === at(0))
      // native session end = last event + gap (the merge window), unlike the
      // custom operator's last-event end — both mark the same burst
      assert(first.getTimestamp(2) === at(10 + 30))
      assert(first.getLong(3) === 2L)
      assert(first.getDouble(4) === 3.0)
    } finally query.stop()
  }

  test("IVF ingest monitor assigns cells with the batch kernel and flags hot cells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{EmbStream, StreamEmb}
    // two orthogonal centroids; the artifact a batch trainer would publish
    val cents = Array(
      (0L, Seq(1.0, 0.0, 0.0, 0.0), 1.0),
      (1L, Seq(0.0, 1.0, 0.0, 0.0), 1.0))
    def emb(id: Long, v: Seq[Float], min: Int) =
      StreamEmb(id, v, 0, new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L))
    val mem = MemoryStream[StreamEmb]
    val q = EmbStream.cellIngestMonitor(mem.toDF(), cents,
        windowDur = "10 minutes", hotCellThreshold = 2L)
      .writeStream.format("memory").queryName("cell_ingest")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // window 1: three near-centroid-0 vectors (hot: > 2) + one near 1
      mem.addData(
        emb(1, Seq(0.9f, 0.1f, 0f, 0f), 0),
        emb(2, Seq(0.8f, 0.05f, 0f, 0f), 1),
        emb(3, Seq(0.95f, 0f, 0f, 0f), 2),
        emb(4, Seq(0.1f, 0.9f, 0f, 0f), 3))
      q.processAllAvailable()
      mem.addData(emb(9, Seq(0f, 1f, 0f, 0f), 60)) // watermark push closes window 1
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT cell, n_ingested, hot FROM cell_ingest WHERE window_start = timestamp'2024-01-01 00:00:00'")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(rows(0L) === ((3L, true)), s"got $rows")
      assert(rows(1L) === ((1L, false)), s"got $rows")
    } finally q.stop()
    // batch parity: the same frame through the batch assignment kernel
    val batch = Seq(
      emb(1, Seq(0.9f, 0.1f, 0f, 0f), 0),
      emb(4, Seq(0.1f, 0.9f, 0f, 0f), 3)).toDF()
    val assigned = graft.streaming.EmbStream.withCell(batch, cents)
      .select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned === Map(1L -> 0L, 4L -> 1L))
  }

  test("large-k ingest: foreachBatch log-tree assignment equals the flat batch argmax") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{EmbStream, StreamEmb}
    import graft.operators.Similarity
    // a production-sized artifact: k far past LiteralCentroidMax (the
    // literal withCell refuses it — guard-tested below) and past
    // LiteralCentroidMax, so the per-batch assignment runs the exact
    // log-tree plan with O(B) driver state
    val k = 1500
    assert(k > Similarity.LiteralCentroidMax)
    def dvec(seed: Long): Seq[Double] =
      (0 until 8).map(d => ((seed * 31 + d * 7) % 13 - 6).toDouble / 3.0)
    val cents = (0 until k).map { c =>
      val cv = dvec(c * 977L + 3)
      (c.toLong, cv, cv.map(x => x * x).sum)
    }
    val centDf = cents.toDF("centroid_id", "cvec", "csq")
    def emb(id: Long) = StreamEmb(id, dvec(id).map(_.toFloat), (id % 5).toInt,
      new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + id * 1000L))
    val out = scala.collection.mutable.Map.empty[Long, Long]
    val mem = MemoryStream[StreamEmb]
    val q = EmbStream.ingestLargeK(mem.toDF(), centDf, k) { (df, _) =>
      df.select("vec_id", "cell").collect()
        .foreach(r => out.synchronized { out(r.getLong(0)) = r.getLong(1) })
    }
    try {
      mem.addData((0L until 250L).map(emb): _*)
      q.processAllAvailable()
      mem.addData((250L until 300L).map(emb): _*) // a second micro-batch
      q.processAllAvailable()
    } finally q.stop()
    // ground truth: the FLAT broadcast argmax over the identical
    // (float-widened) vectors — an independent plan, bit-identical by the
    // log-tree exactness property
    val v = (0L until 300L)
      .map(id => (id, dvec(id).map(_.toFloat).map(_.toDouble)))
      .toDF("vec_id", "vec")
      .withColumn("sq", graft.functions.VectorMath.normSq("vec"))
      .filter(col("sq") > 0)
    val flat = Similarity.bestCentroid(v, cents.toArray, literal = false)
      .select(col("vec_id"), (-col("best.ncid")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty && out.toMap === flat)
    // and the literal path still refuses an artifact this size
    val err = intercept[IllegalArgumentException] {
      EmbStream.withCell(Seq(emb(0)).toDF(),
        cents.toArray.map { case (id, cv, sq) => (id, cv, sq) })
    }
    assert(err.getMessage.contains("log-tree"))
  }

  test("streaming exact dedup emits only the first copy of each content digest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val query = DocStream.dedupExact(mem.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, text: String, min: Int) =
      StreamDoc(id, text, "en",
        new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L))
    mem.addData(doc(1, "alpha beta", 0), doc(2, "gamma delta", 1))
    query.processAllAvailable()
    // copies arriving in a LATER batch must still be dropped (cross-batch state)
    mem.addData(doc(3, "alpha beta", 2), doc(4, "epsilon", 3), doc(5, "gamma delta", 4))
    query.processAllAvailable()
    val rows = spark.sql("SELECT doc_id, digest, simhash FROM dedup_stream ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    query.stop()
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L)) // first-seen only
    // streaming signatures equal the batch kernels' values
    val batch = DocStream.withSignatures(
        Seq((1L, "alpha beta", "en")).toDF("doc_id", "text", "lang"))
      .select("digest", "simhash").collect().head
    assert(rows.head._2 === batch.getString(0))
    assert(rows.head._3 === batch.getLong(1))
  }

  test("watermarked dedup keeps state bounded but still drops in-window duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val query = DocStream.dedupWithinWatermark(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, text: String, min: Int) =
      StreamDoc(id, text, "en",
        new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L))
    mem.addData(doc(1, "alpha beta", 0), doc(2, "alpha beta", 3)) // dup within window
    query.processAllAvailable()
    val rows = spark.sql("SELECT doc_id FROM dedup_wm").collect().map(_.getLong(0))
    query.stop()
    assert(rows.toSeq === Seq(1L)) // in-window duplicate dropped
  }

  test("streaming near-dup gate flags a truncated copy across batches with the batch kernel's estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val query = DocStream.nearDupPairs(mem.toDF())
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, text: String, min: Int) =
      StreamDoc(id, text, "en",
        new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L))
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    mem.addData(
      doc(1, base, 0),
      doc(2, "completely different words entirely unrelated content streaming here", 1))
    query.processAllAvailable()
    // a lightly truncated copy arrives in a LATER batch → must hit the
    // retained bucket state, not just intra-batch comparison
    val trunc = base.split(" ").dropRight(1).mkString(" ")
    mem.addData(doc(3, trunc, 2))
    query.processAllAvailable()
    val matches = spark.sql(
      "SELECT DISTINCT doc_id, matched_doc_id, est_jaccard FROM neardup_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    query.stop()
    assert(matches.length === 1, matches.mkString(", ")) // no false pairs with doc 2
    val (docId, matchedId, est) = matches.head
    assert(docId === 3L && matchedId === 1L && est >= 0.5)
    // the streaming estimate equals the batch MinHash kernel's agreement
    graft.GraftExtensions.ensureRegistered(spark)
    val sigs = Seq(1L -> base, 3L -> trunc).toDF("doc_id", "text")
      .select(org.apache.spark.sql.functions.call_function("minhash_sig",
        org.apache.spark.sql.functions.call_function("word_shingles",
          org.apache.spark.sql.functions.trim(org.apache.spark.sql.functions.col("text")),
          org.apache.spark.sql.functions.lit(3))).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val batchEst = sigs(0).iterator.zip(sigs(1).iterator)
      .count { case (a, b) => a == b } / graft.operators.Dedup.MinhashK.toDouble
    assert(est === batchEst)
  }

  test("near-dup bucket state is evicted once the watermark passes retention") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    // tight knobs so eviction is observable: 1-minute watermark delay,
    // 5-minute bucket retention
    val query = DocStream.nearDupPairs(mem.toDF(), delay = "1 minute",
        retentionMs = 5 * 60000L)
      .writeStream.format("memory").queryName("neardup_evict")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, text: String, min: Int) =
      StreamDoc(id, text, "en",
        new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L))
    def stateRows: Long = query.recentProgress.reverse
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)
    mem.addData(
      doc(1, "alpha beta gamma delta epsilon", 0),
      doc(2, "one two three four five six", 0))
    query.processAllAvailable()
    val afterFirst = stateRows
    assert(afterFirst > 0, "expected bucket state after the first batch")
    // jump event time far past retention: the watermark (119 min) passes
    // every t=0 bucket's 5-minute timeout, so the next trigger removes them
    mem.addData(doc(3, "seven eight nine ten eleven twelve", 120))
    query.processAllAvailable()
    mem.addData(doc(4, "thirteen fourteen fifteen sixteen seventeen", 121))
    query.processAllAvailable()
    val afterEvict = stateRows
    query.stop()
    // docs 3+4 add their own buckets; without eviction state would be the
    // t=0 buckets PLUS those — bounded means the old buckets are gone
    assert(afterEvict <= afterFirst,
      s"state grew $afterFirst -> $afterEvict: timed-out buckets not removed")
    assert(afterEvict < afterFirst + 6,
      s"no eviction observed: $afterFirst -> $afterEvict")
  }

  test("a within-watermark late arrival never rewinds a bucket's expiry (pair still found)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    // generous watermark (60 min) so the late doc is admitted; 30-minute
    // retention so the old behavior (timeout re-anchored on the LATE ts)
    // would expire the bucket before the true near-dup arrives
    val query = DocStream.nearDupPairs(mem.toDF(), delay = "60 minutes",
        retentionMs = 30 * 60000L)
      .writeStream.format("memory").queryName("neardup_late")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, text: String, min: Int) =
      StreamDoc(id, text, "en",
        new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime + min * 60000L))
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    mem.addData(doc(1, base, 60)) // bucket anchor: newest-seen = 60min
    query.processAllAvailable()
    // LATE but in-watermark copy at 20min: under the old batch-max timeout
    // this re-anchored expiry to 20+30 = 50min — BEFORE doc 1's own
    // 60+30 = 90min window
    mem.addData(doc(2, base + " late", 20))
    query.processAllAvailable()
    // watermark advances to 85−60 = 25min... push it past the REWOUND
    // expiry (50min) but before the monotonic one (90min): wm = 115−60 = 55
    mem.addData(doc(3, "unrelated words one two three four five", 115))
    query.processAllAvailable()
    // the true near-dup arrives at 80min — still inside newest-seen(60)+30
    mem.addData(doc(4, base + " tail", 80))
    query.processAllAvailable()
    val pairs = spark.sql("SELECT doc_id, matched_doc_id FROM neardup_late")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    query.stop()
    assert(pairs.exists { case (a, b) => a == 4L && (b == 1L || b == 2L) },
      s"bucket expired early after a late arrival rewound its timeout: $pairs")
  }

  test("snapshot gate survives a torn first snapshot write (empty dir, no footers)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snapgate_torn").toString
    val (snapDir, outDir) = (s"$root/snap", s"$root/out")
    // what a crash mid-first-write leaves behind: the directory exists,
    // zero committed parquet footers — schema inference would throw here
    // on EVERY replay and wedge the stream
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$snapDir/_temporary"))
    val batch = Seq(
      (1L, "alpha beta", "en", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("doc_id", "text", "lang", "ts")
    DocStream.snapshotGate(snapDir, outDir, "runT")(batch, 0L)
    val out = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getString(r.fieldIndex("status")))
    assert(out.toSeq === Seq(1L -> "new"))
  }

  test("null text streams the batch kernels' signatures, not NULL") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang")
    val s = DocStream.withSignatures(df).select("digest", "simhash").collect().head
    // batch convention: null text → coalesce('') → digest md5(''), simhash
    // of [""] — concrete values, never NULL (bit-for-bit interchangeable)
    assert(!s.isNullAt(0) && !s.isNullAt(1))
    assert(s.getString(0) ===
      df.select(graft.operators.Dedup.contentDigest(col("text"))).collect().head.getString(0))
    assert(s.getLong(1) ===
      df.select(call_function("simhash48",
        split(coalesce(trim(col("text")), lit("")), "\\s+"))).collect().head.getLong(0))
  }

  test("quality monitor reports per-window per-lang mixture matching the batch scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val query = DocStream.qualityMonitor(mem.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("quality_mon")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      def doc(id: Long, text: String, lang: String, m: Int) =
        StreamDoc(id, text, lang, Timestamp.valueOf(f"2024-01-01 01:$m%02d:00"))
      val goodText = "the cat sat on the mat and the dog ran in the park"
      mem.addData(
        doc(1, goodText, "en", 2),
        doc(2, "zz yy xx ww", "en", 5),
        doc(3, "el perro grande", "es", 7))
      query.processAllAvailable()
      mem.addData(doc(4, goodText, "en", 45)) // watermark past the 01:00 window
      query.processAllAvailable()
      mem.addData(doc(5, goodText, "en", 59)) // and further, to finalize it
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT lang, n_docs, total_tokens, avg_quality FROM quality_mon " +
        "WHERE window_start = timestamp'2024-01-01 01:00:00' ORDER BY lang")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(rows.map(t => (t._1, t._2)).toSeq === Seq(("en", 2L), ("es", 1L)))
      // monitor values equal the batch scorer aggregated over the same docs
      import org.apache.spark.sql.functions.{avg, round, sum}
      val batch = graft.operators.TextAnalysis.withQualityScore(
        Seq((1L, goodText, "en"), (2L, "zz yy xx ww", "en")).toDF("doc_id", "text", "lang"))
        .agg(sum($"n_tokens"), round(avg($"quality_score"), 4)).collect()(0)
      val en = rows.find(_._1 == "en").get
      assert(en._3 === batch.getLong(0))
      assert(en._4 === batch.getDouble(1))
    } finally query.stop()
  }

  test("windowed counts run identically on the batch events table") {
    // the same operator body over a bounded DataFrame — backfill path;
    // totals must reconcile with a plain aggregation of the same table
    val df = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val out = EventStream.windowedCounts(df, "24 hours", "0 seconds")
    val windowedTotal = out.agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect()(0).getLong(0)
    assert(windowedTotal === df.count())
  }

  test("snapshot-backed gate remembers digests across a QUERY restart with a fresh checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("snapgate").toString
    val (snapDir, outDir) = (s"$root/snap", s"$root/out")
    def doc(id: Long, text: String) =
      StreamDoc(id, text, "en", Timestamp.valueOf("2024-01-01 00:00:00"))
    // query 1: two distinct docs
    val mem1 = MemoryStream[StreamDoc]
    val q1 = mem1.toDF().writeStream
      .foreachBatch(DocStream.snapshotGate(snapDir, outDir, "run1") _)
      .option("checkpointLocation", s"$root/cp1")
      .trigger(Trigger.ProcessingTime(0)).start()
    mem1.addData(doc(1, "alpha beta"), doc(2, "gamma delta"))
    q1.processAllAvailable(); q1.stop()
    // query 2: NEW stream, NEW checkpoint — engine state is gone, the
    // parquet snapshot is the only memory; a copy must still be caught,
    // and an intra-batch pair must split new/duplicate
    val mem2 = MemoryStream[StreamDoc]
    val q2 = mem2.toDF().writeStream
      .foreachBatch(DocStream.snapshotGate(snapDir, outDir, "run2") _)
      .option("checkpointLocation", s"$root/cp2")
      .trigger(Trigger.ProcessingTime(0)).start()
    mem2.addData(doc(3, "alpha beta"), doc(4, "epsilon"), doc(5, "epsilon"))
    q2.processAllAvailable(); q2.stop()
    val status = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getString(r.fieldIndex("status"))).toMap
    assert(status === Map(1L -> "new", 2L -> "new", 3L -> "duplicate",
      4L -> "new", 5L -> "duplicate"))
  }

  test("snapshot gate is idempotent under at-least-once batch replay") {
    // a foreachBatch retry re-runs a batchId whose first attempt already
    // appended both output and snapshot digests; the replay must neither
    // duplicate output rows nor re-label the batch's first-occurrence rows
    // 'duplicate' against its OWN earlier snapshot append
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snapgate_replay").toString
    val (snapDir, outDir) = (s"$root/snap", s"$root/out")
    val batch = Seq(
      (1L, "alpha beta", "en", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "gamma delta", "en", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("doc_id", "text", "lang", "ts")
    DocStream.snapshotGate(snapDir, outDir, "runA")(batch, 0L)
    val first = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getString(r.fieldIndex("status")))
      .sorted
    // full replay of the same (runId, batchId) after a complete commit
    DocStream.snapshotGate(snapDir, outDir, "runA")(batch, 0L)
    val second = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getString(r.fieldIndex("status")))
      .sorted
    assert(first.toSeq === Seq(1L -> "new", 2L -> "new"))
    assert(second.toSeq === first.toSeq) // no second copy, no label flip
    // and a genuinely NEW batch still sees the frontier
    val next = Seq((3L, "alpha beta", "en", Timestamp.valueOf("2024-01-01 00:01:00")))
      .toDF("doc_id", "text", "lang", "ts")
    DocStream.snapshotGate(snapDir, outDir, "runA")(next, 1L)
    val all = spark.read.parquet(outDir).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getString(r.fieldIndex("status"))).toMap
    assert(all === Map(1L -> "new", 2L -> "new", 3L -> "duplicate"))
  }

  test("volume anomaly monitor passes normal windows, flags floods and unknown types") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // reference profile: clicks run 3±1 per hour
    val ref = Map("click" -> (3.0, 1.0))
    val query = EventStream.volumeAnomalyMonitor(mem.toDF(), ref, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("vol_anomaly")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def ev(id: Long, typ: String, h: Int, m: Int) =
      Event(1L, id, typ, Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00"), 1.0)
    // hour 1: 3 clicks (on-profile); hour 2: 10 clicks (flood) + a type
    // the profile has never seen
    mem.addData(ev(1, "click", 1, 0), ev(2, "click", 1, 10), ev(3, "click", 1, 20))
    query.processAllAvailable()
    mem.addData((1 to 10).map(i => ev(100 + i, "click", 2, i)): _*)
    mem.addData(ev(200, "ddos_probe", 2, 30))
    query.processAllAvailable()
    mem.addData(ev(300, "click", 6, 0)) // advance watermark, close both windows
    query.processAllAvailable()
    val rows = spark.sql(
      """SELECT window_start, event_type, n_events, z, anomalous
        |FROM vol_anomaly ORDER BY window_start, event_type""".stripMargin)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
      .toMap
    query.stop()
    val h1 = rows(("2024-01-01 01:00:00.0", "click"))
    assert(h1 === ((3L, Some(0.0), false)))
    val h2 = rows(("2024-01-01 02:00:00.0", "click"))
    assert(h2._1 === 10L && h2._2.contains(7.0) && h2._3, s"flood not flagged: $h2")
    val unk = rows(("2024-01-01 02:00:00.0", "ddos_probe"))
    assert(unk._2.isEmpty && unk._3, "unknown event type must be anomalous")
  }

  test("pii monitor counts planted spans per window and passes clean windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val query = DocStream.piiMonitor(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("pii_monitor")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, text: String, h: Int) =
      StreamDoc(id, text, "en", Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"))
    mem.addData(
      doc(1, "clean text here", 1),
      doc(2, "contact bob@example.com or 192.168.1.5 now", 1),
      doc(3, "all clean again", 2))
    query.processAllAvailable()
    mem.addData(doc(9, "watermark push", 6))
    query.processAllAvailable()
    val rows = spark.sql(
      """SELECT window_start, n_docs, n_docs_with_pii, n_email, n_ip
        |FROM pii_monitor ORDER BY window_start""".stripMargin).collect()
      .map(r => r.getTimestamp(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    query.stop()
    assert(rows("2024-01-01 01:00:00.0") === ((2L, 1L, 1L, 1L)))
    assert(rows("2024-01-01 02:00:00.0") === ((1L, 0L, 0L, 0L)))
  }

  test("mix-drift monitor flags the skewed window and passes the on-mix window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val ref = Map("en" -> 0.5, "de" -> 0.5)
    val query = DocStream.mixDriftMonitor(mem.toDF(), ref, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("mix_drift")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, lang: String, h: Int, m: Int) =
      StreamDoc(id, s"doc $id", lang, Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00"))
    // hour 1: exactly the reference mix; hour 2: all-French flood
    mem.addData(doc(1, "en", 1, 0), doc(2, "de", 1, 10),
      doc(3, "en", 1, 20), doc(4, "de", 1, 30))
    query.processAllAvailable()
    mem.addData(doc(5, "fr", 2, 0), doc(6, "fr", 2, 10), doc(7, "fr", 2, 20))
    query.processAllAvailable()
    mem.addData(doc(8, "en", 5, 0)) // advance the watermark so both windows close
    query.processAllAvailable()
    val rows = spark.sql(
      "SELECT window_start, n_docs, tv_dist, drifted FROM mix_drift ORDER BY window_start")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    query.stop()
    val hour1 = rows.find(_._1 == Timestamp.valueOf("2024-01-01 01:00:00")).get
    val hour2 = rows.find(_._1 == Timestamp.valueOf("2024-01-01 02:00:00")).get
    assert(hour1._2 === 4L && hour1._3 === 0.0 && !hour1._4)
    // all mass on an unknown language: TV = ½(0.5 + 0.5 + 1.0) = 1.0
    assert(hour2._2 === 3L && hour2._3 === 1.0 && hour2._4)
  }
}
