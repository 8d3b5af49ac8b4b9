package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One document arriving on an ingest stream — the streaming-side shape of
  * the `documents` table plus an arrival timestamp. */
case class StreamDoc(doc_id: Long, text: String, lang: String, ts: Timestamp)

/** One (LSH bucket, document) observation on the stream. */
case class BandObs(band_key: String, doc_id: Long, sig: Seq[Long], ts: Timestamp)

/** Retained signatures for one LSH bucket (newest first, bounded). */
/** `lastTs` = the newest event time this bucket has EVER seen — the
  * timeout anchor. Tracking it in state (not per batch) keeps the expiry
  * monotonic: a within-watermark late arrival must never rewind the
  * bucket's timeout below newest-seen + retention. */
case class BucketState(docs: List[(Long, Seq[Long])], lastTs: Long = 0L)

/** An arriving document matching an earlier-seen near-duplicate. */
case class NearDupMatch(doc_id: Long, matched_doc_id: Long, est_jaccard: Double)

/**
 * Streaming operators for a training-data INGEST pipeline — the dedup and
 * signature steps applied while documents arrive, not after (the batch
 * forms live in [[graft.operators.Dedup]]; the reference is batch-only).
 *
 * Spark-first: exact streaming dedup is `dropDuplicates` over the content
 * digest — the engine manages the dedup state store, checkpoints it, and
 * recovers it exactly-once; no hand-rolled `mapGroupsWithState` needed.
 * Two variants with different state contracts:
 *
 *  - [[dedupExact]]: unbounded state — every digest ever seen is retained.
 *    Correct forever, state grows with distinct content (production: back
 *    the state store with RocksDB).
 *  - [[dedupWithinWatermark]]: bounded state — a duplicate arriving within
 *    the watermark delay of its original is dropped; digests age out of
 *    state once the watermark passes. The production shape when duplicate
 *    arrivals cluster in time (re-crawls, retries) and state must stay
 *    bounded.
 *
 * [[withSignatures]] shows that the batch signature kernels (content
 * digest, SimHash) are narrow projections and therefore stream as-is —
 * identical values to the batch pipeline, so a backfilled corpus and a
 * tailed stream agree bit-for-bit.
 */
object DocStream {

  /** Content digest + 48-bit SimHash computed on the stream — same
    * codegen'd kernels as the batch path ([[graft.operators.Dedup]]), so
    * streaming and batch signatures are interchangeable. */
  def withSignatures(docs: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    docs
      .withColumn("digest", graft.operators.Dedup.contentDigest(col("text")))
      .withColumn("simhash",
        // the BATCH tokenization convention (TextAnalysis.withTokens'
        // null guard): a null text must produce the same concrete
        // simhash48([""]) the batch path computes, not NULL — streaming
        // and batch signatures are documented bit-for-bit interchangeable
        call_function("simhash48",
          split(coalesce(trim(col("text")), lit("")), "\\s+")))
  }

  /** Exact streaming dedup, unbounded state: emit each document the first
    * time its content digest appears; drop every later copy. */
  def dedupExact(docs: DataFrame): DataFrame =
    withSignatures(docs).dropDuplicates("digest")

  /** Exact streaming dedup with bounded state: duplicates are dropped only
    * if they arrive within `delay` of the first copy (event time); state
    * for older digests is reclaimed as the watermark advances. */
  def dedupWithinWatermark(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    withSignatures(docs)
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("digest")

  /** Live corpus-quality/mixture monitor — the streaming sibling of
    * [[graft.operators.Curation.sourceMix]] / the batch quality report: per
    * (event-time window, lang) document counts, token totals, and mean
    * quality score while the corpus is ingested, so mixture drift or a
    * quality collapse in one source surfaces within a window delay instead
    * of at the next batch audit.
    *
    * The scoring is [[graft.operators.TextAnalysis.withQualityScore]] — the
    * SAME narrow codegen'd projection as the batch path, so monitor numbers
    * and the batch audit agree exactly. State is the windowed aggregation's
    * own store, bounded by the watermark (one row per window × lang). */
  def qualityMonitor(docs: DataFrame, windowDur: String = "10 minutes",
      delay: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    graft.operators.TextAnalysis.withQualityScore(docs)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("quality_score")), 4).as("avg_quality"))
      .select(
        col("window.start").as("window_start"),
        col("lang"), col("n_docs"), col("total_tokens"), col("avg_quality"))
  }

  /** Streaming PII monitor — the privacy alarm BEFORE data lands: per
    * event-time window, how many arriving documents carry PII spans and
    * how many spans of each kind (the same codegen'd regexp projection as
    * the batch [[graft.operators.Pii]] scanner, so stream and backfill
    * agree exactly). A spike says a new source is leaking personal data
    * into the crawl; the redaction step then runs before the sink.
    * Watermarked tumbling windows, append-safe; the scan itself is
    * narrow, so the monitor costs one windowed aggregation. */
  def piiMonitor(docs: DataFrame, windowDur: String = "10 minutes",
      delay: String = "10 minutes"): DataFrame = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    graft.operators.Pii.withCounts(docs)
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_email") + col("n_phone") + col("n_ip") + col("n_ssn") > 0,
          1L).otherwise(0L)).as("n_docs_with_pii"),
        sum(col("n_email")).as("n_email"),
        sum(col("n_phone")).as("n_phone"),
        sum(col("n_ip")).as("n_ip"),
        sum(col("n_ssn")).as("n_ssn"))
      .select(col("window.start").as("window_start"), col("n_docs"),
        col("n_docs_with_pii"), col("n_email"), col("n_phone"),
        col("n_ip"), col("n_ssn"))
  }

  /** Streaming near-dup gate — the streaming sibling of
    * [[graft.operators.Dedup.minhashLshPairs]], for duplicates the digest
    * gate cannot see (truncated/edited copies). Custom state via
    * `flatMapGroupsWithState` keyed by LSH band bucket: each arriving
    * document's MinHash signature (the same codegen'd kernels as the batch
    * path, so stream and backfill agree bit-for-bit) is banded, and within
    * each bucket the arrival is compared against the bucket's RETAINED
    * signatures — state is per-bucket, so comparisons stay ∝ true
    * collisions, exactly like the batch band join, never corpus-wide.
    *
    * State is bounded two ways: per-bucket retention caps the signature
    * list at `maxSigsPerBucket` (newest win — recent arrivals are the
    * likely duplicate sources on an ingest stream), and event-time timeout
    * drops buckets idle past `retentionMs` once the watermark passes.
    * A pair colliding in several bands emits once per band — downstream
    * consumers dedup on (doc_id, matched_doc_id), the same contract as the
    * batch pairs before their `distinct`. */
  /** `foreachBatch` ingest gate against a PERSISTENT digest snapshot — the
    * state-outlives-the-query sibling of [[dedupExact]]: each micro-batch
    * is labeled `duplicate`/`new` against the snapshot parquet and the
    * fresh digests are appended back, so a NEW query (fresh checkpoint,
    * post-restart, or a different job entirely) still sees everything ever
    * ingested. [[dedupExact]]'s state dies with its checkpoint; this is
    * how batch backfills and the stream share one dedup frontier.
    *
    * IDEMPOTENT under at-least-once batch replay: both the labeled output
    * and the snapshot digests land under a `batch_key=<runId>_<batchId>`
    * hive partition written with OVERWRITE, and the snapshot lookup
    * EXCLUDES the current batch's own partition — so a retry that re-runs
    * after a partially- or fully-committed first attempt overwrites its
    * own partition in place (no second output copy) and still sees exactly
    * the pre-batch frontier (no first-occurrence row re-labeled
    * `duplicate` by its own earlier append). `runId` must be unique per
    * STREAM RUN (pass the streaming query's runId, or any fresh token):
    * Spark batchIds restart from 0 on a new checkpoint, so batchId alone
    * cannot distinguish a replay from a different query's first batch.
    * Labeling uses semi/anti joins (set semantics). Intra-batch copies:
    * first occurrence (lowest doc_id) is `new`, the rest `duplicate`.
    * At 100 TB the snapshot is the digest-bucketed table
    * ([[graft.operators.Dedup.saveSnapshotDigests]]) and the join shuffles
    * only each micro-batch. Snapshot existence goes through the Hadoop
    * FileSystem API, so the gate works on HDFS/S3, not just local disk.
    *
    * Usage: `stream.writeStream.foreachBatch(DocStream.snapshotGate(snapDir, outDir, runId) _)`. */
  def snapshotGate(snapshotDir: String, outDir: String, runId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val batchKey = s"${runId.replaceAll("[^A-Za-z0-9_-]", "_")}_$batchId"
    // the ONE content-digest convention (Dedup.contentDigest): this gate's
    // frontier must compose with dedupExact's and the batch snapshots'
    val d = batch.withColumn("digest", graft.operators.Dedup.contentDigest(col("text")))
    val snapPath = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = snapPath.getFileSystem(spark.sessionState.newHadoopConf())
    // EXPLICIT schema, never inference: a crash during the very first
    // snapshot write can leave the directory existing with zero committed
    // footers, and schema inference would then throw on every replay —
    // permanently wedging the stream one exception short of the
    // empty-frontier fallback it needed. The snapshot layout is ours
    // (digest + batch_key partition), so the schema is known right here.
    val snapSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("digest",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("batch_key",
        org.apache.spark.sql.types.StringType)))
    val snap =
      if (fs.exists(snapPath))
        spark.read.schema(snapSchema).parquet(snapshotDir)
          .filter(col("batch_key") =!= batchKey) // replay: ignore own append
          .select(col("digest"))
      else d.select(col("digest")).limit(0)
    val dup = d.join(snap, Seq("digest"), "left_semi")
      .withColumn("status", lit("duplicate"))
    // persisted: the output write and the snapshot write both consume this
    // frame — without the persist each write re-runs the snapshot scan,
    // the batch md5, the anti-join, and the window (2× per-batch latency
    // on the hot ingest path)
    val fresh = d.join(snap, Seq("digest"), "left_anti")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("digest")).orderBy(col("doc_id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val freshNew = fresh.filter(col("rn") === 1).drop("rn")
        .withColumn("status", lit("new"))
      val freshDup = fresh.filter(col("rn") > 1).drop("rn")
        .withColumn("status", lit("duplicate"))
      dup.unionByName(freshNew).unionByName(freshDup)
        .select(col("doc_id"), col("digest"), col("status"))
        .write.mode("overwrite").parquet(s"$outDir/batch_key=$batchKey")
      freshNew.select(col("digest"))
        .write.mode("overwrite").parquet(s"$snapshotDir/batch_key=$batchKey")
    } finally fresh.unpersist(blocking = false)
  }

  /** Source/language-mix drift monitor: per event-time window, the total
    * variation distance between the window's language distribution and the
    * reference mix the pipeline was tuned for — the alarm that fires when
    * the crawl mix shifts (a domain goes dark, a spam source floods in)
    * before the shifted data reaches training.
    *
    * Single streaming aggregation: the reference mix's languages are KNOWN,
    * so per-language counts are conditional sums inside one windowed agg —
    * no chained aggregation, watermark/append compatible. Languages outside
    * the reference mix count toward drift in full (their reference share is
    * zero). TV distance = ½·Σ|observed − reference|, flagged at
    * `tolerance`. */
  def mixDriftMonitor(docs: DataFrame, refShares: Map[String, Double],
      windowDur: String = "10 minutes", delay: String = "10 minutes",
      tolerance: Double = 0.2): DataFrame = {
    require(refShares.nonEmpty, "reference mix is empty")
    val langs = refShares.keys.toSeq.sorted
    val perLang = langs.map(l =>
      sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"n_$l"))
    val aggCols = count(lit(1)).as("n_docs") +: perLang
    val windowed = docs
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur))
      .agg(aggCols.head, aggCols.tail: _*)
    val absDevs = langs.map { l =>
      abs(col(s"n_$l").cast("double") / col("n_docs") - lit(refShares(l)))
    }
    val otherShare = // mass on languages the reference mix doesn't know
      lit(1.0) - langs.map(l => col(s"n_$l")).reduce(_ + _).cast("double") / col("n_docs")
    windowed
      .withColumn("tv_dist",
        round((absDevs.reduce(_ + _) + otherShare) * 0.5, 4))
      .select(
        (Seq(col("window.start").as("window_start"), col("n_docs")) ++
          langs.map(l => col(s"n_$l")) :+
          col("tv_dist") :+
          (col("tv_dist") > tolerance).as("drifted")): _*)
  }

  def nearDupPairs(docs: DataFrame, estThreshold: Double = 0.5,
      delay: String = "1 hour", retentionMs: Long = 3600000L,
      maxSigsPerBucket: Int = 64): Dataset[NearDupMatch] = {
    graft.GraftExtensions.ensureRegistered(docs.sparkSession)
    import docs.sparkSession.implicits._
    val k = graft.operators.Dedup.MinhashK
    val bands = graft.operators.Dedup.MinhashBands
    val rows = k / bands
    val banded = docs
      .withColumn("text", trim(col("text")))
      .filter(size(split(col("text"), "\\s+")) >= 3)
      .withColumn("sig",
        call_function("minhash_sig", call_function("word_shingles", col("text"), lit(3))))
      .select(
        posexplode(expr(
          s"""transform(sequence(0, ${bands - 1}),
             |  b -> concat(cast(b as string), '|',
             |              array_join(transform(slice(sig, b * $rows + 1, $rows),
             |                                   x -> cast(x as string)), ',')))""".stripMargin))
          .as(Seq("band", "band_key")),
        col("doc_id"), col("sig"), col("ts"))
      .withWatermark("ts", delay)
      .select(col("band_key"), col("doc_id"), col("sig"), col("ts"))
      .as[BandObs]
    banded
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[BucketState, NearDupMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_, arrivals, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ordered = arrivals.toSeq.sortBy(o => (o.ts.getTime, o.doc_id))
            var seen = state.getOption.map(_.docs).getOrElse(Nil)
            val out = Seq.newBuilder[NearDupMatch]
            ordered.foreach { o =>
              seen.foreach { case (id, s) =>
                val est = s.iterator.zip(o.sig.iterator).count { case (a, b) => a == b } /
                  k.toDouble
                // id != doc_id: an at-least-once redelivery must not match
                // its own earlier signature and emit a (X, X, 1.0) self-pair
                if (est >= estThreshold && id != o.doc_id)
                  out += NearDupMatch(o.doc_id, id, est)
              }
              // nor burn a bounded state slot on a second copy of itself
              if (!seen.exists(_._1 == o.doc_id)) seen = (o.doc_id, o.sig) :: seen
            }
            // monotonic expiry: a late (within-watermark) arrival's older
            // ts must not pull the timeout back below newest-seen +
            // retention — that would evict the bucket early and silently
            // miss later pairs still inside the retention window
            val newest = math.max(
              state.getOption.map(_.lastTs).getOrElse(0L),
              ordered.map(_.ts.getTime).max)
            state.update(BucketState(seen.take(maxSigsPerBucket), newest))
            state.setTimeoutTimestamp(newest + retentionMs)
            out.result().iterator
          }
      }
  }
}
