package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One document arriving on an ingest stream — the streaming-side shape of
  * the `documents` table plus an arrival timestamp. */
case class StreamDoc(doc_id: Long, text: String, lang: String, ts: Timestamp)

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
      .withColumn("digest", md5(trim(col("text"))))
      .withColumn("simhash",
        call_function("simhash48", split(trim(col("text")), "\\s+")))
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
}
