package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata — the layout a
  * multimodal training pipeline carries image/audio/video in. */
case class MediaRow(
    media_id: Long,
    kind: String, // image | audio | video
    payload: Array[Byte],
    width: Int,
    height: Int,
    duration_ms: Long)

/** Output of the (stubbed) decode + feature-extract stage. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    features: Array[Double])

/**
 * Multimodal-column plumbing: binary payload columns with typed metadata,
 * decode / feature-extract / frame-sample stages.
 *
 * The Spark-side plumbing is real — typed `Dataset[MediaRow]`,
 * `mapPartitions` batch iteration (one decoder instantiation per partition,
 * the shape a JNI/FFI media codec needs), explode for frame sampling,
 * binary-safe schemas. The *codec itself* is a STUB: this container has no
 * image/audio libraries, so `decodeAndFeaturize` computes a deterministic
 * fake feature vector (per-chunk byte checksums) where a real pipeline
 * would call e.g. libjpeg/ffmpeg. The stub is deterministic and
 * byte-defined, so even this stage is value-verified against the DuckDB
 * oracle.
 *
 * Scale: media rows are large (payload-dominated). Everything here is a
 * narrow map — no shuffle; at 100 TB the payload column stays columnar
 * (Parquet binary) and column pruning means metadata-only queries never
 * read the bytes.
 */
object Multimodal {

  val FeatureDims = 8

  /** Derive a deterministic media table from the `documents` corpus: the
    * text bytes play the role of an opaque media payload. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      trim(col("text")).cast("binary").as("payload"),
      (lit(32) + col("n_chars") % 97).cast("int").as("width"),
      (lit(32) + col("n_chars") % 53).cast("int").as("height"),
      (col("n_chars") * 40).cast("long").as("duration_ms"))

  def mediaDataset(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    mediaTable(docs).as[MediaRow]
  }

  /** STUB decode + feature extraction. A real implementation decodes the
    * payload with a media library and emits embeddings; here the "decode"
    * is a deterministic per-chunk checksum so the plumbing (typed
    * mapPartitions over binary, fixed-width feature output) is exercised
    * and verifiable end-to-end. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init — where a real codec/context would be created once
      rows.map { m =>
        val bytes = m.payload
        val n = bytes.length
        val chunkLen = math.max((n + FeatureDims - 1) / FeatureDims, 1)
        val feats = Array.tabulate(FeatureDims) { j =>
          val from = j * chunkLen
          val until = math.min(from + chunkLen, n)
          if (from >= n) 0.0
          else {
            var s = 0L
            var i = from
            while (i < until) { s += (bytes(i) & 0xff); i += 1 }
            (s % 1000L) / 999.0
          }
        }
        MediaFeatures(m.media_id, m.kind, n.toLong, feats)
      }
    }
  }

  /** Feature table flattened for oracle comparison. */
  def featuresFlat(docs: DataFrame): DataFrame = {
    val f = decodeAndFeaturize(mediaDataset(docs)).toDF()
    val featCols = (0 until FeatureDims).map(j =>
      round(element_at(col("features"), j + 1), 6).as(s"f$j"))
    f.select(Seq(col("media_id"), col("kind"), col("n_bytes")) ++ featCols: _*)
      .orderBy(col("media_id"))
  }

  /** Metadata-only rollup — at rest this prunes the payload column
    * entirely (check ReadSchema in the plan). */
  def metaSummary(docs: DataFrame): DataFrame =
    mediaTable(docs)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        round(avg(col("duration_ms")), 4).as("avg_duration_ms"))
      .orderBy(col("kind"))

  val FramesPerVideo = 8
  val FrameBytes = 16

  /** Frame sampling for video rows: 8 evenly-spaced fixed-width byte
    * windows, fingerprinted. posexplode keeps the frame index. */
  def frameSamples(docs: DataFrame): DataFrame =
    mediaTable(docs)
      .filter(col("kind") === "video")
      .withColumn("n_bytes", octet_length(col("payload")))
      .select(
        col("media_id"),
        col("n_bytes").cast("long").as("n_bytes"),
        posexplode(expr(
          s"""transform(sequence(0, $FramesPerVideo - 1),
             |  i -> md5(substring(payload, i * (n_bytes div $FramesPerVideo) + 1, $FrameBytes)))"""
            .stripMargin)).as(Seq("frame_idx", "frame_md5")))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"), col("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Cross-video duplicate-frame detection: frames whose sampled content
    * digest recurs — re-encoded/re-uploaded copies of the same clip, the
    * video-side analogue of document exact dedup. Deduping on frame
    * digests instead of whole-file digests catches copies that differ in
    * container metadata. One digest-keyed aggregation over the sampled
    * frames (the per-frame digest is the narrow [[frameSamples]]
    * projection; whole payloads never shuffle). */
  def frameDuplicates(docs: DataFrame): DataFrame =
    frameSamples(docs)
      .groupBy(col("frame_md5"))
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct(col("media_id")).as("n_media"),
        min(col("media_id")).as("first_media_id"))
      .filter(col("n_occurrences") > 1)
      .orderBy(col("frame_md5"))
}
