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
 * binary-safe schemas. The codec story splits by kind:
 *  - **image rows carry REAL PNGs and take a REAL decode**: payloads are
 *    deterministic synthetic PNGs (pixel channels are a closed-form
 *    function of (media_id, x, y)) and `decodeAndFeaturize` runs them
 *    through `javax.imageio.ImageIO` — an actual compressed-image decode,
 *    JDK-only. Because PNG is lossless, the decoded pixel statistics must
 *    equal the generator's closed form, which is exactly what the DuckDB
 *    oracle computes — so the oracle gate value-verifies a genuine
 *    encode→decode round trip, not a checksum of opaque bytes.
 *  - **audio rows carry REAL WAVs and take a REAL decode**: payloads are
 *    synthetic 16-bit PCM mono WAV files (sample i is a closed-form
 *    function of media_id) and `decodeAndFeaturize` runs them through
 *    `javax.sound.sampled.AudioSystem` — an actual audio-container
 *    decode, JDK-only. PCM is lossless, so the decoded sample statistics
 *    must equal the generator's closed form, which the DuckDB oracle
 *    computes independently.
 *  - **video stays a STUB**: the JDK has no video codec and this container
 *    has no ffmpeg, so video rows keep the deterministic per-chunk byte
 *    checksum — byte-defined, so still oracle-verified.
 *
 * Scale: media rows are large (payload-dominated). Everything here is a
 * narrow map — no shuffle; at 100 TB the payload column stays columnar
 * (Parquet binary) and column pruning means metadata-only queries never
 * read the bytes.
 */
object Multimodal {

  // once at class-init, not buried in a partition body: ImageIO's disk
  // cache is GLOBAL static state, and with it on every per-row PNG encode
  // in pngPayload creates+deletes a FileCacheImageOutputStream temp file —
  // whether that happened used to depend on which partition ran first
  javax.imageio.ImageIO.setUseCache(false)

  val FeatureDims = 8

  /** Per-channel (xMult, yMult) for the synthetic raster: channel value at
    * (x, y) = (media_id % 251 + xMult·x + yMult·y) % 256 for R, G, B.
    * Shared with the DuckDB oracle builders so the closed form and the
    * PNG generator cannot silently desynchronize. */
  val ChannelMults: Seq[(Int, Int)] = Seq((3, 5), (7, 11), (13, 17))

  /** The closed-form pixel channel (see [[ChannelMults]]). */
  def pixelValue(mediaId: Long, xm: Int, ym: Int, x: Int, y: Int): Int =
    (((mediaId % 251) + xm.toLong * x + ym.toLong * y) % 256).toInt

  /** Encode the synthetic raster for `mediaId` as a real PNG. The pixel
    * array is filled straight through the TYPE_INT_RGB backing
    * DataBufferInt (same packed layout setRGB writes, minus the per-pixel
    * ColorModel round-trip), and the closed form is evaluated
    * incrementally — each channel just adds its xMult per column / yMult
    * per row under mod 256, which is arithmetic-identical to
    * [[pixelValue]] for these non-negative operands. */
  private[graft] def pngBytes(mediaId: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    val Seq((rx, ry), (gx, gy), (bx, by)) = ChannelMults
    val base = (mediaId % 251).toInt
    var rRow = base % 256; var gRow = base % 256; var bRow = base % 256
    var y = 0
    var i = 0
    while (y < h) {
      var r = rRow; var g = gRow; var b = bRow
      var x = 0
      while (x < w) {
        px(i) = (r << 16) | (g << 8) | b
        r += rx; if (r >= 256) r -= 256
        g += gx; if (g >= 256) g -= 256
        b += bx; if (b >= 256) b -= 256
        x += 1
        i += 1
      }
      rRow += ry; if (rRow >= 256) rRow -= 256
      gRow += gy; if (gRow >= 256) gRow -= 256
      bRow += by; if (bRow >= 256) bRow -= 256
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val pngPayload =
    udf((id: Long, w: Int, h: Int) => pngBytes(id, w, h))

  /** Audio closed form, shared with the DuckDB oracle builders: the track
    * for `media_id` has `AudioBaseSamples + media_id % AudioSampleMod`
    * 16-bit samples, and sample i is
    * `(media_id % 65521 + 73·i² + 131·i) % 65536 − 32768`. */
  val AudioBaseSamples = 400
  val AudioSampleMod = 251
  val AudioSampleRate = 8000f

  def audioSampleCount(mediaId: Long): Int =
    (AudioBaseSamples + mediaId % AudioSampleMod).toInt

  def audioSampleValue(mediaId: Long, i: Int): Int =
    (((mediaId % 65521) + 73L * i * i + 131L * i) % 65536L - 32768L).toInt

  /** The same closed form as a SQL expression over a `media_id` column and
    * the sample-index expression `iExpr` — interpolated into the DuckDB
    * oracle so the generator and the oracle share one formula. */
  def audioSampleValueSql(iExpr: String): String =
    s"((media_id % 65521) + 73 * $iExpr * $iExpr + 131 * $iExpr) % 65536 - 32768"

  /** Encode the synthetic track for `mediaId` as a real WAV container
    * (RIFF header + 16-bit little-endian PCM) via `javax.sound.sampled`. */
  private[graft] def wavBytes(mediaId: Long): Array[Byte] = {
    val n = audioSampleCount(mediaId)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = audioSampleValue(mediaId, i)
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      AudioSampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val wavPayload = udf((id: Long) => wavBytes(id))

  /** Derive a deterministic media table from the `documents` corpus:
    * image rows get a synthetic PNG payload ([[pngBytes]]), audio rows a
    * synthetic WAV payload ([[wavBytes]]); video keeps the text bytes as
    * an opaque stand-in payload. The conditional keeps the encoders out
    * of metadata-only plans — a query that never touches `payload` (or
    * touches it only behind a kind guard) never runs them. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3).cast("int") + 1).as("kind"),
      trim(col("text")).cast("binary").as("raw_payload"),
      (lit(32) + col("n_chars") % 97).cast("int").as("width"),
      (lit(32) + col("n_chars") % 53).cast("int").as("height"),
      (col("n_chars") * 40).cast("long").as("duration_ms"))
    .select(
      col("media_id"),
      col("kind"),
      when(col("kind") === "image",
        pngPayload(col("media_id"), col("width"), col("height")))
        .when(col("kind") === "audio", wavPayload(col("media_id")))
        .otherwise(col("raw_payload")).as("payload"),
      col("width"),
      col("height"),
      col("duration_ms"))

  def mediaDataset(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    mediaTable(docs).as[MediaRow]
  }

  /** Decode + feature extraction. Image rows take a REAL codec pass:
    * `ImageIO.read` decompresses the PNG payload and the features are
    * decoded-pixel statistics — [width, height, meanR, meanG, meanB,
    * meanLuma, minLuma, maxLuma] (luma = 0.299R + 0.587G + 0.114B;
    * channel means are exact integer sums divided once, so the doubles
    * are order-independent and bit-stable; meanLuma is the linear
    * combination of the channel means, computed identically in the
    * oracle). Audio rows take a REAL codec pass too: `AudioSystem`
    * parses the WAV container, the PCM frames are read back and the
    * features are decoded-sample statistics — [n_samples, sampleRate,
    * mean, meanAbs, min, max, zeroCrossings, rms] (integer sums divided
    * once; rms is one sqrt of an exact ratio — the identical IEEE
    * expression the oracle runs). Video keeps the deterministic
    * per-chunk byte checksum stub (no video codec in the JDK or this
    * environment — a real pipeline swaps in ffmpeg here); `n_bytes`
    * reports DECODED content size for images (w·h·3) and audio (2·frames
    * from the decoded stream — evidence the decode ran) and payload size
    * for the stubbed kind. */
  def decodeAndFeaturize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init — where a real codec/context would be created
      // once; for ImageIO: keep the decoder off its disk-backed cache
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { m =>
        if (m.kind == "image") {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(m.payload))
          require(img != null, s"media ${m.media_id}: payload is not a decodable image")
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var minL = Double.MaxValue; var maxL = Double.MinValue
          // ImageIO decodes an 8-bit RGB PNG to TYPE_3BYTE_BGR; when the
          // raster has that exact standard layout, read the component
          // bytes straight out of the backing array — same channel values
          // getRGB returns, minus the per-pixel ColorModel conversion.
          // Anything else falls back to the portable getRGB loop.
          val raster = img.getRaster
          val fastBgr = img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
            (raster.getSampleModel match {
              case sm: java.awt.image.PixelInterleavedSampleModel =>
                sm.getPixelStride == 3 && sm.getScanlineStride == w * 3 &&
                  java.util.Arrays.equals(sm.getBandOffsets, Array(2, 1, 0)) &&
                  raster.getDataBuffer.getOffset == 0 &&
                  raster.getSampleModelTranslateX == 0 &&
                  raster.getSampleModelTranslateY == 0
              case _ => false
            })
          if (fastBgr) {
            val px = raster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferByte].getData
            var i = 0
            val end = w * h * 3
            while (i < end) {
              val b = px(i) & 0xff
              val g = px(i + 1) & 0xff
              val r = px(i + 2) & 0xff
              sr += r; sg += g; sb += b
              val luma = 0.299 * r + 0.587 * g + 0.114 * b
              if (luma < minL) minL = luma
              if (luma > maxL) maxL = luma
              i += 3
            }
          } else {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                sr += r; sg += g; sb += b
                val luma = 0.299 * r + 0.587 * g + 0.114 * b
                if (luma < minL) minL = luma
                if (luma > maxL) maxL = luma
                x += 1
              }
              y += 1
            }
          }
          val n = w.toLong * h
          val mr = sr.toDouble / n
          val mg = sg.toDouble / n
          val mb = sb.toDouble / n
          MediaFeatures(m.media_id, m.kind, n * 3,
            Array(w.toDouble, h.toDouble, mr, mg, mb,
              0.299 * mr + 0.587 * mg + 0.114 * mb, minL, maxL))
        } else if (m.kind == "audio") {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian, s"media ${m.media_id}: unexpected decoded format $fmt")
          val pcm = ais.readAllBytes()
          ais.close()
          val n = pcm.length / 2
          var sum = 0L; var sumAbs = 0L; var sumSq = 0L
          var minV = Int.MaxValue; var maxV = Int.MinValue
          var zc = 0L; var prev = 0; var i = 0
          while (i < n) {
            val v = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt
            sum += v; sumAbs += math.abs(v).toLong; sumSq += v.toLong * v
            if (v < minV) minV = v
            if (v > maxV) maxV = v
            if (i > 0 && ((prev < 0 && v >= 0) || (prev >= 0 && v < 0))) zc += 1
            prev = v
            i += 1
          }
          MediaFeatures(m.media_id, m.kind, n.toLong * 2,
            Array(n.toDouble, fmt.getSampleRate.toDouble,
              sum.toDouble / n, sumAbs.toDouble / n,
              minV.toDouble, maxV.toDouble, zc.toDouble,
              math.sqrt(sumSq.toDouble / n)))
        } else {
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
    * entirely (check ReadSchema in the plan). `total_bytes` reports
    * logical CONTENT size: the decoded raster (w·h·3) for images and the
    * PCM frames (2·samples) for audio — pure metadata computations, so
    * the rollup never touches the encoded bytes — and payload size for
    * the stubbed video kind (whose payload IS the content). */
  def metaSummary(docs: DataFrame): DataFrame =
    mediaTable(docs)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("kind") === "image",
            col("width").cast("long") * col("height") * 3L)
          .when(col("kind") === "audio",
            (lit(AudioBaseSamples) + col("media_id") % AudioSampleMod) * 2L)
          .otherwise(octet_length(col("payload")).cast("long"))).as("total_bytes"),
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
