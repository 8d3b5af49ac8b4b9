package graft.ssz

import org.xerial.snappy.Snappy

/**
 * Snappy decompression for era-file block records: raw snappy first, then a
 * tolerant walk of the framing format (stream id 0xff, compressed 0x00 /
 * uncompressed 0x01 chunks, 4-byte CRC skipped) — exactly the reference's
 * fallback ladder (era_parser/ingestion/compression.py:4-52).
 *
 * Runs inside executor tasks (DataSource reader / mapPartitions); snappy-java
 * ships with Spark so no extra dependency.
 */
object SnappyFramed {

  private val StreamId = Array[Byte](0xff.toByte, 0x06, 0x00, 0x00, 's', 'N', 'a', 'P', 'p', 'Y')

  /** Offset-based raw-snappy decompress (this snappy-java version has no
    * (byte[], off, len) → byte[] overload): exact-size output array from
    * uncompressedLength, one JNI uncompress into it — still zero input
    * copies. */
  private def uncompressAt(input: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new Array[Byte](Snappy.uncompressedLength(input, off, len))
    Snappy.uncompress(input, off, len, out, 0)
    out
  }

  private def startsWithStreamId(compressed: Array[Byte]): Boolean = {
    if (compressed.length < 10) return false
    var i = 0
    while (i < 10) {
      if (compressed(i) != StreamId(i)) return false
      i += 1
    }
    true
  }

  def decompress(compressed: Array[Byte]): Array[Byte] = {
    // raw-first ladder (compression.py:4-52) WITHOUT a thrown-and-caught
    // exception per framed block: isValidCompressedBuffer is the exact
    // validity check uncompress performs before throwing, so gating on it
    // takes the same branch the try/catch did — framed era blocks (every
    // block the writers produce) skip straight to the frame walk instead
    // of paying a JNI validation + exception construction each
    if (Snappy.isValidCompressedBuffer(compressed))
      try return Snappy.uncompress(compressed)
      catch { case _: Exception => () }

    var pos = if (startsWithStreamId(compressed)) 10 else 0

    // single-chunk fast path — the era writers emit ≤64 KiB-raw blocks as
    // stream id + ONE frame: decompress straight out of the input (offset
    // API) and skip the ByteArrayOutputStream double-copy
    if (pos + 4 <= compressed.length) {
      val t = compressed(pos) & 0xff
      val l = (compressed(pos + 1) & 0xff) |
        ((compressed(pos + 2) & 0xff) << 8) |
        ((compressed(pos + 3) & 0xff) << 16)
      if (l >= 4 && pos + 4 + l == compressed.length) {
        if (t == 0x00) {
          try return uncompressAt(compressed, pos + 8, l - 4)
          catch { case _: Exception =>
            // mirror the general walk's no-chunk-produced contract
            throw new IllegalArgumentException("Failed to decompress snappy framed data")
          }
        } else if (t == 0x01) {
          return java.util.Arrays.copyOfRange(compressed, pos + 8, pos + 4 + l)
        }
      }
    }

    val out = new java.io.ByteArrayOutputStream(compressed.length * 3)
    var produced = false
    while (pos + 4 <= compressed.length) {
      val frameType = compressed(pos) & 0xff
      // 3-byte LE length (compression.py:31)
      val frameLen = (compressed(pos + 1) & 0xff) |
        ((compressed(pos + 2) & 0xff) << 8) |
        ((compressed(pos + 3) & 0xff) << 16)
      pos += 4
      if (pos + frameLen > compressed.length) { pos = compressed.length }
      else {
        if (frameType == 0x00 && frameLen >= 4) {
          try {
            // skip 4-byte CRC (compression.py:41); offset API avoids the
            // per-chunk input copy
            out.write(uncompressAt(compressed, pos + 4, frameLen - 4))
            produced = true
          } catch { case _: Exception => () }
        } else if (frameType == 0x01 && frameLen >= 4) {
          out.write(compressed, pos + 4, frameLen - 4)
          produced = true
        }
        pos += frameLen
      }
    }
    if (!produced)
      throw new IllegalArgumentException("Failed to decompress snappy framed data")
    out.toByteArray
  }

  /** Framed compression (for era-file writers and test fixture generation):
    * stream id + 64 KiB compressed chunks with CRC32C masked checksums. */
  def compress(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    out.write(StreamId, 0, StreamId.length)
    val ChunkMax = 65536
    var off = 0
    while (off < raw.length || (raw.length == 0 && off == 0)) {
      val len = math.min(ChunkMax, raw.length - off)
      val chunk = java.util.Arrays.copyOfRange(raw, off, off + len)
      val comp = Snappy.compress(chunk)
      val crc = maskedCrc32c(chunk)
      val (frameType, payload) =
        if (comp.length < chunk.length) (0x00, comp) else (0x01, chunk)
      val frameLen = payload.length + 4
      out.write(frameType)
      out.write(frameLen & 0xff); out.write((frameLen >> 8) & 0xff); out.write((frameLen >> 16) & 0xff)
      out.write(crc & 0xff); out.write((crc >> 8) & 0xff)
      out.write((crc >> 16) & 0xff); out.write((crc >> 24) & 0xff)
      out.write(payload, 0, payload.length)
      off += len
      if (raw.length == 0) off = 1 // emit nothing further for empty input
    }
    out.toByteArray
  }

  /** CRC32C with the snappy framing mask. */
  private def maskedCrc32c(data: Array[Byte]): Int = {
    val crc = new java.util.zip.CRC32C()
    crc.update(data)
    val c = crc.getValue.toInt
    ((c >>> 15) | (c << 17)) + 0xa282ead8
  }
}
