package graft.sources

import java.io.{DataInputStream, EOFException, InputStream}

import graft.config.Networks
import graft.model.EraRecord
import graft.ssz.{SnappyFramed, Ssz}

/** Filename-derived era metadata (era_reader.py:32-84; naming convention
  * docs/ERA_FILE_FORMAT.md:95-121: `<network>-<era>-<hash>.era`).
  * `eraKnown` = the era number genuinely came from the filename; a
  * non-convention name falls back to era 0 for the metadata COLUMNS
  * (rows inherit these values, so column predicates stay consistent) but
  * must never drive SLOT-based file pruning — block slots are peeked
  * from payloads, and a guessed era range would silently drop matching
  * rows. */
final case class EraFileInfo(
    eraNumber: Long, startSlot: Long, endSlot: Long,
    network: String, hash: String, filename: String, eraKnown: Boolean)

object EraFileInfo {
  def fromPath(path: String): EraFileInfo = {
    val filename = path.split('/').last
    val network = Networks.detectFromFilename(filename)
    val cfg = Networks(network)
    val parts = filename.stripSuffix(".era").split('-')
    val parsed: Option[Long] =
      (if (parts.length >= 2) scala.util.Try(parts(1).toLong).toOption else None)
        // an era number outside any sane range would OVERFLOW the slot
        // arithmetic (era·8192 wraps past Long.MaxValue/8192 ≈ 1.1e15),
        // poisoning slot-range file pruning with wrapped bounds — treat
        // such names as unknown: metadata era falls back to 0 and slot
        // pruning is disabled for the file (the conservative direction)
        .filter(e => e >= 0 && e < (1L << 40))
    val eraNumber = parsed.getOrElse(0L)
    val hash = if (parts.length > 2) parts(2) else "unknown"
    EraFileInfo(
      eraNumber = eraNumber,
      startSlot = graft.config.EraSlots.firstSlot(eraNumber, cfg),
      endSlot = graft.config.EraSlots.lastSlot(eraNumber, cfg),
      network = network, hash = hash, filename = filename,
      eraKnown = parsed.isDefined)
  }
}

/**
 * Sequential e2store record scan — the S1 operator (era_reader.py:86-127).
 *
 * Stream shape: 8-byte version header, then records
 * `[type(2)][length LE(4)][pad(2)][payload]`. Types (era_reader.py:112-125):
 * `0x01 0x00` CompressedSignedBeaconBlock (snappy-framed SSZ; slot peeked),
 * `0x02 0x00` CompressedBeaconState (tagged, not decoded),
 * `0x69 0x32` SlotIndex (tagged).
 *
 * Exposed as an Iterator so the DataSource partition reader streams records
 * without materializing the era (the reference materializes whole eras —
 * SURVEY.md §4 pipelining note).
 */
object EraFileReader {

  val TypeBlock: Int = 0x0001  // bytes 0x01 0x00 LE
  val TypeState: Int = 0x0002
  val TypeIndex: Int = 0x3269  // bytes 0x69 0x32 LE

  def readRecords(in: InputStream, info: EraFileInfo): Iterator[EraRecord] = {
    val din = new DataInputStream(in)
    // skip 8-byte version header (era_reader.py:92); a file shorter than
    // the header is empty, not an error
    try din.skipNBytes(8)
    catch { case _: EOFException => return Iterator.empty }
    new Iterator[EraRecord] {
      private var nextRecord: EraRecord = _
      private var done = false

      private def advance(): Unit = {
        nextRecord = null
        while (nextRecord == null && !done) {
          val header = new Array[Byte](8)
          val n = din.readNBytes(header, 0, 8)
          if (n < 8) { done = true; return }
          val recordType = (header(0) & 0xff) | ((header(1) & 0xff) << 8)
          val rawLength = Ssz.readUint32(header, 2) // unsigned
          // a length the JVM can't even allocate is corruption — stop the
          // walk (the reference's read of that many bytes hits EOF and
          // stops the same way); narrowing through .toInt instead would
          // wrap negative, skip ZERO payload bytes, and re-parse the
          // record's body as headers — garbage records for the rest of
          // the file
          if (rawLength > Int.MaxValue) { done = true; return }
          val dataLength = rawLength.toInt
          if (dataLength > 0) {
            val payload = new Array[Byte](dataLength)
            if (din.readNBytes(payload, 0, dataLength) < dataLength) { done = true; return }
            recordType match {
              case TypeBlock =>
                // decompress-peek the slot (era_reader.py:112-121)
                try {
                  val decompressed = SnappyFramed.decompress(payload)
                  EraScanStats.blocksDecompressed.increment()
                  val messageOffset = Ssz.readUint32(decompressed, 0).toInt
                  val slot = Ssz.readUint64(decompressed, messageOffset)
                  nextRecord = EraRecord(slot, "block", payload,
                    info.network, info.eraNumber, info.filename)
                } catch { case _: Exception => () } // skip undecodable block
              case TypeState =>
                nextRecord = EraRecord(0L, "state", payload,
                  info.network, info.eraNumber, info.filename)
              case TypeIndex =>
                nextRecord = EraRecord(0L, "index", payload,
                  info.network, info.eraNumber, info.filename)
              case _ => () // unknown record types skipped
            }
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextRecord != null
      override def next(): EraRecord = {
        val r = nextRecord
        advance()
        r
      }
    }
  }
}

/** e2store era-file writer — used by fixture generation and synthetic-era
  * benchmarks (format per docs/ERA_FILE_FORMAT.md:36-40). */
object EraFileWriter {
  def write(out: java.io.OutputStream, records: Iterator[(Int, Array[Byte])]): Unit = {
    // 8-byte version header: e2store magic "e2" + version + padding
    out.write(Array[Byte]('e', '2', 's', 't', 0, 0, 0, 0))
    records.foreach { case (recordType, payload) =>
      out.write(recordType & 0xff)
      out.write((recordType >> 8) & 0xff)
      val len = payload.length
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write((len >> 16) & 0xff); out.write((len >> 24) & 0xff)
      out.write(0); out.write(0) // 2-byte pad
      out.write(payload)
    }
  }

  /** Compress + write a block record payload. */
  def blockRecord(sszBlock: Array[Byte]): (Int, Array[Byte]) =
    (EraFileReader.TypeBlock, SnappyFramed.compress(sszBlock))

  /** One indexed group of a (possibly multi-group) era file: blocks are
    * (slot, ALREADY-COMPRESSED payload) with distinct slots inside
    * `[startSlot, startSlot + slotCount)`; `state` is the optional
    * (slot, payload) era-state record. */
  final case class EraGroup(
      blocks: Seq[(Long, Array[Byte])],
      state: Option[(Long, Array[Byte])],
      startSlot: Long, slotCount: Int)

  /** Write a spec-shaped single-group era file WITH its two trailing
    * SlotIndex records (docs/ERA_FILE_FORMAT.md:31-38; offsets signed i64
    * relative to the start of the index record, 0 = no record at that
    * slot — the public e2store layout [[EraSlotIndex]] seeks through). */
  def writeIndexed(out: java.io.OutputStream,
      blocks: Seq[(Long, Array[Byte])],
      state: Option[(Long, Array[Byte])],
      startSlot: Long, slotCount: Int): Unit =
    writeGroups(out, Seq(EraGroup(blocks, state, startSlot, slotCount)))

  /** Multi-group era file (`era := group+`, docs/ERA_FILE_FORMAT.md:31-38):
    * each group after the first opens with a zero-length e2store Version
    * record (type 0x3265, len 0 — the sequential walk's zero-payload loop
    * skips it) and every group carries its OWN trailing SlotIndex pair, so
    * only the LAST group's indices sit at the tail — the exact layout
    * [[EraSlotIndex.lookupAll]]'s `coversWholeEra` fallback guard exists
    * for: tail-index lookups fast-path, earlier-group slots must walk. */
  def writeGroups(out: java.io.OutputStream, groups: Seq[EraGroup]): Unit = {
    require(groups.nonEmpty, "era file needs at least one group")
    groups.foreach { g =>
      require(g.blocks.map(_._1).distinct.size == g.blocks.size,
        "indexed era file: duplicate block slots")
      g.blocks.foreach { case (s, _) =>
        require(s >= g.startSlot && s < g.startSlot + g.slotCount,
          s"slot $s outside index range [${g.startSlot}, ${g.startSlot + g.slotCount})")
      }
    }
    out.write(Array[Byte]('e', '2', 's', 't', 0, 0, 0, 0))
    var pos = 8L
    def emit(recordType: Int, payload: Array[Byte]): Long = {
      val at = pos
      out.write(recordType & 0xff); out.write((recordType >> 8) & 0xff)
      val len = payload.length
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write((len >> 16) & 0xff); out.write((len >> 24) & 0xff)
      out.write(0); out.write(0)
      out.write(payload)
      pos += 8L + len
      at
    }
    def le64(v: Long): Array[Byte] = {
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
      b
    }
    groups.zipWithIndex.foreach { case (g, gi) =>
      if (gi > 0) emit(TypeVersion, Array.emptyByteArray)
      val blockPos: Map[Long, Long] =
        g.blocks.map { case (s, p) => s -> emit(EraFileReader.TypeBlock, p) }.toMap
      val statePos = g.state.map { case (_, p) => emit(EraFileReader.TypeState, p) }
      val bIdxPos = pos
      val bp = new java.io.ByteArrayOutputStream(16 + 8 * g.slotCount)
      bp.write(le64(g.startSlot))
      (0 until g.slotCount).foreach { i =>
        bp.write(le64(blockPos.get(g.startSlot + i).map(_ - bIdxPos).getOrElse(0L)))
      }
      bp.write(le64(g.slotCount.toLong))
      emit(EraFileReader.TypeIndex, bp.toByteArray)
      val sIdxPos = pos
      val sp = new java.io.ByteArrayOutputStream(24)
      sp.write(le64(g.state.map(_._1).getOrElse(g.startSlot + g.slotCount)))
      sp.write(le64(statePos.map(_ - sIdxPos).getOrElse(0L)))
      sp.write(le64(1L))
      emit(EraFileReader.TypeIndex, sp.toByteArray)
    }
  }

  /** e2store Version record type (`0x65 0x32` LE), zero-length — opens
    * every group after the first in a multi-group file. */
  val TypeVersion: Int = 0x3265
}
