package graft.sources

import java.util.concurrent.atomic.LongAdder

import org.apache.hadoop.fs.FSDataInputStream

import graft.model.EraRecord
import graft.ssz.{SnappyFramed, Ssz}

/** Per-JVM scan counters — the measured witness for the SlotIndex fast
  * path (`SlotIndexSpec` asserts a point lookup reads O(1 record) bytes on
  * a multi-thousand-block file instead of walking it). Local-mode tests
  * share the JVM with executors, so LongAdders are visible to the spec;
  * on a real cluster they simply accumulate per executor, unused. */
object EraScanStats {
  val bytesRead = new LongAdder
  val blocksDecompressed = new LongAdder
  val indexLookups = new LongAdder
  val fullScans = new LongAdder
  def reset(): Unit =
    Seq(bytesRead, blocksDecompressed, indexLookups, fullScans).foreach(_.reset())
}

/**
 * SlotIndex-backed random access into an era file — the O(1) seek the
 * format already paid for and the reference reads-but-ignores
 * (era_parser/ingestion/era_reader.py:124-125; SURVEY.md §4 flags that as
 * the reference's own point-lookup perf bug).
 *
 * Layout (public e2store/era spec, docs/ERA_FILE_FORMAT.md:31-38 +
 * status-im nimbus-eth2 docs/e2store.md):
 *
 *   group      := Version | block* | era-state | other-entries*
 *                 | slot-index(block)? | slot-index(state)
 *   slot-index := starting-slot | index … index | count   (all i64 LE)
 *
 * Each `index` entry is a SIGNED offset from the BEGINNING of the
 * slot-index record (its 8-byte header) to the beginning of the target
 * record; 0 = no record at that slot. The state index (count = 1) is the
 * file's last record, so the whole structure parses backwards from EOF:
 * count at EOF−8 sizes the state index, the block index ends where the
 * state index starts, its own trailing count sizes it.
 *
 * Everything here is CONSERVATIVE: any malformed tail, out-of-range slot,
 * or peeked-slot mismatch returns None and the caller falls back to the
 * sequential walk (whose residual filters keep the answer correct) — the
 * index is a seek accelerator, never a correctness dependency. A target
 * slot outside the tail index's range also falls back (a multi-group file
 * has per-group indices; only the last group's is at the tail).
 */
/** InputStream wrapper feeding [[EraScanStats.bytesRead]] — makes the
  * sequential walk's byte volume measurable next to the fast path's. */
class CountingInputStream(in: java.io.InputStream, counter: LongAdder)
    extends java.io.FilterInputStream(in) {
  override def read(): Int = {
    val b = super.read()
    if (b >= 0) counter.increment()
    b
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    val n = super.read(b, off, len)
    if (n > 0) counter.add(n)
    n
  }
  override def skip(n: Long): Long = {
    val s = super.skip(n)
    if (s > 0) counter.add(s)
    s
  }
}

object EraSlotIndex {

  private def readLongAt(in: FSDataInputStream, pos: Long): Long = {
    val b = new Array[Byte](8)
    in.readFully(pos, b)
    EraScanStats.bytesRead.add(8)
    Ssz.readUint64(b, 0) // LE; value re-interpreted signed by the caller
  }

  /** Parse the record header at `pos`: (type, payloadLength) or None. */
  private def headerAt(in: FSDataInputStream, pos: Long,
      fileLen: Long): Option[(Int, Long)] = {
    if (pos < 8 || pos + 8 > fileLen) return None
    val b = new Array[Byte](8)
    in.readFully(pos, b)
    EraScanStats.bytesRead.add(8)
    val tpe = (b(0) & 0xff) | ((b(1) & 0xff) << 8)
    Some((tpe, Ssz.readUint32(b, 2)))
  }

  /** The position of a slot-index RECORD whose payload ENDS at `end`
    * (exclusive), validated against its own trailing count — or None. */
  private def indexRecordEndingAt(in: FSDataInputStream, end: Long,
      fileLen: Long): Option[(Long, Long, Long)] = {
    if (end < 8 + 8 + 24) return None
    val count = readLongAt(in, end - 8)
    // an index over more slots than any era geometry uses is corruption
    if (count < 1 || count > (1L << 20)) return None
    val recPos = end - (24 + 8 * count)
    headerAt(in, recPos, fileLen) match {
      case Some((EraFileReader.TypeIndex, len)) if len == 16 + 8 * count =>
        val startingSlot = readLongAt(in, recPos + 8)
        Some((recPos, startingSlot, count))
      case _ => None
    }
  }

  /** Point lookup: the era record for `slot` via the tail block index.
    * Some(iterator with 0 or 1 records) when the index is present, valid,
    * and covers `slot`; None = caller must fall back to the full walk. */
  def lookup(in: FSDataInputStream, fileLen: Long, info: EraFileInfo,
      slot: Long): Option[Iterator[EraRecord]] =
    lookupAll(in, fileLen, info, Seq(slot))

  /** Batch form — the `slot IN (…)` pushdown: ONE tail parse, then one
    * offset probe + record read per requested slot. Slots OUTSIDE the
    * index's range (a multi-era IN set probes every surviving file for
    * every slot) are SKIPPED only when the index provably spans the
    * file's whole filename-declared era (`startingSlot..+count` ==
    * `info.startSlot..endSlot`, `eraKnown`) — the same filename trust
    * file-level pruning already stands on; otherwise (partial index,
    * unparseable name, possible multi-group file whose tail index covers
    * only the last group) returns None and the caller walks, so a
    * partial answer can never be emitted. Any record-validation failure
    * also walks. Slots are deduplicated; records come back in ascending
    * slot order. */
  def lookupAll(in: FSDataInputStream, fileLen: Long, info: EraFileInfo,
      slots: Seq[Long]): Option[Iterator[EraRecord]] =
    try {
      // state index is the last record; block index ends where it begins
      val stateIdx = indexRecordEndingAt(in, fileLen, fileLen)
      val blockIdx = stateIdx.flatMap { case (statePos, _, _) =>
        indexRecordEndingAt(in, statePos, fileLen)
      }
      blockIdx.flatMap { case (idxPos, startingSlot, count) =>
        val distinctSlots = slots.distinct.sorted
        val wanted = distinctSlots
          .filter(s => s >= startingSlot && s < startingSlot + count)
        val coversWholeEra = info.eraKnown &&
          startingSlot == info.startSlot &&
          startingSlot + count == info.endSlot + 1
        if (wanted.size < distinctSlots.size && !coversWholeEra)
          None
        else {
          EraScanStats.indexLookups.increment()
          val found = Seq.newBuilder[EraRecord]
          val it = wanted.iterator
          while (it.hasNext) {
            val slot = it.next()
            val rawOff = readLongAt(in, idxPos + 16 + 8 * (slot - startingSlot))
            if (rawOff != 0L) { // 0 = indexed hole: no block at this slot
              val recPos = idxPos + rawOff // signed offset, typically negative
              headerAt(in, recPos, fileLen) match {
                case Some((EraFileReader.TypeBlock, len))
                    if len > 0 && len <= Int.MaxValue && recPos + 8 + len <= fileLen =>
                  val payload = new Array[Byte](len.toInt)
                  in.readFully(recPos + 8, payload)
                  EraScanStats.bytesRead.add(len)
                  val decompressed = SnappyFramed.decompress(payload)
                  EraScanStats.blocksDecompressed.increment()
                  val messageOffset = Ssz.readUint32(decompressed, 0).toInt
                  val peeked = Ssz.readUint64(decompressed, messageOffset)
                  // a peek mismatch means the index lies about this file —
                  // distrust it entirely and walk
                  if (peeked != slot) return None
                  found += EraRecord(slot, "block", payload,
                    info.network, info.eraNumber, info.filename)
                case _ => return None
              }
            }
          }
          Some(found.result().iterator)
        }
      }
    } catch { case _: Exception => None }
}
