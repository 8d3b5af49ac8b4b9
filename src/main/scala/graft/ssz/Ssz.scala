package graft.ssz

/**
 * Minimal SSZ byte-level readers used by the fork decoders.
 *
 * Semantics (including the tolerant out-of-range → 0 behavior and the
 * misalignment-forgiving list walk) mirror the reference decoder
 * (era_parser/parsing/ssz_utils.py:4-121) — the differential fixture tests
 * pin them. All functions are allocation-light and run inside executor
 * tasks; no Spark types here.
 */
object Ssz {

  /** LE uint32 at offset; out-of-range → 0 (ssz_utils.py:4-8). */
  def readUint32(data: Array[Byte], offset: Int): Long = {
    if (offset < 0 || offset + 4 > data.length) return 0L
    ((data(offset) & 0xffL)) |
      ((data(offset + 1) & 0xffL) << 8) |
      ((data(offset + 2) & 0xffL) << 16) |
      ((data(offset + 3) & 0xffL) << 24)
  }

  /** LE uint64 at offset; out-of-range → 0 (ssz_utils.py:10-14). Values are
    * well below 2^63 in practice (slots, gwei, gas), matching LongType. */
  def readUint64(data: Array[Byte], offset: Int): Long = {
    if (offset < 0 || offset + 8 > data.length) return 0L
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (data(offset + i) & 0xffL); i -= 1 }
    v
  }

  /** Unsigned offset read for indexing into `data` itself: the raw uint32
    * clamped to `data.length`. The reference keeps offsets as unbounded
    * Python ints, where every ≥-length value behaves identically — an
    * empty slice (`data[off:]`) or a failed `off >= len` guard; folding
    * through `.toInt` instead would turn offsets ≥ 2^31 NEGATIVE and
    * route them into the wrong branch (a clamped slice reads the whole
    * buffer from 0). Clamping to length preserves the reference's
    * semantics for every branch the decoders take. */
  def readOffset(data: Array[Byte], at: Int): Int =
    math.min(readUint32(data, at), data.length.toLong).toInt

  /** uint256 LE → exact decimal string (forks/base.py:435 base_fee_per_gas). */
  def readUint256Decimal(data: Array[Byte], offset: Int, len: Int = 32): String = {
    // Long arithmetic: a near-MaxValue offset would wrap `offset + len`
    // negative and sneak past an Int bounds check into copyOfRange
    if (offset < 0 || offset.toLong + len > data.length) return "0"
    val be = new Array[Byte](len)
    var i = 0
    while (i < len) { be(i) = data(offset + len - 1 - i); i += 1 }
    new java.math.BigInteger(1, be).toString
  }

  def slice(data: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val f = math.max(0, math.min(from, data.length))
    val u = math.max(f, math.min(until, data.length))
    java.util.Arrays.copyOfRange(data, f, u)
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def hex(data: Array[Byte]): String = hex(data, 0, data.length)

  /** "0x…" hex of a byte range — the hottest kernel in block decode (every
    * hash/signature/tx renders through here): direct char-array fill over
    * the range, no intermediate slice copy, no StringBuilder bookkeeping. */
  def hex(data: Array[Byte], from: Int, until: Int): String = {
    val f = math.max(0, math.min(from, data.length))
    val u = math.max(f, math.min(until, data.length))
    val out = new Array[Char](2 + (u - f) * 2)
    out(0) = '0'
    out(1) = 'x'
    var i = f
    var j = 2
    while (i < u) {
      val b = data(i) & 0xff
      out(j) = HexChars(b >> 4)
      out(j + 1) = HexChars(b & 0xf)
      i += 1
      j += 2
    }
    new String(out)
  }

  /** Fixed-stride SSZ list: truncate trailing partial item, parse each
    * (ssz_utils.py:30-51). `parse` returning null drops the item. */
  def parseFixedList[T](data: Array[Byte], itemSize: Int, parse: Array[Byte] => T): Vector[T] = {
    if (data.isEmpty) return Vector.empty
    val n = data.length / itemSize
    val out = Vector.newBuilder[T]
    var i = 0
    while (i < n) {
      val item = parse(java.util.Arrays.copyOfRange(data, i * itemSize, (i + 1) * itemSize))
      if (item != null) out += item
      i += 1
    }
    out.result()
  }

  /** Variable-size SSZ list via 4-byte offset table, with the reference's
    * tolerance rules (ssz_utils.py:53-121):
    *  - len<4 or misaligned/short first offset → treat whole buffer as one item;
    *  - first_offset==0 → single item over the whole buffer;
    *  - first_offset==len → empty list;
    *  - out-of-range offsets dropped; start>=end sections skipped.
    */
  def parseVariableList[T](data: Array[Byte], parse: Array[Byte] => T): Vector[T] = {
    if (data.isEmpty) return Vector.empty
    def one(buf: Array[Byte]): Vector[T] = {
      val item = parse(buf)
      if (item != null) Vector(item) else Vector.empty
    }
    if (data.length < 4) return one(data)
    // offsets stay UNSIGNED (Long) until after the bounds filter: the raw
    // uint32 space reaches 2^32−1, and a premature .toInt folds offsets
    // ≥ 2^31 to negative values — an aligned-but-huge first offset would
    // then take the single-item branch where the reference's unsigned
    // arithmetic falls through to the too-many-offsets empty return, and a
    // negative table entry would pass the ≤length filter and corrupt the
    // PREVIOUS item's end bound (the reference drops it as out of range)
    val firstOffset = readUint32(data, 0)
    if (firstOffset == 0L) return one(data)
    if (firstOffset == data.length.toLong) return Vector.empty
    if (firstOffset % 4 != 0 || firstOffset < 4) return one(data)
    val numItems = firstOffset / 4
    if (numItems * 4 > data.length) return Vector.empty
    val offsets = (0 until numItems.toInt).map(i => readUint32(data, i * 4))
      .filter(_ <= data.length).map(_.toInt)
    if (offsets.isEmpty) return Vector.empty
    val out = Vector.newBuilder[T]
    var i = 0
    while (i < offsets.length) {
      val start = offsets(i)
      val end = if (i + 1 < offsets.length) offsets(i + 1) else data.length
      if (start < data.length && end <= data.length && start < end) {
        try {
          val item = parse(java.util.Arrays.copyOfRange(data, start, end))
          if (item != null) out += item
        } catch { case _: Exception => () }
      }
      i += 1
    }
    out.result()
  }
}
