package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ssz.{SnappyFramed, Ssz}

/** Property tests for the SSZ decode core (SURVEY.md §5 plan item 4):
  * offset-table and fixed-stride list round-trips, LE readers, snappy
  * round-trip, portable hash64 parity with its SQL definition. */
class SszPropertySpec extends AnyFunSuite {

  /** Minimal deterministic property driver (the scalatest-scalacheck bridge
    * is not in the offline dependency cache): samples `gen` n times. */
  private def forAll[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }

  private def encodeVariableList(items: Seq[Array[Byte]]): Array[Byte] = {
    val headerLen = items.length * 4
    val out = java.nio.ByteBuffer.allocate(headerLen + items.map(_.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = headerLen
    items.foreach { it => out.putInt(off); off += it.length }
    items.foreach(out.put)
    out.array()
  }

  private val genItem: Gen[Array[Byte]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
      .map(_.toArray)

  test("variable-list offset-table round-trip for any non-empty item list") {
    forAll(Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, genItem))) { items0 =>
      locally {
        val items = items0
        val encoded = encodeVariableList(items)
        val decoded = Ssz.parseVariableList(encoded, identity[Array[Byte]])
        assert(decoded.length === items.length)
        decoded.zip(items).foreach { case (d, o) => assert(d.sameElements(o)) }
      }
    }
  }

  test("empty variable list encodes as empty-buffer or offset==len and decodes empty") {
    assert(Ssz.parseVariableList(Array.empty[Byte], identity[Array[Byte]]).isEmpty)
    // a single 4-byte offset table pointing at end-of-buffer = empty list
    val selfOffset = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(4).array()
    assert(Ssz.parseVariableList(selfOffset, identity[Array[Byte]]).isEmpty)
  }

  test("offsets >= 2^31 keep the reference's unsigned semantics (no Int wrap)") {
    def le32(v: Long): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
    // aligned-but-huge FIRST offset: the reference's unsigned arithmetic
    // falls through to the too-many-offsets empty return (num_items*4 >
    // len); a signed wrap would take the single-item branch instead
    val hugeFirst = le32(0x80000000L) ++ Array.fill[Byte](12)(7)
    assert(Ssz.parseVariableList(hugeFirst, identity[Array[Byte]]).isEmpty)
    // huge SECOND table entry: the reference drops it as out of range, so
    // item 0 runs to end-of-buffer; a negative wrap would pass the bounds
    // filter and corrupt item 0's end bound (start >= end -> dropped)
    val twoOffsets = le32(8) ++ le32(0xfffffff0L) ++ Array.fill[Byte](6)(9)
    val items = Ssz.parseVariableList(twoOffsets, identity[Array[Byte]])
    assert(items.length === 1 && items.head.sameElements(Array.fill[Byte](6)(9)))
    // readOffset clamps to length, never negative
    assert(Ssz.readOffset(hugeFirst, 0) === hugeFirst.length)
    // uint256 at a near-MaxValue offset must not wrap past the bounds check
    assert(Ssz.readUint256Decimal(Array.fill[Byte](40)(1), Int.MaxValue - 8) === "0")
    // (decoder item parsers under the same inputs: DecoderOffsetSpec)
  }

  test("fixed-stride list round-trip with trailing-partial truncation") {
    forAll(Gen.zip(Gen.chooseNum(1, 16),
        Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)))) { case (stride, bytes0) =>
      val bytes = bytes0.toArray
      val items = Ssz.parseFixedList(bytes, stride, identity[Array[Byte]])
      assert(items.length === bytes.length / stride) // partial tail dropped
      items.zipWithIndex.foreach { case (it, i) =>
        assert(it.sameElements(bytes.slice(i * stride, (i + 1) * stride)))
      }
    }
  }

  test("LE uint readers agree with ByteBuffer") {
    forAll(Gen.listOfN(12, Gen.chooseNum(-128, 127).map(_.toByte))) { bs =>
      val arr = bs.toArray
      val bb = java.nio.ByteBuffer.wrap(arr).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(Ssz.readUint32(arr, 0) === (bb.getInt(0).toLong & 0xffffffffL))
      assert(Ssz.readUint64(arr, 2) === bb.getLong(2))
    }
  }

  test("out-of-range reads return 0 (reference tolerance, ssz_utils.py:4-14)") {
    assert(Ssz.readUint32(Array[Byte](1, 2), 0) === 0L)
    assert(Ssz.readUint64(Array[Byte](1, 2, 3), 0) === 0L)
  }

  test("snappy framed compress/decompress round-trip") {
    forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)), 100) { bs =>
      val arr = bs.toArray
      assert(SnappyFramed.decompress(SnappyFramed.compress(arr)).sameElements(arr))
    }
  }

  test("native hash64 equals its SQL definition (first 15 hex chars of md5, base 16)") {
    forAll(Gen.asciiPrintableStr) { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      assert(graft.functions.Signatures.hash64String(s) === expected)
    }
  }

  test("wordShingles equals the SQL tokenize-then-ngram formulation") {
    // separators include runs of mixed whitespace — the regex-\s+ class
    val genText = for {
      words <- Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x"))
      seps <- Gen.listOfN(math.max(words.length - 1, 0),
        Gen.oneOf(" ", "  ", "\t", " \t ", "\n"))
    } yield words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString
    forAll(genText) { text =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val expected =
        if (toks.length < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      assert(graft.functions.Signatures.wordShinglesSeq(text.trim, 3) === expected)
    }
  }

  test("era reader tolerates truncated and garbage files (skips, never throws)") {
    import graft.sources.{EraFileInfo, EraFileReader}
    val info = EraFileInfo.fromPath("gnosis-00001-deadbeef.era")
    def read(bytes: Array[Byte]) =
      EraFileReader.readRecords(new java.io.ByteArrayInputStream(bytes), info).toVector
    assert(read(Array.empty[Byte]).isEmpty) // empty file
    assert(read(Array.fill[Byte](5)(1)).isEmpty) // shorter than the header
    assert(read(Array.fill[Byte](64)(0x42)).isEmpty) // garbage body
    // valid header + truncated record payload → record dropped cleanly
    val truncated = Array[Byte]('e', '2', 's', 't', 0, 0, 0, 0,
      0x01, 0x00, 100, 0, 0, 0, 0, 0, /* payload shorter than length: */ 1, 2, 3)
    assert(read(truncated).isEmpty)
  }
}
