package graft.decode

import graft.config.Networks
import graft.ssz.{SnappyFramed, Ssz}
import graft.testkit.{EraFixtures, SszEncoder}

/** Stage-level micro-profile of one fixture's decode: snappy, envelope,
  * per-section body parse. Identifies which kernel dominates a slow fork
  * (temporary diagnostic; no Spark). */
object DecodeStageProfile {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "gnosis_10379290"
    val n = if (args.length > 1) args(1).toInt else 3000
    val (_, slot, fork) = EraFixtures.fixtures.find(_._1 == name).get
    val ssz = SszEncoder.encodeSignedBlock(EraFixtures.fixtureJson(name), fork)
    val compressed = SnappyFramed.compress(ssz)
    val cfg = Networks("gnosis")

    def time(label: String)(f: => Any): Unit = {
      (1 to 500).foreach(_ => f)
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e3 / n}%10.1f us")
    }

    time("full decode")(BlockDecoder.decode(compressed, slot, cfg, slot / 8192, "f"))
    time("snappy decompress")(SnappyFramed.decompress(compressed))

    // isolate the body: envelope offsets exactly as decode() reads them
    val messageOffset = Ssz.readUint32(ssz, 0).toInt
    val message = Ssz.slice(ssz, messageOffset, ssz.length)
    val bodyOffset = Ssz.readUint32(message, 80).toInt
    val body = Ssz.slice(message, bodyOffset, message.length)
    println(s"body bytes: ${body.length}")
    time("parseBody")(BlockDecoder.parseBody(body, fork))

    // per-section costs: rerun parseBody variants by timing the item
    // parsers over their real section bytes
    val parsed = BlockDecoder.parseBody(body, fork)
    println(s"attestations=${parsed.attestations.length} " +
      s"txs=${parsed.execution_payload.map(_.transactions.length).getOrElse(0)} " +
      s"withdrawals=${parsed.execution_payload.flatMap(_.withdrawals).size}")

    // locate the attestation section the way parseBody does (5 base
    // offsets start at body[200]; attestations = field index 2)
    val baseOffsets = (0 until 5).map(i => Ssz.readUint32(body, 200 + i * 4).toInt)
    val attStart = baseOffsets(2)
    val attEnd = baseOffsets.filter(_ > attStart).sorted.headOption.getOrElse(body.length)
    val attSection = Ssz.slice(body, attStart, attEnd)
    println(s"attestation section bytes: ${attSection.length}")
    time("attestation section")(
      Ssz.parseVariableList(attSection, BlockDecoder.parseAttestation))

    // re-measure the first two AFTER everything is JIT-hot: the first
    // window's numbers carry C2 compile ramp the later windows don't
    time("full decode (hot)")(BlockDecoder.decode(compressed, slot, cfg, slot / 8192, "f"))
    time("snappy decompress (hot)")(SnappyFramed.decompress(compressed))
    time("parseBody (hot)")(BlockDecoder.parseBody(body, fork))
  }
}
