package graft.testkit

import java.io.{BufferedOutputStream, File, FileOutputStream}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.sources.EraFileWriter

/**
 * Mainnet-config era fixtures — the SECOND network through the full
 * decode path. Every other era fixture is gnosis-derived, so the
 * network-parameterized machinery (filename detection, fork-by-slot with
 * mainnet epochs, the 12 s/32-slot genesis timestamp ladder —
 * era_parser/config/networks.py:1-41, forks.py:63-81) was only ever
 * exercised on its default branch. These two files re-slot the reference's
 * RPC fixture bodies into MAINNET fork windows:
 *
 *  - altair at slot 2,400,000 (epoch 75,000 ∈ [74240, 144896)) — no
 *    execution payload, so `timestamp_utc` MUST come from the genesis
 *    ladder: 1606824023 + slot·12. Gnosis at the same slot is also altair
 *    but 1638993340 + slot·5 — a wrong-network regression shifts the
 *    timestamp by ~3 years and fails both the golden spec and the oracle.
 *  - capella at slot 6,300,000 (epoch 196,875 ∈ [194048, 269568)) — under
 *    the GNOSIS ladder this slot is bellatrix (epoch 393,750 < its capella
 *    epoch 648,704), so fork classification itself diverges by network.
 *
 * Deterministic byte-for-byte, same discipline as [[EraFixtures]].
 */
object MainnetEraFixture {

  private val mapper = new ObjectMapper()

  /** (source RPC fixture, mainnet slot, fork under the mainnet ladder). */
  val fixtures: Seq[(String, Long, String)] = Seq(
    ("gnosis_98300", 2400000L, "altair"),
    ("gnosis_10379290", 6300000L, "capella"))

  def ensureGenerated(dir: String = "target/fixture-eras-mainnet1"): String = {
    val d = new File(dir)
    d.mkdirs()
    fixtures.foreach { case (src, slot, fork) =>
      val era = slot / 8192
      val f = new File(d,
        f"mainnet-$era%05d-${(src + slot).hashCode.toHexString.take(8)}%s.era")
      if (!f.exists()) {
        val raw = mapper.readTree(
          new File(s"${EraFixtures.fixtureDir}/${src}_rpc.json"))
        val data = raw.get("data").deepCopy[ObjectNode]()
        // re-slot the block into the mainnet fork window; everything else
        // (body ops, the augmentation mix) is reused verbatim
        data.get("message").asInstanceOf[ObjectNode].put("slot", slot.toString)
        FixtureAugmenter.augment(src,
          data.get("message").get("body").asInstanceOf[ObjectNode])
        val ssz = SszEncoder.encodeSignedBlock(data, fork)
        val out = new BufferedOutputStream(new FileOutputStream(f))
        try EraFileWriter.write(out, Iterator(EraFileWriter.blockRecord(ssz)))
        finally out.close()
      }
    }
    d.getAbsolutePath
  }
}
