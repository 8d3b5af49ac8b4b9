package graft.testkit

import java.io.{BufferedOutputStream, File, FileOutputStream}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.sources.EraFileWriter

/**
 * Generates e2store era files from the reference's RPC fixtures
 * (FIXTURES.md §3) — the scan-layer test inputs and the input for the
 * rows-only era queries in SparkEntry. Each fixture's beacon JSON is the
 * [[FixtureAugmenter]]-augmented form (synthetic deposits / exits /
 * slashings / blobs / requests injected deterministically), plus two
 * synthetic-fork fixtures (bellatrix, electra) the reference ships no RPC
 * docs for — so all 7 forks and all 15 normalized tables carry rows.
 * Deterministic: same fixtures → same bytes, so generated files are safe
 * to cache under target/.
 */
object EraFixtures {

  private val mapper = new ObjectMapper()
  val fixtureDir = "/root/reference/tests/test_data"

  /** (fixture name, slot, fork). First five are the reference's gnosis RPC
    * fixtures (FIXTURES.md §1); the last two are reshaped synthetics
    * (bellatrix = capella stripped of capella-only fields, electra =
    * deneb + execution_requests) at in-range gnosis slots. */
  val fixtures: Seq[(String, Long, String)] = Seq(
    ("gnosis_300", 300L, "phase0"),
    ("gnosis_98300", 98300L, "altair"),
    ("gnosis_10379290", 10379290L, "capella"),
    ("gnosis_12678717", 12678717L, "capella"),
    ("gnosis_16383000", 16383000L, "deneb"),
    ("gnosis_bellatrix_syn", 6200000L, "bellatrix"),
    ("gnosis_electra_syn", 21405701L, "electra"),
    // ~10× child-row density deneb block (own era): decode + every era
    // oracle exercised at offset-table sizes the per-op fixtures never
    // reach — the small-N-masked-bug canary
    ("gnosis_dense_syn", 16400000L, "deneb"))

  /** Raw RPC fixture each name derives from. */
  private def rawName(name: String): String = name match {
    case "gnosis_bellatrix_syn" => "gnosis_10379290"
    case "gnosis_electra_syn" => "gnosis_16383000"
    case "gnosis_dense_syn" => "gnosis_16383000"
    case n => n
  }

  /** The augmented beacon-API `data` node for a fixture — the single source
    * of truth for era files, golden counts, and round-trip specs. */
  def fixtureJson(name: String): ObjectNode = {
    val slot = fixtures.find(_._1 == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown fixture $name"))._2
    val raw = mapper.readTree(new File(s"$fixtureDir/${rawName(name)}_rpc.json"))
    FixtureAugmenter.augmentedData(name, raw.get("data"), slot)
  }

  /** Write one SPEC-SHAPED era file per fixture (era number = slot/8192,
    * gnosis naming): the block record, a `state` record, and the two
    * trailing SlotIndex records with real offsets
    * ([[EraFileWriter.writeIndexed]]) — so record-type dispatch AND the
    * SlotIndex point-lookup fast path are both exercised by the fixture
    * corpus (each file carries TWO `index` rows: block index + state
    * index, the public e2store group shape). Returns the directory.
    * Idempotent: skips when files exist. The dir name carries the
    * augmentation generation so stale caches are never reused. */
  def ensureGenerated(dir: String = "target/fixture-eras-aug3"): String = {
    val d = new File(dir)
    d.mkdirs()
    fixtures.foreach { case (name, slot, fork) =>
      val era = slot / 8192
      val f = new File(d, f"gnosis-$era%05d-${name.hashCode.toHexString.take(8)}%s.era")
      if (!f.exists()) {
        val ssz = SszEncoder.encodeSignedBlock(fixtureJson(name), fork)
        val startSlot = era * 8192
        val out = new BufferedOutputStream(new FileOutputStream(f))
        try EraFileWriter.writeIndexed(out,
          blocks = Seq(slot -> graft.ssz.SnappyFramed.compress(ssz)),
          state = Some((startSlot + 8192L, Array[Byte](1, 2, 3, 4))),
          startSlot = startSlot, slotCount = 8192)
        finally out.close()
      }
    }
    d.getAbsolutePath
  }
}
