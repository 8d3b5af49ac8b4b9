package graft.testkit

import java.io.{BufferedOutputStream, File, FileOutputStream}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.EraFileWriter

/**
 * Generates e2store era files from the reference's RPC fixtures
 * (FIXTURES.md §3) — the scan-layer test inputs and the input for the
 * rows-only era queries in SparkEntry. Deterministic: same fixtures → same
 * bytes, so generated files are safe to cache under target/.
 */
object EraFixtures {

  private val mapper = new ObjectMapper()
  val fixtureDir = "/root/reference/tests/test_data"

  /** (fixture name, slot, fork) — all gnosis (FIXTURES.md §1). */
  val fixtures: Seq[(String, Long, String)] = Seq(
    ("gnosis_300", 300L, "phase0"),
    ("gnosis_98300", 98300L, "altair"),
    ("gnosis_10379290", 10379290L, "capella"),
    ("gnosis_12678717", 12678717L, "capella"),
    ("gnosis_16383000", 16383000L, "deneb"))

  /** Write one era file per fixture (era number = slot/8192, gnosis naming)
    * plus a `state` and `index` record so record-type dispatch is exercised.
    * Returns the directory. Idempotent: skips when files exist. */
  def ensureGenerated(dir: String = "target/fixture-eras"): String = {
    val d = new File(dir)
    d.mkdirs()
    fixtures.foreach { case (name, slot, fork) =>
      val era = slot / 8192
      val f = new File(d, f"gnosis-$era%05d-${name.hashCode.toHexString.take(8)}%s.era")
      if (!f.exists()) {
        val rpc = mapper.readTree(new File(s"$fixtureDir/${name}_rpc.json"))
        val ssz = SszEncoder.encodeSignedBlock(rpc.get("data"), fork)
        val out = new BufferedOutputStream(new FileOutputStream(f))
        try {
          EraFileWriter.write(out, Iterator(
            EraFileWriter.blockRecord(ssz),
            (graft.sources.EraFileReader.TypeState, Array[Byte](1, 2, 3, 4)),
            (graft.sources.EraFileReader.TypeIndex, Array[Byte](5, 6, 7, 8))))
        } finally out.close()
      }
    }
    d.getAbsolutePath
  }
}
