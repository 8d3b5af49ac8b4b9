package graft.testkit

import java.io.{BufferedOutputStream, File, FileOutputStream}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.EraFileWriter
import graft.ssz.SnappyFramed

/**
 * Synthetic era corpus for parse-throughput benchmarking, comparable to the
 * reference's published blocks/s table (BASELINE.md; docs/NETWORK_FORKS.md
 * :268-273): per fork fixture, `filesPerFork` era files of `blocksPerFile`
 * compressed block records each. One era file = one input partition, so
 * 32 files saturate local[32] the same way an era archive saturates a
 * cluster. Deterministic; cached under target/.
 */
object BenchEras {

  private val mapper = new ObjectMapper()

  /** (fixture, slot, fork) — the big 414 KB capella fixture is excluded to
    * keep the corpus a realistic mix (~75 MB). */
  private val fixtures = Seq(
    ("gnosis_300", 300L, "phase0"),
    ("gnosis_98300", 98300L, "altair"),
    ("gnosis_10379290", 10379290L, "capella"),
    ("gnosis_16383000", 16383000L, "deneb"))

  def ensureGenerated(dir: String = "target/bench-eras",
      filesPerFork: Int = 32, blocksPerFile: Int = 64): (String, Long) = {
    val d = new File(dir)
    d.mkdirs()
    val total = fixtures.size.toLong * filesPerFork * blocksPerFile
    val marker = new File(d, s".complete-$filesPerFork-$blocksPerFile")
    if (marker.exists()) return (d.getAbsolutePath, total)
    fixtures.foreach { case (name, slot, fork) =>
      val rpc = mapper.readTree(new File(s"${EraFixtures.fixtureDir}/${name}_rpc.json"))
      val ssz = SszEncoder.encodeSignedBlock(rpc.get("data"), fork)
      val payload = SnappyFramed.compress(ssz) // compress once, reuse
      val era = slot / 8192
      (0 until filesPerFork).foreach { i =>
        val f = new File(d, f"gnosis-$era%05d-bc${i}%06x.era")
        val out = new BufferedOutputStream(new FileOutputStream(f), 1 << 20)
        try EraFileWriter.write(out,
          Iterator.fill(blocksPerFile)((graft.sources.EraFileReader.TypeBlock, payload)))
        finally out.close()
      }
    }
    marker.createNewFile()
    (d.getAbsolutePath, total)
  }
}
