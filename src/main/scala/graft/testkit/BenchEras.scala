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

  /** (source fixture, slot, fork) — all six BASELINE.md forks. The big
    * 414 KB capella fixture is excluded to keep the corpus a realistic mix;
    * bellatrix/electra (no reference fixture exists) are reshaped from the
    * capella/deneb fixtures WITHOUT augmentation, so per-fork throughput
    * stays comparable to the reference's published blocks/s. */
  private val fixtures = Seq(
    ("gnosis_300", 300L, "phase0"),
    ("gnosis_98300", 98300L, "altair"),
    ("gnosis_10379290", 10379290L, "capella"),
    ("gnosis_16383000", 16383000L, "deneb"),
    ("gnosis_10379290", 6200000L, "bellatrix"),
    ("gnosis_16383000", 21405701L, "electra"))

  def ensureGenerated(dir: String = "target/bench-eras",
      filesPerFork: Int = 32, blocksPerFile: Int = 64): (String, Long) = {
    val d = new File(dir)
    d.mkdirs()
    val total = fixtures.size.toLong * filesPerFork * blocksPerFile
    val marker = new File(d, s".complete-$filesPerFork-$blocksPerFile-f${fixtures.size}")
    if (marker.exists()) return (d.getAbsolutePath, total)
    fixtures.foreach { case (name, slot, fork) =>
      val rpc = mapper.readTree(new File(s"${EraFixtures.fixtureDir}/${name}_rpc.json"))
      val data = rpc.get("data")
        .deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      val shaped = fork match {
        case "bellatrix" => FixtureAugmenter.reshapeBellatrix(data, slot)
        case "electra" => FixtureAugmenter.reshapeElectra(data, slot)
        case _ => data
      }
      val ssz = SszEncoder.encodeSignedBlock(shaped, fork)
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
