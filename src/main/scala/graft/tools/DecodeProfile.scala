package graft.tools

import java.io.File

import com.fasterxml.jackson.databind.ObjectMapper

import graft.config.Networks
import graft.decode.BlockDecoder
import graft.ssz.SnappyFramed
import graft.testkit.{EraFixtures, SszEncoder}

/** Micro-profile of the raw decode path (no Spark): snappy decompress +
  * SSZ decode per fork fixture, blocks/s single-threaded. Separates kernel
  * cost from Dataset-encoder overhead in the Bench numbers. */
object DecodeProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    EraFixtures.fixtures.foreach { case (name, slot, fork) =>
      val ssz = SszEncoder.encodeSignedBlock(EraFixtures.fixtureJson(name), fork)
      val compressed = SnappyFramed.compress(ssz)
      val cfg = Networks("gnosis")
      // warm
      (1 to 500).foreach(_ => BlockDecoder.decode(compressed, slot, cfg, slot / 8192, "f"))
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { BlockDecoder.decode(compressed, slot, cfg, slot / 8192, "f"); i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name%-20s $fork%-8s ${ssz.length}%8d B  ${n / dt}%10.0f blocks/s  ${dt / n * 1e6}%8.1f us/block")
    }
  }
}
