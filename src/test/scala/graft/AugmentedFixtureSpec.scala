package graft

import com.fasterxml.jackson.databind.JsonNode
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ForkSchedule, Networks}
import graft.decode.BlockDecoder
import graft.export.BeaconJson
import graft.ssz.SnappyFramed
import graft.testkit.{EraFixtures, SszEncoder}

/**
 * Round-trip oracle for the AUGMENTED fixtures — the synthetic deposits /
 * voluntary exits / proposer+attester slashings / blob commitments /
 * execution requests injected by [[graft.testkit.FixtureAugmenter]]. The
 * reference's RPC fixtures carry none of these operations, so this spec is
 * what upgrades the rare-body decode paths (F8–F11, F15 and their
 * flattens) from "runs on empty input" to value-verified on data: any
 * layout mistake in encoder or decoder breaks the JSON equality.
 */
class AugmentedFixtureSpec extends AnyFunSuite {

  private def diff(expected: JsonNode, actual: JsonNode, path: String): Seq[String] = {
    if (expected == null && actual == null) return Nil
    if (expected == null || actual == null)
      return Seq(s"$path: one side missing (expected=$expected actual=$actual)")
    if (expected.isObject && actual.isObject) {
      val keys = new scala.collection.mutable.LinkedHashSet[String]
      expected.fieldNames().forEachRemaining(k => keys += k)
      actual.fieldNames().forEachRemaining(k => keys += k)
      keys.toSeq.flatMap(k => diff(expected.get(k), actual.get(k), s"$path.$k"))
    } else if (expected.isArray && actual.isArray) {
      if (expected.size != actual.size)
        Seq(s"$path: array size ${expected.size} != ${actual.size}")
      else (0 until expected.size).flatMap(i => diff(expected.get(i), actual.get(i), s"$path[$i]"))
    } else if (expected.asText() != actual.asText()) {
      Seq(s"$path: '${expected.asText().take(60)}' != '${actual.asText().take(60)}'")
    } else Nil
  }

  private val gnosis = Networks("gnosis")

  EraFixtures.fixtures.foreach { case (name, slot, fork) =>
    test(s"$name ($fork): augmented fixture round-trips encode → decode → JSON") {
      assert(ForkSchedule.forkAt(slot, gnosis) == fork)
      val data = EraFixtures.fixtureJson(name)
      val ssz = SszEncoder.encodeSignedBlock(data, fork)
      val decoded = BlockDecoder.decode(SnappyFramed.compress(ssz), slot, gnosis)
      assert(decoded.isDefined, "decode returned None")
      val diffs = diff(data, BeaconJson.toJson(decoded.get).get("data"), "data")
      assert(diffs.isEmpty, s"${diffs.length} diffs, first 10:\n${diffs.take(10).mkString("\n")}")
    }
  }

  test("every rare operation family is non-empty somewhere in the corpus") {
    val bodies = EraFixtures.fixtures.map { case (name, slot, fork) =>
      val data = EraFixtures.fixtureJson(name)
      val ssz = SszEncoder.encodeSignedBlock(data, fork)
      BlockDecoder.decode(SnappyFramed.compress(ssz), slot, gnosis).get.body
    }
    // sparse corpus contributions + the dense fixture's ×10 op mix
    // (1 deposit, 1 exit, 1 proposer slashing, 1 attester slashing,
    // 3 blob commitments — each repeated 10×)
    assert(bodies.map(_.deposits.size).sum == 3 + 10)
    assert(bodies.map(_.voluntary_exits.size).sum == 5 + 10)
    assert(bodies.map(_.proposer_slashings.size).sum == 2 + 10)
    assert(bodies.map(_.attester_slashings.size).sum == 3 + 10)
    assert(bodies.flatMap(_.blob_kzg_commitments).map(_.size).sum == 4 + 30)
    val reqs = bodies.flatMap(_.execution_requests)
    assert(reqs.map(_.deposits.size).sum == 2)
    assert(reqs.map(_.withdrawals.size).sum == 1)
    assert(reqs.map(_.consolidations.size).sum == 1)
  }

  test("attester slashings carry overlapping index sets (distinct-union ≠ sum)") {
    val (name, slot, fork) = EraFixtures.fixtures.find(_._1 == "gnosis_98300").get
    val data = EraFixtures.fixtureJson(name)
    val ssz = SszEncoder.encodeSignedBlock(data, fork)
    val b = BlockDecoder.decode(SnappyFramed.compress(ssz), slot, gnosis).get
    val s = b.body.attester_slashings.head
    val union = (s.attestation_1.attesting_indices ++ s.attestation_2.attesting_indices).distinct
    assert(s.attestation_1.attesting_indices.nonEmpty)
    assert(union.size <
      s.attestation_1.attesting_indices.size + s.attestation_2.attesting_indices.size,
      "index sets must overlap so the distinct-union column differs from the sum")
    assert(s.attestation_1.attesting_indices.contains(0L),
      "validator 0 must appear for the containment-search query")
  }
}
