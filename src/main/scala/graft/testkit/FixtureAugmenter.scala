package graft.testkit

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/**
 * Deterministic synthetic-operation injection for the reference's RPC
 * fixtures. The fixture blocks happen to carry NO deposits, voluntary
 * exits, proposer/attester slashings, or blob commitments (the reference's
 * RPC fixtures under `tests/test_data` don't either), so without injection those
 * decode/flatten paths only ever run on empty input. This module adds
 * well-formed operations — sized and laid out per the reference decoder
 * (`processor.py:240-331` extraction, `forks/base.py:109-350` item
 * layouts) — to each fixture's body, producing the augmented JSON that is
 * the single source of truth for era-file generation ([[EraFixtures]]),
 * golden counts (`EraPipelineSpec`), and the encode→decode round-trip
 * oracle (`AugmentedFixtureSpec`).
 *
 * Everything is deterministic (fixed seeds, no RNG), so generated era
 * files are byte-stable across runs.
 */
object FixtureAugmenter {

  /** n bytes of the repeated byte b, hex-encoded. */
  private def hx(b: Int, n: Int): String = "0x" + (f"${b & 0xff}%02x" * n)

  private def attData(parent: ObjectNode, slot: Long, index: Long,
                      srcEpoch: Long, tgtEpoch: Long, seed: Int): ObjectNode = {
    val d = parent.putObject("data")
    d.put("slot", slot.toString)
    d.put("index", index.toString)
    d.put("beacon_block_root", hx(0x40 + seed, 32))
    val s = d.putObject("source")
    s.put("epoch", srcEpoch.toString)
    s.put("root", hx(0x50 + seed, 32))
    val t = d.putObject("target")
    t.put("epoch", tgtEpoch.toString)
    t.put("root", hx(0x60 + seed, 32))
    d
  }

  private def indexedAtt(parent: ObjectNode, field: String, indices: Seq[Long],
                         slot: Long, srcEpoch: Long, tgtEpoch: Long, seed: Int): Unit = {
    val a = parent.putObject(field)
    val idx = a.putArray("attesting_indices")
    indices.foreach(i => idx.add(i.toString))
    attData(a, slot, 1L, srcEpoch, tgtEpoch, seed)
    a.put("signature", hx(0x70 + seed, 96))
  }

  /** Attester slashing with explicit epochs (to pin the Double/Surround/
    * Other classification) and explicit — overlapping — index sets so
    * `total_slashed_validators = |distinct union|` differs from the naive
    * sum (the A3 distinct-union column finally runs on data). */
  private def addAttesterSlashing(body: ObjectNode, indices1: Seq[Long], indices2: Seq[Long],
                                  src1: Long, tgt1: Long, src2: Long, tgt2: Long,
                                  slot: Long, seed: Int): Unit = {
    val s = body.withArray[ArrayNode]("attester_slashings").addObject()
    indexedAtt(s, "attestation_1", indices1, slot, src1, tgt1, seed)
    indexedAtt(s, "attestation_2", indices2, slot, src2, tgt2, seed + 8)
  }

  private def addProposerSlashing(body: ObjectNode, slot: Long,
                                  proposer: Long, seed: Int): Unit = {
    val s = body.withArray[ArrayNode]("proposer_slashings").addObject()
    Seq("signed_header_1" -> seed, "signed_header_2" -> (seed + 4)).foreach {
      case (field, sd) =>
        val h = s.putObject(field)
        val m = h.putObject("message")
        m.put("slot", slot.toString)
        m.put("proposer_index", proposer.toString)
        m.put("parent_root", hx(0x10 + sd, 32))
        m.put("state_root", hx(0x20 + sd, 32))
        m.put("body_root", hx(0x30 + sd, 32))
        h.put("signature", hx(0x80 + sd, 96))
    }
  }

  /** Merkle proof depth 33 (DEPOSIT_CONTRACT_TREE_DEPTH + 1) — the fixed
    * 1240-byte deposit layout the decoder walks. */
  private def addDeposit(body: ObjectNode, validator: Int, amountGwei: Long, seed: Int): Unit = {
    val d = body.withArray[ArrayNode]("deposits").addObject()
    val proof = d.putArray("proof")
    (0 until 33).foreach(i => proof.add(hx(seed + i, 32)))
    val data = d.putObject("data")
    data.put("pubkey", hx(0xa0 + validator, 48))
    data.put("withdrawal_credentials", hx(0xb0 + validator, 32))
    data.put("amount", amountGwei.toString)
    data.put("signature", hx(0xc0 + validator, 96))
  }

  private def addVoluntaryExit(body: ObjectNode, epoch: Long, validator: Long, seed: Int): Unit = {
    val e = body.withArray[ArrayNode]("voluntary_exits").addObject()
    val m = e.putObject("message")
    m.put("epoch", epoch.toString)
    m.put("validator_index", validator.toString)
    e.put("signature", hx(0xd0 + seed, 96))
  }

  private def addBlobCommitments(body: ObjectNode, n: Int, seed: Int): Unit = {
    val a = body.withArray[ArrayNode]("blob_kzg_commitments")
    (0 until n).foreach(i => a.add(hx(seed + i, 48)))
  }

  private def addExecutionRequests(body: ObjectNode): Unit = {
    val er = body.putObject("execution_requests")
    val deps = er.putArray("deposits")
    Seq((1, 32000000000L, 11L), (2, 1000000000L, 12L)).foreach { case (v, amt, idx) =>
      val d = deps.addObject()
      d.put("pubkey", hx(0xa0 + v, 48))
      d.put("withdrawal_credentials", hx(0xb0 + v, 32))
      d.put("amount", amt.toString)
      d.put("signature", hx(0xc0 + v, 96))
      d.put("index", idx.toString)
    }
    val wds = er.putArray("withdrawals")
    val w = wds.addObject()
    w.put("source_address", hx(0x15, 20))
    w.put("validator_pubkey", hx(0xa5, 48))
    w.put("amount", "5000000000")
    val cons = er.putArray("consolidations")
    val c = cons.addObject()
    c.put("source_address", hx(0x16, 20))
    c.put("source_pubkey", hx(0xa6, 48))
    c.put("target_pubkey", hx(0xa7, 48))
  }

  /** Inject this fixture's synthetic operations into `body` (mutates).
    * The per-fixture mix gives every rare table ≥1 row somewhere, all
    * three slashing classifications, a slashing containing validator 0
    * (for the array-containment search), and multi-month spreads for the
    * monthly rollups. */
  def augment(name: String, body: ObjectNode): Unit = name match {
    case "gnosis_300" => // phase0
      addDeposit(body, 1, 32000000000L, 0x01)
      addDeposit(body, 2, 32000000000L, 0x41)
      addVoluntaryExit(body, epoch = 17L, validator = 901L, seed = 1)
      addProposerSlashing(body, slot = 290L, proposer = 77L, seed = 0)
    case "gnosis_98300" => // altair: Double Vote (equal targets), overlap, has validator 0
      addVoluntaryExit(body, epoch = 6140L, validator = 902L, seed = 2)
      addVoluntaryExit(body, epoch = 6141L, validator = 903L, seed = 3)
      addAttesterSlashing(body, Seq(0L, 1L, 2L), Seq(1L, 2L, 3L),
        src1 = 6100L, tgt1 = 6143L, src2 = 6101L, tgt2 = 6143L, slot = 98280L, seed = 0)
    case "gnosis_10379290" => // capella
      addDeposit(body, 3, 1000000000L, 0x11)
      addProposerSlashing(body, slot = 10379280L, proposer = 4242L, seed = 16)
    case "gnosis_12678717" => // capella: Surround Vote (src1<src2 && tgt1>tgt2)
      addVoluntaryExit(body, epoch = 792419L, validator = 904L, seed = 4)
      addAttesterSlashing(body, Seq(10L, 11L), Seq(11L, 12L, 13L),
        src1 = 792400L, tgt1 = 792419L, src2 = 792405L, tgt2 = 792410L,
        slot = 12678700L, seed = 32)
    case "gnosis_16383000" => // deneb: blobs + an "Other"-class slashing
      addBlobCommitments(body, 3, 0x90)
      addAttesterSlashing(body, Seq(7L, 8L, 9L), Seq(8L, 9L),
        src1 = 1023930L, tgt1 = 1023937L, src2 = 1023930L, tgt2 = 1023938L,
        slot = 16382990L, seed = 48)
    case "gnosis_bellatrix_syn" =>
      addVoluntaryExit(body, epoch = 387500L, validator = 905L, seed = 5)
    case "gnosis_electra_syn" =>
      addBlobCommitments(body, 1, 0x98)
      addExecutionRequests(body)
    case "gnosis_dense_syn" =>
      // the ~10× child-row density fixture: start from the deneb op mix
      // (every rare table populated), then element-wise repeat every child
      // list — exercises decode at offset-table sizes an op-or-two-per-
      // block fixture never reaches (hundreds of attestations/transactions
      // in ONE block), so a small-N-masked SSZ bug fails the golden counts
      // and every era oracle rather than hiding
      addDeposit(body, 5, 32000000000L, 0x21)
      addVoluntaryExit(body, epoch = 1024000L, validator = 906L, seed = 6)
      addProposerSlashing(body, slot = 16399990L, proposer = 5151L, seed = 64)
      addBlobCommitments(body, 3, 0xa0)
      addAttesterSlashing(body, Seq(20L, 21L, 22L), Seq(21L, 22L),
        src1 = 1024990L, tgt1 = 1024999L, src2 = 1024990L, tgt2 = 1025000L,
        slot = 16399980L, seed = 80)
      densify(body, copies = 10)
    case _ => ()
  }

  /** Element-wise ×`copies` repetition of every operation list in `body`
    * (and the payload's withdrawals/transactions): each original element is
    * deep-copied `copies−1` more times, appended after the originals.
    * Clone-unchanged on purpose — every golden count and table value is
    * then exactly derivable from the JSON, and the decode must reproduce
    * each clone bit-for-bit (positional columns aside). */
  private def densify(body: ObjectNode, copies: Int): Unit = {
    def repeat(parent: ObjectNode, field: String): Unit = {
      val node = parent.get(field)
      if (node != null && node.isArray) {
        val a = node.asInstanceOf[ArrayNode]
        val orig = (0 until a.size).map(a.get(_).deepCopy[JsonNode]())
        (1 until copies).foreach(_ =>
          orig.foreach(e => a.add(e.deepCopy[JsonNode]())))
      }
    }
    Seq("attestations", "deposits", "voluntary_exits", "proposer_slashings",
        "attester_slashings", "bls_to_execution_changes",
        "blob_kzg_commitments").foreach(repeat(body, _))
    val payload = body.get("execution_payload")
    if (payload != null && payload.isObject) {
      Seq("withdrawals", "transactions")
        .foreach(repeat(payload.asInstanceOf[ObjectNode], _))
    }
  }

  /** Reshape the capella fixture body to bellatrix (strip capella-only
    * fields) — the reference ships no bellatrix fixture. Mirrors the
    * DecodeFixtureSpec reshape. */
  def reshapeBellatrix(data: ObjectNode, slot: Long): ObjectNode = {
    val message = data.get("message").asInstanceOf[ObjectNode]
    val body = message.get("body").asInstanceOf[ObjectNode]
    body.remove("bls_to_execution_changes")
    body.get("execution_payload").asInstanceOf[ObjectNode].remove("withdrawals")
    message.put("slot", slot.toString)
    data
  }

  /** Reshape the deneb fixture body to electra (add the execution_requests
    * container; augment() fills it). */
  def reshapeElectra(data: ObjectNode, slot: Long): ObjectNode = {
    val message = data.get("message").asInstanceOf[ObjectNode]
    val body = message.get("body").asInstanceOf[ObjectNode]
    val er = body.putObject("execution_requests")
    er.putArray("deposits"); er.putArray("withdrawals"); er.putArray("consolidations")
    message.put("slot", slot.toString)
    data
  }

  /** Apply the fixture's reshape (synthetic forks) + augmentation to a raw
    * RPC `data` node. `raw` is deep-copied, never mutated. */
  def augmentedData(name: String, raw: JsonNode, slot: Long): ObjectNode = {
    val data = raw.deepCopy[ObjectNode]()
    val shaped = name match {
      case "gnosis_bellatrix_syn" => reshapeBellatrix(data, slot)
      case "gnosis_electra_syn" => reshapeElectra(data, slot)
      case "gnosis_dense_syn" => // deneb shape as-is, relocated to its slot
        data.get("message").asInstanceOf[ObjectNode].put("slot", slot.toString)
        data
      case _ => data
    }
    augment(name, shaped.get("message").get("body").asInstanceOf[ObjectNode])
    shaped
  }
}
