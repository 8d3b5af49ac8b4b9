package graft.export

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.model._

/**
 * DecodedBlock → beacon-API JSON document, with the reference's edge fidelity
 * (block_parser.py:59-78): every uint64 rendered as a decimal string, binary
 * as 0x-hex, ISO-8601 timestamp_utc. Used by the JSON sinks (S11/S12) and by
 * the RPC-fixture differential tests (tests compare this tree against
 * the reference's `tests/test_data` RPC fixtures).
 */
object BeaconJson {

  private val mapper = new ObjectMapper()

  def toJsonString(b: DecodedBlock): String = mapper.writeValueAsString(toJson(b))

  def toJson(b: DecodedBlock): ObjectNode = {
    val root = mapper.createObjectNode()
    val data = root.putObject("data")
    val message = data.putObject("message")
    message.put("slot", b.slot.toString)
    message.put("proposer_index", b.proposer_index.toString)
    message.put("parent_root", b.parent_root)
    message.put("state_root", b.state_root)
    message.set[ObjectNode]("body", bodyJson(b.body))
    data.put("signature", b.signature)
    root.put("execution_optimistic", false)
    root.put("finalized", true)
    root.put("version", b.version)
    root.put("timestamp_utc", isoUtc(b.timestamp_utc))
    val meta = root.putObject("metadata")
    meta.put("compressed_size", b.compressed_size)
    meta.put("decompressed_size", b.decompressed_size)
    root
  }

  private def isoUtc(ts: java.sql.Timestamp): String =
    java.time.OffsetDateTime.ofInstant(ts.toInstant, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)

  def bodyJson(body: BlockBody): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("randao_reveal", body.randao_reveal)
    val eth1 = o.putObject("eth1_data")
    eth1.put("deposit_root", body.eth1_data.deposit_root)
    eth1.put("deposit_count", body.eth1_data.deposit_count.toString)
    eth1.put("block_hash", body.eth1_data.block_hash)
    o.put("graffiti", body.graffiti)

    val ps = o.putArray("proposer_slashings")
    body.proposer_slashings.foreach { s =>
      val n = ps.addObject()
      n.set[ObjectNode]("signed_header_1", signedHeaderJson(s.signed_header_1))
      n.set[ObjectNode]("signed_header_2", signedHeaderJson(s.signed_header_2))
    }
    val as = o.putArray("attester_slashings")
    body.attester_slashings.foreach { s =>
      val n = as.addObject()
      n.set[ObjectNode]("attestation_1", indexedAttJson(s.attestation_1))
      n.set[ObjectNode]("attestation_2", indexedAttJson(s.attestation_2))
    }
    val atts = o.putArray("attestations")
    body.attestations.foreach { a =>
      val n = atts.addObject()
      n.put("aggregation_bits", a.aggregation_bits)
      n.set[ObjectNode]("data", attDataJson(a.data))
      n.put("signature", a.signature)
    }
    val deps = o.putArray("deposits")
    body.deposits.foreach { d =>
      val n = deps.addObject()
      val proof = n.putArray("proof")
      d.proof.foreach(proof.add)
      val dd = n.putObject("data")
      dd.put("pubkey", d.data.pubkey)
      dd.put("withdrawal_credentials", d.data.withdrawal_credentials)
      dd.put("amount", d.data.amount.toString)
      dd.put("signature", d.data.signature)
    }
    val ve = o.putArray("voluntary_exits")
    body.voluntary_exits.foreach { e =>
      val n = ve.addObject()
      val m = n.putObject("message")
      m.put("epoch", e.message.epoch.toString)
      m.put("validator_index", e.message.validator_index.toString)
      n.put("signature", e.signature)
    }
    body.sync_aggregate.foreach { s =>
      val n = o.putObject("sync_aggregate")
      n.put("sync_committee_bits", s.sync_committee_bits)
      n.put("sync_committee_signature", s.sync_committee_signature)
    }
    body.execution_payload.foreach { p => o.set[ObjectNode]("execution_payload", payloadJson(p)) }
    body.bls_to_execution_changes.foreach { changes =>
      val a = o.putArray("bls_to_execution_changes")
      changes.foreach { c =>
        val n = a.addObject()
        val m = n.putObject("message")
        m.put("validator_index", c.message.validator_index.toString)
        m.put("from_bls_pubkey", c.message.from_bls_pubkey)
        m.put("to_execution_address", c.message.to_execution_address)
        n.put("signature", c.signature)
      }
    }
    body.blob_kzg_commitments.foreach { cs =>
      val a = o.putArray("blob_kzg_commitments")
      cs.foreach(a.add)
    }
    body.execution_requests.foreach { er =>
      val n = o.putObject("execution_requests")
      val d = n.putArray("deposits")
      er.deposits.foreach { r =>
        val x = d.addObject()
        x.put("pubkey", r.pubkey)
        x.put("withdrawal_credentials", r.withdrawal_credentials)
        x.put("amount", r.amount.toString)
        x.put("signature", r.signature)
        x.put("index", r.index.toString)
      }
      val w = n.putArray("withdrawals")
      er.withdrawals.foreach { r =>
        val x = w.addObject()
        x.put("source_address", r.source_address)
        x.put("validator_pubkey", r.validator_pubkey)
        x.put("amount", r.amount.toString)
      }
      val c = n.putArray("consolidations")
      er.consolidations.foreach { r =>
        val x = c.addObject()
        x.put("source_address", r.source_address)
        x.put("source_pubkey", r.source_pubkey)
        x.put("target_pubkey", r.target_pubkey)
      }
    }
    o
  }

  private def signedHeaderJson(h: SignedBeaconBlockHeader): ObjectNode = {
    val n = mapper.createObjectNode()
    val m = n.putObject("message")
    m.put("slot", h.message.slot.toString)
    m.put("proposer_index", h.message.proposer_index.toString)
    m.put("parent_root", h.message.parent_root)
    m.put("state_root", h.message.state_root)
    m.put("body_root", h.message.body_root)
    n.put("signature", h.signature)
    n
  }

  private def attDataJson(d: AttestationData): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("slot", d.slot.toString)
    n.put("index", d.index.toString)
    n.put("beacon_block_root", d.beacon_block_root)
    val s = n.putObject("source")
    s.put("epoch", d.source.epoch.toString)
    s.put("root", d.source.root)
    val t = n.putObject("target")
    t.put("epoch", d.target.epoch.toString)
    t.put("root", d.target.root)
    n
  }

  private def indexedAttJson(a: IndexedAttestation): ObjectNode = {
    val n = mapper.createObjectNode()
    val idx = n.putArray("attesting_indices")
    a.attesting_indices.foreach(i => idx.add(i.toString))
    n.set[ObjectNode]("data", attDataJson(a.data))
    n.put("signature", a.signature)
    n
  }

  private def payloadJson(p: ExecutionPayload): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("parent_hash", p.parent_hash)
    n.put("fee_recipient", p.fee_recipient)
    n.put("state_root", p.state_root)
    n.put("receipts_root", p.receipts_root)
    n.put("logs_bloom", p.logs_bloom)
    n.put("prev_randao", p.prev_randao)
    n.put("block_number", p.block_number.toString)
    n.put("gas_limit", p.gas_limit.toString)
    n.put("gas_used", p.gas_used.toString)
    n.put("timestamp", p.timestamp.toString)
    n.put("extra_data", p.extra_data)
    n.put("base_fee_per_gas", p.base_fee_per_gas)
    n.put("block_hash", p.block_hash)
    val txs = n.putArray("transactions")
    p.transactions.foreach(txs.add)
    p.withdrawals.foreach { ws =>
      val a = n.putArray("withdrawals")
      ws.foreach { w =>
        val x = a.addObject()
        x.put("index", w.index.toString)
        x.put("validator_index", w.validator_index.toString)
        x.put("address", w.address)
        x.put("amount", w.amount.toString)
      }
    }
    p.blob_gas_used.foreach(v => n.put("blob_gas_used", v.toString))
    p.excess_blob_gas.foreach(v => n.put("excess_blob_gas", v.toString))
    n
  }
}
