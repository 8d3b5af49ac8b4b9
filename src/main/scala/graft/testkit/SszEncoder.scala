package graft.testkit

import com.fasterxml.jackson.databind.JsonNode

/**
 * SSZ encoder for signed beacon blocks, built from the beacon-API JSON shape
 * (the RPC fixtures of the reference's differential tests —
 * `/root/reference/tests/test_data`, FIXTURES.md §1).
 *
 * Test/benchmark infrastructure: encode fixture JSON → SSZ → snappy-framed →
 * e2store era file → decode through the full Spark pipeline → compare back
 * to the fixture (round-trip pins every decoder edge case, FIXTURES.md §3).
 * Also drives synthetic-era generation for decode-throughput benchmarks
 * against BASELINE.md blocks/s numbers.
 *
 * Layout is the standard SSZ container encoding (fixed parts + 4-byte offsets
 * to variable parts), matching what the reference decoder walks
 * (forks/base.py, forks/electra.py).
 */
object SszEncoder {

  // ── primitives ──────────────────────────────────────────────────────────

  def u32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def u64(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0; var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    b
  }

  /** uint256 LE from decimal string (base_fee_per_gas). */
  def u256(decimal: String): Array[Byte] = {
    val out = new Array[Byte](32)
    var v = new java.math.BigInteger(decimal)
    var i = 0
    while (i < 32 && v.signum != 0) {
      out(i) = v.and(java.math.BigInteger.valueOf(0xff)).byteValue()
      v = v.shiftRight(8)
      i += 1
    }
    out
  }

  def unhex(s: String): Array[Byte] = {
    val h = if (s.startsWith("0x") || s.startsWith("0X")) s.substring(2) else s
    val out = new Array[Byte](h.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((Character.digit(h.charAt(2 * i), 16) << 4) |
        Character.digit(h.charAt(2 * i + 1), 16)).toByte
      i += 1
    }
    out
  }

  def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p => System.arraycopy(p, 0, out, off, p.length); off += p.length }
    out
  }

  /** Variable-size SSZ list: leading offset table + items. */
  def variableList(items: Seq[Array[Byte]]): Array[Byte] = {
    if (items.isEmpty) return Array.empty
    val tableLen = 4 * items.length
    val offsets = items.scanLeft(tableLen.toLong)((acc, it) => acc + it.length).init
    concat((offsets.map(u32) ++ items): _*)
  }

  // ── JSON field helpers ───────────────────────────────────────────────────

  private def str(n: JsonNode, f: String): String = n.get(f).asText()
  private def lng(n: JsonNode, f: String): Long = n.get(f).asText().toLong
  private def bytes(n: JsonNode, f: String): Array[Byte] = unhex(n.get(f).asText())
  private def arr(n: JsonNode, f: String): Seq[JsonNode] = {
    val a = n.get(f)
    if (a == null || a.isNull) Nil
    else (0 until a.size()).map(a.get)
  }

  // ── containers ──────────────────────────────────────────────────────────

  def encodeAttestationData(d: JsonNode): Array[Byte] = concat(
    u64(lng(d, "slot")), u64(lng(d, "index")), bytes(d, "beacon_block_root"),
    u64(lng(d.get("source"), "epoch")), bytes(d.get("source"), "root"),
    u64(lng(d.get("target"), "epoch")), bytes(d.get("target"), "root"))

  def encodeAttestation(a: JsonNode): Array[Byte] = concat(
    u32(228), encodeAttestationData(a.get("data")), bytes(a, "signature"),
    unhex(str(a, "aggregation_bits")))

  def encodeIndexedAttestation(a: JsonNode): Array[Byte] = {
    val indices = arr(a, "attesting_indices").map(n => u64(n.asText().toLong))
    concat(u32(228), encodeAttestationData(a.get("data")), bytes(a, "signature"),
      concat(indices: _*))
  }

  def encodeAttesterSlashing(s: JsonNode): Array[Byte] = {
    val a1 = encodeIndexedAttestation(s.get("attestation_1"))
    val a2 = encodeIndexedAttestation(s.get("attestation_2"))
    concat(u32(8), u32(8 + a1.length), a1, a2)
  }

  def encodeSignedHeader(h: JsonNode): Array[Byte] = {
    val m = h.get("message")
    concat(
      u64(lng(m, "slot")), u64(lng(m, "proposer_index")),
      bytes(m, "parent_root"), bytes(m, "state_root"), bytes(m, "body_root"),
      bytes(h, "signature"))
  }

  def encodeProposerSlashing(s: JsonNode): Array[Byte] =
    concat(encodeSignedHeader(s.get("signed_header_1")),
      encodeSignedHeader(s.get("signed_header_2")))

  def encodeDeposit(d: JsonNode): Array[Byte] = {
    val proof = arr(d, "proof").map(n => unhex(n.asText()))
    val data = d.get("data")
    concat(concat(proof: _*),
      bytes(data, "pubkey"), bytes(data, "withdrawal_credentials"),
      u64(lng(data, "amount")), bytes(data, "signature"))
  }

  def encodeVoluntaryExit(e: JsonNode): Array[Byte] = {
    val m = e.get("message")
    concat(u64(lng(m, "epoch")), u64(lng(m, "validator_index")), bytes(e, "signature"))
  }

  def encodeBlsChange(c: JsonNode): Array[Byte] = {
    val m = c.get("message")
    concat(u64(lng(m, "validator_index")), bytes(m, "from_bls_pubkey"),
      bytes(m, "to_execution_address"), bytes(c, "signature"))
  }

  def encodeSyncAggregate(s: JsonNode): Array[Byte] =
    concat(bytes(s, "sync_committee_bits"), bytes(s, "sync_committee_signature"))

  def encodeWithdrawal(w: JsonNode): Array[Byte] = concat(
    u64(lng(w, "index")), u64(lng(w, "validator_index")),
    bytes(w, "address"), u64(lng(w, "amount")))

  /** Execution payload for the given fork (forks/base.py:416-508 layout). */
  def encodeExecutionPayload(p: JsonNode, fork: String): Array[Byte] = {
    val hasWithdrawals = Set("capella", "deneb", "electra")(fork)
    val hasBlobGas = Set("deneb", "electra")(fork)

    val extraData = unhex(str(p, "extra_data"))
    val txItems = arr(p, "transactions").map(n => unhex(n.asText()))
    val txSection = variableList(txItems)
    val wdSection =
      if (hasWithdrawals) concat(arr(p, "withdrawals").map(encodeWithdrawal): _*)
      else Array.empty[Byte]

    val fixedLen = 504 + 4 + (if (hasWithdrawals) 4 else 0) + (if (hasBlobGas) 16 else 0)
    val extraOff = fixedLen
    val txOff = extraOff + extraData.length
    val wdOff = txOff + txSection.length

    val head = concat(
      bytes(p, "parent_hash"), bytes(p, "fee_recipient"), bytes(p, "state_root"),
      bytes(p, "receipts_root"), bytes(p, "logs_bloom"), bytes(p, "prev_randao"),
      u64(lng(p, "block_number")), u64(lng(p, "gas_limit")), u64(lng(p, "gas_used")),
      u64(lng(p, "timestamp")),
      u32(extraOff), u256(str(p, "base_fee_per_gas")), bytes(p, "block_hash"),
      u32(txOff))
    val tail = concat(
      (if (hasWithdrawals) Seq(u32(wdOff)) else Nil) ++
        (if (hasBlobGas) Seq(u64(lng(p, "blob_gas_used")), u64(lng(p, "excess_blob_gas"))) else Nil): _*)
    concat(head, tail, extraData, txSection, wdSection)
  }

  def encodeDepositRequest(r: JsonNode): Array[Byte] = concat(
    bytes(r, "pubkey"), bytes(r, "withdrawal_credentials"), u64(lng(r, "amount")),
    bytes(r, "signature"), u64(lng(r, "index")))

  def encodeWithdrawalRequest(r: JsonNode): Array[Byte] = concat(
    bytes(r, "source_address"), bytes(r, "validator_pubkey"), u64(lng(r, "amount")))

  def encodeConsolidationRequest(r: JsonNode): Array[Byte] = concat(
    bytes(r, "source_address"), bytes(r, "source_pubkey"), bytes(r, "target_pubkey"))

  def encodeExecutionRequests(er: JsonNode): Array[Byte] = {
    val d = concat(arr(er, "deposits").map(encodeDepositRequest): _*)
    val w = concat(arr(er, "withdrawals").map(encodeWithdrawalRequest): _*)
    val c = concat(arr(er, "consolidations").map(encodeConsolidationRequest): _*)
    concat(u32(12), u32(12 + d.length), u32(12 + d.length + w.length), d, w, c)
  }

  /** Block body for the given fork. */
  def encodeBody(body: JsonNode, fork: String): Array[Byte] = {
    val hasSync = fork != "phase0"
    val hasPayload = Set("bellatrix", "capella", "deneb", "electra")(fork)
    val hasBls = Set("capella", "deneb", "electra")(fork)
    val hasBlobs = Set("deneb", "electra")(fork)
    val hasRequests = fork == "electra"

    val eth1 = body.get("eth1_data")
    val fixed = concat(
      bytes(body, "randao_reveal"),
      bytes(eth1, "deposit_root"), u64(lng(eth1, "deposit_count")), bytes(eth1, "block_hash"),
      bytes(body, "graffiti"))
    require(fixed.length == 200, s"fixed body head must be 200 bytes, got ${fixed.length}")

    val sections = Vector.newBuilder[Array[Byte]]
    sections += concat(arr(body, "proposer_slashings").map(encodeProposerSlashing): _*)
    sections += variableList(arr(body, "attester_slashings").map(encodeAttesterSlashing))
    sections += variableList(arr(body, "attestations").map(encodeAttestation))
    sections += concat(arr(body, "deposits").map(encodeDeposit): _*)
    sections += concat(arr(body, "voluntary_exits").map(encodeVoluntaryExit): _*)
    if (hasPayload) sections += encodeExecutionPayload(body.get("execution_payload"), fork)
    if (hasBls) sections += concat(arr(body, "bls_to_execution_changes").map(encodeBlsChange): _*)
    if (hasBlobs) sections += concat(arr(body, "blob_kzg_commitments").map(n => unhex(n.asText())): _*)
    if (hasRequests) sections += encodeExecutionRequests(body.get("execution_requests"))
    val secs = sections.result()

    val numOffsets = secs.length
    val headerLen = 200 + numOffsets * 4 + (if (hasSync) 160 else 0)
    val offsets = secs.scanLeft(headerLen.toLong)((acc, s) => acc + s.length).init

    val baseOffsets = concat(offsets.take(5).map(u32): _*)
    val syncBytes =
      if (hasSync) encodeSyncAggregate(body.get("sync_aggregate")) else Array.empty[Byte]
    val extraOffsets = concat(offsets.drop(5).map(u32): _*)

    concat(fixed, baseOffsets, syncBytes, extraOffsets, concat(secs: _*))
  }

  /** SignedBeaconBlock: [message_offset=100][signature 96][message]
    * (block_parser.py:41-50). */
  def encodeSignedBlock(data: JsonNode, fork: String): Array[Byte] = {
    val message = data.get("message")
    val body = encodeBody(message.get("body"), fork)
    val messageBytes = concat(
      u64(lng(message, "slot")), u64(lng(message, "proposer_index")),
      bytes(message, "parent_root"), bytes(message, "state_root"),
      u32(84), body)
    concat(u32(100), bytes(data, "signature"), messageBytes)
  }
}
