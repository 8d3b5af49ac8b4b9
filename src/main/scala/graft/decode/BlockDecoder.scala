package graft.decode

import graft.config.{ForkSchedule, NetworkConfig}
import graft.model._
import graft.ssz.{SnappyFramed, Ssz}

/**
 * Fork-aware SSZ block decoder: compressed era block record → [[DecodedBlock]].
 *
 * Pure JVM function designed to run inside executor tasks (the era DataSource
 * reader or a `mapPartitions` decode stage) — one call per block, no Spark
 * types, no allocation beyond the output tree. The field-layout semantics —
 * including every tolerance/edge rule — mirror the reference decoder and are
 * pinned by the RPC-fixture differential tests:
 *
 *  - envelope + message header: era_parser/parsing/block_parser.py:41-58
 *  - fixed body head (randao/eth1/graffiti): forks/base.py:14-35
 *  - schema-driven variable sections:        forks/base.py:46-106,510-569
 *  - item parsers F7-F15:                    forks/base.py:108-413
 *  - execution payload (fork-conditional):   forks/base.py:416-508
 *  - electra execution requests:             forks/electra.py:24-124
 *  - timestamp fallback ladder:              block_parser.py:84-120
 */
object BlockDecoder {

  import Ssz._

  /** Every variable body section the pruned decode can skip — the
    * column-pruning vocabulary of [[decode]]'s `sections` parameter
    * (SURVEY.md §4's one remaining optional pushdown: the reference always
    * computes all 15 datasets and keeps one — processor.py:401-404). */
  val AllSections: Set[String] = Set(
    "proposer_slashings", "attester_slashings", "attestations", "deposits",
    "voluntary_exits", "sync_aggregate", "execution_payload",
    "bls_to_execution_changes", "blob_kzg_commitments", "execution_requests")

  /** Decode one compressed block record. Returns None on any decode failure
    * (the reference logs and skips — processor.py:131-133).
    *
    * `sections` prunes the body parse: a section not in the set is skipped
    * entirely (empty list / None in the output) instead of parsed — the
    * decode-side half of column pruning, so a single-table extract never
    * pays for the 14 sections it drops. The block header, eth1 data,
    * graffiti, and the fork/timestamp ladder are always decoded (every
    * table carries them); when `execution_payload` is pruned, the payload
    * TIMESTAMP is still read directly from its fixed offset so
    * `timestamp_utc` stays identical on post-merge blocks. CONTRACT: the
    * requested tables' rows are identical to the full decode's on
    * well-formed blocks; a block whose PRUNED-AWAY section is corrupt may
    * decode here where the full path degrades or drops it (the corruption
    * is only detectable by parsing, which is exactly the work pruning
    * skips) — `SectionPruningSpec` pins table-for-table equality on every
    * fixture fork. */
  def decode(
      compressed: Array[Byte],
      slot: Long,
      network: NetworkConfig,
      eraNumber: Long = -1L,
      sourceFile: String = "",
      sections: Set[String] = AllSections): Option[DecodedBlock] = {
    try {
      val data = SnappyFramed.decompress(compressed)
      val fork = ForkSchedule.forkAt(slot, network)

      val messageOffset = readOffset(data, 0)
      val signature = hex(data, 4, 100)
      val message = slice(data, messageOffset, data.length)

      val slotParsed = readUint64(message, 0)
      val proposerIndex = readUint64(message, 8)
      val parentRoot = hex(message, 16, 48)
      val stateRoot = hex(message, 48, 80)
      val bodyOffset = readOffset(message, 80)
      val (body, payloadTs) =
        parseBodyPruned(slice(message, bodyOffset, message.length), fork, sections)

      val ts = if (payloadTs > 0) payloadTs
        else network.genesisTime + slotParsed * network.secondsPerSlot

      Some(DecodedBlock(
        slot = slotParsed,
        proposer_index = proposerIndex,
        parent_root = parentRoot,
        state_root = stateRoot,
        signature = signature,
        body = body,
        version = fork,
        timestamp_utc = new java.sql.Timestamp(ts * 1000L),
        compressed_size = compressed.length,
        decompressed_size = data.length,
        network = network.name,
        era_number = eraNumber,
        source_file = sourceFile))
    } catch {
      case _: Exception => None
    }
  }

  // ── body ────────────────────────────────────────────────────────────────

  /** Fixed byte offset of `timestamp` inside an execution payload:
    * parent_hash(32) + fee_recipient(20) + state_root(32) +
    * receipts_root(32) + logs_bloom(256) + prev_randao(32) +
    * block_number(8) + gas_limit(8) + gas_used(8) — identical across every
    * post-merge fork (the fork-variable fields all come later). */
  private val PayloadTsOffset = 428

  /** Full-parse compatibility wrapper (the differential/golden specs drive
    * this directly). */
  private[decode] def parseBody(body: Array[Byte], fork: String): BlockBody =
    parseBodyPruned(body, fork, AllSections)._1

  /** Body parse with section pruning; returns (body, payload timestamp —
    * 0 when absent/pre-merge, read from [[PayloadTsOffset]] when the
    * payload section is pruned away; block_parser.py:84-113's fallback
    * ladder runs on this hint in [[decode]]). */
  private[decode] def parseBodyPruned(body: Array[Byte], fork: String,
      sections: Set[String]): (BlockBody, Long) = {
    // fixed head: randao_reveal(96) + eth1_data(72) + graffiti(32) = 200
    val randao = hex(body, 0, 96)
    val eth1 = Eth1Data(
      deposit_root = hex(body, 96, 128),
      deposit_count = readUint64(body, 128),
      block_hash = hex(body, 136, 168))
    val graffiti = hex(body, 168, 200)
    var pos = 200

    // 5 base variable offsets (forks/base.py:37-44)
    val baseOffsets = (0 until 5).map(i => readOffset(body, pos + i * 4))
    pos += 20

    // fixed schema field: sync_aggregate 160B inline, altair+ (forks/altair.py:8-10)
    var syncAggregate: Option[SyncAggregate] = None
    if (ForkSchedule.hasSyncAggregate(fork)) {
      if (pos + 160 <= body.length) {
        if (sections("sync_aggregate")) {
          DecodeStats.mark("sync_aggregate")
          syncAggregate = parseSyncAggregate(slice(body, pos, pos + 160))
        }
        pos += 160 // schema position advances whether or not we decode it
      } // else: missing → empty (forks/base.py:66-68)
    }

    // additional variable offsets in schema order (forks/base.py:70-77)
    val variableFields = Vector.newBuilder[String]
    if (ForkSchedule.hasExecutionPayload(fork)) variableFields += "execution_payload"
    if (ForkSchedule.hasBlsChanges(fork)) variableFields += "bls_to_execution_changes"
    if (ForkSchedule.hasBlobCommitments(fork)) variableFields += "blob_kzg_commitments"
    if (ForkSchedule.hasExecutionRequests(fork)) variableFields += "execution_requests"
    val extraFields = variableFields.result()

    val extraOffsets = Vector.newBuilder[Int]
    extraFields.foreach { _ =>
      if (pos + 4 <= body.length) { extraOffsets += readOffset(body, pos); pos += 4 }
    }

    val fieldNames = Vector("proposer_slashings", "attester_slashings", "attestations",
      "deposits", "voluntary_exits") ++ extraFields
    val allOffsets = baseOffsets.toVector ++ extraOffsets.result()

    // section boundaries with the reference's equal-consecutive-offset empty
    // rule and min-greater-offset end rule (forks/base.py:510-557).
    // Bounds are the CLAMPED [from, until) `slice` would use, computed
    // without copying — so the pruned timestamp peek below can read 8
    // bytes in place instead of memcpy'ing the whole payload section
    // (transactions included — the largest section in the body).
    def sectionBounds(i: Int): Option[(Int, Int)] = {
      if (i >= allOffsets.length) return None
      val offset = allOffsets(i)
      val greater = allOffsets.filter(_ > offset)
      val end = if (greater.nonEmpty) greater.min else body.length
      if (i + 1 < allOffsets.length && offset == allOffsets(i + 1)) return None
      if (offset >= body.length || end <= offset) return None
      // identical clamping to Ssz.slice, so (u - f) is the slice's length
      val f = math.max(0, math.min(offset, body.length))
      val u = math.max(f, math.min(end, body.length))
      Some((f, u))
    }
    def section(i: Int): Option[Array[Byte]] =
      sectionBounds(i).map { case (f, u) => slice(body, f, u) }
    def sectionOf(name: String): Option[Array[Byte]] = {
      val i = fieldNames.indexOf(name)
      if (i < 0) None else section(i)
    }
    def sectionBoundsOf(name: String): Option[(Int, Int)] = {
      val i = fieldNames.indexOf(name)
      if (i < 0) None else sectionBounds(i)
    }

    /** Section slice, only when the caller asked for the section. */
    def requested(name: String): Option[Array[Byte]] =
      if (!sections(name)) None
      else sectionOf(name).map { d => DecodeStats.mark(name); d }

    val proposerSlashings = requested("proposer_slashings")
      .map(d => parseFixedList(d, 416, parseProposerSlashing)).getOrElse(Vector.empty)
    val attesterSlashings = requested("attester_slashings")
      .map(d => parseVariableList(d, parseAttesterSlashing)).getOrElse(Vector.empty)
    val attestations = requested("attestations")
      .map(d => parseVariableList(d, parseAttestation)).getOrElse(Vector.empty)
    val deposits = requested("deposits")
      .map(d => parseFixedList(d, 1240, parseDeposit)).getOrElse(Vector.empty)
    val voluntaryExits = requested("voluntary_exits")
      .map(d => parseFixedList(d, 112, parseVoluntaryExit)).getOrElse(Vector.empty)

    val executionPayload: Option[ExecutionPayload] =
      if (!ForkSchedule.hasExecutionPayload(fork)) None
      else requested("execution_payload").flatMap(d => parseExecutionPayload(d, fork))

    // timestamp survives payload pruning: read the one fixed-offset field
    // instead of the full parse (same 0-on-short semantics — a section too
    // short to hold the field never yields a timestamp on the full path
    // either, it fails parseExecutionPayload's bounds)
    val payloadTs: Long =
      if (!ForkSchedule.hasExecutionPayload(fork)) 0L
      else if (sections("execution_payload"))
        executionPayload.map(_.timestamp).getOrElse(0L)
      else sectionBoundsOf("execution_payload")
        .collect { case (f, u) if u - f >= PayloadTsOffset + 8 =>
          readUint64(body, f + PayloadTsOffset) }
        .getOrElse(0L)

    val blsChanges: Option[Seq[BlsToExecutionChange]] =
      if (!ForkSchedule.hasBlsChanges(fork)) None
      else Some(requested("bls_to_execution_changes")
        .map(d => parseFixedList(d, 172, parseBlsChange)).getOrElse(Vector.empty))

    val blobCommitments: Option[Seq[String]] =
      if (!ForkSchedule.hasBlobCommitments(fork)) None
      else Some(requested("blob_kzg_commitments")
        .map(d => parseFixedList(d, 48, parseKzgCommitment)).getOrElse(Vector.empty))

    val executionRequests: Option[ExecutionRequests] =
      if (!ForkSchedule.hasExecutionRequests(fork)) None
      else Some(requested("execution_requests")
        .map(parseExecutionRequests).getOrElse(ExecutionRequests(Nil, Nil, Nil)))

    (BlockBody(randao, eth1, graffiti, proposerSlashings, attesterSlashings,
      attestations, deposits, voluntaryExits, syncAggregate, executionPayload,
      blsChanges, blobCommitments, executionRequests),
      payloadTs)
  }

  // ── item parsers (F7–F15, F19) ──────────────────────────────────────────

  private[decode] def parseAttestationData(d: Array[Byte]): AttestationData =
    AttestationData(
      slot = readUint64(d, 0),
      index = readUint64(d, 8),
      beacon_block_root = hex(d, 16, 48),
      source = Checkpoint(readUint64(d, 48), hex(d, 56, 88)),
      target = Checkpoint(readUint64(d, 88), hex(d, 96, 128)))

  /** forks/base.py:157-187 */
  private[decode] def parseAttestation(d: Array[Byte]): Attestation = {
    if (d.length < 228) return null
    val bitsOffset = readOffset(d, 0)
    Attestation(
      aggregation_bits = hex(d, bitsOffset, d.length),
      data = parseAttestationData(slice(d, 4, 132)),
      signature = hex(d, 132, 228))
  }

  /** forks/base.py:274-321 */
  private[decode] def parseIndexedAttestation(d: Array[Byte]): IndexedAttestation = {
    if (d.length < 232) return null
    val indicesOffset = readOffset(d, 0)
    if (indicesOffset >= d.length) return null
    val indicesData = slice(d, indicesOffset, d.length)
    val indices = Vector.newBuilder[Long]
    if (indicesData.length >= 8) {
      var i = 0
      while (i <= indicesData.length - 8) { indices += readUint64(indicesData, i); i += 8 }
    }
    IndexedAttestation(
      attesting_indices = indices.result(),
      data = parseAttestationData(slice(d, 4, 132)),
      signature = hex(d, 132, 228))
  }

  /** forks/base.py:323-350 */
  private[decode] def parseAttesterSlashing(d: Array[Byte]): AttesterSlashing = {
    if (d.length < 8) return null
    val off1 = readOffset(d, 0)
    val off2 = readOffset(d, 4)
    if (off1 >= d.length || off2 >= d.length) return null
    val a1 = parseIndexedAttestation(slice(d, off1, off2))
    val a2 = parseIndexedAttestation(slice(d, off2, d.length))
    if (a1 == null || a2 == null) return null
    AttesterSlashing(a1, a2)
  }

  /** forks/base.py:221-272 (ssz_size 416) */
  private[decode] def parseProposerSlashing(d: Array[Byte]): ProposerSlashing = {
    if (d.length < 416) return null
    def header(at: Int) = BeaconBlockHeader(
      slot = readUint64(d, at),
      proposer_index = readUint64(d, at + 8),
      parent_root = hex(d, at + 16, at + 48),
      state_root = hex(d, at + 48, at + 80),
      body_root = hex(d, at + 80, at + 112))
    ProposerSlashing(
      SignedBeaconBlockHeader(header(0), hex(d, 112, 208)),
      SignedBeaconBlockHeader(header(208), hex(d, 320, 416)))
  }

  /** forks/base.py:109-155 (ssz_size 1240) */
  private[decode] def parseDeposit(d: Array[Byte]): Deposit = {
    if (d.length < 1240) return null
    val proof = (0 until 33).map(i => hex(d, i * 32, (i + 1) * 32))
    val base = 1056
    Deposit(
      proof = proof,
      data = DepositData(
        pubkey = hex(d, base, base + 48),
        withdrawal_credentials = hex(d, base + 48, base + 80),
        amount = readUint64(d, base + 80),
        signature = hex(d, base + 88, base + 184)))
  }

  /** forks/base.py:191-219 (ssz_size 112) */
  private[decode] def parseVoluntaryExit(d: Array[Byte]): VoluntaryExit = {
    if (d.length < 112) return null
    VoluntaryExit(
      message = VoluntaryExitMessage(readUint64(d, 0), readUint64(d, 8)),
      signature = hex(d, 16, 112))
  }

  /** forks/base.py:352-383 (ssz_size 172) */
  private[decode] def parseBlsChange(d: Array[Byte]): BlsToExecutionChange = {
    if (d.length < 172) return null
    BlsToExecutionChange(
      message = BlsToExecutionChangeMessage(
        validator_index = readUint64(d, 0),
        from_bls_pubkey = hex(d, 8, 56),
        to_execution_address = hex(d, 56, 76)),
      signature = hex(d, 76, 172))
  }

  /** forks/base.py:385-392 (fixed 160) */
  private[decode] def parseSyncAggregate(d: Array[Byte]): Option[SyncAggregate] = {
    if (d.length < 160) None
    else Some(SyncAggregate(hex(d, 0, 64), hex(d, 64, 160)))
  }

  /** forks/base.py:394-405 (ssz_size 44) */
  private[decode] def parseWithdrawal(d: Array[Byte]): Withdrawal = {
    if (d.length < 44) return null
    Withdrawal(readUint64(d, 0), readUint64(d, 8), hex(d, 16, 36), readUint64(d, 36))
  }

  /** forks/base.py:407-413 (ssz_size 48) */
  private[decode] def parseKzgCommitment(d: Array[Byte]): String =
    if (d.length != 48) null else hex(d)

  // ── execution payload (F16–F18) ─────────────────────────────────────────

  /** forks/base.py:416-508; fork-conditional offsets incl. the Deneb 16-byte
    * blob-gas reservation and the equal-offset empty-transactions rule. */
  private[decode] def parseExecutionPayload(d: Array[Byte], fork: String): Option[ExecutionPayload] = {
    try {
      if (d.length < 100) return None
      var pos = 0
      val parentHash = hex(d, 0, 32); pos = 32
      val feeRecipient = hex(d, pos, pos + 20); pos += 20
      val stateRoot = hex(d, pos, pos + 32); pos += 32
      val receiptsRoot = hex(d, pos, pos + 32); pos += 32
      val logsBloom = hex(d, pos, pos + 256); pos += 256
      val prevRandao = hex(d, pos, pos + 32); pos += 32
      val blockNumber = readUint64(d, pos); pos += 8
      val gasLimit = readUint64(d, pos); pos += 8
      val gasUsed = readUint64(d, pos); pos += 8
      val timestamp = readUint64(d, pos); pos += 8

      var offsets = Map.empty[String, Int]
      offsets += "extra_data" -> readOffset(d, pos); pos += 4
      val baseFee = readUint256Decimal(d, pos); pos += 32
      val blockHash = hex(d, pos, pos + 32); pos += 32

      var availableOffsetBytes = d.length - pos
      if (fork == "deneb" || fork == "electra") availableOffsetBytes -= 16
      val numOffsetsAvailable = availableOffsetBytes / 4

      offsets += "transactions" -> readOffset(d, pos); pos += 4

      val withWithdrawals = ForkSchedule.hasWithdrawals(fork) && numOffsetsAvailable >= 2
      if (withWithdrawals) { offsets += "withdrawals" -> readOffset(d, pos); pos += 4 }

      var blobGasUsed: Option[Long] = None
      var excessBlobGas: Option[Long] = None
      if (fork == "deneb" || fork == "electra") {
        blobGasUsed = Some(readUint64(d, pos)); pos += 8
        excessBlobGas = Some(readUint64(d, pos)); pos += 8
      }

      // variable fields (forks/base.py:459-508)
      def sectionEnd(start: Int): Int = {
        val greater = offsets.values.filter(_ > start)
        if (greater.nonEmpty) greater.min else d.length
      }
      var extraData = ""
      var transactions: Seq[String] = Vector.empty
      var withdrawals: Option[Seq[Withdrawal]] =
        if (ForkSchedule.hasWithdrawals(fork)) Some(Vector.empty) else None

      val equalTxWd = offsets.contains("withdrawals") &&
        offsets("transactions") == offsets("withdrawals")

      val fieldsToParse =
        if (equalTxWd) Seq("extra_data", "withdrawals") // transactions stays []
        else if (withWithdrawals) Seq("extra_data", "transactions", "withdrawals")
        else Seq("extra_data", "transactions")

      fieldsToParse.foreach { name =>
        offsets.get(name).foreach { start =>
          val fieldData = slice(d, start, sectionEnd(start))
          name match {
            case "extra_data" => extraData = hex(fieldData)
            case "transactions" =>
              transactions = parseVariableList(fieldData, (b: Array[Byte]) => hex(b))
            case "withdrawals" =>
              withdrawals = Some(parseFixedList(fieldData, 44, parseWithdrawal))
          }
        }
      }

      Some(ExecutionPayload(parentHash, feeRecipient, stateRoot, receiptsRoot,
        logsBloom, prevRandao, blockNumber, gasLimit, gasUsed, timestamp,
        extraData, baseFee, blockHash, transactions, withdrawals,
        blobGasUsed, excessBlobGas))
    } catch {
      case _: Exception => None
    }
  }

  // ── electra execution requests (F19) ────────────────────────────────────

  /** forks/electra.py:24-124 — unique-offset sections with rightmost-owner
    * disambiguation for empty lists. */
  private[decode] def parseExecutionRequests(d: Array[Byte]): ExecutionRequests = {
    if (d.length < 12) return ExecutionRequests(Nil, Nil, Nil)
    try {
      val depositsOff = readOffset(d, 0)
      val withdrawalsOff = readOffset(d, 4)
      val consolidationsOff = readOffset(d, 8)

      var deposits: Seq[DepositRequest] = Vector.empty
      var withdrawals: Seq[WithdrawalRequest] = Vector.empty
      var consolidations: Seq[ConsolidationRequest] = Vector.empty

      val unique = Seq(depositsOff, withdrawalsOff, consolidationsOff).distinct.sorted
      unique.zipWithIndex.foreach { case (offset, i) =>
        if (offset < d.length && offset >= 12) {
          val end = if (i + 1 < unique.length) unique(i + 1) else d.length
          val sectionData = slice(d, offset, end)
          if (sectionData.nonEmpty) {
            val users = Seq(
              "deposits" -> (depositsOff == offset),
              "withdrawals" -> (withdrawalsOff == offset),
              "consolidations" -> (consolidationsOff == offset)
            ).collect { case (n, true) => n }
            val owner =
              if (users.length > 1) {
                // rightmost field owns the shared tail section
                if (users.contains("consolidations")) "consolidations"
                else if (users.contains("withdrawals")) "withdrawals"
                else "deposits"
              } else users.head
            owner match {
              case "deposits" =>
                deposits = parseFixedList(sectionData, 192, parseDepositRequest)
              case "withdrawals" =>
                withdrawals = parseFixedList(sectionData, 76, parseWithdrawalRequest)
              case "consolidations" =>
                consolidations = parseFixedList(sectionData, 116, parseConsolidationRequest)
            }
          }
        }
      }
      ExecutionRequests(deposits, withdrawals, consolidations)
    } catch {
      case _: Exception => ExecutionRequests(Nil, Nil, Nil)
    }
  }

  /** forks/electra.py:46-57 (ssz_size 192) */
  private[decode] def parseDepositRequest(d: Array[Byte]): DepositRequest = {
    if (d.length < 192) return null
    DepositRequest(
      pubkey = hex(d, 0, 48),
      withdrawal_credentials = hex(d, 48, 80),
      amount = readUint64(d, 80),
      signature = hex(d, 88, 184),
      index = readUint64(d, 184))
  }

  /** forks/electra.py:60-68 (ssz_size 76) */
  private[decode] def parseWithdrawalRequest(d: Array[Byte]): WithdrawalRequest = {
    if (d.length < 76) return null
    WithdrawalRequest(hex(d, 0, 20), hex(d, 20, 68), readUint64(d, 68))
  }

  /** forks/electra.py:71-79 (ssz_size 116) */
  private[decode] def parseConsolidationRequest(d: Array[Byte]): ConsolidationRequest = {
    if (d.length < 116) return null
    ConsolidationRequest(hex(d, 0, 20), hex(d, 20, 68), hex(d, 68, 116))
  }
}
