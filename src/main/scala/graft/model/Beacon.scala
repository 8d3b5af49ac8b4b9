package graft.model

/**
 * Canonical superset data model for a decoded signed beacon block — the
 * beacon-API shape the reference emits (era_parser/parsing/block_parser.py:59-78),
 * as Spark-encodable case classes. Fork-specific branches are `Option`s; the
 * `version` tag tells which are populated (SURVEY.md §1.2).
 *
 * Type mapping (SURVEY.md §1.4): uint64 → Long (values fit: slots, gwei,
 * gas); 32-byte uint256 `base_fee_per_gas` → exact decimal String; all
 * roots/pubkeys/signatures/bitfields → 0x-hex String; timestamps surface as
 * epoch seconds here and become TimestampType in the normalized tables.
 */
final case class Eth1Data(deposit_root: String, deposit_count: Long, block_hash: String)

final case class Checkpoint(epoch: Long, root: String)

final case class AttestationData(
    slot: Long, index: Long, beacon_block_root: String,
    source: Checkpoint, target: Checkpoint)

final case class Attestation(aggregation_bits: String, data: AttestationData, signature: String)

final case class IndexedAttestation(
    attesting_indices: Seq[Long], data: AttestationData, signature: String)

final case class AttesterSlashing(attestation_1: IndexedAttestation, attestation_2: IndexedAttestation)

final case class BeaconBlockHeader(
    slot: Long, proposer_index: Long, parent_root: String,
    state_root: String, body_root: String)

final case class SignedBeaconBlockHeader(message: BeaconBlockHeader, signature: String)

final case class ProposerSlashing(
    signed_header_1: SignedBeaconBlockHeader, signed_header_2: SignedBeaconBlockHeader)

final case class DepositData(
    pubkey: String, withdrawal_credentials: String, amount: Long, signature: String)

final case class Deposit(proof: Seq[String], data: DepositData)

final case class VoluntaryExitMessage(epoch: Long, validator_index: Long)

final case class VoluntaryExit(message: VoluntaryExitMessage, signature: String)

final case class SyncAggregate(sync_committee_bits: String, sync_committee_signature: String)

final case class Withdrawal(index: Long, validator_index: Long, address: String, amount: Long)

final case class ExecutionPayload(
    parent_hash: String, fee_recipient: String, state_root: String,
    receipts_root: String, logs_bloom: String, prev_randao: String,
    block_number: Long, gas_limit: Long, gas_used: Long, timestamp: Long,
    extra_data: String, base_fee_per_gas: String, block_hash: String,
    transactions: Seq[String],
    withdrawals: Option[Seq[Withdrawal]],      // capella+
    blob_gas_used: Option[Long],               // deneb+
    excess_blob_gas: Option[Long])             // deneb+

final case class BlsToExecutionChangeMessage(
    validator_index: Long, from_bls_pubkey: String, to_execution_address: String)

final case class BlsToExecutionChange(message: BlsToExecutionChangeMessage, signature: String)

final case class DepositRequest(
    pubkey: String, withdrawal_credentials: String, amount: Long,
    signature: String, index: Long)

final case class WithdrawalRequest(source_address: String, validator_pubkey: String, amount: Long)

final case class ConsolidationRequest(
    source_address: String, source_pubkey: String, target_pubkey: String)

final case class ExecutionRequests(
    deposits: Seq[DepositRequest],
    withdrawals: Seq[WithdrawalRequest],
    consolidations: Seq[ConsolidationRequest])

final case class BlockBody(
    randao_reveal: String,
    eth1_data: Eth1Data,
    graffiti: String,
    proposer_slashings: Seq[ProposerSlashing],
    attester_slashings: Seq[AttesterSlashing],
    attestations: Seq[Attestation],
    deposits: Seq[Deposit],
    voluntary_exits: Seq[VoluntaryExit],
    sync_aggregate: Option[SyncAggregate],                    // altair+
    execution_payload: Option[ExecutionPayload],              // bellatrix+
    bls_to_execution_changes: Option[Seq[BlsToExecutionChange]], // capella+
    blob_kzg_commitments: Option[Seq[String]],                // deneb+
    execution_requests: Option[ExecutionRequests])            // electra+

final case class BeaconBlockMessage(
    slot: Long, proposer_index: Long, parent_root: String, state_root: String,
    body: BlockBody)

/** One decoded block row — the unit the era scan + decode pipeline emits. */
final case class DecodedBlock(
    slot: Long,
    proposer_index: Long,
    parent_root: String,
    state_root: String,
    signature: String,
    body: BlockBody,
    version: String,
    /** Single-timestamp design (processor.py:140): payload time if >0 else
      * genesis + slot*seconds_per_slot (block_parser.py:84-113). */
    timestamp_utc: java.sql.Timestamp,
    compressed_size: Int,
    decompressed_size: Int,
    network: String,
    era_number: Long,
    source_file: String)

/** Raw era-file record before decode (era_reader.py:10-15). */
final case class EraRecord(
    slot: Long,
    record_type: String,
    data: Array[Byte],
    network: String,
    era_number: Long,
    source_file: String)
