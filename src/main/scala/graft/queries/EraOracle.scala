package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, concat_ws}

import graft.operators.Normalizer
import graft.testkit.EraFixtures

/**
 * DuckDB-oracle support for the era-domain analytics
 * (docs/CLICKHOUSE.md:340-920 ports in [[EraQueries]]).
 *
 * The era queries read era files — a format DuckDB cannot decode — so the
 * driver's hash gate historically recorded them rows-only. This module closes
 * that gap: [[exportTables]] writes the decoded normalized tables (the 15 child
 * tables plus raw-record/meta/wide projections) to parquet under a stable
 * absolute path, and [[oracleSql]] re-expresses every era query as DuckDB SQL
 * over those parquet files via DuckDB `read_parquet` globs on absolute paths.
 *
 * Verification split (deliberate): DECODE correctness (era bytes → table
 * values) stays anchored to the RPC-fixture differential and augmented-golden
 * specs; the hash gate added here independently re-computes the ANALYTICS
 * (aggregations / joins / windows / set ops) on top of the decoded values.
 * The 15 `era_<table>` passthrough entries and `era_wide_blocks` are
 * round-trip parity checks only (oracle reads the same export), kept because
 * they pin schema + serialization through an independent parquet reader.
 */
object EraOracle {

  /** Absolute export directory, resolved once per JVM. Lives under the
    * build's target dir; overridable for tests via -Dgraft.era.oracle.dir.
    * Absolute so the driver's DuckDB process resolves it regardless of cwd. */
  lazy val dir: String = new java.io.File(
    sys.props.getOrElse("graft.era.oracle.dir", "target/era-oracle")).getAbsolutePath

  /** DuckDB table expression for one exported table. */
  private def t(name: String): String = s"read_parquet('$dir/$name/*.parquet')"

  /** All exported table names: the 15 normalized tables plus the raw-record
    * scan (`records`), the block fork/size metadata the normalized `blocks`
    * projection drops (`block_meta`), and the wide single-file shape. */
  val exportedTables: Seq[String] =
    Normalizer.datasetNames ++ Seq("records", "block_meta", "wide_blocks")

  /** Write every exported table as single-file parquet under [[dir]].
    * Fixture-era scale (a few thousand rows total) — coalesce(1) keeps the
    * DuckDB glob trivial; production exports go through [[graft.export.Sinks]]
    * with real partitioning. */
  def exportTables(spark: SparkSession): Unit = {
    val blocks = EraQueries.blocks(spark)
    def write(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
    Normalizer.allDatasets(blocks).foreach { case (n, df) => write(n)(df) }
    write("records")(
      spark.read.format("era").load(EraFixtures.ensureGenerated())
        .select("slot", "record_type"))
    write("block_meta")(blocks.toDF().select(
      "slot", "era_number", "version", "compressed_size", "decompressed_size"))
    write("wide_blocks")(Normalizer.wideBlocks(blocks))
    // mainnet fixture corpus: the oracle recomputes the fork/timestamp
    // ladder from `slot` alone (+ payload time when present), so only the
    // minimal columns are exported — nothing the ladder query asserts is
    // passed through except slot and the detected network name.
    val mb = EraQueries.mainnetBlocks(spark)
    write("mainnet_blocks")(mb.toDF().select("slot", "network", "era_number"))
    // RAW payload timestamp field (not the derived timestamp_utc, which for
    // payload forks is itself computed from it — that would be circular)
    write("mainnet_payloads")(
      mb.toDF().filter(col("body.execution_payload").isNotNull)
        .select(col("slot"),
          col("body.execution_payload.timestamp").as("payload_ts")))
    // era-state fixture: the RAW append-only event log. The state SQL
    // oracles recompute the latest-state argmax from it independently,
    // so the dedup semantics (not just the exported rows) are checked.
    write("era_completion_log")(
      EraStateFixture.manager(spark).log
        .withColumn("datasets_processed",
          concat_ws(",", col("datasets_processed"))))
  }

  /** One DuckDB statement per era query, mirroring the Spark plans in
    * [[EraQueries]] column-for-column (same aliases, same ORDER BY, BIGINT
    * casts where Spark produces LongType — DuckDB COUNT/SUM otherwise widen
    * to HUGEINT and fail the driver's schema compare). */
  def oracleSql: Map[String, String] = {
    val passthrough: Map[String, String] =
      (Normalizer.datasetNames.map(n => s"era_$n" -> t(n)) :+
        ("era_wide_blocks" -> t("wide_blocks")))
        .map { case (q, tbl) => q -> s"SELECT * FROM $tbl ORDER BY slot" }
        .toMap

    passthrough ++ Map(
      "era_stats" ->
        s"""SELECT record_type, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(CASE WHEN record_type = 'block' THEN slot END) AS min_slot,
           MAX(CASE WHEN record_type = 'block' THEN slot END) AS max_slot
           FROM ${t("records")} GROUP BY record_type ORDER BY record_type""",
      "era_point_lookup" ->
        s"""SELECT * FROM ${t("blocks")} WHERE slot = 98300""",
      "era_point_lookup_multi" ->
        s"""SELECT * FROM ${t("blocks")} WHERE slot IN (300, 98301, 16383000)
           ORDER BY slot""",
      "era_slot_range" ->
        s"""SELECT * FROM ${t("blocks")} WHERE slot BETWEEN 98299 AND 98301
           ORDER BY slot""",
      // independent recomputation of the mainnet fork/epoch/timestamp ladder
      // (config/forks.py:63-81 epochs, networks.py mainnet genesis 1606824023
      // / 12 s slots): fork from the epoch thresholds, era from slot // 8192,
      // timestamp = payload time when the fork carries one, else genesis +
      // slot·12 (block_parser.py:84-113)
      "era_mainnet_ladder" ->
        s"""SELECT b.slot, b.network,
           CASE WHEN b.slot // 32 >= 364032 THEN 'electra'
                WHEN b.slot // 32 >= 269568 THEN 'deneb'
                WHEN b.slot // 32 >= 194048 THEN 'capella'
                WHEN b.slot // 32 >= 144896 THEN 'bellatrix'
                WHEN b.slot // 32 >= 74240 THEN 'altair'
                ELSE 'phase0' END AS fork,
           CAST(b.slot // 8192 AS BIGINT) AS era_number,
           CAST(b.slot // 32 AS BIGINT) AS epoch,
           CAST(COALESCE(p.payload_ts, 1606824023 + b.slot * 12) AS BIGINT) AS ts_epoch
           FROM ${t("mainnet_blocks")} b
           LEFT JOIN ${t("mainnet_payloads")} p ON b.slot = p.slot
           ORDER BY b.slot""",
      // dense-children density profile: independent per-table recount of
      // every slot's child rows (the dense fixture's ~10× row sets are
      // value-hashed here, not just decoded)
      "era_child_density" ->
        Normalizer.datasetNames.map(n =>
          s"""SELECT '$n' AS tbl, slot, CAST(COUNT(*) AS BIGINT) AS n_rows
             FROM ${t(n)} GROUP BY slot""")
          .mkString("", " UNION ALL ", " ORDER BY tbl, slot"),
      "era_inclusion_delay" ->
        s"""SELECT committee_index,
           ROUND(AVG(slot - attestation_slot), 4) AS avg_inclusion_delay,
           CAST(COUNT(*) AS BIGINT) AS n_attestations
           FROM ${t("attestations")}
           GROUP BY committee_index ORDER BY committee_index""",
      // the Spark plan stitches per-era windows with a broadcast boundary
      // frame (scale shape); over sorted non-overlapping eras that equals the
      // plain global lag, which is the natural single-node oracle form
      "era_slot_gaps" ->
        s"""SELECT slot, LAG(slot) OVER (ORDER BY slot) AS prev_slot,
           slot - COALESCE(LAG(slot) OVER (ORDER BY slot), slot) AS gap
           FROM ${t("block_meta")} ORDER BY slot""",
      "era_fork_summary" ->
        s"""SELECT version, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(compressed_size) AS BIGINT) AS total_compressed,
           CAST(SUM(decompressed_size) AS BIGINT) AS total_decompressed,
           MIN(slot) AS min_slot, MAX(slot) AS max_slot
           FROM ${t("block_meta")} GROUP BY version ORDER BY version""",
      "era_block_tx_join" ->
        s"""WITH tx AS (SELECT slot, CAST(COUNT(*) AS BIGINT) AS n_tx
             FROM ${t("transactions")} GROUP BY slot)
           SELECT b.slot, b.proposer_index, b.version,
             p.block_number, p.gas_used, COALESCE(tx.n_tx, 0) AS n_tx
           FROM ${t("blocks")} b
           JOIN ${t("execution_payloads")} p ON b.slot = p.slot
           LEFT JOIN tx ON b.slot = tx.slot
           ORDER BY b.slot""",
      "era_requests_reconciliation" ->
        s"""WITH d AS (SELECT slot, CAST(COUNT(*) AS BIGINT) AS n_deposit_req
             FROM ${t("deposit_requests")} GROUP BY slot),
           w AS (SELECT slot, CAST(COUNT(*) AS BIGINT) AS n_withdrawal_req
             FROM ${t("withdrawal_requests")} GROUP BY slot),
           c AS (SELECT slot, CAST(COUNT(*) AS BIGINT) AS n_consolidation_req
             FROM ${t("consolidation_requests")} GROUP BY slot),
           s AS (SELECT slot FROM d UNION SELECT slot FROM w UNION SELECT slot FROM c)
           SELECT s.slot, COALESCE(d.n_deposit_req, 0) AS n_deposit_req,
             COALESCE(w.n_withdrawal_req, 0) AS n_withdrawal_req,
             COALESCE(c.n_consolidation_req, 0) AS n_consolidation_req
           FROM s LEFT JOIN d USING (slot) LEFT JOIN w USING (slot)
             LEFT JOIN c USING (slot)
           ORDER BY s.slot""",
      "era_slashed_validator_search" ->
        s"""SELECT slot, slashing_index,
           list_contains(CAST(att_1_attesting_indices AS BIGINT[]), 0) AS has_validator_0,
           CAST(len(CAST(att_1_attesting_indices AS BIGINT[])) AS BIGINT) AS n1
           FROM ${t("attester_slashings")} ORDER BY slot, slashing_index""",
      "era_daily_activity" ->
        s"""SELECT DATE_TRUNC('day', timestamp_utc) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(COUNT(DISTINCT proposer_index) AS BIGINT) AS n_proposers
           FROM ${t("blocks")} GROUP BY 1 ORDER BY day""",
      "era_proposer_stats" ->
        s"""SELECT proposer_index, CAST(COUNT(*) AS BIGINT) AS blocks_proposed,
           MIN(timestamp_utc) AS first_block, MAX(timestamp_utc) AS last_block
           FROM ${t("blocks")} GROUP BY proposer_index
           ORDER BY blocks_proposed DESC, proposer_index LIMIT 20""",
      "era_tx_fee_recipients" ->
        s"""WITH g AS (SELECT fee_recipient, CAST(COUNT(*) AS BIGINT) AS transactions,
             ROUND(AVG(gas_limit), 2) AS avg_gas_limit,
             ROUND(AVG(gas_used), 2) AS avg_gas_used
             FROM ${t("transactions")} GROUP BY fee_recipient),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_tx FROM ${t("transactions")})
           SELECT fee_recipient, transactions, avg_gas_limit, avg_gas_used,
             ROUND(transactions * 100.0 / total_tx, 4) AS percentage
           FROM g CROSS JOIN tot
           ORDER BY transactions DESC, fee_recipient LIMIT 20""",
      "era_withdrawal_comparison" ->
        s"""SELECT * FROM (
           SELECT DATE_TRUNC('day', timestamp_utc) AS day,
             CAST(COUNT(*) AS BIGINT) AS withdrawal_count,
             CAST(SUM(amount) AS BIGINT) AS total_withdrawn_gwei,
             CAST(COUNT(DISTINCT validator_index) AS BIGINT) AS unique_validators,
             'traditional_withdrawals' AS withdrawal_type
           FROM ${t("withdrawals")} GROUP BY 1
           UNION ALL
           SELECT DATE_TRUNC('day', timestamp_utc) AS day,
             CAST(COUNT(*) AS BIGINT), CAST(SUM(amount) AS BIGINT),
             CAST(COUNT(DISTINCT validator_pubkey) AS BIGINT),
             'withdrawal_requests'
           FROM ${t("withdrawal_requests")} GROUP BY 1)
           ORDER BY day, withdrawal_type""",
      "era_deposit_comparison" ->
        s"""SELECT * FROM (
           SELECT CAST(COUNT(*) AS BIGINT) AS deposit_count,
             CAST(SUM(amount) AS BIGINT) AS total_deposited_gwei,
             CAST(COUNT(DISTINCT pubkey) AS BIGINT) AS unique_validators,
             'traditional_deposits' AS deposit_type
           FROM ${t("deposits")}
           UNION ALL
           SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(amount) AS BIGINT),
             CAST(COUNT(DISTINCT pubkey) AS BIGINT), 'deposit_requests'
           FROM ${t("deposit_requests")})
           ORDER BY deposit_type""",
      "era_attestation_participation" ->
        s"""SELECT committee_index, CAST(COUNT(*) AS BIGINT) AS attestations,
           CAST(COUNT(DISTINCT attestation_slot) AS BIGINT) AS slots_attested,
           CAST(COUNT(DISTINCT slot) AS BIGINT) AS inclusion_slots,
           ROUND(AVG(slot - attestation_slot), 4) AS avg_inclusion_delay
           FROM ${t("attestations")}
           GROUP BY committee_index ORDER BY attestations DESC, committee_index""",
      "era_exits_monthly" ->
        s"""SELECT DATE_TRUNC('month', timestamp_utc) AS month,
           CAST(COUNT(*) AS BIGINT) AS exit_count,
           CAST(COUNT(DISTINCT validator_index) AS BIGINT) AS unique_validators
           FROM ${t("voluntary_exits")} GROUP BY 1 ORDER BY month""",
      "era_sync_participation" ->
        s"""SELECT DATE_TRUNC('hour', timestamp_utc) AS hour,
           ROUND(AVG(participating_validators), 2) AS avg_participation,
           MIN(participating_validators) AS min_participation,
           MAX(participating_validators) AS max_participation,
           CAST(COUNT(*) AS BIGINT) AS total_sync_aggregates
           FROM ${t("sync_aggregates")} GROUP BY 1 ORDER BY hour""",
      "era_sync_efficiency" ->
        s"""SELECT DATE_TRUNC('day', timestamp_utc) AS day,
           ROUND(AVG(participating_validators), 2) AS avg_participation,
           ROUND(COALESCE(STDDEV_POP(participating_validators), 0.0), 4)
             AS participation_stddev,
           CAST(COUNT(*) AS BIGINT) AS sync_count
           FROM ${t("sync_aggregates")} GROUP BY 1 ORDER BY day""",
      "era_slashing_classified" ->
        s"""SELECT slot, slashing_index, att_1_committee_index,
           att_1_validator_count, att_2_validator_count, total_slashed_validators,
           CASE WHEN att_1_target_epoch = att_2_target_epoch THEN 'Double Vote'
             WHEN att_1_source_epoch < att_2_source_epoch
               AND att_1_target_epoch > att_2_target_epoch THEN 'Surround Vote'
             ELSE 'Other' END AS slashing_type
           FROM ${t("attester_slashings")} ORDER BY slot, slashing_index""",
      "era_top_slashings" ->
        s"""SELECT slot, total_slashed_validators, att_1_validator_count,
           att_2_validator_count
           FROM ${t("attester_slashings")}
           ORDER BY total_slashed_validators DESC, slot LIMIT 20""",
      "era_slashing_monthly" ->
        s"""SELECT DATE_TRUNC('month', timestamp_utc) AS month,
           CAST(COUNT(*) AS BIGINT) AS slashing_events,
           CAST(SUM(total_slashed_validators) AS BIGINT) AS total_validators_slashed,
           ROUND(AVG(total_slashed_validators), 4) AS avg_validators_per_slashing
           FROM ${t("attester_slashings")} GROUP BY 1 ORDER BY month""",
      "era_bls_top_validators" ->
        s"""SELECT validator_index, CAST(COUNT(*) AS BIGINT) AS change_count,
           STRING_AGG(to_execution_address, ',' ORDER BY to_execution_address)
             AS execution_addresses
           FROM ${t("bls_changes")} GROUP BY validator_index
           ORDER BY change_count DESC, validator_index""",
      "era_blob_patterns" ->
        s"""WITH hourly AS (SELECT DATE_TRUNC('hour', timestamp_utc) AS hour,
             CAST(COUNT(*) AS BIGINT) AS total_commitments,
             CAST(COUNT(DISTINCT slot) AS BIGINT) AS blocks_with_blobs
             FROM ${t("blob_commitments")} GROUP BY 1),
           a AS (SELECT ROUND(AVG(total_commitments), 4) AS avg_hourly_commitments
             FROM hourly)
           SELECT hour, total_commitments, blocks_with_blobs, avg_hourly_commitments
           FROM hourly CROSS JOIN a ORDER BY hour""",
      "era_blob_top_blocks" ->
        s"""SELECT slot, CAST(COUNT(*) AS BIGINT) AS commitment_count
           FROM ${t("blob_commitments")} GROUP BY slot
           ORDER BY commitment_count DESC, slot LIMIT 20""",
      // standalone oracles for the SQL-text surface queries with no
      // DataFrame twin (verbatim CLICKHOUSE.md shapes over wide_blocks /
      // the request tables)
      // era-state surface: DuckDB recomputes the latest-state argmax from
      // the RAW exported event log (insert_version DESC, recorded_at DESC,
      // writer_id DESC — the eraStatus window), then applies the documented
      // query — an independent check of the ReplacingMergeTree-FINAL
      // semantics, not a passthrough.
      "era_sql_state_status" ->
        s"""WITH latest AS (
             SELECT *, row_number() OVER (PARTITION BY network, era_number
               ORDER BY insert_version DESC, recorded_at DESC, writer_id DESC) AS rn
             FROM ${t("era_completion_log")})
           SELECT status, CAST(COUNT(*) AS BIGINT) AS era_count,
                  CAST(SUM(total_records) AS BIGINT) AS total_records
           FROM latest WHERE rn = 1 AND network = 'gnosis'
           GROUP BY status ORDER BY status""",
      "era_sql_state_recent" ->
        s"""WITH latest AS (
             SELECT *, row_number() OVER (PARTITION BY network, era_number
               ORDER BY insert_version DESC, recorded_at DESC, writer_id DESC) AS rn
             FROM ${t("era_completion_log")})
           SELECT era_number, status, total_records,
                  recorded_at AS completed_at, error_message
           FROM latest WHERE rn = 1 AND network = 'gnosis'
           ORDER BY era_number DESC""",
      "era_sql_state_failed" ->
        s"""WITH latest AS (
             SELECT *, row_number() OVER (PARTITION BY network, era_number
               ORDER BY insert_version DESC, recorded_at DESC, writer_id DESC) AS rn
             FROM ${t("era_completion_log")})
           SELECT era_number, retry_count, error_message
           FROM latest WHERE rn = 1 AND network = 'gnosis' AND status = 'failed'
           ORDER BY era_number""",
      "era_sql_state_perf" ->
        s"""SELECT CAST(date_trunc('hour', recorded_at) AS TIMESTAMP) AS hour,
           CAST(COUNT(*) AS BIGINT) AS events,
           CAST(COUNT(*) FILTER (WHERE status = 'completed') AS BIGINT) AS eras_completed,
           ROUND(AVG(retry_count), 4) AS avg_retries,
           CAST(COUNT(*) FILTER (WHERE status = 'failed') AS BIGINT) AS failed,
           CAST(SUM(total_records) AS BIGINT) AS total_rows
           FROM ${t("era_completion_log")}
           GROUP BY hour ORDER BY hour""",
      "era_sql_deposit_trends" ->
        s"""SELECT CAST(date_trunc('day', timestamp_utc) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS deposit_requests,
           CAST(SUM(amount) AS BIGINT) AS total_amount_gwei,
           CAST(COUNT(DISTINCT pubkey) AS BIGINT) AS unique_validators
           FROM ${t("deposit_requests")}
           GROUP BY day ORDER BY day""",
      "era_sql_consolidation_addresses" ->
        s"""SELECT source_address,
           CAST(COUNT(*) AS BIGINT) AS consolidation_count,
           CAST(COUNT(DISTINCT source_pubkey) AS BIGINT) AS validators_consolidated,
           CAST(COUNT(DISTINCT target_pubkey) AS BIGINT) AS target_validators,
           MIN(timestamp_utc) AS first_consolidation,
           MAX(timestamp_utc) AS last_consolidation
           FROM ${t("consolidation_requests")}
           GROUP BY source_address
           ORDER BY consolidation_count DESC, source_address
           LIMIT 20""",
      "era_sql_consolidation_efficiency" ->
        s"""SELECT source_address,
           CAST(COUNT(*) AS BIGINT) AS total_consolidations,
           CAST(COUNT(DISTINCT source_pubkey) AS BIGINT) AS source_validators,
           CAST(COUNT(DISTINCT target_pubkey) AS BIGINT) AS target_validators,
           ROUND(COUNT(DISTINCT source_pubkey) * CAST(1.0 AS DOUBLE)
                 / COUNT(DISTINCT target_pubkey), 2) AS consolidation_ratio
           FROM ${t("consolidation_requests")}
           GROUP BY source_address
           HAVING COUNT(*) >= 1
           ORDER BY consolidation_ratio DESC, source_address
           LIMIT 20""",
      "era_sql_tx_hourly" ->
        s"""WITH hourly AS (
             SELECT CAST(hour(timestamp_utc) AS BIGINT) AS hour,
                    CAST(COUNT(*) AS BIGINT) AS transaction_count
             FROM ${t("transactions")} GROUP BY hour),
           a AS (SELECT ROUND(AVG(transaction_count), 4) AS avg_hourly_txs FROM hourly)
           SELECT hour, transaction_count, avg_hourly_txs
           FROM hourly CROSS JOIN a
           ORDER BY hour""",
      "era_sql_gas_utilization" ->
        s"""SELECT b.slot,
           ep.gas_limit, ep.gas_used,
           ROUND((ep.gas_used * CAST(100.0 AS DOUBLE)) / ep.gas_limit, 2)
             AS gas_utilization_percent,
           ep.base_fee_per_gas,
           CAST(COUNT(tx.transaction_hash) AS BIGINT) AS transaction_count
           FROM ${t("blocks")} b
           JOIN ${t("execution_payloads")} ep ON b.slot = ep.slot
           LEFT JOIN ${t("transactions")} tx ON b.slot = tx.slot
           WHERE ep.gas_used > 0
           GROUP BY b.slot, ep.gas_limit, ep.gas_used, ep.base_fee_per_gas
           ORDER BY gas_utilization_percent DESC, b.slot
           LIMIT 100""",
      "era_sql_health_freshness" ->
        s"""SELECT tbl, MAX(timestamp_utc) AS latest_data,
           CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM (
             SELECT 'blocks' AS tbl, timestamp_utc FROM ${t("blocks")}
             UNION ALL SELECT 'transactions', timestamp_utc FROM ${t("transactions")}
             UNION ALL SELECT 'attestations', timestamp_utc FROM ${t("attestations")}
             UNION ALL SELECT 'withdrawals', timestamp_utc FROM ${t("withdrawals")}
             UNION ALL SELECT 'deposit_requests', timestamp_utc FROM ${t("deposit_requests")}
             UNION ALL SELECT 'withdrawal_requests', timestamp_utc FROM ${t("withdrawal_requests")}
             UNION ALL SELECT 'consolidation_requests', timestamp_utc FROM ${t("consolidation_requests")}
           ) u
           GROUP BY tbl ORDER BY tbl""",
      "era_sql_data_quality" ->
        s"""SELECT 'blocks_with_zero_timestamp' AS issue, CAST(COUNT(*) AS BIGINT) AS n
           FROM ${t("blocks")}
           WHERE timestamp_utc = TIMESTAMP '1970-01-01 00:00:00' AND slot > 0
           UNION ALL
           SELECT 'execution_payloads_without_blocks', CAST(COUNT(*) AS BIGINT)
           FROM ${t("execution_payloads")} ep LEFT JOIN ${t("blocks")} b ON ep.slot = b.slot
           WHERE b.slot IS NULL
           UNION ALL
           SELECT 'deposit_requests_with_empty_pubkey', CAST(COUNT(*) AS BIGINT)
           FROM ${t("deposit_requests")} WHERE pubkey = ''
           UNION ALL
           SELECT 'withdrawal_requests_with_zero_amount', CAST(COUNT(*) AS BIGINT)
           FROM ${t("withdrawal_requests")} WHERE amount = 0
           UNION ALL
           SELECT 'consolidation_requests_same_source_target', CAST(COUNT(*) AS BIGINT)
           FROM ${t("consolidation_requests")} WHERE source_pubkey = target_pubkey
           ORDER BY issue""",
      "era_sql_block_production" ->
        s"""SELECT proposer_index, CAST(COUNT(*) AS BIGINT) AS blocks_proposed,
           ROUND(AVG(attestation_count), 4) AS avg_attestations,
           MIN(timestamp_utc) AS first_block, MAX(timestamp_utc) AS last_block
           FROM ${t("wide_blocks")} GROUP BY proposer_index
           ORDER BY blocks_proposed DESC, proposer_index LIMIT 20""",
      "era_sql_block_timing" ->
        s"""SELECT DATE_TRUNC('hour', timestamp_utc) AS hour,
           CAST(COUNT(*) AS BIGINT) AS block_count,
           ROUND(AVG(attestation_count), 4) AS avg_attestations,
           ROUND(AVG(deposit_count), 4) AS avg_deposits
           FROM ${t("wide_blocks")} GROUP BY 1 ORDER BY hour""",
      "era_sql_withdrawal_hourly" ->
        s"""SELECT CAST(EXTRACT(hour FROM timestamp_utc) AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS withdrawal_requests,
           ROUND(AVG(amount), 2) AS avg_amount_gwei,
           CAST(COUNT(DISTINCT source_address) AS BIGINT) AS unique_addresses,
           CAST(COUNT(DISTINCT validator_pubkey) AS BIGINT) AS unique_validators
           FROM ${t("withdrawal_requests")} GROUP BY 1 ORDER BY hour""",
      "era_sql_request_mix" ->
        s"""SELECT 'deposit_requests' AS request_type,
             CAST(COUNT(*) AS BIGINT) AS total_requests,
             CAST(SUM(amount) AS BIGINT) AS total_amount_gwei,
             CAST(COUNT(DISTINCT pubkey) AS BIGINT) AS unique_keys,
             MIN(timestamp_utc) AS earliest_request,
             MAX(timestamp_utc) AS latest_request
           FROM ${t("deposit_requests")}
           UNION ALL
           SELECT 'withdrawal_requests',
             CAST(COUNT(*) AS BIGINT), CAST(SUM(amount) AS BIGINT),
             CAST(COUNT(DISTINCT validator_pubkey) AS BIGINT),
             MIN(timestamp_utc), MAX(timestamp_utc)
           FROM ${t("withdrawal_requests")}
           UNION ALL
           SELECT 'consolidation_requests',
             CAST(COUNT(*) AS BIGINT), CAST(0 AS BIGINT),
             CAST(COUNT(DISTINCT source_pubkey) AS BIGINT),
             MIN(timestamp_utc), MAX(timestamp_utc)
           FROM ${t("consolidation_requests")}
           ORDER BY total_requests DESC, request_type""")
  }

  /** The raw-SQL view surface ([[EraViews]]) runs CLICKHOUSE.md query TEXT
    * through `spark.sql` against the registered temp views; each is gated
    * with the identical oracle as its DataFrame twin — shared by
    * reference, so the two surfaces can never drift apart silently. */
  private val sqlSurfaceTwins: Map[String, String] = Map(
    "era_sql_daily_activity" -> "era_daily_activity",
    // warehouse-backed runs of the same texts: identical oracle — the
    // at-rest layout must answer exactly what the in-session decode does
    "era_sql_wh_daily_activity" -> "era_daily_activity",
    "era_sql_wh_attestation_participation" -> "era_attestation_participation",
    "era_sql_wh_exits_monthly" -> "era_exits_monthly",
    "era_sql_slot_gaps" -> "era_slot_gaps",
    "era_sql_attestation_participation" -> "era_attestation_participation",
    "era_sql_exits_monthly" -> "era_exits_monthly",
    "era_sql_tx_fee_recipients" -> "era_tx_fee_recipients",
    "era_sql_sync_participation" -> "era_sync_participation",
    "era_sql_slashing_classified" -> "era_slashing_classified",
    "era_sql_bls_top_validators" -> "era_bls_top_validators",
    "era_sql_blob_patterns" -> "era_blob_patterns")

  def oracleSqlWithViews: Map[String, String] = {
    val base = oracleSql
    base ++ sqlSurfaceTwins.map { case (sqlQ, twin) => sqlQ -> base(twin) }
  }
}
