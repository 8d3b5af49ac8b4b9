package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.DecodedBlock
import graft.operators.Normalizer

/**
 * Raw-SQL surface over the era-domain tables — the missing half of the
 * reference's user contract: its entire downstream query corpus is
 * documented as SQL the user pastes against the exported tables
 * (docs/CLICKHOUSE.md:340-920), so an engine swap has to let that SQL run
 * (near-)verbatim, not only through a Scala query map.
 *
 * [[register]] exposes every normalized child table
 * ([[Normalizer.datasetNames]]: blocks, attestations, transactions, …)
 * plus the wide single-file shape as TEMP VIEWS, after which
 * `spark.sql("SELECT … FROM attestations …")` works directly. Views are
 * lazy plans over the one shared decode — registering costs nothing until
 * a query runs, and every SQL query hits the same cached decode the
 * DataFrame corpus uses (no second scan).
 *
 * The `era_sql_*` queries below are CLICKHOUSE.md queries translated to
 * Spark SQL TEXT (ClickHouse's `toStartOfDay`/`count()` become ANSI
 * `date_trunc`/`count(*)`; the rolling `now() − INTERVAL` guards are
 * dropped because the fixture corpus is historical) and executed through
 * `spark.sql` against these views. Each is oracle-gated with the SAME
 * DuckDB SQL as its DataFrame twin in [[EraQueries]], and
 * `EraViewsSpec` asserts text-vs-DataFrame result equality row-for-row.
 */
object EraViews {

  /** View name for the wide single-file export shape. */
  val WideBlocksView = "wide_blocks"

  /** Register all era tables as temp views over an arbitrary decoded-block
    * dataset — the production entry (point it at any era directory's
    * decode). */
  def register(spark: SparkSession, blocks: Dataset[DecodedBlock]): Unit = {
    Normalizer.datasetNames.foreach { name =>
      Normalizer.dataset(blocks, name).createOrReplaceTempView(name)
    }
    Normalizer.wideBlocks(blocks).createOrReplaceTempView(WideBlocksView)
  }

  /** Fixture-backed registration (the harness/test entry): views over the
    * same cached decode every era query shares. */
  def register(spark: SparkSession): Unit =
    register(spark, EraQueries.blocks(spark))

  private def sql(s: SparkSession, text: String): DataFrame = {
    register(s)
    s.sql(text)
  }

  /** CLICKHOUSE.md:386-399 — daily activity (toStartOfDay → date_trunc). */
  val DailyActivitySql: String =
    """SELECT date_trunc('day', timestamp_utc) AS day,
      |       count(*) AS n_blocks,
      |       count(DISTINCT proposer_index) AS n_proposers
      |FROM blocks
      |GROUP BY day
      |ORDER BY day""".stripMargin

  /** CLICKHOUSE.md:500-508 — missing-slot analysis, verbatim global-lag
    * form. NOTE the documented SQL is the inherently-global window (one
    * partition); [[EraQueries]]'s `era_slot_gaps` is the scale-safe
    * per-era restatement — both produce the same gaps, and the spec
    * checks them against each other. */
  val SlotGapsSql: String =
    """SELECT slot,
      |       lag(slot) OVER (ORDER BY slot) AS prev_slot,
      |       slot - coalesce(lag(slot) OVER (ORDER BY slot), slot) AS gap
      |FROM blocks
      |ORDER BY slot""".stripMargin

  /** CLICKHOUSE.md:604-613 — attestation participation per committee. */
  val AttestationParticipationSql: String =
    """SELECT committee_index,
      |       count(*) AS attestations,
      |       count(DISTINCT attestation_slot) AS slots_attested,
      |       count(DISTINCT slot) AS inclusion_slots,
      |       round(avg(slot - attestation_slot), 4) AS avg_inclusion_delay
      |FROM attestations
      |GROUP BY committee_index
      |ORDER BY attestations DESC, committee_index""".stripMargin

  /** CLICKHOUSE.md:616-624 — voluntary exits by month. */
  val ExitsMonthlySql: String =
    """SELECT date_trunc('month', timestamp_utc) AS month,
      |       count(*) AS exit_count,
      |       count(DISTINCT validator_index) AS unique_validators
      |FROM voluntary_exits
      |GROUP BY month
      |ORDER BY month""".stripMargin

  /** CLICKHOUSE.md:512-524 — tx volume by fee recipient with global share
    * (the scalar subquery denominator, verbatim shape). */
  val TxFeeRecipientsSql: String =
    """SELECT fee_recipient,
      |       count(*) AS transactions,
      |       round(avg(gas_limit), 2) AS avg_gas_limit,
      |       round(avg(gas_used), 2) AS avg_gas_used,
      |       round(count(*) * cast(100.0 AS DOUBLE) / (SELECT count(*) FROM transactions), 4) AS percentage
      |FROM transactions
      |GROUP BY fee_recipient
      |ORDER BY transactions DESC, fee_recipient
      |LIMIT 20""".stripMargin

  /** CLICKHOUSE.md:628-638 — sync committee participation by hour
    * (toStartOfHour → date_trunc). */
  val SyncParticipationSql: String =
    """SELECT date_trunc('hour', timestamp_utc) AS hour,
      |       round(avg(participating_validators), 2) AS avg_participation,
      |       min(participating_validators) AS min_participation,
      |       max(participating_validators) AS max_participation,
      |       count(*) AS total_sync_aggregates
      |FROM sync_aggregates
      |GROUP BY hour
      |ORDER BY hour""".stripMargin

  /** CLICKHOUSE.md:666-685 — attester-slashing classification (double vs
    * surround vote), the documented CASE verbatim; ordered by the table
    * key instead of `timestamp_utc DESC` so the result is deterministic
    * under slot-timestamp ties (the twin's column set). */
  val SlashingClassifiedSql: String =
    """SELECT slot, slashing_index, att_1_committee_index,
      |       att_1_validator_count, att_2_validator_count,
      |       total_slashed_validators,
      |       CASE
      |         WHEN att_1_target_epoch = att_2_target_epoch THEN 'Double Vote'
      |         WHEN att_1_source_epoch < att_2_source_epoch
      |          AND att_1_target_epoch > att_2_target_epoch THEN 'Surround Vote'
      |         ELSE 'Other'
      |       END AS slashing_type
      |FROM attester_slashings
      |ORDER BY slot, slashing_index""".stripMargin

  /** CLICKHOUSE.md:733-745 — repeat BLS changers (groupArray →
    * sort_array+array_join for a deterministic address list). */
  val BlsTopValidatorsSql: String =
    """SELECT validator_index,
      |       count(*) AS change_count,
      |       array_join(sort_array(collect_list(to_execution_address)), ',')
      |         AS execution_addresses
      |FROM bls_changes
      |GROUP BY validator_index
      |ORDER BY change_count DESC, validator_index""".stripMargin

  /** CLICKHOUSE.md:749-760 — blob commitment patterns. The documented
    * `avg(count()) OVER ()` is an all-rows window (one partition); the
    * scale-safe restatement is a scalar aggregate over the hourly frame
    * cross-joined back — identical values, no single-partition Exchange
    * (same shape as the `era_blob_patterns` DataFrame twin). */
  val BlobPatternsSql: String =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', timestamp_utc) AS hour,
      |         count(*) AS total_commitments,
      |         count(DISTINCT slot) AS blocks_with_blobs
      |  FROM blob_commitments
      |  GROUP BY hour),
      |a AS (SELECT round(avg(total_commitments), 4) AS avg_hourly_commitments
      |      FROM hourly)
      |SELECT hour, total_commitments, blocks_with_blobs, avg_hourly_commitments
      |FROM hourly CROSS JOIN a
      |ORDER BY hour""".stripMargin

  /** CLICKHOUSE.md:477-487 — block production statistics, verbatim over
    * `wide_blocks` (the child-count columns live on the wide shape; the
    * reference's `blocks` table carries them inline). Deterministic
    * proposer tie-break added to the documented ORDER BY. */
  val BlockProductionSql: String =
    """SELECT proposer_index,
      |       count(*) AS blocks_proposed,
      |       round(avg(attestation_count), 4) AS avg_attestations,
      |       min(timestamp_utc) AS first_block,
      |       max(timestamp_utc) AS last_block
      |FROM wide_blocks
      |GROUP BY proposer_index
      |ORDER BY blocks_proposed DESC, proposer_index
      |LIMIT 20""".stripMargin

  /** CLICKHOUSE.md:489-498 — block timing analysis by hour. */
  val BlockTimingSql: String =
    """SELECT date_trunc('hour', timestamp_utc) AS hour,
      |       count(*) AS block_count,
      |       round(avg(attestation_count), 4) AS avg_attestations,
      |       round(avg(deposit_count), 4) AS avg_deposits
      |FROM wide_blocks
      |GROUP BY hour
      |ORDER BY hour""".stripMargin

  /** CLICKHOUSE.md:410-420 — withdrawal request patterns by hour of day
    * (toHour → hour()). */
  val WithdrawalHourlySql: String =
    """SELECT cast(hour(timestamp_utc) AS BIGINT) AS hour,
      |       count(*) AS withdrawal_requests,
      |       round(avg(amount), 2) AS avg_amount_gwei,
      |       count(DISTINCT source_address) AS unique_addresses,
      |       count(DISTINCT validator_pubkey) AS unique_validators
      |FROM withdrawal_requests
      |GROUP BY hour
      |ORDER BY hour""".stripMargin

  /** CLICKHOUSE.md:422-459 — cross-request-type analysis, the three-way
    * UNION ALL verbatim (consolidations carry no amount → literal 0);
    * request_type tie-break added for a deterministic order. */
  val RequestMixSql: String =
    """SELECT 'deposit_requests' AS request_type,
      |       count(*) AS total_requests,
      |       sum(amount) AS total_amount_gwei,
      |       count(DISTINCT pubkey) AS unique_keys,
      |       min(timestamp_utc) AS earliest_request,
      |       max(timestamp_utc) AS latest_request
      |FROM deposit_requests
      |UNION ALL
      |SELECT 'withdrawal_requests' AS request_type,
      |       count(*) AS total_requests,
      |       sum(amount) AS total_amount_gwei,
      |       count(DISTINCT validator_pubkey) AS unique_keys,
      |       min(timestamp_utc) AS earliest_request,
      |       max(timestamp_utc) AS latest_request
      |FROM withdrawal_requests
      |UNION ALL
      |SELECT 'consolidation_requests' AS request_type,
      |       count(*) AS total_requests,
      |       cast(0 AS BIGINT) AS total_amount_gwei,
      |       count(DISTINCT source_pubkey) AS unique_keys,
      |       min(timestamp_utc) AS earliest_request,
      |       max(timestamp_utc) AS latest_request
      |FROM consolidation_requests
      |ORDER BY total_requests DESC, request_type""".stripMargin

  /** The SQL-text query corpus: each runs through `spark.sql` against the
    * registered views and carries the same oracle as its DataFrame twin. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "era_sql_daily_activity" -> ((s, _) => sql(s, DailyActivitySql)),
    "era_sql_slot_gaps" -> ((s, _) => sql(s, SlotGapsSql)),
    "era_sql_attestation_participation" ->
      ((s, _) => sql(s, AttestationParticipationSql)),
    "era_sql_exits_monthly" -> ((s, _) => sql(s, ExitsMonthlySql)),
    "era_sql_tx_fee_recipients" -> ((s, _) => sql(s, TxFeeRecipientsSql)),
    "era_sql_sync_participation" -> ((s, _) => sql(s, SyncParticipationSql)),
    "era_sql_slashing_classified" -> ((s, _) => sql(s, SlashingClassifiedSql)),
    "era_sql_bls_top_validators" -> ((s, _) => sql(s, BlsTopValidatorsSql)),
    "era_sql_blob_patterns" -> ((s, _) => sql(s, BlobPatternsSql)),
    "era_sql_block_production" -> ((s, _) => sql(s, BlockProductionSql)),
    "era_sql_block_timing" -> ((s, _) => sql(s, BlockTimingSql)),
    "era_sql_withdrawal_hourly" -> ((s, _) => sql(s, WithdrawalHourlySql)),
    "era_sql_request_mix" -> ((s, _) => sql(s, RequestMixSql)))
}
