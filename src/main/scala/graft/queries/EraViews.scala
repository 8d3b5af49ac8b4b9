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

  /** The SQL-text query corpus: each runs through `spark.sql` against the
    * registered views and carries the same oracle as its DataFrame twin. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "era_sql_daily_activity" -> ((s, _) => sql(s, DailyActivitySql)),
    "era_sql_slot_gaps" -> ((s, _) => sql(s, SlotGapsSql)),
    "era_sql_attestation_participation" ->
      ((s, _) => sql(s, AttestationParticipationSql)),
    "era_sql_exits_monthly" -> ((s, _) => sql(s, ExitsMonthlySql)),
    "era_sql_tx_fee_recipients" -> ((s, _) => sql(s, TxFeeRecipientsSql)))
}
