package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.DecodedBlock
import graft.operators.Normalizer
import graft.testkit.EraFixtures

/**
 * Era-domain query corpus: the full scan→decompress→decode→explode pipeline
 * plus the documented downstream analytics surface
 * (docs/CLICKHOUSE.md:340-920 in the reference). These run on fixture-derived
 * era files (deterministic, generated from the RPC fixtures), so the driver
 * records rows-only checks — value-level correctness is pinned by
 * DecodeFixtureSpec / EraPipelineSpec against the RPC oracle.
 *
 * Scale notes: the pipeline is a narrow map (scan → decode → explode); no
 * shuffle until an aggregation. One input partition per era file ⇒ a 100 TB
 * era archive parallelizes across files. Aggregations below shuffle only
 * group keys (partial agg), windows partition by slot-derived keys except
 * the inherently-global gap analysis (flagged).
 */
object EraQueries {

  @volatile private var cachedBlocks: Dataset[DecodedBlock] = _

  /** Decoded blocks over the fixture era directory; cached across queries
    * within a session (the reference decodes once and fans out 15 tables —
    * same shape here). */
  def blocks(spark: SparkSession): Dataset[DecodedBlock] = synchronized {
    if (cachedBlocks == null || cachedBlocks.sparkSession.ne(spark)) {
      val dir = EraFixtures.ensureGenerated()
      cachedBlocks = Normalizer.decodeBlocks(spark.read.format("era").load(dir)).cache()
    }
    cachedBlocks
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    // every normalized table is directly a query (the 15-way explode is the
    // reference's core "query" — processor.py:101-399)
    val tables: Map[String, (SparkSession, String) => DataFrame] =
      Normalizer.datasetNames.map { name =>
        s"era_$name" -> ((s: SparkSession, _: String) =>
          Normalizer.dataset(blocks(s), name).orderBy("slot"))
      }.toMap

    tables ++ Map(
      // S3/A1: record stats scan (era_reader.py:135-155)
      "era_stats" -> ((s, _) => {
        val dir = EraFixtures.ensureGenerated()
        s.read.format("era").load(dir)
          .groupBy(col("record_type"))
          .agg(count(lit(1)).as("n"),
            min(when(col("record_type") === "block", col("slot"))).as("min_slot"),
            max(when(col("record_type") === "block", col("slot"))).as("max_slot"))
          .orderBy(col("record_type"))
      }),
      // wide single-file all-blocks shape (export/base.py:59-153)
      "era_wide_blocks" -> ((s, _) =>
        Normalizer.wideBlocks(blocks(s)).orderBy("slot")),
      // P1: point lookup — slot predicate prunes files before any read
      "era_point_lookup" -> ((s, _) =>
        Normalizer.blocksTable(blocks(s)).filter(col("slot") === 98300L)),
      // CLICKHOUSE.md:604-613 — attestation inclusion delay
      "era_inclusion_delay" -> ((s, _) =>
        Normalizer.attestations(blocks(s))
          .groupBy(col("committee_index"))
          .agg(round(avg(col("slot") - col("attestation_slot")), 4).as("avg_inclusion_delay"),
            count(lit(1)).as("n_attestations"))
          .orderBy(col("committee_index"))),
      // CLICKHOUSE.md:500-508 — missing-slot gap analysis (W1; global order
      // by design: the reference query is a chain-integrity check)
      "era_slot_gaps" -> ((s, _) => {
        val w = Window.orderBy(col("slot"))
        Normalizer.blocksTable(blocks(s))
          .select(col("slot"), lag(col("slot"), 1).over(w).as("prev_slot"))
          .withColumn("gap", col("slot") - coalesce(col("prev_slot"), col("slot")))
          .orderBy(col("slot"))
      }),
      // CLICKHOUSE.md:384-399 — per-fork block counts + sizes over time
      "era_fork_summary" -> ((s, _) =>
        blocks(s).toDF()
          .groupBy(col("version"))
          .agg(count(lit(1)).as("n_blocks"),
            sum(col("compressed_size")).as("total_compressed"),
            sum(col("decompressed_size")).as("total_decompressed"),
            min(col("slot")).as("min_slot"),
            max(col("slot")).as("max_slot"))
          .orderBy(col("version"))),
      // CLICKHOUSE.md:544-560 — blocks ⋈ execution_payloads ⋈ transactions
      "era_block_tx_join" -> ((s, _) => {
        val b = Normalizer.blocksTable(blocks(s)).select("slot", "proposer_index", "version")
        val p = Normalizer.executionPayloads(blocks(s))
          .select(col("slot"), col("block_number"), col("gas_used"))
        val t = Normalizer.transactions(blocks(s))
          .groupBy(col("slot")).agg(count(lit(1)).as("n_tx"))
        b.join(p, Seq("slot"))
          .join(t, Seq("slot"), "left")
          .select(col("slot"), col("proposer_index"), col("version"),
            col("block_number"), col("gas_used"), coalesce(col("n_tx"), lit(0L)).as("n_tx"))
          .orderBy(col("slot"))
      }),
      // CLICKHOUSE.md:804-815 — request tables FULL OUTER reconciliation (J3)
      "era_requests_reconciliation" -> ((s, _) => {
        val d = Normalizer.depositRequests(blocks(s))
          .groupBy(col("slot")).agg(count(lit(1)).as("n_deposit_req"))
        val w = Normalizer.withdrawalRequests(blocks(s))
          .groupBy(col("slot")).agg(count(lit(1)).as("n_withdrawal_req"))
        val c = Normalizer.consolidationRequests(blocks(s))
          .groupBy(col("slot")).agg(count(lit(1)).as("n_consolidation_req"))
        d.join(w, Seq("slot"), "full_outer").join(c, Seq("slot"), "full_outer")
          .select(col("slot"),
            coalesce(col("n_deposit_req"), lit(0L)).as("n_deposit_req"),
            coalesce(col("n_withdrawal_req"), lit(0L)).as("n_withdrawal_req"),
            coalesce(col("n_consolidation_req"), lit(0L)).as("n_consolidation_req"))
          .orderBy(col("slot"))
      }),
      // CLICKHOUSE.md:705-706 — JSON array extraction + containment over
      // attester_slashings (from_json + array_contains)
      "era_slashed_validator_search" -> ((s, _) =>
        Normalizer.attesterSlashings(blocks(s))
          .withColumn("indices_1",
            from_json(col("att_1_attesting_indices"), lit("array<bigint>")))
          .select(col("slot"), col("slashing_index"),
            array_contains(col("indices_1"), 0L).as("has_validator_0"),
            size(col("indices_1")).cast("long").as("n1"))
          .orderBy(col("slot"), col("slashing_index"))),
      // time-bucketed activity (toStartOfDay ladder, CLICKHOUSE.md:386-424)
      "era_daily_activity" -> ((s, _) =>
        Normalizer.blocksTable(blocks(s))
          .groupBy(date_trunc("day", col("timestamp_utc")).as("day"))
          .agg(count(lit(1)).as("n_blocks"),
            countDistinct(col("proposer_index")).as("n_proposers"))
          .orderBy(col("day")))
    )
  }
}
