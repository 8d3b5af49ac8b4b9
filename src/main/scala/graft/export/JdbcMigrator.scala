package graft.export

import java.sql.DriverManager

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType, StringType, TimestampType}

import graft.model.DecodedBlock
import graft.operators.Normalizer

/**
 * Versioned JDBC schema bootstrap — the analogue of the reference's
 * ClickHouse migration layer (`migrations/migration_manager.py:71-113`,
 * `commands/migrate.py`, `migrations/sql/001/002_*_up.sql`): a user
 * pointing `--export-jdbc` at a fresh database gets every table created by
 * `graft --migrate <url> run` instead of by hand.
 *
 *  - `schema_migrations` tracking table: (version, name, applied_at,
 *    checksum), exactly the reference's columns;
 *  - migration 001 `initial_tables`: the 15 normalized dataset tables.
 *    The DDL is not hand-written — each table is created by an empty
 *    DataFrame carrying the Normalizer's own output schema, so the sink
 *    schema can never drift from the engine (the reference maintains the
 *    same 15 CREATE TABLEs by hand in SQL);
 *  - migration 002 `state_tracking`: `era_completion` (the state log,
 *    array column flattened for portable JDBC) and the `era_status`
 *    latest-state VIEW (correlated max-version subquery — the portable
 *    form of the reference's argMax view, 002_performance_optimizations
 *    _up.sql:20-38).
 *
 * Engine-specifics (ReplacingMergeTree, PARTITION BY, MATERIALIZED
 * insert_version) are ClickHouse luxuries with no generic-JDBC analogue;
 * idempotent upsert semantics live in [[Sinks.jdbcSink]]'s staged promote
 * instead.
 */
class JdbcMigrator(spark: SparkSession, url: String,
    properties: Map[String, String] = Map.empty) {

  import spark.implicits._

  private val props = {
    val p = new java.util.Properties()
    properties.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  private val MigrationTable = "schema_migrations"

  private val migrationTableSchema = StructType(Seq(
    StructField("version", StringType),
    StructField("name", StringType),
    StructField("applied_at", TimestampType),
    StructField("checksum", StringType)))

  /** Create a table from a code-derived schema by appending zero rows —
    * Spark's dialect mapping does the DDL; existing tables are untouched. */
  private def createFromSchema(table: String, schema: StructType,
      columnTypes: Option[String] = None): Unit = {
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    val w = empty.write.mode("append")
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, table, props)
  }

  private def datasetSchemas: Seq[(String, StructType)] = {
    val empty = spark.emptyDataset[DecodedBlock]
    Normalizer.datasetNames.sorted.map(n => n -> Normalizer.dataset(empty, n).schema)
  }

  // VARCHAR overrides so the era_status view can compare/filter these
  // columns (Derby maps plain STRING to CLOB, which is not comparable)
  private val eraCompletionTypes =
    "network VARCHAR(64), status VARCHAR(32), error_message VARCHAR(600), " +
      "datasets_processed VARCHAR(4000), writer_id VARCHAR(64)"

  private def execDdl(sql: String,
      tolerate: java.sql.SQLException => Boolean = _ => false): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql)
      catch {
        case e: java.sql.SQLException if tolerate(e) => ()
      } finally st.close()
    } finally conn.close()
  }

  private def isAlreadyExists(e: java.sql.SQLException): Boolean =
    JdbcMigrator.isAlreadyExists(e)

  /** Full latest-state view, mirroring EraStateManager.eraStatus's complete
    * ordering (insert_version desc, recorded_at desc, writer_id desc) as
    * nested correlated MAXes — Derby has neither PARTITION BY windows nor
    * row-value comparison, so each tie-break level filters within the
    * previous level's winners. Without the extra levels, same-version ties
    * (two writers racing an era) emit multiple rows per (network, era) and
    * diverge from the Parquet-side latest-state view. Installed by
    * migration 003 (replacing 002's single-level view — migrations are
    * append-only, so the fix is a new version, not an edit: a database that
    * recorded 002 before the tie-break existed still converges).
    *
    * Known limit: on a FULL tie — same insert_version, recorded_at AND
    * writer_id, i.e. one writer appending the identical row twice — the
    * view emits both rows, where the Parquet-side row_number picks one
    * arbitrarily. writer_id is the unique per-writer discriminator, so a
    * full tie means a duplicate append of the same record; consumers that
    * must be robust to that should collapse with GROUP BY (network,
    * era_number). */
  private[export] val eraStatusViewDdl: String =
    """CREATE VIEW era_status AS
      |SELECT * FROM era_completion ec
      |WHERE ec."insert_version" = (
      |  SELECT MAX(e2."insert_version") FROM era_completion e2
      |  WHERE e2."network" = ec."network"
      |    AND e2."era_number" = ec."era_number")
      |AND (ec."recorded_at" = (
      |  SELECT MAX(e3."recorded_at") FROM era_completion e3
      |  WHERE e3."network" = ec."network"
      |    AND e3."era_number" = ec."era_number"
      |    AND e3."insert_version" = ec."insert_version")
      | OR (ec."recorded_at" IS NULL AND (
      |  SELECT MAX(e3."recorded_at") FROM era_completion e3
      |  WHERE e3."network" = ec."network"
      |    AND e3."era_number" = ec."era_number"
      |    AND e3."insert_version" = ec."insert_version") IS NULL))
      |AND (ec."writer_id" = (
      |  SELECT MAX(e4."writer_id") FROM era_completion e4
      |  WHERE e4."network" = ec."network"
      |    AND e4."era_number" = ec."era_number"
      |    AND e4."insert_version" = ec."insert_version"
      |    AND (e4."recorded_at" = ec."recorded_at"
      |         OR (e4."recorded_at" IS NULL AND ec."recorded_at" IS NULL)))
      | OR (ec."writer_id" IS NULL AND (
      |  SELECT MAX(e4."writer_id") FROM era_completion e4
      |  WHERE e4."network" = ec."network"
      |    AND e4."era_number" = ec."era_number"
      |    AND e4."insert_version" = ec."insert_version"
      |    AND (e4."recorded_at" = ec."recorded_at"
      |         OR (e4."recorded_at" IS NULL AND ec."recorded_at" IS NULL))) IS NULL))""".stripMargin

  /** 002's era_status view as originally shipped (one home: the action
    * executes it and checksumOf fingerprints it). */
  private val eraStatus002ViewDdl: String =
    """CREATE VIEW era_status AS
      |SELECT * FROM era_completion ec
      |WHERE ec."insert_version" = (
      |  SELECT MAX(e2."insert_version") FROM era_completion e2
      |  WHERE e2."network" = ec."network"
      |    AND e2."era_number" = ec."era_number")""".stripMargin

  /** (version, name, action) — ordered; mirror of get_available_migrations.
    * APPEND-ONLY: never edit an entry that has shipped — a database that
    * already recorded the version keeps its old objects and silently
    * diverges. Behavior changes go in a new version (003 is the example). */
  val migrations: Seq[(String, String, () => Unit)] = Seq(
    ("001", "001_initial_tables", () =>
      datasetSchemas.foreach { case (table, schema) => createFromSchema(table, schema) }),
    ("002", "002_state_tracking", () => {
      createFromSchema("era_completion", EraStateManager.jdbcLogSchema,
        Some(eraCompletionTypes))
      // 002 as originally shipped: latest insert_version only. Same-version
      // ties are resolved by 003's replacement view.
      execDdl(eraStatus002ViewDdl, tolerate = isAlreadyExists)
    }),
    ("003", "003_era_status_tiebreak", () => {
      // replace whatever era_status the database carries (002's
      // single-level view, or none on a partially bootstrapped schema)
      execDdl("DROP VIEW era_status", tolerate = JdbcMigrator.isMissing)
      execDdl(eraStatusViewDdl)
    }))

  /** Deterministic content fingerprint for the tracking row: md5 over the
    * created tables' code-derived DDL. */
  private def checksumOf(version: String): String = {
    val ddl = version match {
      case "001" => datasetSchemas.map { case (n, s) => s"$n:${s.toDDL}" }.mkString(";")
      // fingerprint EVERYTHING 002 creates — omitting the view DDL would
      // blind the drift detection the checksum column exists for
      case "002" => s"era_completion:${EraStateManager.jdbcLogSchema.toDDL};" +
        s"era_status:$eraStatus002ViewDdl"
      case "003" => s"era_status:$eraStatusViewDdl"
      case _ => ""
    }
    java.security.MessageDigest.getInstance("MD5").digest(ddl.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }

  def ensureMigrationTable(): Unit =
    createFromSchema(MigrationTable, migrationTableSchema,
      Some("version VARCHAR(16), name VARCHAR(128), checksum VARCHAR(64)"))

  /** Applied migration versions, sorted (empty if the table is absent).
    * Only a missing-table error maps to "nothing applied" — a connection
    * or auth failure must propagate, otherwise run() would re-apply
    * migrations and duplicate tracking rows on a transient outage. */
  def appliedVersions(): Seq[String] = {
    // prove CONNECTIVITY before interpreting any error message: Derby's
    // "Database 'x' not found" and Postgres's "database does not exist"
    // are CONNECT-time failures whose text matches the missing-TABLE
    // heuristic below — without this probe they'd read as "nothing
    // applied" and run() would re-apply everything against a database
    // that was never reached
    val probe = java.sql.DriverManager.getConnection(url, props)
    probe.close()
    try spark.read.jdbc(url, MigrationTable, props)
      .select("version").collect().map(_.getString(0)).toSeq.sorted
    catch {
      case e: Exception if {
        val m = String.valueOf(e.getMessage).toLowerCase
        m.contains("not exist") || m.contains("not found") || m.contains("doesn't exist")
      } => Nil
    }
  }

  /** Run pending migrations (optionally only up to `target`); returns the
    * versions applied this call. Mirrors run_migrations. */
  def run(target: Option[String] = None): Seq[String] = {
    ensureMigrationTable()
    val applied = appliedVersions().toSet
    val pending = migrations
      .filter { case (v, _, _) => target.forall(v <= _) }
      .filterNot { case (v, _, _) => applied(v) }
    pending.foreach { case (version, name, action) =>
      action()
      Seq((version, name, checksumOf(version)))
        .toDF("version", "name", "checksum")
        .withColumn("applied_at", org.apache.spark.sql.functions.current_timestamp())
        .select("version", "name", "applied_at", "checksum")
        .write.mode("append").jdbc(url, MigrationTable, props)
    }
    pending.map(_._1)
  }

  /** (applied, available, pending, lastApplied) — mirror of
    * get_migration_status. */
  def status(): (Seq[String], Seq[String], Seq[String], Option[String]) = {
    val applied = appliedVersions()
    val available = migrations.map(_._1)
    val pending = available.filterNot(applied.toSet)
    (applied, available, pending, applied.lastOption)
  }
}

object JdbcMigrator {

  /** True only for genuine already-exists collisions. The bare substring
    * "exist" also matches "does not exist", which would silently swallow a
    * broken view definition (e.g. era_status referencing a table whose
    * CREATE failed) and record the migration as applied with no view.
    * Prefer the dialect's SQLState (Derby X0Y32 schema-object-exists,
    * X0Y68 view/alias-exists; SQL-standard duplicate states 42P07
    * Postgres / 42S01 MySQL), fall back to the phrase "already exist". */
  private[graft] def isAlreadyExists(e: java.sql.SQLException): Boolean = {
    val state = Option(e.getSQLState).getOrElse("")
    state == "X0Y32" || state == "X0Y68" || state == "42P07" || state == "42S01" ||
      Option(e.getMessage).exists(_.toLowerCase.contains("already exist"))
  }

  /** True for missing-object errors (the DROP-if-exists tolerance — Derby
    * has no DROP VIEW IF EXISTS). Derby X0X05/42X05 table-or-view-not-found,
    * SQL-standard undefined-table states 42P01 Postgres / 42S02 MySQL;
    * message fallback excludes "already exists" by construction. */
  private[graft] def isMissing(e: java.sql.SQLException): Boolean = {
    val state = Option(e.getSQLState).getOrElse("")
    state == "X0X05" || state == "42X05" || state == "42P01" || state == "42S02" ||
      Option(e.getMessage).exists { m =>
        val lm = m.toLowerCase
        lm.contains("does not exist") || lm.contains("not found")
      }
  }
}
