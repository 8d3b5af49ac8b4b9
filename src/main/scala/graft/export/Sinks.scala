package graft.export

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/**
 * Multi-format sink layer (SURVEY.md §2.1 S11–S16), mirroring the
 * reference's export surface (the `era_parser/export` package,
 * `core/output_manager.py:21-42`) with Spark-native writers:
 *
 *  - JSON/JSONL  → `df.write.json` (native JSONL; the reference's metadata
 *    envelope becomes a `_era_metadata.json` sidecar so the write itself
 *    stays distributed — a whole-array JSON file with an inline header
 *    cannot be written in parallel)
 *  - CSV         → `df.write.csv(header=true)` (the reference's `#` comment
 *    preamble also moves to the sidecar: commented preambles break most
 *    CSV readers anyway)
 *  - Parquet     → `df.write.parquet` + sidecar for the reference's
 *    pyarrow KV metadata (parquet_exporter.py:31-69)
 *  - ClickHouse  → JDBC batch writer, batch 100k + retry ×3 w/ exponential
 *    backoff (clickhouse_service.py:17,135-162)
 *
 * Each output `<name>.<ext>` is a directory of part files — the
 * distributed-native shape. At 100 TB one file per sink is a non-goal;
 * downstream consumers read the directory. `singleFile = true` coalesces
 * to 1 partition for small-parity exports.
 */
object Sinks {

  /** `<base>_era_<00000>.<ext>` (output_manager.py:21-42). */
  def eraOutputFilename(baseOutput: String, eraNumber: Int): String = {
    val (stem, ext) = splitExt(baseOutput)
    f"${stem}_era_$eraNumber%05d$ext"
  }

  /** `<base>_<dataset>.<ext>` (parquet_exporter.py:71-103). */
  def datasetFilename(baseOutput: String, dataset: String): String = {
    val (stem, ext) = splitExt(baseOutput)
    s"${stem}_$dataset$ext"
  }

  private def splitExt(path: String): (String, String) = {
    val i = path.lastIndexOf('.')
    val slash = path.lastIndexOf('/')
    if (i > slash) (path.substring(0, i), path.substring(i)) else (path, ".parquet")
  }

  private def formatOf(path: String): String = splitExt(path)._2 match {
    case ".json" | ".jsonl" => "json"
    case ".csv" => "csv"
    case _ => "parquet"
  }

  /** Write one DataFrame in the format implied by the extension. Returns
    * the row count (also written to the sidecar). For parquet the count
    * comes from the written footers (metadata-only read) so the data is
    * computed exactly once; csv/json cache the frame across the write +
    * count pair, so the sidecar count always agrees with the data actually
    * written (a nondeterministic frame recomputed for a separate count
    * could drift) and the computation isn't paid twice. */
  def write(df: DataFrame, path: String, singleFile: Boolean = false,
      metadata: Map[String, String] = Map.empty): Long = {
    val out = if (singleFile) df.coalesce(1) else df
    def writeCached(doWrite: DataFrame => Unit): Long = {
      val cached = out.persist()
      try { doWrite(cached); cached.count() }
      finally cached.unpersist()
    }
    val n = formatOf(path) match {
      case "json" =>
        writeCached(_.write.mode("overwrite").json(path))
      case "csv" =>
        writeCached(_.write.mode("overwrite").option("header", "true").csv(path))
      case _ =>
        out.write.mode("overwrite").parquet(path)
        df.sparkSession.read.parquet(path).count() // footer-only
    }
    if (metadata.nonEmpty) writeMetadataSidecar(path, metadata + ("rows" -> n.toString))
    n
  }

  /** The at-rest layout for the 15-table warehouse at archive scale:
    * parquet partitioned by `era_number`, one directory per era. Era is
    * the natural unit — the ETL writes whole eras atomically (resume /
    * replay is per-era, [[EraStateManager]]), and every slot- or
    * era-ranged query prunes to its directories BEFORE any file is opened
    * (`spark.read.parquet(path).filter(era_number === n)` lists only that
    * partition — pruning-tested in `ExportStateSpec`). A 100k-era archive
    * is 100k directories per table; a point query opens one. */
  def writePartitionedByEra(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("era_number").parquet(path)

  /** The INCREMENTAL write into the same layout: overwrite ONLY the era
    * partitions present in `df`, leaving every other era's directories
    * untouched (`partitionOverwriteMode=dynamic`, set per-write so the
    * session default stays static). This is what makes the per-era loop's
    * re-processing idempotent at the warehouse: a crashed era's retry
    * replaces exactly its own partition, and completed eras' files are
    * never rewritten — [[IncrementalExporter.runWarehouse]]'s
    * exactly-once mechanism, spec-pinned by `WarehouseResumeSpec`. */
  def overwriteEraPartitions(df: DataFrame, path: String,
      maxRecordsPerFile: Long = 0L): Unit = {
    val w = df.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
    // output-file sizing (guide §6): cap records per file when the caller
    // has a measured bytes/row to derive the cap from — at production
    // scale one era of a hot table is multi-GB and the stage's task count
    // (not file-size policy) otherwise decides output file sizes
    (if (maxRecordsPerFile > 0) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w)
      .partitionBy("era_number").parquet(path)
  }

  /** Target output-file size for the warehouse loop (guide §6: aim for
    * 128 MB–1 GB parquet files). Overridable for tests and deployments via
    * SPARK_GRAFT_WH_TARGET_FILE_MB. */
  def whTargetFileBytes: Long =
    sys.env.get("SPARK_GRAFT_WH_TARGET_FILE_MB")
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .map(_ * 1024L * 1024L)
      .getOrElse(512L * 1024L * 1024L)

  /** S11/S13 exact-parity single-file export: the reference's INLINE
    * metadata envelope — JSONL metadata as the first line
    * (json_exporter.py:31-41) or a CSV `#` comment preamble
    * (csv_exporter.py:30-45) — followed by the data. Opt-in (`--parity`)
    * because an inline header forces one file: the distributed default
    * keeps the envelope in a sidecar so the write itself parallelizes.
    * Returns the row count. */
  def writeWithEnvelope(df: DataFrame, path: String, dataType: String,
      eraInfo: Map[String, String] = Map.empty): Long = {
    val fmt = formatOf(path)
    require(fmt == "json" || fmt == "csv", s"envelope parity applies to csv/json, not $fmt")
    val tmp = s"$path.__parts"
    val cached = df.coalesce(1).persist()
    val n =
      try {
        if (fmt == "json") cached.write.mode("overwrite").json(tmp)
        else cached.write.mode("overwrite").option("header", "true").csv(tmp)
        cached.count()
      } finally cached.unpersist()
    val listing = Files.list(Paths.get(tmp))
    val part =
      try listing.iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      finally listing.close()
    val ts = java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME)
    val envelope =
      if (fmt == "json") {
        val eraJson = eraInfo.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }.mkString("{", ", ", "}")
        s"""{"era_info": $eraJson, "data_type": "${esc(dataType)}", "record_count": $n, "export_timestamp": "$ts", "type": "metadata"}\n"""
      } else {
        val era = eraInfo.getOrElse("era_number", "?")
        val slots = (eraInfo.get("start_slot"), eraInfo.get("end_slot")) match {
          case (Some(a), Some(b)) => s"# Slots: $a - $b\n"
          case _ => ""
        }
        s"# Era $era: $dataType data\n" + slots +
          s"# Network: ${eraInfo.getOrElse("network", "?")}\n" +
          s"# Export timestamp: $ts\n# Total records: $n\n"
      }
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val out = Files.newOutputStream(target,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try {
      out.write(envelope.getBytes("UTF-8"))
      Files.copy(part, out)
    } finally out.close()
    // drop the temp part dir
    val walk = Files.walk(Paths.get(tmp))
    try walk.sorted(java.util.Comparator.reverseOrder()).forEach(f => Files.delete(f))
    finally walk.close()
    n
  }

  /** True iff `path`'s extension routes to a format that supports the
    * inline `--parity` envelope (csv/json). */
  def supportsEnvelope(path: String): Boolean = {
    val f = formatOf(path); f == "json" || f == "csv"
  }

  /** The reference's per-file KV metadata (era number, network, slot range
    * — parquet_exporter.py:40-55) as a JSON sidecar inside the output dir. */
  private def writeMetadataSidecar(path: String, meta: Map[String, String]): Unit = {
    val json = meta.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    Files.write(Paths.get(path, "_era_metadata.json"), json.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** S16: one output per dataset + SUMMARY.txt
    * (parquet_exporter.py:71-103, csv_exporter.py:47-76). */
  def exportSeparateFiles(
      datasets: Map[String, DataFrame],
      baseOutput: String,
      metadata: Map[String, String] = Map.empty,
      singleFile: Boolean = false): Map[String, Long] =
    exportSeparateFilesTimed(datasets, baseOutput, metadata, singleFile,
      parallelism = 1).map { case (n, (rows, _)) => n -> rows }

  /** The fan-out with CONCURRENT table writes plus per-table wall time.
    *
    * The 15 child tables are independent jobs over one shared (cached)
    * decode, and most of them are tiny — sequentially each pays full
    * job-scheduling + file-commit latency while 31 cores idle. Submitting
    * the writes from a bounded thread pool lets the scheduler overlap
    * them (multi-thread job submission is the supported Spark pattern for
    * exactly this fan-out shape), which is where the ETL path's wall
    * clock actually goes at bench scale — the per-table seconds this
    * returns are the evidence. Output contents are byte-identical to the
    * sequential path (disjoint output dirs, same per-table plans);
    * `ExportParallelSpec` pins that equivalence. */
  def exportSeparateFilesTimed(
      datasets: Map[String, DataFrame],
      baseOutput: String,
      metadata: Map[String, String] = Map.empty,
      singleFile: Boolean = false,
      parallelism: Int = 8): Map[String, (Long, Double)] = {
    val entries = datasets.toSeq.sortBy(_._1)
    val timed: Seq[(String, (Long, Double))] =
      if (parallelism <= 1)
        entries.map { case (name, df) =>
          val t0 = System.nanoTime()
          val rows = write(df, datasetFilename(baseOutput, name), singleFile, metadata)
          name -> (rows, (System.nanoTime() - t0) / 1e9)
        }
      else {
        val spark = entries.head._2.sparkSession
        val results = runQuiescent(spark, parallelism, entries.map {
          case (name, df) => () => {
            val t0 = System.nanoTime()
            val rows =
              write(df, datasetFilename(baseOutput, name), singleFile, metadata)
            (rows, (System.nanoTime() - t0) / 1e9)
          }
        })
        entries.map(_._1).zip(results)
      }
    val (stem, _) = splitExt(baseOutput)
    val summary = timed.map { case (n, (c, _)) => s"$n: $c records" }
      .mkString("", "\n", "\n")
    val summaryPath = Paths.get(s"${stem}_SUMMARY.txt")
    if (summaryPath.getParent != null) Files.createDirectories(summaryPath.getParent)
    Files.write(summaryPath, summary.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    timed.toMap
  }

  /** Run `tasks` on a bounded pool and return their results in task order;
    * on the FIRST failure make the fan-out quiescent before rethrowing.
    * Interrupting a submitter thread only unblocks its job await — the
    * already-launched Spark job keeps running and emitting files — so
    * every task runs under one shared JOB GROUP and the failure path
    * cancels the group (killing in-flight tasks), cancels the undone
    * futures, and drains the pool. A caller that records the failure and
    * starts cleaning up therefore never races stray write jobs. Shared by
    * [[exportSeparateFilesTimed]] and
    * [[graft.export.StagedExport.exportWarehouse]]. */
  private[export] def runQuiescent[T](spark: org.apache.spark.sql.SparkSession,
      parallelism: Int, tasks: Seq[() => T]): Seq[T] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, math.max(1, tasks.size)))
    val group = s"graft-export-${java.util.UUID.randomUUID()}"
    try {
      val futures = tasks.map { t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          def call(): T = {
            spark.sparkContext.setJobGroup(group, "graft export fan-out",
              interruptOnCancel = true)
            try t() finally spark.sparkContext.clearJobGroup()
          }
        })
      }
      try futures.map(_.get())
      catch {
        case e: Throwable =>
          futures.foreach(_.cancel(true))
          spark.sparkContext.cancelJobGroup(group)
          pool.shutdownNow()
          pool.awaitTermination(5, java.util.concurrent.TimeUnit.MINUTES)
          throw e
      }
    } finally pool.shutdown()
  }

  /** S15: batched JDBC sink with the reference's retry discipline
    * (100k batches, ×3 retries, exponential backoff —
    * clickhouse_service.py:115-342) made IDEMPOTENT for generic JDBC
    * targets: the reference can retry blind appends because ClickHouse
    * ReplacingMergeTree dedups by version, but a plain append target would
    * keep the partitions committed before a mid-write failure and
    * duplicate them on retry. So each attempt (1) overwrites a staging
    * table — overwrite makes the retry itself idempotent — then
    * (2) promotes staging into the target with a single INSERT…SELECT
    * committed on its own, after which the stage is dropped outside the
    * transaction (several engines — MySQL, Derby in some modes — treat
    * DDL as implicit-commit, so a DROP inside the "transaction" would
    * silently commit the INSERT and a post-DROP failure would re-run the
    * whole attempt and duplicate rows; a failed post-commit DROP is
    * instead non-fatal because the stage name is per-invocation unique
    * and gets a best-effort cleanup). On engines without transactional
    * DML (ClickHouse — which rejects or no-ops setAutoCommit(false)) the
    * promote is plain and the retry hazard is covered by the engine's own
    * insert-version dedup — the reference's assumption. The stage name
    * carries a per-invocation unique suffix so concurrent sinks to the
    * same target cannot clobber each other's stage mid-promote. Works
    * against any JDBC URL; for ClickHouse use `jdbc:clickhouse://…` with
    * the ClickHouse driver on the executor classpath. */
  def jdbcSink(
      df: DataFrame,
      url: String,
      table: String,
      properties: Map[String, String] = Map.empty,
      batchSize: Int = 100000,
      maxRetries: Int = 3): Unit = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    props.setProperty("batchsize", batchSize.toString)
    // Unique per invocation (driver-side), constant across this call's
    // retries: retries still overwrite the same stage (idempotent), but two
    // concurrent writers to the same target never share a stage.
    val stage = s"${table}__stage_${java.util.UUID.randomUUID.toString.replace("-", "").take(12)}"
    // column names must be quoted the way Spark quoted them at CREATE time
    // — per-dialect (double quotes on Derby/Postgres, backticks on MySQL);
    // table names stay unquoted (Spark passes them raw to CREATE TABLE, so
    // the DB applies its own case normalization)
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    val cols = df.columns.map(dialect.quoteIdentifier).mkString(", ")
    var attempt = 0
    var done = false
    var lastErr: Throwable = null
    while (!done && attempt < maxRetries) {
      try {
        // (1) stage: overwrite → a partial previous attempt leaves no residue
        df.write.mode("overwrite").jdbc(url, stage, props)
        // target must exist before the promote (0-row append creates it)
        df.limit(0).write.mode("append").jdbc(url, table, props)
        // (2) promote: INSERT…SELECT, committed BEFORE the stage DROP. The
        // DROP must run outside the transaction: on implicit-commit-DDL
        // engines (MySQL; Derby DDL-in-txn quirks) a DROP "inside" the txn
        // commits the INSERT anyway, so a failure at/after the DROP would
        // retry and duplicate the batch while the code still believed the
        // attempt was atomic. Engines without transactional DML
        // (ClickHouse — rejects or no-ops setAutoCommit(false)) get a
        // plain promote: the duplicate-on-retry hazard there is covered by
        // the engine's own dedup (ReplacingMergeTree insert versions,
        // exactly the reference's assumption).
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          val transactional =
            try { conn.setAutoCommit(false); true }
            catch { case _: java.sql.SQLException => false }
          val st = conn.createStatement()
          try {
            try {
              st.executeUpdate(s"INSERT INTO $table ($cols) SELECT $cols FROM $stage")
              if (transactional) conn.commit()
            } catch {
              case e: Throwable =>
                if (transactional) { try conn.rollback() catch { case _: Throwable => () } }
                throw e
            }
            // Post-commit cleanup: non-fatal. The rows are in; a leaked
            // stage is reclaimed by the final best-effort drop below or by
            // a later invocation's overwrite of ITS own stage (names are
            // unique, so nothing ever clobbers a live writer).
            if (transactional) { try conn.setAutoCommit(true) catch { case _: java.sql.SQLException => () } }
            try st.executeUpdate(s"DROP TABLE $stage")
            catch { case _: java.sql.SQLException => () }
          } finally st.close()
        } finally conn.close()
        done = true
      } catch {
        case e: Throwable =>
          lastErr = e
          attempt += 1
          if (attempt < maxRetries) Thread.sleep(1000L << attempt) // 2s, 4s
      }
    }
    if (!done) {
      // best-effort: don't leak the uniquely-named stage on terminal failure
      try {
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          val st = conn.createStatement()
          try st.executeUpdate(s"DROP TABLE $stage") finally st.close()
        } finally conn.close()
      } catch { case _: Throwable => () }
      throw new RuntimeException(
        s"JDBC sink to $table failed after $maxRetries attempts", lastErr)
    }
  }
}
