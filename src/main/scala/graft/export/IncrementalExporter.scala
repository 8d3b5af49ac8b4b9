package graft.export

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Normalizer

/**
 * The incremental multi-era export loop — the reference's atomic per-era
 * protocol (`era_parser/export/clickhouse_exporter.py:37-82`,
 * `era_state_manager.py:430-473`) as one reusable driver:
 *
 *  1. resume = anti-join available eras against completed ones (the state
 *     log's latest-state view); an era whose previous run died mid-flight
 *     (status `processing`) or failed is simply not completed and is
 *     re-picked up;
 *  2. per era: record start → export every table under an ERA-SUFFIXED
 *     output name in OVERWRITE mode → record completion. Overwrite +
 *     era-scoped names make re-processing idempotent: a torn write from a
 *     killed run is clobbered by the retry, so the final table contents
 *     are exactly-once per era no matter where the previous run died;
 *  3. an era failing with an `Exception` records a failure transition and
 *     the loop moves on (the reference's behavior); anything harsher (an
 *     `Error`, a JVM kill) leaves the era's last transition as
 *     `processing`/`failed` and the NEXT run's anti-join re-processes it.
 *
 * `CrashResumeSpec` drives a hard mid-run death end-to-end and asserts the
 * resumed run's tables equal an uninterrupted run's, table for table.
 *
 * The CLI's `--remote` verb is this loop with `loadEra` = download + era
 * scan; tests feed local era files. State-log reads are broadcast-size
 * (rows ∝ eras), so at cluster scale the only heavy work per era is the
 * export job itself.
 */
object IncrementalExporter {

  /** Observed row count of a completed write. The write job has already
    * finished when this is called, but `QueryExecutionListener` delivery
    * is ASYNCHRONOUS (the execution-listener bus), so the metric can trail
    * the action by a beat — poll briefly rather than `Observation.get`,
    * whose wait is unbounded if a Spark regression ever stopped reporting
    * observed metrics for write commands. The `fallback` (a footer-only
    * read-back count — the pre-r13 shape) keeps the completion record
    * CORRECT even in that failure mode; the no-read-jobs spec assertion
    * is what would flag the regression. */
  private def observedRows(obs: org.apache.spark.sql.Observation,
      fallback: => Long): Long = {
    import scala.concurrent.duration._
    val f = scala.concurrent.Future(obs.get("rows").asInstanceOf[Long])(
      scala.concurrent.ExecutionContext.global)
    try scala.concurrent.Await.result(f, 30.seconds)
    catch { case _: java.util.concurrent.TimeoutException => fallback }
  }

  /** Process `eras` incrementally, returning the eras actually processed
    * this run (in order). `loadEra` maps an era number to its raw era
    * RECORDS frame (the `era` format scan); `verb` is `all-blocks` for the
    * full 15-table fan-out or a single dataset name. */
  def run(spark: SparkSession, state: EraStateManager, network: String,
      eras: Seq[Long], out: String, verb: String = "all-blocks",
      force: Boolean = false, dataRoot: Option[String] = None)(
      loadEra: Long => DataFrame): Seq[Long] = {
    val todo = if (force) eras else state.determineErasToProcess(eras, network)
    val processed = Seq.newBuilder[Long]
    todo.foreach { era =>
      if (force)
        state.cleanEraCompletely(
          dataRoot.getOrElse(Option(new java.io.File(out).getParent).getOrElse(".")),
          network, era)
      state.recordEraStart(era, network)
      try {
        val counts =
          if (verb == "all-blocks") {
            val blocks = Normalizer.decodeBlocks(loadEra(era)).cache()
            try Sinks.exportSeparateFiles(Normalizer.allDatasets(blocks),
              Sinks.eraOutputFilename(out, era.toInt))
            finally blocks.unpersist()
          } else // single-dataset verb: section-pruned decode, nothing to share
            Map(verb -> Sinks.write(
              Normalizer.datasetPruned(loadEra(era), verb),
              Sinks.eraOutputFilename(out, era.toInt)))
        state.recordEraCompletion(era, network, counts.keys.toSeq.sorted,
          counts.values.sum)
        processed += era
      } catch {
        case e: Exception =>
          state.recordEraFailure(era, network, String.valueOf(e.getMessage))
          System.err.println(s"era $era failed: ${e.getMessage}")
      }
    }
    processed.result()
  }

  /** The same resume loop writing into the AT-REST WAREHOUSE — the
    * reference's actual production contract, where the per-era atomic
    * export (`clickhouse_exporter.py:37-82`), the completion state
    * (`era_state_manager.py:102-168`) and the paste-SQL surface
    * (`docs/CLICKHOUSE.md:340+`) are ONE store. Per era:
    *
    *  1. record start;
    *  2. decode → a small columnar stage (the nested-pruning discipline
    *     of [[StagedExport]], sized to one era) → the 17 per-table
    *     extracts fan out concurrently, each landing as a DYNAMIC
    *     partition overwrite ([[Sinks.overwriteEraPartitions]]) into
    *     `<warehouseDir>/<network>/<table>/era_number=N/` — exactly this
    *     era's directories are replaced, completed eras' files are never
    *     touched;
    *  3. record completion with per-table counts captured FROM THE WRITE
    *     ITSELF (`Dataset.observe` metrics riding each overwrite job) —
    *     zero post-write read jobs. The r12 shape read counts back
    *     footer-only, which was metadata-cheap but still 16 scheduled
    *     jobs per era: a 10k-era backfill paid 160k jobs of pure
    *     scheduling latency for numbers the write jobs already knew.
    *
    * Torn state from a kill cannot leak into a resumed warehouse: before
    * writing, the era's partition directories are dropped across ALL
    * tables (a table that legitimately has no rows for the era this run
    * would otherwise keep a dead run's partial partition — dynamic
    * overwrite only replaces partitions it writes), then the overwrite
    * lands fresh data. Consumers see completed eras via
    * [[graft.queries.EraViews]]`.registerWarehouse` + the
    * `era_completion` view; `WarehouseResumeSpec` kills a run mid-era and
    * proves resume ≡ uninterrupted, table for table.
    *
    * At cluster scale: the state reads are broadcast-size, the stage is
    * one era (bounded), and each table write touches one partition
    * directory — the loop's footprint is per-era, never per-archive. */
  def runWarehouse(spark: SparkSession, state: EraStateManager,
      network: String, eras: Seq[Long], warehouseDir: String,
      parallelism: Int = 8, force: Boolean = false,
      stageCodec: String = "zstd",
      targetFileBytes: Long = Sinks.whTargetFileBytes)(
      loadEra: Long => DataFrame): Seq[Long] = {
    // every filesystem touch goes through the Hadoop FileSystem bound to
    // the warehouse URI — the loop's own contract is "any store Spark can
    // write" (hdfs://, s3a://, local), and java.nio would treat a scheme'd
    // path as a relative local dir: the pre-drop would silently never
    // fire (a dead run's torn partition in a now-empty table would
    // survive resume) and every footer count would read 0
    val netDir = s"$warehouseDir/$network"
    val fs = new org.apache.hadoop.fs.Path(netDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    val tableNames = StagedExport.warehouseTableNames
    // every table directory must exist up front: a table empty across the
    // whole corpus still has to bind as an empty view at registration
    tableNames.foreach(n => fs.mkdirs(hp(s"$netDir/$n")))
    val stage = s"$netDir/_stage"
    def dropEraPartitions(era: Long): Unit = tableNames.foreach { n =>
      val p = hp(s"$netDir/$n/era_number=$era")
      if (fs.exists(p)) fs.delete(p, true)
    }
    val todo = if (force) eras else state.determineErasToProcess(eras, network)
    val processed = Seq.newBuilder[Long]
    // measured bytes/row per table, updated from each completed era's own
    // on-disk output — the `maxRecordsPerFile` derivation (guide §6): the
    // first era writes unconstrained (nothing measured yet), every later
    // era caps records/file at targetFileBytes / measured bytes-per-row,
    // so a multi-GB hot-table era splits into ~target-sized files instead
    // of whatever the stage's task count dictated. Self-tuning: the
    // estimate follows the corpus as row width drifts across eras.
    var rowBytes = Map.empty[String, Double]
    try {
      todo.foreach { era =>
        if (force) dropEraPartitions(era)
        state.recordEraStart(era, network)
        try {
          import spark.implicits._
          Normalizer.decodeBlocks(loadEra(era)).toDF().coalesce(4)
            .write.mode("overwrite").option("compression", stageCodec).parquet(stage)
          val staged = spark.read.parquet(stage).as[graft.model.DecodedBlock]
          val tables = StagedExport.networkTables(staged, network)
          dropEraPartitions(era)
          // per-table counts ride the write jobs as observed metrics: a
          // CollectMetrics node above each extract counts the rows the
          // overwrite commits, so completion bookkeeping costs ZERO
          // post-write jobs (WarehouseResumeSpec asserts no read-back
          // count job ever runs). wide_blocks is still EXCLUDED from the
          // completion record: it re-shapes the same blocks, and counting
          // it would make total_records diverge from the file-mode loop's
          // accounting for the same era.
          val observed = tables.map { case (name, df) =>
            val obs = org.apache.spark.sql.Observation(s"wh_rows_${name}_$era")
            (name, obs,
              df.observe(obs, org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("rows")))
          }
          Sinks.runQuiescent(spark, parallelism, observed.map {
            case (name, _, df) =>
              () => Sinks.overwriteEraPartitions(df, s"$netDir/$name",
                rowBytes.get(name)
                  .map(b => math.max(1L, (targetFileBytes / b).toLong))
                  .getOrElse(0L))
          })
          val counts = observed.collect {
            case (name, obs, _) if name != "wide_blocks" =>
              name -> observedRows(obs, {
                val p = s"$netDir/$name/era_number=$era"
                if (fs.exists(hp(p))) spark.read.parquet(p).count() else 0L
              })
          }.toMap
          rowBytes ++= counts.flatMap { case (name, rows) =>
            if (rows <= 0) None
            else {
              val p = hp(s"$netDir/$name/era_number=$era")
              val bytes =
                if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
              if (bytes > 0) Some(name -> bytes.toDouble / rows) else None
            }
          }
          state.recordEraCompletion(era, network,
            counts.filter(_._2 > 0).keys.toSeq.sorted, counts.values.sum)
          processed += era
        } catch {
          case e: Exception =>
            state.recordEraFailure(era, network, String.valueOf(e.getMessage))
            System.err.println(s"era $era warehouse export failed: ${e.getMessage}")
        }
      }
    } finally {
      val p = hp(stage)
      if (fs.exists(p)) fs.delete(p, true)
    }
    processed.result()
  }
}
