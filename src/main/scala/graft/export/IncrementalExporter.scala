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
        val blocks = Normalizer.decodeBlocks(loadEra(era)).cache()
        val counts =
          try {
            if (verb == "all-blocks")
              Sinks.exportSeparateFiles(Normalizer.allDatasets(blocks),
                Sinks.eraOutputFilename(out, era.toInt))
            else Map(verb -> Sinks.write(Normalizer.dataset(blocks, verb),
              Sinks.eraOutputFilename(out, era.toInt)))
          } finally blocks.unpersist()
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
}
