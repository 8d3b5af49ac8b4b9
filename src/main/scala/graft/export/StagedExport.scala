package graft.export

import org.apache.spark.sql.Dataset

import graft.model.DecodedBlock
import graft.operators.Normalizer

/**
 * Staged 15-table fan-out: materialize the decoded blocks ONCE as parquet,
 * then run the per-table exports as concurrent column-pruned scans of the
 * stage.
 *
 * Why staging beats caching for the full-corpus extract (measured in
 * `tools/EtlProbe`, ~6× on the 98k-block bench corpus): a cached
 * `Dataset[DecodedBlock]` stores the whole `body` struct as ONE in-memory
 * column, so all 16 table jobs re-deserialize every child array of every
 * block; parquet stores each nested field as its own column chunk and
 * Spark's nested-schema pruning reaches through `body.<child>`, so the
 * deposits job reads only the deposits bytes, vectorized. The stage also
 * survives any corpus:memory ratio — at cluster scale the executor cache
 * cannot hold the corpus, a parquet stage trivially does — making this the
 * only fan-out shape that holds at 100 TB.
 *
 * The reference fans its 15 tables out of one in-process decode pass
 * (`processor.py` fan-out); this is that shape re-expressed for a shared-
 * nothing engine: one decode pass to columnar storage, then embarrassingly
 * parallel pruned extracts.
 */
object StagedExport {

  /** Stage `blocks` under `stageDir` and export all 15 normalized tables
    * to `baseOutput` (reference naming via [[Sinks.datasetFilename]]).
    * Returns per-table (rows, seconds). `stageFiles` bounds both stage
    * fan-in and per-table output file count. */
  def exportAll(blocks: Dataset[DecodedBlock], stageDir: String,
      baseOutput: String, parallelism: Int = 16,
      stageFiles: Int = 32, stageCodec: String = "zstd"): Map[String, (Long, Double)] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    // zstd stage: ~2× smaller than snappy for hex-heavy block payloads at
    // negligible extra CPU — halves both the write-back pressure staging
    // adds and the bytes every fan-out scan re-reads
    blocks.toDF().coalesce(stageFiles)
      .write.mode("overwrite").option("compression", stageCodec).parquet(stageDir)
    val staged = spark.read.parquet(stageDir).as[DecodedBlock]
    Sinks.exportSeparateFilesTimed(Normalizer.allDatasets(staged),
      baseOutput, parallelism = parallelism)
  }
}
