package graft.streaming

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.EraRecord
import graft.operators.Normalizer
import graft.sources.{EraFileInfo, EraFileReader}

/**
 * Structured-Streaming wrapper over an era directory — the "continuous
 * monitoring" use case (reference README.md:151-153). The reference has no
 * stream engine (SURVEY.md §2.9); its incremental loop is batch. Here the
 * same era pipeline becomes a file-source stream: new era files landing in
 * the watched directory are discovered by the file source, split into
 * records, decoded, and appended to the output — exactly-once via the
 * checkpoint, `Trigger.AvailableNow` for drain-and-stop batch runs or the
 * default micro-batch trigger for tailing.
 *
 * Scale: record splitting is a narrow flatMap per file (one file = one
 * task), identical to the batch DataSource's partition layout.
 */
object EraStream {

  private val binaryFileSchema = StructType.fromDDL(
    "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")

  /** Streaming equivalent of `spark.read.format("era")`: binaryFile file
    * source → per-file record split. */
  def records(spark: SparkSession, dir: String): Dataset[EraRecord] = {
    import spark.implicits._
    spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.era")
      .load(dir)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        EraFileReader.readRecords(new ByteArrayInputStream(bytes), EraFileInfo.fromPath(path))
      }
  }

  /** Decoded wide-blocks stream for the watched directory. */
  def wideBlocks(spark: SparkSession, dir: String): DataFrame =
    Normalizer.wideBlocks(Normalizer.decodeBlocks(records(spark, dir).toDF()))

  /** Drain currently-available era files into a parquet sink and stop —
    * the incremental batch loop (§3.2) expressed as AvailableNow. */
  def runAvailableNow(spark: SparkSession, inDir: String, outDir: String,
      checkpoint: String): StreamingQuery = {
    wideBlocks(spark, inDir).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
