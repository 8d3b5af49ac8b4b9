package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data-clustering layout (Z-order / Morton curve) — the
 * `OPTIMIZE ZORDER BY` maintenance operation a 100 TB warehouse runs so
 * that parquet min/max statistics prune row groups for MORE THAN ONE
 * filter column at once.
 *
 * A single-column sort gives tight min/max ranges for that column only: a
 * predicate on any OTHER column touches every file. Interleaving the bits
 * of two (rank-scaled) key columns and range-partitioning + sorting on the
 * interleaved value gives every file a small RECTANGLE in (x, y) space, so
 * a range predicate on x, on y, or on both skips most row groups — the
 * robustness argument for z-order over a linear sort, measured in
 * `ZorderSpec` (scan-node output rows under pushed filters, layout vs
 * layout, multiple row groups per file).
 *
 * Everything is exact integer / IEEE-identical arithmetic:
 *  - per-dimension scaling is min-max into 16 bits from a one-row bounds
 *    aggregate (bounded driver state; at 100 TB the bounds come from table
 *    statistics instead — same two-pass shape). Min-max is the simple
 *    scaling; a rank-based variant (sampled quantiles, what
 *    `repartitionByRange` already does internally) drops in for skewed
 *    keys without changing the interleave;
 *  - the interleave is 32 shift-and-or terms — one narrow codegen'd
 *    projection, regenerated verbatim by the DuckDB oracle
 *    ([[graft.queries.Relational]] `layout_zorder`).
 */
object Layout {

  /** Bits kept per dimension. 16 bits ≈ 65k distinct ranks per dimension —
    * far finer than any realistic file count; the z-value fits in 32 bits. */
  val ZBits = 16

  /** x with its low `bits` bits spread to positions off, off+2, off+4, … */
  private def spreadBits(c: Column, bits: Int, off: Int): Column =
    (0 until bits)
      .map(i => shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), 2 * i + off))
      .reduce(_ bitwiseOR _)

  /** Morton interleave of two `bits`-bit non-negative longs: x takes the
    * even bit positions, y the odd ones. */
  def zvalue(x: Column, y: Column, bits: Int = ZBits): Column =
    spreadBits(x, bits, 0).bitwiseOR(spreadBits(y, bits, 1))

  /** Min-max scale an integral column into [0, 2^bits): clamp(floor(
    * (c − mn) · (2^bits − 1) / max(mx − mn, 1))). Double arithmetic is
    * exact for key ranges below 2^53 / 2^bits and identical across IEEE
    * engines, so the oracle mirrors it verbatim. */
  private def scaled(c: Column, mn: Column, mx: Column, bits: Int): Column = {
    val hi = (1L << bits) - 1
    floor(least(greatest(
      (c - mn).cast("double") * lit(hi.toDouble) /
        greatest((mx - mn).cast("double"), lit(1.0)),
      lit(0.0)), lit(hi.toDouble))).cast("long")
  }

  /** df + `zval` = the Morton interleave of the two min-max-scaled key
    * columns. One 4-value bounds aggregate (1 driver row), then a fully
    * narrow projection. */
  def withZValue(df: DataFrame, xCol: String, yCol: String,
      bits: Int = ZBits): DataFrame = {
    val b = df.agg(
      min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).collect()(0)
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"z-order bounds: $xCol/$yCol are all-NULL")
    df.withColumn("zval", zvalue(
      scaled(col(xCol), lit(b.getLong(0)), lit(b.getLong(1)), bits),
      scaled(col(yCol), lit(b.getLong(2)), lit(b.getLong(3)), bits), bits))
  }

  /** The maintenance op itself: cluster `df` into `files` output files by
    * z-value (range partition → in-partition sort → write), so every file
    * covers one compact z-range = one small (x, y) rectangle in the
    * parquet footer stats. The sort is per-partition; the only global
    * coordination is `repartitionByRange`'s sampled range boundaries —
    * exactly the shuffle an OPTIMIZE pays, once, to make every future
    * two-column scan prunable. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, path: String,
      files: Int, writerOptions: Map[String, String] = Map.empty): Unit =
    withZValue(df, xCol, yCol)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.options(writerOptions).mode("overwrite").parquet(path)

  /** The layout profile — per z-bucket row count and per-dimension min/max
    * rectangle: the statistics a file would carry in its footer under this
    * clustering, i.e. the tightness evidence for two-column pruning. One
    * narrow z-value projection + one ≤`buckets`-row aggregation. */
  def zorderProfile(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64, bits: Int = ZBits): DataFrame = {
    val div = (1L << (2 * bits)) / buckets
    withZValue(df, xCol, yCol, bits)
      .withColumn("bucket", floor(col("zval") / lit(div)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).cast("long").as("x_min"),
        max(col(xCol)).cast("long").as("x_max"),
        min(col(yCol)).cast("long").as("y_min"),
        max(col(yCol)).cast("long").as("y_max"))
      .orderBy(col("bucket"))
  }
}
