package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Shared testdata loader. The one piece of schema drift the driver-side
  * generator has exhibited is the `events.ts` physical type, which has been
  * delivered as each of:
  *
  *  - parquet TIMESTAMP(NANOS) — Spark can't represent nanos natively and
  *    (with `spark.sql.legacy.parquet.nanosAsLong`) surfaces it as `Long`;
  *  - parquet `timestamp[us]` with no timezone — Spark 4 reads it as
  *    `TIMESTAMP_NTZ`, which event-time arithmetic (`unix_micros`, windows,
  *    watermarks) rejects;
  *  - a plain zoned `TIMESTAMP` (what every consumer wants).
  *
  * All event-time consumers (batch queries, specs, streaming backfill) load
  * through here so the normalization — and its UTC precondition — live in
  * exactly one place.
  */
object Tables {

  def load(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(s, df) else df
  }

  /** Normalize `ts` to a zoned `TIMESTAMP` regardless of the layout the
    * testdata was generated with. Idempotent: an already-zoned column passes
    * through untouched.
    */
  def normalizeEventTs(s: SparkSession, df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // int64-nanos layout. `div` (integer division), not `/` — nanoseconds
        // since 2024 overflow the 53-bit double mantissa, so float division
        // would corrupt the low microseconds.
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // tz-naive layout. Casting NTZ→TIMESTAMP reinterprets the wall-clock
        // reading in the session zone, so this is only value-preserving when
        // that zone is UTC (the oracle's DuckDB `epoch_us` on the same naive
        // value then agrees). Enforce the precondition rather than assume it:
        // a non-UTC entry point must fail loudly, not shift every event time.
        val tz = s.conf.get("spark.sql.session.timeZone", "")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ; the cast to TIMESTAMP is only correct " +
            s"under spark.sql.session.timeZone=UTC (got '$tz')")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
}
