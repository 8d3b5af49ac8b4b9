package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary for driver-side testdata regeneration. The parquet layout of the
  * shared tables has drifted between rounds (notably `events.ts`:
  * int64-nanos → tz-naive timestamp[us]); when it drifts again this spec
  * should be the single obvious failure, instead of eight mysterious ones
  * deep in the query surface.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  import TestSpark._

  test("events.ts normalizes to a zoned TIMESTAMP under every observed layout") {
    val ev = graft.queries.Tables.load(spark, sf, "events")
    assert(ev.schema("ts").dataType === TimestampType,
      s"raw type was ${spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType}; " +
        "normalizeEventTs must map it to TIMESTAMP")
    // event-time arithmetic that rejected TIMESTAMP_NTZ in r8 must work
    val n = ev.selectExpr("unix_micros(ts)").limit(1).count()
    assert(n === 1)
  }

  test("normalizeEventTs is idempotent and rejects non-UTC sessions on NTZ input") {
    import org.apache.spark.sql.functions._
    val ntz = spark.range(3).select(
      col("id"),
      col("id").cast(TimestampType).cast(TimestampNTZType).as("ts"))
    val once = graft.queries.Tables.normalizeEventTs(spark, ntz)
    assert(once.schema("ts").dataType === TimestampType)
    val twice = graft.queries.Tables.normalizeEventTs(spark, once)
    assert(twice.schema("ts").dataType === TimestampType)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException] {
        graft.queries.Tables.normalizeEventTs(spark, ntz)
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("legacy int64-nanos layout still normalizes exactly (micro truncation, no float loss)") {
    import org.apache.spark.sql.functions._
    // 2024-01-01T00:00:00.123456789 as nanos — big enough that a double
    // round-trip would corrupt the low microseconds (the original bug class
    // the `div` comment in Tables guards against)
    val nanos = 1704067200L * 1000000000L + 123456789L
    val legacy = spark.range(1).select(lit(nanos).as("ts"))
    val out = graft.queries.Tables.normalizeEventTs(spark, legacy)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.selectExpr("unix_micros(ts)").collect()(0).getLong(0)
    assert(got === 1704067200L * 1000000L + 123456L) // nanos div 1000, exact
  }

  test("core table columns the query surface depends on are present and typed") {
    def sch(t: String) = spark.read.parquet(s"$sf/$t.parquet").schema
    val li = sch("lineitem")
    assert(li("l_quantity").dataType.isInstanceOf[NumericType])
    assert(li("l_extendedprice").dataType.isInstanceOf[NumericType])
    val ord = sch("orders")
    assert(ord("o_orderkey").dataType === LongType || ord("o_orderkey").dataType === IntegerType)
    val docs = sch("documents")
    assert(docs.fieldNames.contains("text"))
    assert(docs("text").dataType === StringType)
    val emb = sch("embeddings")
    assert(emb("embedding").dataType.isInstanceOf[ArrayType])
    val ev = sch("events")
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(ev("ts").dataType),
      s"events.ts arrived as unrecognized type ${ev("ts").dataType}; extend Tables.normalizeEventTs")
  }
}
