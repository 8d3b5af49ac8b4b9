package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-test-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query has an oracle or is explicitly rows-only") {
    // every oracle key must have a query; queries without oracle are allowed
    // (non-SQL-expressible) but must still run.
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle keys without query impl: ${os.diff(qs)}")
  }

  test("all queries execute and return a schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.nonEmpty, s"$name produced empty schema")
      df.count() // forces full execution
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("agg_pricing groups are exhaustive over flag/status pairs") {
    val df = SparkEntry.queries("agg_pricing")(spark, sf).collect()
    assert(df.length >= 4)
    assert(df.map(_.getLong(df.head.fieldIndex("count_order"))).sum > 0)
  }

  test("win_latest_state returns exactly one row per user") {
    val df = SparkEntry.queries("win_latest_state")(spark, sf)
    val users = df.select("user_id").collect().map(_.getLong(0))
    assert(users.distinct.length == users.length)
  }

  test("topk_orders is sorted desc and bounded") {
    val rows = SparkEntry.queries("topk_orders")(spark, sf).collect()
    assert(rows.length <= 20)
    val prices = rows.map(_.getDouble(1))
    assert(prices.sameElements(prices.sortBy(-_.doubleValue)))
  }

  test("join_full_outer covers users present on either side") {
    val df = SparkEntry.queries("join_full_outer")(spark, sf).collect()
    assert(df.forall(r => r.getLong(1) + r.getLong(2) > 0))
  }

  test("histogram quantile: a constant-valued group survives with est = the constant") {
    // mx = mn used to make the bin NaN and the whole group silently vanish;
    // the guard must pin every quantile estimate to the constant itself
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("histq").toString
    Seq(
      ("CONST", 42.0), ("CONST", 42.0), ("CONST", 42.0),
      ("VARIED", 10.0), ("VARIED", 20.0), ("VARIED", 30.0), ("VARIED", 40.0))
      .toDF("o_orderpriority", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("agg_histogram_quantile")(spark, dir).collect()
    val const = rows.filter(_.getString(0) == "CONST")
    assert(const.length === 2, rows.mkString("; ")) // q=0.5 and q=0.9 both present
    const.foreach(r => assert(r.getDouble(r.fieldIndex("est")) === 42.0))
    assert(rows.count(_.getString(0) == "VARIED") === 2)
  }
}
