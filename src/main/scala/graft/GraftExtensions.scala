package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.HexPopcount

/**
 * Session extensions registering graft's native Catalyst expressions, so
 * they resolve by name (`call_function`/SQL) and stay inside whole-stage
 * codegen. Enable with:
 *
 *   SparkSession.builder().config("spark.sql.extensions", "graft.GraftExtensions")
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("hex_popcount"),
      new ExpressionInfo(classOf[HexPopcount].getName, "hex_popcount"),
      (exprs: Seq[Expression]) => HexPopcount(exprs.head)))
  }
}

object GraftExtensions {
  /** Make graft functions callable on a session that was built without the
    * extension (e.g. a driver-provided smoke session): falls back to a plain
    * UDF with identical semantics (slower — no codegen — but correct). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registered =
      try { spark.sql("SELECT hex_popcount('0x0f')").collect(); true }
      catch { case _: Exception => false }
    if (!registered)
      spark.udf.register("hex_popcount", (s: String) => HexPopcount.count(s))
  }
}
