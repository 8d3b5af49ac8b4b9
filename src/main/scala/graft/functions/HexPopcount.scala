package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Popcount of a 0x-hex bitfield string — computes
 * `sync_aggregates.participating_validators`, which the reference schema
 * declares but never computes (001_initial_tables_up.sql:27,
 * PARSED_FIELDS.md:79; backfilled 0 by clickhouse_service.py:185,200-212 —
 * SURVEY.md §2.4 faithfulness note). We compute it properly.
 *
 * Native Catalyst expression with codegen (no UDF): stays inside
 * whole-stage codegen in the normalizer's hot path.
 */
case class HexPopcount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hex_popcount requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    HexPopcount.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HexPopcount.count($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): HexPopcount =
    copy(child = newChild)

  override def prettyName: String = "hex_popcount"
}

object HexPopcount {
  /** Count set bits in a "0x…" hex string; non-hex chars contribute 0. */
  def count(s: String): Long = {
    var i = if (s.startsWith("0x") || s.startsWith("0X")) 2 else 0
    var bits = 0L
    while (i < s.length) {
      val d = Character.digit(s.charAt(i), 16)
      if (d > 0) bits += java.lang.Integer.bitCount(d)
      i += 1
    }
    bits
  }

  /** Column wrapper — resolves against the session function registry
    * (native expression when graft.GraftExtensions is installed, UDF
    * fallback via GraftExtensions.ensureRegistered otherwise). */
  def hex_popcount(c: Column): Column =
    org.apache.spark.sql.functions.call_function("hex_popcount", c)
}
