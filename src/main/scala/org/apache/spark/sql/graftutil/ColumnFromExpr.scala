package org.apache.spark.sql.graftutil

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Wrap a raw Catalyst expression as a user-facing Column — the classic
  * `new Column(expr)` constructor went `private[sql]` behind the Spark 4
  * column-node indirection; this one-liner shim lives inside the sql
  * namespace the same way [[FunctionInjector]] does. Needed for library
  * expressions that carry NON-child constructor data (e.g. a literal
  * centroid matrix) and therefore cannot route through the
  * one-Seq[Expression] function-registry builder signature. */
object ColumnFromExpr {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The inverse: unwrap a Column's Catalyst expression (to hand an
    * unresolved attribute to an expression built outside the registry). */
  def expr(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
