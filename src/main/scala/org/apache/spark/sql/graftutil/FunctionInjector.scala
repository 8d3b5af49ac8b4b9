package org.apache.spark.sql.graftutil

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers a native Catalyst function builder on an ALREADY-BUILT
  * session. The supported path (`spark.sql.extensions=graft.GraftExtensions`)
  * only applies at session construction; a host that hands us a finished
  * session (the driver's smoke harness, a notebook) previously fell back
  * to Scala UDFs with hand-mirrored semantics — a divergence class the r14
  * functions-layer review closed by registering the SAME native
  * expressions here instead. `SparkSession.sessionState` is
  * `private[sql]`, hence this one-method shim inside the sql namespace. */
object FunctionInjector {
  def register(spark: SparkSession, name: String, className: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), new ExpressionInfo(className, name), builder)
}
