package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/**
 * Portable dense-vector arithmetic over `array<double>` columns, built from
 * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs.
 *
 * The accumulation is an explicit left fold in element order, so the result
 * is bit-identical to the same fold in any IEEE-754 engine (the DuckDB
 * oracle mirrors it with `list_reduce`). Cosine is always computed as
 * `dot / sqrt(sq_a * sq_b)` with the squared norms precomputed per row —
 * compute-once per vector, not per pair, which is the only sane layout when
 * a pair join fans out.
 */
object VectorMath {

  /** SQL text for the ordered-fold dot product of two array<double> exprs.
    * Resolves to the native [[graft.functions.VecDotExpr]] kernel — callers
    * must have run `GraftExtensions.ensureRegistered` (bit-identical to the
    * `aggregate(zip_with(...), 0.0d, +)` fold it replaces, ~40× cheaper
    * than the two interpreted lambdas per pair). */
  def dotSql(x: String, y: String): String = s"vec_dot($x, $y)"

  def dot(x: String, y: String): Column = expr(dotSql(x, y))

  /** Squared L2 norm. */
  def normSq(x: String): Column = expr(dotSql(x, x))
}
