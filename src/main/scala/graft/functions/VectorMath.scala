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

  /** SQL text for the ordered-fold dot product of two array<double> exprs. */
  def dotSql(x: String, y: String): String =
    s"aggregate(zip_with($x, $y, (p, q) -> p * q), cast(0 as double), (acc, v) -> acc + v)"

  def dot(x: String, y: String): Column = expr(dotSql(x, y))

  /** Squared L2 norm. */
  def normSq(x: String): Column = expr(dotSql(x, x))
}
