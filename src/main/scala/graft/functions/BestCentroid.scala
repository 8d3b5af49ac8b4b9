package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native literal-centroid argmax — the one-expression replacement for the
 * `array_max(array(struct(vec_dot(vec, lit(c₀))/…, −cid₀), …))` projection
 * the literal IVF assignment used to build (k struct constructions + k
 * boxed-literal dot products per corpus row; measured the dominant term of
 * `sim_topk_ivf`'s O(N·k_q) build). The kernel runs the identical IEEE
 * arithmetic over a primitive double[][] centroid matrix:
 *
 *  - score fold order = [[Signatures.vecDot]] (ordered left fold over the
 *    min length);
 *  - struct-max semantics = Spark's struct ordering: s compared with
 *    nan-safe double ordering (NaN greatest, +0 == −0), NULL s smallest,
 *    ties broken by greater ncid (= smaller centroid id);
 *  - the null dispatch mirrors VecDotExpr's: when the vec schema admits
 *    null ELEMENTS, any null element (or a vec/centroid length mismatch)
 *    nulls every score — exactly the guarded `vec_dot` twin; a NULL vec or
 *    NULL sq nulls every score on both plans (nullSafeEval / null
 *    arithmetic).
 *
 * `CellCapSpec`'s literal-vs-broadcast agreement tests pin the argmax and
 * tie-break against the independent join plan; the DuckDB oracle pins the
 * values end to end.
 */
object BestCentroidKernel {

  /** Spark's nanSafeCompareDoubles: NaN greater than everything
    * (incl. +∞), +0.0 == −0.0, otherwise natural order. */
  private def cmp(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if (xn && yn) 0
    else if (xn) 1
    else if (yn) -1
    else if (x == y) 0
    else if (x < y) -1
    else 1
  }

  def bestLit(vec: ArrayData, sqNull: Boolean, sq: Double,
      cvecs: Array[Array[Double]], csqs: Array[Double], cids: Array[Long],
      guarded: Boolean): InternalRow = {
    val k = cids.length
    var allNull = vec == null || sqNull
    var v: Array[Double] = null
    if (!allNull) {
      val n = vec.numElements()
      if (guarded) {
        var i = 0
        while (i < n && !allNull) { if (vec.isNullAt(i)) allNull = true; i += 1 }
      }
      if (!allNull) {
        v = new Array[Double](n)
        var i = 0
        while (i < n) { v(i) = vec.getDouble(i); i += 1 }
      }
    }
    var haveBest = false
    var bestNull = true
    var bestS = 0.0
    var bestN = 0L
    var c = 0
    while (c < k) {
      val cv = cvecs(c)
      val ncid = -cids(c)
      // guarded twin also nulls on length mismatch (zip_with pads → null)
      val sNull = allNull || (guarded && v.length != cv.length)
      var s = 0.0
      if (!sNull) {
        val n = math.min(v.length, cv.length)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v(i) * cv(i); i += 1 }
        s = dot / math.sqrt(sq * csqs(c))
      }
      val better =
        if (!haveBest) true
        else if (sNull != bestNull) bestNull // non-null beats null under max
        else if (!sNull) {
          val t = cmp(s, bestS)
          t > 0 || (t == 0 && ncid > bestN)
        } else ncid > bestN
      if (better) { haveBest = true; bestNull = sNull; bestS = s; bestN = ncid }
      c += 1
    }
    new GenericInternalRow(Array[Any](
      if (bestNull) null else java.lang.Double.valueOf(bestS), bestN))
  }
}

/** `best = struct(s, ncid)` of the nearest literal centroid — see
  * [[BestCentroidKernel]]. Centroids ride the expression as DATA (a value
  * list, not child expressions), so plan canonicalization still compares
  * by value the way the old `typedLit` array did. */
case class BestCentroidLitExpr(vec: Expression, sq: Expression,
    cents: Seq[(Long, Seq[Double], Double)]) extends Expression {

  @transient private lazy val cidArr: Array[Long] = cents.map(_._1).toArray
  @transient private lazy val cvecArr: Array[Array[Double]] =
    cents.map(_._2.toArray).toArray
  @transient private lazy val csqArr: Array[Double] = cents.map(_._3).toArray

  override def children: Seq[Expression] = Seq(vec, sq)
  override def dataType: DataType = StructType(Seq(
    StructField("s", DoubleType, nullable = true),
    StructField("ncid", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  /** VecDotExpr's dispatch: elements that may be null take the guarded
    * (null-scanning, strict-length) twin. */
  private def guarded: Boolean = vec.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, sq.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) if cents.nonEmpty =>
        TypeCheckResult.TypeCheckSuccess
      case (v, s) => TypeCheckResult.TypeCheckFailure(
        s"best_centroid_lit requires (ARRAY<DOUBLE>, DOUBLE) and ≥1 centroid, " +
          s"got ${v.catalogString}, ${s.catalogString}, k=${cents.length}")
    }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    val s = sq.eval(input)
    BestCentroidKernel.bestLit(
      if (v == null) null else v.asInstanceOf[ArrayData],
      s == null, if (s == null) 0.0 else s.asInstanceOf[Double],
      cvecArr, csqArr, cidArr, guarded)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vEv = vec.genCode(ctx)
    val sEv = sq.genCode(ctx)
    val cv = ctx.addReferenceObj("bclCvecs", cvecArr, "double[][]")
    val cq = ctx.addReferenceObj("bclCsqs", csqArr, "double[]")
    val ci = ctx.addReferenceObj("bclCids", cidArr, "long[]")
    ev.copy(code = code"""
      ${vEv.code}
      ${sEv.code}
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        graft.functions.BestCentroidKernel.bestLit(
          ${vEv.isNull} ? null : ${vEv.value},
          ${sEv.isNull}, ${sEv.value}, $cv, $cq, $ci, $guarded);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BestCentroidLitExpr =
    copy(vec = newChildren(0), sq = newChildren(1))

  override def prettyName: String = "best_centroid_lit"
}
