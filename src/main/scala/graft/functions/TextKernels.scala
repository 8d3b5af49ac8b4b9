package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native kernels for the token-array reductions the text-quality paths ran
 * as interpreted higher-order functions (ArrayFilter/ArrayAggregate are
 * CodegenFallback — a MutableProjection call per element per row). Each is
 * value-identical to the SQL form it replaces, including the null
 * three-valued semantics:
 *
 *  - `count_in_set(toks, set)`    = size(filter(toks, t -> array_contains(set, t)))
 *    (a null element's membership is NULL → the filter drops it);
 *  - `count_rlike(toks, pattern)` = size(filter(toks, t -> t rlike pattern));
 *  - `count_nonempty(toks)`       = size(filter(toks, t -> t <> ''));
 *  - `sum_char_lengths(toks)`     = aggregate(toks, 0, (acc, t) -> acc + length(t))
 *    (a null element nulls the whole fold — exactly the SQL aggregate).
 *
 * The set/pattern arguments are required foldable (they are literal rule
 * constants), evaluated once per expression instead of per row.
 */
object TextKernels {

  def countInSet(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def countRlike(arr: ArrayData, p: java.util.regex.Pattern): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && p.matcher(arr.getUTF8String(i).toString).find()) c += 1
      i += 1
    }
    c
  }

  def countNonempty(arr: ArrayData): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && arr.getUTF8String(i).numBytes() > 0) c += 1
      i += 1
    }
    c
  }

  /** All `d` signed hashed-token-count features in ONE pass — per dim i,
    * equals
    * `aggregate(filter(words, t -> pmod(hash64(t), d) = i), 0L,
    *    (acc, t) -> acc + case when pmod(hash64(concat('s#', t)), 2) = 0
    *    then 1L else -1L end)`
    * (the linear-probe design row ran that fold d times, re-hashing every
    * word per dim through two interpreted lambdas). Null elements fall out
    * of the SQL filter (NULL predicate) — skipped here identically. Long
    * adds of ±1 commute exactly, so bucket order is irrelevant. */
  def probeFeatures(arr: ArrayData, d: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val acc = new Array[Long](d)
    val n = arr.numElements()
    val salt = "s#".getBytes("UTF-8")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val b = (Signatures.hash64(t) % d).toInt // hash64 ≥ 0 ⇒ pmod = %
        val tb = t.getBytes
        val buf = new Array[Byte](salt.length + tb.length)
        System.arraycopy(salt, 0, buf, 0, salt.length)
        System.arraycopy(tb, 0, buf, salt.length, tb.length)
        acc(b) += (if (Signatures.hash64(buf) % 2 == 0) 1L else -1L)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      acc.map(x => x: Any))
  }

  /** See [[ZipEqCountExpr]]. */
  def zipEqCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** Int fold like the SQL aggregate (widening happens at the caller's
    * cast); any null element nulls the fold. */
  def sumCharLengths(arr: ArrayData): java.lang.Integer = {
    val n = arr.numElements()
    var acc = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc += arr.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Integer.valueOf(acc)
  }
}

private[functions] trait FoldableRightStringArg { self: BinaryExpression =>
  protected def requireFoldableRight(what: String): TypeCheckResult =
    if (right.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal $what")
}

/** `count_in_set(array<string>, array<string>) -> int` — see [[TextKernels]]. */
case class CountInSetExpr(left: Expression, right: Expression)
    extends BinaryExpression with FoldableRightStringArg {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        requireFoldableRight("set array")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"count_in_set requires (ARRAY<STRING>, ARRAY<STRING>), got ${l.catalogString}, ${r.catalogString}")
    }
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val a = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) s.add(a.getUTF8String(i).clone())
      i += 1
    }
    s
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) null
    else TextKernels.countInSet(l.asInstanceOf[ArrayData], set)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("cisSet", set, "java.util.HashSet")
    val lEv = left.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"""
      ${lEv.code}
      boolean ${ev.isNull} = ${lEv.isNull};
      int ${ev.value} = 0;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.TextKernels.countInSet(${lEv.value}, $setRef);
      }""")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountInSetExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "count_in_set"
}

/** `count_rlike(array<string>, pattern) -> int` — see [[TextKernels]]. */
case class CountRlikeExpr(left: Expression, right: Expression)
    extends BinaryExpression with FoldableRightStringArg {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) => requireFoldableRight("pattern")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"count_rlike requires (ARRAY<STRING>, STRING), got ${l.catalogString}, ${r.catalogString}")
    }
  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(
      right.eval(null).asInstanceOf[UTF8String].toString)
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) null
    else TextKernels.countRlike(l.asInstanceOf[ArrayData], pattern)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("crPattern", pattern, "java.util.regex.Pattern")
    val lEv = left.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"""
      ${lEv.code}
      boolean ${ev.isNull} = ${lEv.isNull};
      int ${ev.value} = 0;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.TextKernels.countRlike(${lEv.value}, $pRef);
      }""")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountRlikeExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "count_rlike"
}

/** `count_nonempty(array<string>) -> int` — see [[TextKernels]]. */
case class CountNonemptyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_nonempty requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.countNonempty(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.countNonempty($c)")
  override protected def withNewChildInternal(newChild: Expression): CountNonemptyExpr =
    copy(child = newChild)
  override def prettyName: String = "count_nonempty"
}

/** `sum_char_lengths(array<string>) -> int` — see [[TextKernels]]. */
case class SumCharLengthsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true // a null ELEMENT nulls the fold
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sum_char_lengths requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.sumCharLengths(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sclRes")
      s"""java.lang.Integer $r = graft.functions.TextKernels.sumCharLengths($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): SumCharLengthsExpr =
    copy(child = newChild)
  override def prettyName: String = "sum_char_lengths"
}

/** `probe_features(array<string>, d) -> array<bigint>` — see
  * [[TextKernels.probeFeatures]]. `d` must be a literal positive int. */
case class ProbeFeaturesExpr(left: Expression, right: Expression)
    extends BinaryExpression with FoldableRightStringArg {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => requireFoldableRight("dim count")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"probe_features requires (ARRAY<STRING>, INT), got ${l.catalogString}, ${r.catalogString}")
    }
  @transient private lazy val d: Int = right.eval(null).asInstanceOf[Int]
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) null
    else TextKernels.probeFeatures(l.asInstanceOf[ArrayData], d)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lEv = left.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code = code"""
      ${lEv.code}
      boolean ${ev.isNull} = ${lEv.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.functions.TextKernels.probeFeatures(${lEv.value}, $d);
      }""")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ProbeFeaturesExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "probe_features"
}

/** `zip_eq_count(array<bigint>, array<bigint>) -> int` — equals
  * `size(filter(zip_with(a, b, (x, y) -> x = y), v -> v))`: positions where
  * both sides are non-null and equal (zip_with pads the short side with
  * nulls and `null = y` is NULL, which the filter drops — so only the
  * common prefix can count). The MinHash signature-agreement kernel,
  * previously two interpreted lambdas per candidate pair. */
case class ZipEqCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zip_eq_count requires ARRAY<BIGINT> args, got ${l.catalogString}, ${r.catalogString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.zipEqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextKernels.zipEqCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZipEqCountExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "zip_eq_count"
}
