package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._

/** Null-ELEMENT semantics of the native array kernels (r14 functions-layer
  * review): before this round, an array containing a null element was
  * UNDEFINED input — Unsafe getters silently read 0/garbage (a
  * plausible-looking wrong vec_dot) and string getters NPE'd. Now any
  * null element yields NULL, which for simhash48/minhash_sig/vec_dot is
  * exactly the SQL higher-order-function twin's answer (a null lambda
  * result nulls the fold) and for sorted_overlap/winnow_min is the
  * documented strict contract. Both execution paths are pinned: the SQL
  * route (codegen) and direct Expression.eval (interpreted), so the
  * eval/doGenCode pair cannot diverge on the guarded branch. */
class FunctionNullSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    graft.GraftExtensions.ensureRegistered(s)
    s
  }

  test("null elements yield NULL through SQL/codegen; vec_dot agrees with its zip_with twin") {
    // inputs reference a column (id) so ConstantFolding cannot pre-compute
    // them on the interpreted path — this run goes through doGenCode's
    // guarded branch
    val r = spark.range(1).selectExpr(
        "IF(id >= 0, CAST(NULL AS STRING), 'x') AS ns",
        "IF(id >= 0, CAST(NULL AS BIGINT), 1L) AS nl",
        "IF(id >= 0, CAST(NULL AS DOUBLE), 1.0D) AS nd")
      .selectExpr(
        "simhash48(array('a', ns)) AS sh",
        "minhash_sig(array('a', ns)) AS mh",
        "sorted_overlap(array(1L, nl), array(1L)) AS so",
        "vec_dot(array(1.0D, nd), array(2.0D, 3.0D)) AS vd",
        """aggregate(zip_with(array(1.0D, nd), array(2.0D, 3.0D),
          |                   (p, q) -> p * q),
          |          0.0D, (acc, v) -> acc + v) AS vd_twin""".stripMargin,
        "winnow_min(array(1L, nl), 1) AS wm")
      .collect().head
    (0 until 6).foreach { i =>
      assert(r.isNullAt(i), s"column $i must be NULL on a null element")
    }
  }

  test("a containsNull=true schema with NO actual nulls takes the guarded path value-identically") {
    // a nullable-bodied lambda DECLARES containsNull=true though it never
    // emits nulls here — the guarded codegen path must be value-identical
    // to the fast kernels (column-dependent input defeats constant folding)
    val nullableToks = "transform(split(text, ' '), t -> IF(length(t) < 0, NULL, t))"
    val df = spark.range(1).selectExpr(
        "concat('a b c', CASE WHEN id < 0 THEN ' x' ELSE '' END) AS text")
      .selectExpr(
        s"simhash48($nullableToks) AS sh",
        s"minhash_sig($nullableToks) AS mh",
        s"""vec_dot(
           |  transform(split(text, ' '),
           |    t -> IF(length(t) < 0, CAST(NULL AS DOUBLE), CAST(length(t) AS DOUBLE))),
           |  transform(split(text, ' '),
           |    t -> IF(length(t) < 0, CAST(NULL AS DOUBLE), CAST(2 AS DOUBLE)))) AS vd""".stripMargin)
    // precondition of the whole test: the inputs really are containsNull=true
    import org.apache.spark.sql.types.ArrayType
    val shInput = df.queryExecution.analyzed.expressions
      .flatMap(_.collect { case e: SimHash48Expr => e }).head
    assert(shInput.child.dataType.asInstanceOf[ArrayType].containsNull,
      "test input must DECLARE nullable elements to exercise the guarded path")
    val r = df.collect().head
    assert(r.getLong(0) === Signatures.simhash48Seq(Seq("a", "b", "c")))
    assert(r.getSeq[Long](1) === Signatures.minhashSigSeq(Seq("a", "b", "c")))
    assert(r.getDouble(2) === Signatures.vecDotSeq(Seq(1.0, 1.0, 1.0), Seq(2.0, 2.0, 2.0)))
  }

  test("interpreted eval matches: null on null elements, kernel values otherwise") {
    def strArr(xs: Seq[String]) =
      Literal.create(xs, ArrayType(StringType, containsNull = true))
    def lngArr(xs: Seq[java.lang.Long]) =
      Literal.create(xs, ArrayType(LongType, containsNull = true))
    def dblArr(xs: Seq[java.lang.Double]) =
      Literal.create(xs, ArrayType(DoubleType, containsNull = true))

    assert(SimHash48Expr(strArr(Seq("a", null))).eval(null) == null)
    assert(SimHash48Expr(strArr(Seq("a", "b"))).eval(null) ===
      Signatures.simhash48Seq(Seq("a", "b")))

    assert(MinHashSigExpr(strArr(Seq("a", null))).eval(null) == null)
    assert(MinHashSigExpr(strArr(Seq("a", "b"))).eval(null)
      .asInstanceOf[ArrayData].toLongArray().toSeq ===
      Signatures.minhashSigSeq(Seq("a", "b")))

    assert(SortedOverlapExpr(lngArr(Seq(1L, null)), lngArr(Seq(1L))).eval(null) == null)
    assert(SortedOverlapExpr(lngArr(Seq(1L, 3L)), lngArr(Seq(1L, 2L, 3L))).eval(null) === 2L)

    assert(VecDotExpr(dblArr(Seq(1.0, null)), dblArr(Seq(2.0, 3.0))).eval(null) == null)
    assert(VecDotExpr(dblArr(Seq(1.0, 2.0)), dblArr(Seq(2.0))).eval(null) == null,
      "length mismatch must stay NULL on the guarded path")
    assert(VecDotExpr(dblArr(Seq(1.0, 2.0)), dblArr(Seq(3.0, 4.0))).eval(null) === 11.0)

    assert(WinnowMinExpr(lngArr(Seq(5L, null)),
      Literal.create(1, IntegerType)).eval(null) == null)
    assert(WinnowMinExpr(lngArr(Seq(5L, 3L, 4L)),
      Literal.create(2, IntegerType)).eval(null)
      .asInstanceOf[ArrayData].toLongArray().toSeq ===
      Signatures.winnowMinSeq(Seq(5L, 3L, 4L), 2))
  }

  test("FunctionInjector registers the native expression on an already-built session") {
    // the ensureRegistered fallback path (sessions built without
    // spark.sql.extensions) now injects the SAME native builders instead
    // of hand-mirrored UDFs — prove the injector end to end under a
    // fresh name so it cannot collide with the extension-registered one
    org.apache.spark.sql.graftutil.FunctionInjector.register(spark,
      "vec_dot_injected", classOf[VecDotExpr].getName,
      exprs => VecDotExpr(exprs(0), exprs(1)))
    val r = spark.sql(
      "SELECT vec_dot_injected(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd, " +
        "vec_dot_injected(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) AS vdn")
      .collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.isNullAt(1), "injected expression must carry the null-element guard")
  }

  test("kernel nullability surfaces in the schema so optimizers keep null checks") {
    val df = spark.sql(
      "SELECT vec_dot(array(1.0D), array(1.0D)) AS vd, " +
        "simhash48(transform(split('a', ' '), t -> IF(length(t) < 0, NULL, t))) AS sh, " +
        "simhash48(split('a', ' ')) AS sh_fast")
    assert(df.schema("vd").nullable, "vec_dot must be declared nullable")
    assert(df.schema("sh").nullable,
      "simhash48 over a containsNull input must be declared nullable")
    // split() declares containsNull=false in Spark 4, so the fast path's
    // nullability stays the child's own — pinned so a Spark upgrade that
    // changes split's declaration is noticed here, not in a plan diff
    assert(!df.schema("sh_fast").nullable,
      "simhash48 over a non-null-element input should stay non-nullable")
  }
}
