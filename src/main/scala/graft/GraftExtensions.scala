package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Hash64Expr, HexPopcount, MinHashSigExpr, Signatures, SimHash48Expr, SortedOverlapExpr, VecDotExpr, WinnowMinExpr, WordNgramsExpr, WordShinglesExpr}

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
    e.injectFunction((
      FunctionIdentifier("simhash48"),
      new ExpressionInfo(classOf[SimHash48Expr].getName, "simhash48"),
      (exprs: Seq[Expression]) => SimHash48Expr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSigExpr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("hash64"),
      new ExpressionInfo(classOf[Hash64Expr].getName, "hash64"),
      (exprs: Seq[Expression]) => Hash64Expr(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("sorted_overlap"),
      new ExpressionInfo(classOf[SortedOverlapExpr].getName, "sorted_overlap"),
      (exprs: Seq[Expression]) => SortedOverlapExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShinglesExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgramsExpr].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => WordNgramsExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("winnow_min"),
      new ExpressionInfo(classOf[WinnowMinExpr].getName, "winnow_min"),
      (exprs: Seq[Expression]) => WinnowMinExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotExpr].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDotExpr(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  /** Make graft functions callable on a session that was built without the
    * extension (e.g. a driver-provided smoke session): falls back to plain
    * UDFs with identical semantics (slower — no codegen — but correct). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registered =
      try { spark.sql("SELECT hex_popcount('0x0f'), hash64('x')").collect(); true }
      catch { case _: Exception => false }
    if (!registered) {
      // Null semantics must MATCH the native expressions: every native
      // kernel is a nullSafeEval (NULL in → NULL out), but Spark passes
      // nulls through to reference-typed Scala UDF args, so an unguarded
      // lambda NPEs the task where the expression nulls the row; and
      // vec_dot's native form additionally nulls LENGTH-MISMATCHED arrays
      // (a truncated partial dot must never flow into rankings).
      spark.udf.register("hex_popcount",
        (s: String) => Option(s).map(HexPopcount.count))
      spark.udf.register("hash64",
        (s: String) => Option(s).map(Signatures.hash64String))
      spark.udf.register("simhash48",
        (ts: Seq[String]) => Option(ts).map(Signatures.simhash48Seq))
      spark.udf.register("minhash_sig",
        (ts: Seq[String]) => Option(ts).map(Signatures.minhashSigSeq))
      spark.udf.register("sorted_overlap",
        (a: Seq[Long], b: Seq[Long]) =>
          if (a == null || b == null) None
          else Some(Signatures.sortedOverlapSeq(a, b)))
      spark.udf.register("word_shingles",
        (s: String, n: Int) => Option(s).map(Signatures.wordShinglesSeq(_, n)))
      spark.udf.register("word_ngrams",
        (s: String, n: Int) => Option(s).map(Signatures.wordNgramsSeq(_, n)))
      spark.udf.register("winnow_min",
        (hs: Seq[Long], w: Int) => Option(hs).map(Signatures.winnowMinSeq(_, w)))
      spark.udf.register("vec_dot",
        (a: Seq[Double], b: Seq[Double]) =>
          if (a == null || b == null || a.length != b.length) None
          else Some(Signatures.vecDotSeq(a, b)))
    }
  }
}
