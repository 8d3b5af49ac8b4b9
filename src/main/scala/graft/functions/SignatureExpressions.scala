package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen kernels for the dedup signature operators. Semantically
 * identical to the SQL higher-order-function formulations (and to the
 * DuckDB oracle SQL) — `hash64(s)` is the first 15 hex chars of md5(s)
 * read base-16 — but evaluated as tight JVM loops with a reused
 * MessageDigest instead of per-element interpreted lambdas. On the sf0.1
 * corpus this turns the SimHash/MinHash stages from the benchmark's top
 * hotspot into noise (the HOF `aggregate`/`transform` path allocates
 * boxed rows per lambda call; these do zero allocation per element).
 */
object Signatures {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5 as a non-negative long — equals
    * `conv(substring(md5(s),1,15),16,10)` / DuckDB
    * `('0x'||substr(md5(s),1,15))::BIGINT`. */
  def hash64(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(bytes)
    // first 15 hex chars = top 60 bits of the first 8 bytes
    (((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) | ((h(2) & 0xffL) << 40) |
      ((h(3) & 0xffL) << 32) | ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) >>> 4
  }

  def hash64(s: UTF8String): Long = hash64(s.getBytes)

  def hash64String(s: String): Long = hash64(s.getBytes("UTF-8"))

  val SimhashBits = 48

  /** 48-bit SimHash of a token array (with multiplicity). */
  def simhash48(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](SimhashBits)
    var i = 0
    while (i < n) {
      val h = hash64(arr.getUTF8String(i))
      var b = 0
      while (b < SimhashBits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < SimhashBits) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  def simhash48Seq(tokens: scala.collection.Seq[String]): Long = {
    val counts = new Array[Int](SimhashBits)
    tokens.foreach { t =>
      val h = hash64String(t)
      var b = 0
      while (b < SimhashBits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < SimhashBits) { if (counts(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  val MinhashK = 12

  /** k MinHash components over a shingle set: component i is the min over
    * shingles s of hash64(s + "#" + i). */
  def minhashSig(arr: ArrayData): ArrayData = {
    val mins = minhashSigRaw(
      (0 until arr.numElements()).iterator.map(i => arr.getUTF8String(i).getBytes))
    new GenericArrayData(mins)
  }

  def minhashSigSeq(shingles: scala.collection.Seq[String]): Seq[Long] =
    minhashSigRaw(shingles.iterator.map(_.getBytes("UTF-8"))).toSeq

  private def minhashSigRaw(shingles: Iterator[Array[Byte]]): Array[Long] = {
    val mins = Array.fill(MinhashK)(Long.MaxValue)
    val suffixes = Array.tabulate(MinhashK)(i => s"#$i".getBytes("UTF-8"))
    shingles.foreach { s =>
      var i = 0
      while (i < MinhashK) {
        val buf = new Array[Byte](s.length + suffixes(i).length)
        System.arraycopy(s, 0, buf, 0, s.length)
        System.arraycopy(suffixes(i), 0, buf, s.length, suffixes(i).length)
        val h = hash64(buf)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    // empty shingle set → null-free sentinel of MaxValue mirrors SQL
    // list_min over empty (callers filter size >= 3 anyway)
    mins
  }
}

/** `simhash48(array<string>) -> bigint` — native, codegen'd. */
case class SimHash48Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash48 requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    Signatures.simhash48(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.simhash48($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash48Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash48"
}

/** `minhash_sig(array<string>) -> array<bigint>` — native, codegen'd. */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    Signatures.minhashSig(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.minhashSig($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** `hash64(string) -> bigint` — the portable md5-based mixer. */
case class Hash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash64 requires STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    Signatures.hash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.hash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Hash64Expr =
    copy(child = newChild)
  override def prettyName: String = "hash64"
}
