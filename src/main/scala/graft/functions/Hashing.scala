package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Engine-portable deterministic hashing primitives.
 *
 * Every function here is chosen so the *identical* value is computable in
 * ANSI-ish SQL on other engines (the DuckDB oracle in particular) — that is
 * what lets the dedup / fingerprint / LSH operators be hash-verified
 * end-to-end rather than rows-only:
 *
 *  - `hash64(s)`  = first 15 hex chars of md5(s) parsed base-16 → a value in
 *    [0, 2^60) that fits a signed 64-bit int in any engine.
 *    DuckDB: `('0x' || substr(md5(s),1,15))::BIGINT`.
 *  - `rollingFingerprint` = left fold `acc = (acc*1000003 + h%P) % P` with
 *    P = 1e9+7; intermediate products stay < 2^63 so no engine overflows.
 *
 * All arithmetic is integer and sequence-ordered, so results are
 * bit-identical across engines. md5 is used as a *portable* mixer, not for
 * security. At 100 TB these evaluate inside whole-stage codegen (pure
 * Catalyst expressions — no UDFs anywhere in this file).
 */
object Hashing {

  /** 60-bit positive hash of a string column; portable across engines. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL-text form of [[hash64]] for use inside lambda expressions. */
  def hash64Sql(inner: String): String =
    s"cast(conv(substring(md5($inner), 1, 15), 16, 10) as bigint)"

  val FpPrime = 1000000007L

  /** Order-sensitive rolling (polynomial) fingerprint of an array<string>
    * column — the document-fingerprinting primitive (same shape as a Rabin
    * rolling hash, with engine-portable arithmetic). */
  def rollingFingerprint(tokensCol: String): Column =
    expr(
      s"""aggregate($tokensCol, cast(0 as bigint),
         |  (acc, t) -> (acc * 1000003 + ${hash64Sql("t")} % $FpPrime) % $FpPrime)
         |""".stripMargin)
}
