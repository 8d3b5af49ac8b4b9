package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Engine-portable deterministic hashing primitives, chosen so the
 * *identical* value is computable in ANSI-ish SQL on other engines (the
 * DuckDB oracle in particular) — that is what lets the dedup / fingerprint
 * / LSH operators be hash-verified end-to-end rather than rows-only.
 *
 * The scalar `hash64` definition (first 15 hex chars of md5, read base-16,
 * i.e. a value in [0, 2^60)) lives in [[Signatures.hash64]] and is exposed
 * as the native `hash64` SQL function via [[graft.GraftExtensions]];
 * DuckDB mirror: `('0x' || substr(md5(s),1,15))::BIGINT`.
 */
object Hashing {

  val FpPrime = 1000000007L

  /** Order-sensitive rolling (polynomial) fingerprint of an array<string>
    * column — the document-fingerprinting primitive (same shape as a Rabin
    * rolling hash, with engine-portable arithmetic: every intermediate
    * stays < 2^63). Callers must have run `GraftExtensions.ensureRegistered`
    * (the lambda resolves the native `hash64`). */
  def rollingFingerprint(tokensCol: String): Column =
    expr(
      s"""aggregate($tokensCol, cast(0 as bigint),
         |  (acc, t) -> (acc * 1000003 + hash64(t) % $FpPrime) % $FpPrime)
         |""".stripMargin)
}
