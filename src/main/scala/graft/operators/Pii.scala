package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction — the scrubbing pass a training-data pipeline
 * runs before a corpus ships: find personally identifiable spans (emails,
 * phone numbers, IP addresses, national-id patterns) and replace them with
 * typed placeholder tokens.
 *
 * Everything is a narrow per-row projection over codegen'd regexp
 * expressions (`regexp_extract_all` / `regexp_replace`) — no shuffle, no
 * UDFs, no state; at 100 TB this runs at scan speed inside the same
 * whole-stage-codegen span as the surrounding filters. Patterns are written
 * in the common subset of Java regex (Spark) and RE2 (DuckDB/Go scrubbers):
 * explicit `[0-9]` classes, `\b` boundaries, no lookaround — so the oracle
 * verifies detection counts AND the redacted text (via fingerprint)
 * value-for-value.
 *
 * The synthetic corpus contains no organic PII, so [[augmentPii]]
 * deterministically plants one span of each kind on a doc_id stride —
 * mirrored in the oracle — exactly like [[Dedup.augmentedDocs]] plants
 * duplicates.
 */
object Pii {

  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b555-[0-9]{4}\\b"
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** (kind, pattern, placeholder) in redaction order. Patterns are mutually
    * exclusive here (no span matches two kinds), but more specific kinds
    * run first as a rule: an SSN-shaped span must become [SSN] before a
    * broader pattern could eat it. */
  val Kinds: Seq[(String, String, String)] = Seq(
    ("ssn", SsnRe, "[SSN]"),
    ("phone", PhoneRe, "[PHONE]"),
    ("ip", IpRe, "[IP]"),
    ("email", EmailRe, "[EMAIL]"))

  /** Deterministic PII planting (oracle-reproducible): appends one span of
    * each kind on a doc_id stride. */
  def augmentPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), trim(col("text")).as("text"), col("lang"))
      .withColumn("text", concat(
        col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call 555-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" host 10."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".0."),
            pmod(col("doc_id") * 7, lit(256)).cast("string")))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" id 123-45-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit(""))))

  private def countOf(pattern: String): Column =
    size(regexp_extract_all(col("text"), lit(pattern), lit(0))).cast("long")

  /** text with every PII span replaced by its typed placeholder. */
  def redacted(textCol: Column): Column =
    Kinds.foldLeft(textCol) { case (c, (_, pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }

  /** The four per-kind count columns appended in one narrow projection —
    * shared with the streaming monitor ([[graft.streaming.DocStream]]). */
  private[graft] def withCounts(df: DataFrame): DataFrame =
    df.withColumn("n_email", countOf(EmailRe))
      .withColumn("n_phone", countOf(PhoneRe))
      .withColumn("n_ip", countOf(IpRe))
      .withColumn("n_ssn", countOf(SsnRe))

  /** Per-document PII scan over ALREADY-DIRTY text — the production entry
    * point (mirrors [[Dedup]] exposing both augmented and raw-input APIs):
    * per-kind span counts plus a portable fingerprint of the redacted text
    * (verifying the replacement itself, not just the detection). Only
    * documents with at least one finding are emitted — at scale that keeps
    * the output proportional to findings, not corpus size. Expects
    * (doc_id, text) columns. */
  def scanRaw(dirty: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(dirty.sparkSession)
    dirty
      .withColumn("n_email", countOf(EmailRe))
      .withColumn("n_phone", countOf(PhoneRe))
      .withColumn("n_ip", countOf(IpRe))
      .withColumn("n_ssn", countOf(SsnRe))
      .filter(col("n_email") + col("n_phone") + col("n_ip") + col("n_ssn") > 0)
      .select(
        col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"), col("n_ssn"),
        call_function("hash64", redacted(col("text"))).as("redacted_fp"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-level scrub accounting over ALREADY-DIRTY text: total spans and
    * affected docs per kind. ONE corpus pass: all eight partial sums ride a
    * single aggregation to one row, unpivoted to per-kind rows afterwards
    * (`stack` over the 1-row result — free), never one scan per kind. */
  def summaryRaw(dirty: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(dirty.sparkSession)
    val kinds = Seq("email", "phone", "ip", "ssn")
    val scanned = dirty
      .withColumn("n_email", countOf(EmailRe))
      .withColumn("n_phone", countOf(PhoneRe))
      .withColumn("n_ip", countOf(IpRe))
      .withColumn("n_ssn", countOf(SsnRe))
    val sums = kinds.flatMap(k => Seq(
      sum(col(s"n_$k")).as(s"s_$k"),
      sum(when(col(s"n_$k") > 0, 1L).otherwise(0L)).as(s"d_$k")))
    val stackArgs = kinds.map(k => s"'$k', s_$k, d_$k").mkString(", ")
    scanned.agg(sums.head, sums.tail: _*)
      .select(expr(
        s"stack(${kinds.size}, $stackArgs) as (kind, n_spans, n_docs)"))
      .orderBy(col("kind"))
  }

  /** [[scanRaw]] over the deterministically planted corpus — the
    * oracle-verifiable harness entry point. */
  def piiScan(docs: DataFrame): DataFrame = scanRaw(augmentPii(docs))

  /** [[summaryRaw]] over the planted corpus (oracle twin). */
  def piiSummary(docs: DataFrame): DataFrame = summaryRaw(augmentPii(docs))
}
