package graft.decode

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Per-JVM counters of body sections actually parsed — the test seam that
  * makes section-pruned decode ([[BlockDecoder.decode]]'s `sections`
  * parameter) machine-checkable: `SectionPruningSpec` resets, runs a pruned
  * single-table extract, and asserts the pruned-away sections counted ZERO
  * parses (and seed-proves the counter by running the full decode). One
  * LongAdder increment per (block, parsed section) — noise next to the
  * parse itself. On a cluster these are per-executor diagnostics; the spec
  * runs local, where driver and executors share the JVM. */
object DecodeStats {
  private val parsed = new ConcurrentHashMap[String, LongAdder]()

  private[decode] def mark(section: String): Unit =
    parsed.computeIfAbsent(section, _ => new LongAdder).increment()

  def count(section: String): Long =
    Option(parsed.get(section)).map(_.sum).getOrElse(0L)

  def reset(): Unit = parsed.clear()
}
