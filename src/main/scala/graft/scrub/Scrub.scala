package graft.scrub

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII/toxicity scrubbing as a frozen, ordered chain of
  * `regexp_replace` Catalyst expressions (UDF-free, codegen'd).
  *
  * The rule list and its order are versioned constants: exact
  * scrubbed-caption equality is a correctness gate (BASELINE.md), so the
  * chain must never be reordered silently — bump [[version]] on any
  * change. Replacement tokens are chosen so no pattern can match a
  * token, making the chain idempotent (property-tested).
  *
  * This operator has no reference counterpart (north-rule addition M16 in
  * SURVEY.md §2.8); the reference's nearest analog is its regex status
  * relabeling (/root/reference/backendClasses/DQTestToolHelper.py:96).
  */
object Scrub {
  val version = 1

  /** (name, pattern, replacement) — order is semantic and frozen. */
  val rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\+?\\d{1,2}[-. ]\\(?\\d{3}\\)?[-. ]\\d{3}[-. ]\\d{4}|\\(\\d{3}\\)[-. ]?\\d{3}[-. ]\\d{4}|\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("url", "https?://[^\\s]+", "<URL>"),
    ("toxicity", "(?i)\\b(?:unclefucker|shitweasel|assclown)\\b", "<TOX>")
  )

  /** The scrub chain as one Column expression (built-in regexp_replace
    * chain — the oracle-parity surface, q19). The engine hot path uses
    * the native single-pass expression instead
    * (org.apache.spark.sql.graft.Exprs.scrubAll → [[scrubString]]):
    * each chained regexp_replace round-trips UTF8String ↔ String and
    * allocates an intermediate result per rule per row, and that
    * allocation rate was the worst-scaling component of the score phase
    * at 32 threads (1.57× for 4× threads). Semantics are identical
    * (same java.util.regex patterns, same order — parity-tested). */
  def scrub(caption: Column): Column =
    rules.foldLeft(caption) { case (c, (_, pat, rep)) => regexp_replace(c, pat, rep) }

  private val compiled: Array[(java.util.regex.Pattern, String)] =
    rules.map { case (_, pat, rep) =>
      (java.util.regex.Pattern.compile(pat), rep)
    }.toArray

  /** One-pass scalar scrub: ONE UTF8String↔String conversion per row
    * (inside the native expression), precompiled patterns, and a
    * zero-allocation fast path for the no-match case (the overwhelming
    * majority of captions). Exact-equality parity with [[scrub]] and the
    * DuckDB oracle chain is test-gated. */
  def scrubString(s: String): String = {
    var cur = s
    var i = 0
    while (i < compiled.length) {
      val (p, rep) = compiled(i)
      val m = p.matcher(cur)
      if (m.find()) cur = m.replaceAll(rep)
      i += 1
    }
    cur
  }
}
