package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regex PII redaction for training-data scrubbing: emails, phone
  * numbers, and free-standing long digit runs (ids, account numbers).
  *
  * Patterns are restricted to syntax shared by java.util.regex (Spark's
  * codegen'd `regexp_replace`) and RE2 (DuckDB, Go scrubbers): character
  * classes, bounded repetition, `\b` anchors — no lookaround, no
  * backreferences. Row-local and codegen'd: scales linearly with the
  * corpus, no shuffle.
  */
object PiiRedact {

  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Phone = "\\b\\d{2}-\\d{3}-\\d{3}-\\d{4}\\b"
  val DigitRun = "\\d{6,}"

  def redact(c: Column, pattern: String, replacement: String): Column =
    regexp_replace(c, pattern, replacement)

  /** Emails first (before the digit-run rule can bite a numeric local
    * part), then phones, then free-standing long digit runs.
    */
  def redactPii(c: Column): Column =
    redact(redact(redact(c, Email, "[EMAIL]"), Phone, "[PHONE]"),
      DigitRun, "[NUM]")
}
