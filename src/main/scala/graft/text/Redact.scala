package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass every released training
  * corpus runs (emails, IPv4 addresses, long digit runs such as phone/card
  * numbers replaced by typed placeholder tokens, cf. the public Dolma/ROOTS
  * curation pipelines).
  *
  * Patterns are deliberately restricted to syntax with IDENTICAL semantics
  * under Java regex (Spark codegen's `regexp_replace`) and RE2 (DuckDB):
  * character classes, bounded repetition, `\b` ASCII word boundaries — no
  * backreferences, no lookaround. Replacement order matters and is fixed:
  * emails first (they contain dots and digits), then IPv4 (contains digit
  * runs), then bare long digit runs, so each later pattern only sees text
  * the earlier classes no longer match.
  *
  * 100 TB shape: pure per-row column expressions (regexp_replace /
  * regexp_extract_all), fully codegen'd, zero shuffle.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val DigitRunRe = "\\d{10,}"

  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val NumberTag = "<NUMBER>"

  /** Count of each PII class in the ORIGINAL text. */
  def emailCount(text: Column): Column = size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def ipv4Count(text: Column): Column = size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
  def digitRunCount(text: Column): Column = size(regexp_extract_all(text, lit(DigitRunRe), lit(0)))

  /** Text with all three classes replaced by placeholder tags, in the
    * documented order. */
  def redacted(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTag),
        Ipv4Re, IpTag),
      DigitRunRe, NumberTag)
}
