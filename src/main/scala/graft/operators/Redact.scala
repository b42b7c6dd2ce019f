package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pattern redaction for training-data pipelines: replace every match
  * of a regex with a placeholder token and count what was removed.
  * Embarrassingly parallel (pure per-row projection, codegen'd
  * regexp_replace) — the scrubbing pass that precedes tokenization.
  *
  * Patterns stay in the common Java-regex/RE2 subset (character
  * classes, quantifiers, word boundaries — no backrefs/lookaround) so
  * the DuckDB oracle replays them verbatim; DuckDB needs the 'g' flag
  * for replace-ALL, which is Spark's only behavior.
  */
object Redact {

  /** Email addresses — common-subset regex, replayable in RE2. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone numbers. */
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\\b"

  /** Dotted-quad IPv4 addresses. */
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def redact(c: Column, pattern: String, token: String): Column =
    regexp_replace(c, pattern, token)

  /** How many spans the redaction removed. */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** The standard PII scrub pass: emails, then phones, then IPv4 — a
    * fixed order so overlapping spans resolve deterministically (email
    * local parts may contain digits; an earlier pass must not leave a
    * fragment a later pattern half-matches). One chained codegen'd
    * projection — row-local at any corpus size.
    */
  def scrubPii(c: Column): Column =
    redact(redact(redact(c, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>"), Ipv4Pattern, "<IP>")
}
