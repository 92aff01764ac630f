package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: replace email addresses, phone
  * numbers, and IPv4 addresses with typed placeholder tokens before any
  * downstream tokenization. Pure per-row `regexp_replace` chains — no
  * shuffle, fully codegen'd, and the patterns are written in the regex
  * subset Java (Spark) and RE2 (DuckDB/Go scanners) interpret
  * identically: character classes, bounded repetition, alternation — no
  * backreferences, no lookaround.
  *
  * Scale: embarrassingly parallel; the only cost is the regex scan per
  * row, which fuses into whole-stage codegen with the rest of the
  * cleaning pipeline.
  */
object TextRedact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** North-American-style groups (555-123-4567, 555 123 4567,
    * (555) 123-4567) — the fixture shapes; real deployments localize. */
  val PhonePattern =
    "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"
  val Ipv4Pattern =
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def redactEmails(c: Column): Column =
    regexp_replace(c, EmailPattern, "<EMAIL>")

  def redactPhones(c: Column): Column =
    regexp_replace(c, PhonePattern, "<PHONE>")

  def redactIpv4(c: Column): Column =
    regexp_replace(c, Ipv4Pattern, "<IP>")

  /** The standard chain: emails first (their local parts can contain
    * digits that would otherwise half-match phone shapes), then phones,
    * then IPs. */
  def redactPii(c: Column): Column =
    redactIpv4(redactPhones(redactEmails(c)))
}
