package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-corpus curation: emails, IPv4 addresses,
  * and phone numbers replaced by stable placeholder tags.
  *
  * Pure `regexp_replace`/`regexp_count` built-ins — codegen'd, scan-speed,
  * no UDFs. Patterns are deliberately RE2-compatible (no backrefs or
  * lookaround) so the same pattern text runs in Spark, DuckDB, and any
  * RE2-based scrubber, and the redaction is reproducible across engines.
  *
  * Order matters and is fixed: emails first (their domain part must not
  * be half-eaten by the IP rule), then IPs, then phones.
  */
object Pii {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** All three rules in canonical order, with their placeholder tags. */
  val Rules: Seq[(String, String)] = Seq(
    EmailPattern -> "[EMAIL]",
    Ipv4Pattern -> "[IP]",
    PhonePattern -> "[PHONE]")

  /** Redact all PII classes (canonical rule order). */
  def scrub(text: Column): Column =
    Rules.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Number of redactions [[scrub]] performs: each rule counts on the
    * PROGRESSIVELY scrubbed text (the same fold as scrub), so PII
    * classes embedded in an earlier class's match — a phone number used
    * as an email local-part, an IP-shaped domain — are not
    * double-counted, and `countPii` always equals the number of
    * placeholder insertions. */
  def countPii(text: Column): Column =
    Rules.foldLeft((lit(0).cast("long"), text)) {
      case ((n, t), (pat, tag)) =>
        (n + regexp_count(t, lit(pat)), regexp_replace(t, pat, tag))
    }._1
}
