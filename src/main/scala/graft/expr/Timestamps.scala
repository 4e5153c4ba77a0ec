package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timestamp-string normalization + safe parsing.
  *
  * Re-expresses the reference's `clean_ts` normalizer
  * (/root/reference/apps/spark_app/flight_stream.py:149-196) as a pure
  * `Column => Column` chain of codegen'd built-ins. The six rewrite steps
  * are ORDER-DEPENDENT (millis-trim before seconds-pad etc.) and are kept
  * in the reference's order. Java regex replacement uses `$n` backrefs
  * (Python used `\1`); `$10$2` parses as group-1 + literal "0" + group-2
  * because the pattern has only two groups.
  */
object Timestamps {

  /** Spark ISO-8601 parse pattern with `+00:00`-style offset
    * (/root/reference/apps/spark_app/flight_stream.py:147). */
  val TsFmt = "yyyy-MM-dd'T'HH:mm:ssXXX"

  /** Normalize an ISO-8601-ish timestamp string so it parses under
    * [[TsFmt]]. Handles: `Z`→`+00:00`; `+0000`→`+00:00`; trims fractional
    * seconds to 3 digits; pads 1-digit seconds; clamps 3-digit seconds;
    * inserts missing `:00` seconds; appends `+00:00` when no zone.
    * Unsalvageable inputs pass through (and later parse to NULL). */
  def cleanTs(c0: Column): Column = {
    var c = regexp_replace(c0, "Z$", "+00:00")
    c = regexp_replace(c, "([+-]\\d{2})(\\d{2})$", "$1:$2")
    c = regexp_replace(c, "(\\.\\d{3})\\d+", "$1")
    // 1-digit seconds → pad: "T00:05:2" → "T00:05:02"
    c = regexp_replace(
      c, "(T\\d{2}:\\d{2}:)(\\d)(?=(?:\\.\\d{1,3}|[+-]\\d{2}:\\d{2}|$))", "$10$2")
    // 3-digit seconds → keep first two
    c = regexp_replace(
      c, "(T\\d{2}:\\d{2}:)(\\d{2})\\d(?=(?:\\.\\d{1,3}|[+-]\\d{2}:\\d{2}|$))", "$1$2")
    // missing seconds → insert ":00"
    c = regexp_replace(
      c, "(T\\d{2}:\\d{2})(?=(?:\\.\\d{1,3}|[+-]\\d{2}:\\d{2}|$))", "$1:00")
    // bare local timestamp → assume UTC
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}$"),
      concat_ws("", c, lit("+00:00"))).otherwise(c)
  }

  /** NULL-on-failure timestamp parse (ANSI-safe): the reference relies on
    * non-ANSI `to_timestamp` returning NULL for junk
    * (flight_stream.py:205-212); under Spark 4 ANSI we use
    * `try_to_timestamp` for identical semantics. */
  def parseTs(c: Column, fmt: String = TsFmt): Column =
    try_to_timestamp(c, lit(fmt))

  /** cleanTs + parse via composed built-ins — the reference-literal form,
    * kept as the property-test twin of the native expression. */
  def normalizeTsChain(c: Column): Column = parseTs(cleanTs(c))

  /** cleanTs + parse in one step — the canonical ingest path. Uses the
    * native single-pass [[graft.expr.catalyst.NormalizeTs]] expression
    * (~7× less string work than the 6-regex chain, still codegen'd);
    * semantically identical to [[normalizeTsChain]] (property-tested). */
  def normalizeTs(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.catalyst.NormalizeTs(
        org.apache.spark.sql.GraftBridge.expression(c)))
}
