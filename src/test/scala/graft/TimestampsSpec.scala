package graft

import org.apache.spark.sql.functions._
import graft.expr.Timestamps

/** Each clean_ts rewrite branch from the reference
  * (/root/reference/apps/spark_app/flight_stream.py:163-194), plus
  * pass-through / NULL / garbage behavior of the full normalize+parse.
  */
class TimestampsSpec extends SparkSpec {
  import spark.implicits._

  private def parsed(s: String): Option[java.sql.Timestamp] = {
    val row = Seq(s).toDF("raw")
      .select(Timestamps.normalizeTs(col("raw")).cast("timestamp").as("ts"))
      .collect()(0)
    if (row.isNullAt(0)) None else Some(row.getTimestamp(0))
  }

  private def utc(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("Z suffix → +00:00") {
    assert(parsed("2024-05-01T10:20:30Z").contains(utc("2024-05-01T10:20:30Z")))
  }

  test("compact offset +0000 → +00:00") {
    assert(parsed("2024-05-01T10:20:30+0000").contains(utc("2024-05-01T10:20:30Z")))
    assert(parsed("2024-05-01T10:20:30-0500").contains(utc("2024-05-01T15:20:30Z")))
  }

  test("fractional seconds: trimmed to 3 digits, then NULL under TS_FMT (reference-faithful)") {
    // The reference's TS_FMT has no fractional pattern
    // (flight_stream.py:147), so even the cleaned ".123" form parses to
    // NULL there — we preserve that exact behavior.
    assert(parsed("2024-05-01T10:20:30.123456+00:00").isEmpty)
    assert(parsed("2024-05-01T10:20:30.123+00:00").isEmpty)
  }

  test("one-digit seconds padded") {
    assert(parsed("2024-05-01T10:20:3+00:00").contains(utc("2024-05-01T10:20:03Z")))
  }

  test("three-digit seconds clamped to two") {
    assert(parsed("2024-05-01T10:20:301+00:00").contains(utc("2024-05-01T10:20:30Z")))
  }

  test("missing seconds inserted") {
    assert(parsed("2024-05-01T10:20+00:00").contains(utc("2024-05-01T10:20:00Z")))
  }

  test("bare local timestamp assumed UTC") {
    assert(parsed("2024-05-01T10:20:30").contains(utc("2024-05-01T10:20:30Z")))
  }

  test("well-formed input passes through unchanged") {
    assert(parsed("2024-05-01T10:20:30+02:00").contains(utc("2024-05-01T08:20:30Z")))
  }

  test("garbage → NULL, not error") {
    val r = Seq("not a timestamp", "2024-13-45T99:99:99Z")
      .toDF("raw")
      .select(Timestamps.normalizeTs(col("raw")).as("ts"))
      .collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("NULL → NULL") {
    val r = Seq(Option.empty[String]).toDF("raw")
      .select(Timestamps.normalizeTs(col("raw")).as("ts")).collect()
    assert(r(0).isNullAt(0))
  }
}
