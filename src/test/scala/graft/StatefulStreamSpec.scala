package graft

import java.sql.Timestamp
import java.time.{Duration, Instant}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.Analytics
import graft.stream.StatefulLatest

case class Obs(key: String, ts: Timestamp, value: Double)

/** Stateful streaming semantics: flatMapGroupsWithState latest-per-key
  * with event-time TTL (streaming-native form of the loader's
  * DISTINCT ON + upsert), and Analytics.tumblingAgg running unchanged on
  * a watermarked stream (the batch/streaming-identical-plan claim).
  */
class StatefulStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.from(Instant.parse(s))

  test("streaming latestPerKey: latest wins, stale updates suppressed, TTL drops state") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Obs]
    val latest = StatefulLatest.latestPerKey[Obs](
      ms.toDS().withWatermark("ts", "0 seconds"),
      _.key, _.ts.getTime * 1000L, Duration.ofDays(3))
    val q = latest.writeStream.format("memory").queryName("latest_sink")
      .outputMode(OutputMode.Update).start()
    def sink() = spark.table("latest_sink").as[Obs].collect().toSeq

    // batch 1: two keys
    ms.addData(Obs("k1", t("2024-05-09T10:00:00Z"), 1.0),
      Obs("k2", t("2024-05-09T09:00:00Z"), 2.0))
    q.processAllAvailable()
    assert(sink().map(o => o.key -> o.value).toSet == Set("k1" -> 1.0, "k2" -> 2.0))

    // batch 2: stale k1 update suppressed; fresh k1 update emitted
    ms.addData(Obs("k1", t("2024-05-09T08:00:00Z"), 99.0))
    q.processAllAvailable()
    assert(sink().count(_.key == "k1") == 1) // no new emission for stale row
    ms.addData(Obs("k1", t("2024-05-09T11:00:00Z"), 3.0))
    q.processAllAvailable()
    assert(sink().filter(_.key == "k1").map(_.value).toSet == Set(1.0, 3.0))

    // advance the watermark > 3 days past k1/k2's latest → their state
    // times out (rows older than the watermark are late-dropped before the
    // state function, so expiry is observable as state-store shrinkage,
    // not as output: exactly the bounded-state property we need at scale)
    ms.addData(Obs("k9", t("2024-05-20T00:00:00Z"), 0.0))
    q.processAllAvailable() // watermark advances at end of this batch
    ms.addData(Obs("k10", t("2024-05-20T01:00:00Z"), 0.0))
    q.processAllAvailable() // timeouts fire during this batch
    val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
    assert(stateRows == 2L, s"expected k1/k2 expired, k9/k10 live; got $stateRows")
    q.stop()
  }

  test("session_window aggregation on a watermarked stream") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Obs]
    val agg = Analytics.sessionWindowAgg(
      ms.toDF().withWatermark("ts", "0 seconds"), col("key"), col("ts"), "30 minutes")
    val q = agg.writeStream.format("memory").queryName("sess_sink")
      .outputMode(OutputMode.Append).start()
    // two events 10 min apart (one session), one 2h later (new session)
    ms.addData(Obs("u1", t("2024-05-09T10:00:00Z"), 1.0),
      Obs("u1", t("2024-05-09T10:10:00Z"), 1.0),
      Obs("u1", t("2024-05-09T12:00:00Z"), 1.0))
    q.processAllAvailable()
    // close all sessions by advancing the watermark far ahead
    ms.addData(Obs("zz", t("2024-05-10T00:00:00Z"), 0.0))
    q.processAllAvailable()
    ms.addData(Obs("zz2", t("2024-05-11T00:00:00Z"), 0.0))
    q.processAllAvailable()
    val u1 = spark.table("sess_sink").filter(col("user_id") === "u1")
      .orderBy("session_start").collect()
    assert(u1.length == 2)
    assert(u1(0).getAs[Long]("n_events") == 2L) // merged 10:00+10:10
    assert(u1(1).getAs[Long]("n_events") == 1L)
    q.stop()
  }

  test("Trigger.AvailableNow drains pending data then stops on its own") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Obs]
    ms.addData(Obs("a", t("2024-05-09T10:00:00Z"), 1.0),
      Obs("b", t("2024-05-09T11:00:00Z"), 2.0))
    val q = ms.toDF().writeStream.format("memory").queryName("avnow_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode(OutputMode.Append).start()
    q.awaitTermination(30000) // self-terminates after draining
    assert(!q.isActive)
    assert(spark.table("avnow_sink").count() == 2)
  }

  test("tumblingAgg runs unchanged on a watermarked stream (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Obs]
    val agg = Analytics.tumblingAgg(
      ms.toDF().withWatermark("ts", "0 seconds"), col("ts"), "1 day", col("value"))
    val q = agg.writeStream.format("memory").queryName("win_sink")
      .outputMode(OutputMode.Append).start()

    ms.addData(Obs("a", t("2024-05-09T10:00:00Z"), 1.0),
      Obs("b", t("2024-05-09T11:00:00Z"), 2.5))
    q.processAllAvailable()
    // window not closed yet → nothing appended
    assert(spark.table("win_sink").isEmpty)

    // an event a day later closes the 05-09 window
    ms.addData(Obs("c", t("2024-05-10T00:00:01Z"), 7.0))
    q.processAllAvailable()
    val rows = spark.table("win_sink").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Timestamp]("window_start") == t("2024-05-09T00:00:00Z"))
    assert(rows(0).getAs[Long]("n") == 2L)
    assert(rows(0).getAs[Double]("sum_measure") == 3.5)
    q.stop()
  }
}
