package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.{AsofJoin, RangeJoin}
import graft.stream.StreamDedup

/** Range-join quantization semantics, as-of join edge cases, and
  * streaming dedup bounded-state behavior. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin: inclusive bounds, multi-bucket intervals, no false pairs") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 100L))
      .toDF("id", "pt")
    val intervals = Seq((10L, 20L), (0L, 99L)).toDF("lo", "hi")
    val out = RangeJoin.rangeJoin(points, col("pt"),
        intervals, col("lo"), col("hi"), bucketWidth = 8L)
      .select("id", "lo", "hi").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 0L, 99L),            // 5 only in the wide interval
      (2L, 10L, 20L), (2L, 0L, 99L), // 10 inclusive lower bound, both
      (3L, 0L, 99L),            // 25 > 20 → only wide
      // 100 > 99 → nothing (4 absent)
      ))
  }

  test("rangeJoin ≡ naive BETWEEN join on random data (property)") {
    import org.scalacheck.Gen
    val pts = Gen.listOfN(200, Gen.chooseNum(0L, 500L)).sample.get
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
    val ivs = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 480L),
      Gen.chooseNum(0L, 60L))).sample.get.map { case (lo, w) => (lo, lo + w) }
    val points = pts.toDF("id", "pt")
    val intervals = ivs.toDF("lo", "hi")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "lo", "hi").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bucketed = asSet(RangeJoin.rangeJoin(points, col("pt"),
      intervals, col("lo"), col("hi"), bucketWidth = 64L))
    val naive = asSet(points.join(intervals,
      col("pt") >= col("lo") && col("pt") <= col("hi")))
    assert(bucketed == naive)
  }

  test("rangeJoin result is bucketWidth-invariant") {
    val points = (0L to 50L).map(i => (i, i * 3L)).toDF("id", "pt")
    val intervals = Seq((10L, 40L), (35L, 36L), (90L, 120L)).toDF("lo", "hi")
    def run(w: Long) = RangeJoin.rangeJoin(points, col("pt"),
        intervals, col("lo"), col("hi"), w)
      .select("id", "lo").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1L) == run(7L) && run(7L) == run(1000L))
  }

  test("asofJoin: no right row yet → NULLs; exact-ts tie is inclusive") {
    val left = Seq(("u1", 5L, "a"), ("u1", 10L, "b"), ("u2", 1L, "c"))
      .toDF("k", "ts", "lv")
    val right = Seq(("u1", 5L, 100.0), ("u1", 8L, 200.0))
      .toDF("k", "ts", "rv")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts")
      .orderBy("k", "ts").collect()
    assert(out(0).getDouble(out(0).fieldIndex("r_rv")) == 100.0) // ts=5 inclusive
    assert(out(1).getDouble(out(1).fieldIndex("r_rv")) == 200.0) // latest ≤ 10
    assert(out(2).isNullAt(out(2).fieldIndex("r_rv")))           // u2: none
  }

  test("asofJoin ≡ naive join+argmax on random keyed data (property)") {
    import org.scalacheck.Gen
    val rows = Gen.listOfN(300, for {
      k <- Gen.chooseNum(0, 8); ts <- Gen.chooseNum(0L, 50L)
      v <- Gen.chooseNum(0.0, 9.0)
    } yield (s"u$k", ts, v)).sample.get
    val left = rows.take(150).toDF("k", "ts", "lv")
    // right must be unique per (k, ts) — the operator's contract
    val right = rows.drop(150).toDF("k", "ts", "rv")
      .groupBy("k", "ts").agg(max("rv").as("rv"))
    val fast = AsofJoin.asofJoin(left, right, Seq("k"), "ts")
      .select("k", "ts", "lv", "r_ts", "r_rv")
      .collect().map(_.toSeq).toSet
    // reference implementation: quadratic join + latest-per-left-row argmax
    val naive = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.k").as("k"), col("l.ts").as("ts"), col("l.lv").as("lv"))
      .agg(max_by(struct(col("r.ts"), col("r.rv")), col("r.ts")).as("m"))
      .select(col("k"), col("ts"), col("lv"),
        col("m.ts").as("r_ts"), col("m.rv").as("r_rv"))
      .collect().map(_.toSeq).toSet
    assert(fast == naive)
  }

  test("streaming exact dedup: duplicates dropped within watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Obs]
    def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val q = StreamDedup.exactDedupStream(ms.toDF(), Seq("key"), "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode(OutputMode.Append).start()
    ms.addData(Obs("a", t("2024-05-09T10:00:00Z"), 1.0),
      Obs("a", t("2024-05-09T10:00:00Z"), 1.0)) // same-batch duplicate
    q.processAllAvailable()
    ms.addData(Obs("a", t("2024-05-09T10:10:00Z"), 2.0)) // dup key, within horizon
    q.processAllAvailable()
    assert(spark.table("dedup_sink").count() == 1) // only first occurrence
    q.stop()
  }
  test("overlapJoin: exact half-open overlap semantics, exactly-once " +
    "reporting across shared bins, abutting intervals excluded") {
    import graft.ops.RangeJoin
    val a = Seq((1L, 0L, 100L), (2L, 95L, 205L), (3L, 300L, 310L))
      .toDF("aid", "alo", "ahi")
    val b = Seq((10L, 90L, 120L), (20L, 100L, 300L), (30L, 310L, 320L))
      .toDF("bid", "blo", "bhi")
    // binWidth 50 -> intervals span multiple bins; pairs sharing
    // several bins (2-20 share bins 2,3,4) must appear ONCE
    val r = RangeJoin.overlapJoin(a, col("alo"), col("ahi"),
        b, col("blo"), col("bhi"), binWidth = 50L)
      .collect().map(x => (x.getLong(0), x.getLong(3)) -> x.getLong(6))
      .toMap
    // expected: (1,10) overlap [90,100) = 10; (2,10) [95,120) = 25;
    // (2,20) [100,205) = 105. NOT (1,20): [0,100) vs [100,300) abut.
    // NOT (3,30): [300,310) vs [310,320) abut.
    assert(r == Map((1L, 10L) -> 10L, (2L, 10L) -> 25L,
      (2L, 20L) -> 105L), r.toString)
    // exactly-once held under any bin width (dedupe is structural)
    for (w <- Seq(7L, 100L, 1000L)) {
      val rw = RangeJoin.overlapJoin(a, col("alo"), col("ahi"),
          b, col("blo"), col("bhi"), binWidth = w)
        .collect().map(x => (x.getLong(0), x.getLong(3)) -> x.getLong(6))
        .toMap
      assert(rw == r, s"binWidth $w changed the result: $rw")
    }
    // the plan is an equi-join on the bin, never a nested loop
    val plan = RangeJoin.overlapJoin(a, col("alo"), col("ahi"),
      b, col("blo"), col("bhi"), 50L).queryExecution.executedPlan
    assert(!plan.toString.contains("BroadcastNestedLoopJoin"), plan)
  }

}
