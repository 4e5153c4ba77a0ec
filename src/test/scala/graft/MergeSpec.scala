package graft

import org.apache.spark.sql.Row
import graft.ops.{Dedup, Merge}
import org.apache.spark.sql.functions._

/** Merge-layer semantics from the reference's ON CONFLICT family
  * (/root/reference/apps/loader/load_warehouse.py:32-119,199-202,263-277):
  * NULL-preservation, insert-if-absent, per-column fact-merge policies,
  * idempotence, and NULL-key safety.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsertCoalesce: incoming NULLs never erase known values") {
    val existing = Seq(("AA", "AAL", "American")).toDF("iata", "icao", "name")
    val incoming = Seq(("AA", null: String, "American Airlines"))
      .toDF("iata", "icao", "name")
    val out = Merge.upsertCoalesce(existing, incoming, Seq("iata")).collect()
    assert(out.toSeq == Seq(Row("AA", "AAL", "American Airlines")))
  }

  test("upsertCoalesce: both sides' unmatched rows survive (full outer)") {
    val existing = Seq(("AA", "a")).toDF("k", "v")
    val incoming = Seq(("BB", "b")).toDF("k", "v")
    val out = Merge.upsertCoalesce(existing, incoming, Seq("k"))
      .orderBy("k").collect()
    assert(out.toSeq == Seq(Row("AA", "a"), Row("BB", "b")))
  }

  test("upsertCoalesce is idempotent: applying the same batch twice == once") {
    val existing = Seq(("AA", "AAL"), ("BB", null: String)).toDF("k", "v")
    val batch = Seq(("AA", null: String), ("BB", "BBL"), ("CC", "CCL")).toDF("k", "v")
    val once = Merge.upsertCoalesce(existing, batch, Seq("k"))
    val twice = Merge.upsertCoalesce(once, batch, Seq("k"))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("snapshotDiff: insert/delete/update classified; NULLs compare null-safe") {
    val old0 = Seq(
      (1L, Some(10.0), "a"),  // unchanged
      (2L, Some(20.0), "b"),  // updated payload
      (3L, None, "c"),        // NULL == NULL → unchanged
      (4L, Some(40.0), "d"))  // deleted
      .toDF("k", "price", "tag")
    val new0 = Seq(
      (1L, Some(10.0), "a"),
      (2L, Some(21.0), "b"),
      (3L, None, "c"),
      (5L, Some(50.0), "e"),  // inserted
      (6L, None, "f"))        // inserted with NULL payload
      .toDF("k", "price", "tag")
    val got = Merge.snapshotDiff(old0, new0, Seq("k"), Seq("price", "tag"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "update", 4L -> "delete",
      5L -> "insert", 6L -> "insert"))
    // NULL → value and value → NULL are updates, not unchanged
    val flip = Merge.snapshotDiff(
      Seq((7L, Option.empty[Double], "x")).toDF("k", "price", "tag"),
      Seq((7L, Some(1.0), "x")).toDF("k", "price", "tag"),
      Seq("k"), Seq("price", "tag")).as[(Long, String)].collect()
    assert(flip.toSeq == Seq((7L, "update")))
  }

  test("insertIfAbsent: existing rows never overwritten (DO NOTHING)") {
    val existing = Seq((1L, 2L, "old")).toDF("dep", "arr", "tag")
    val incoming = Seq((1L, 2L, "new"), (3L, 4L, "fresh")).toDF("dep", "arr", "tag")
    val out = Merge.insertIfAbsent(existing, incoming, Seq("dep", "arr"))
      .orderBy("dep").collect()
    assert(out.toSeq == Seq(Row(1L, 2L, "old"), Row(3L, 4L, "fresh")))
  }

  test("factMerge: overwrite vs coalesce vs greatest column policies") {
    val existing = Seq(("k1", "landed", 9.0, "p-old", 100L))
      .toDF("k", "status", "val", "pk", "ingest")
    // incoming row has NULL status (overwrite→NULL), NULL pk (coalesce→old),
    // smaller ingest (greatest→old)
    val incoming = Seq(("k1", null: String, 1.0, null: String, 50L))
      .toDF("k", "status", "val", "pk", "ingest")
    val out = Merge.factMerge(existing, incoming, Seq("k"),
      overwriteCols = Seq("status", "val"),
      coalesceCols = Seq("pk"), greatestCols = Seq("ingest")).collect()
    assert(out.toSeq == Seq(Row("k1", null, 1.0, "p-old", 100L)))
  }

  test("factMerge: insert-only and unmatched-existing rows survive") {
    val existing = Seq(("old", "s0", 0.0, "p0", 1L)).toDF("k", "status", "val", "pk", "ingest")
    val incoming = Seq(("new", "s1", 1.0, "p1", 2L)).toDF("k", "status", "val", "pk", "ingest")
    val out = Merge.factMerge(existing, incoming, Seq("k"),
      Seq("status", "val"), Seq("pk"), Seq("ingest")).orderBy("k").collect()
    assert(out.toSeq == Seq(
      Row("new", "s1", 1.0, "p1", 2L), Row("old", "s0", 0.0, "p0", 1L)))
  }

  test("latestPerKey: ties broken deterministically by tie-break column") {
    val df = Seq(
      ("u1", 10L, 1L, "first"), ("u1", 10L, 2L, "second"), ("u1", 5L, 3L, "older"))
      .toDF("k", "ts", "id", "tag")
    val out = Dedup.latestPerKey(df, Seq("k"), Seq(col("ts"), col("id"))).collect()
    assert(out.toSeq == Seq(Row("u1", 10L, 2L, "second")))
  }

  test("latestPerKey window form agrees with max_by form") {
    val df = Seq(
      ("a", 3L, 1L), ("a", 7L, 2L), ("b", 1L, 3L), ("b", 1L, 4L))
      .toDF("k", "ts", "id")
    val m = Dedup.latestPerKey(df, Seq("k"), Seq(col("ts"), col("id")))
      .orderBy("k").collect()
    val w = Dedup.latestPerKeyWindow(df, Seq("k"), Seq(col("ts"), col("id")))
      .orderBy("k").collect()
    assert(m.toSeq == w.toSeq)
  }

  test("duplicate + reordered staging batches converge (ST4 layering)") {
    val b1 = Seq(("k", 1L, "v1"), ("k", 2L, "v2")).toDF("key", "ts", "v")
    val b2 = Seq(("k", 2L, "v2"), ("k", 1L, "v1")).toDF("key", "ts", "v") // dup, reordered
    val merged = Dedup.latestPerKey(b1.unionByName(b2), Seq("key"), Seq(col("ts")))
    assert(merged.collect().toSeq == Seq(Row("k", 2L, "v2")))
  }

  test("NULL natural keys never merge with each other (equi-join NULL drop)") {
    val existing = Seq((Some("x"), "ex"), (None, "en")).toDF("k", "v")
    val incoming = Seq((Some("x"), "ix"), (None, "in")).toDF("k", "v")
    val out = Merge.upsertCoalesce(existing, incoming, Seq("k"))
    // full_outer USING-join keeps NULL-key rows distinct (no NULL=NULL match)
    assert(out.count() == 3)
    assert(out.filter(col("k").isNull).count() == 2)
  }

  test("changeFeed/applyChanges roundtrip: apply(old, feed(old,new)) ≡ new") {
    val oldS = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val newS = Seq((2L, "b", 25.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal") // 1 deleted, 2 updated, 3 unchanged, 4 inserted
    val feed = Merge.changeFeed(oldS, newS, Seq("k"), Seq("name", "bal"))
    val byChange = feed.collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(byChange == Map(1L -> "delete", 2L -> "update", 4L -> "insert"))
    val applied = Merge.applyChanges(oldS, feed, Seq("k"), Seq("name", "bal"))
    assert(applied.collect().toSet == newS.collect().toSet)
  }

  test("applyChanges: empty feed is the identity; delete-only feed removes rows") {
    val snap = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "bal")
    val none = Merge.changeFeed(snap, snap, Seq("k"), Seq("name", "bal"))
    assert(none.isEmpty)
    assert(Merge.applyChanges(snap, none, Seq("k"), Seq("name", "bal"))
      .collect().toSet == snap.collect().toSet)
    val gone = Merge.changeFeed(snap, snap.limit(0), Seq("k"), Seq("name", "bal"))
    assert(Merge.applyChanges(snap, gone, Seq("k"), Seq("name", "bal")).isEmpty)
  }

  test("incrementalAggApply: maintenance law apply(agg(old), feed) ≡ agg(new)") {
    def mkRows(seed: Int) = (0 until 120).map { i =>
      val h = i * 2654435761L + seed
      (i.toLong, s"g${h % 5}", BigDecimal((h % 1000) / 10.0).setScale(4))
    }
    // new snapshot: drop a band of keys, add another, move some rows
    // between groups, change some values
    val oldRows = mkRows(1).filter(_._1 % 10 < 8)
    val newRows = mkRows(1).filter(_._1 % 10 >= 2).map { case (k, g, v) =>
      val g2 = if (k % 13 == 0) "moved" else g
      val v2 = if (k % 7 == 0) v + 1 else v
      (k, g2, v2)
    }
    def agg(rows: Seq[(Long, String, BigDecimal)]) =
      rows.toDF("k", "grp", "value").groupBy(col("grp"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).as("sum_v"))
    val feed = Merge.changeFeedFull(
      oldRows.toDF("k", "grp", "value"), newRows.toDF("k", "grp", "value"),
      Seq("k"), Seq("grp", "value"))
    val applied = Merge.incrementalAggApply(agg(oldRows), feed, "grp", "value")
      .select(col("grp"), col("n"), col("sum_v").cast("decimal(18,4)"))
    val direct = agg(newRows)
      .select(col("grp"), col("n"), col("sum_v").cast("decimal(18,4)"))
    assert(applied.collect().toSet == direct.collect().toSet)
    // a group fully deleted must leave the view
    val gone = Merge.incrementalAggApply(agg(oldRows),
      Merge.changeFeedFull(oldRows.toDF("k", "grp", "value"),
        oldRows.filter(_._2 != "g0").toDF("k", "grp", "value"),
        Seq("k"), Seq("grp", "value")), "grp", "value")
    assert(gone.filter(col("grp") === "g0").isEmpty)
  }

  test("tableChecksum: order-free match, mutation pinpoints its bucket") {
    def sums(rows: Seq[(Long, String, String)]) =
      Merge.tableChecksum(rows.toDF("id", "b", "v"),
          Seq(col("id"), col("v")), col("b"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2))))
        .toMap
    val base = Seq((1L, "d1", "a"), (2L, "d1", "b"), (3L, "d2", "c"))
    // reordered copy fingerprints identically (commutative sum)
    assert(sums(base) == sums(base.reverse))
    // one mutated cell: that bucket's checksum moves, count does not;
    // the other bucket is untouched
    val mutated = sums(Seq((1L, "d1", "a"), (2L, "d1", "X"), (3L, "d2", "c")))
    val orig = sums(base)
    assert(mutated("d1")._1 == orig("d1")._1)
    assert(mutated("d1")._2 != orig("d1")._2)
    assert(mutated("d2") == orig("d2"))
  }

  test("tableChecksum: NULL sentinel keeps null position significant") {
    def one(a: Option[String], b: Option[String]) =
      Merge.tableChecksum(Seq((a, b)).toDF("x", "y"),
          Seq(col("x"), col("y")), lit("all"))
        .collect()(0).getDecimal(2)
    // concat_ws would collapse (a,NULL) and (NULL,a) without the sentinel
    assert(one(Some("a"), None) != one(None, Some("a")))
  }
}
