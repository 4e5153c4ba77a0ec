package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal binary-column plumbing: media table shape, per-partition
  * batched decode (stubbed codec), metadata projection. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "a"), (3L, ""))
    .toDF("doc_id", "text")

  test("asMediaTable: payload bytes round-trip, metadata consistent") {
    val m = Multimodal.asMediaTable(docs).orderBy("doc_id").collect()
    assert(new String(m(0).getAs[Array[Byte]]("media"), "UTF-8") == "hello world")
    assert(m(0).getAs[Long]("n_bytes") == 11L)
    assert(m(0).getAs[String]("format") == "utf8-text")
    assert(m(2).getAs[Long]("n_bytes") == 0L)
  }

  test("decodeFeatures: deterministic fixed-width features per partition batch") {
    val media = Multimodal.asMediaTable(docs).as[Multimodal.MediaRow]
    val f1 = Multimodal.decodeFeatures(media, dim = 8).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(media.repartition(3), dim = 8)
      .collect().sortBy(_.doc_id)
    assert(f1.forall(_.features.length == 8))
    // partitioning must not change the decoded features (pure per-row fn)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    assert(f1(0).n_bytes == 11L)
  }

  test("frameSample: stride-sampled frame indices, stable hashes, short-doc empty") {
    // 10-byte frames, every 2nd frame: a 35-byte doc has frames 0,1,2 → keep 0,2
    val d = Seq((1L, "x" * 35), (2L, "y" * 9)).toDF("doc_id", "text")
    val m = Multimodal.frameSample(Multimodal.asMediaTable(d),
      frameBytes = 10, stride = 2)
    val rows = m.orderBy("doc_id", "frame_idx").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 0L), (1L, 2L)))          // doc 2 shorter than one frame: no rows
    // frame hash = md5 of exactly that 10-byte slice
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(("x" * 10).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows(0).getString(2) == expect)
    assert(rows(1).getString(2) == expect) // same bytes at idx 2 ("x"*10 again)
  }

  test("batchedInfer: batch size bounded, results row-aligned, batch-invariant") {
    val docs9 = (1L to 9L).map(i => (i, s"doc number $i content")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs9).as[Multimodal.MediaRow]
    val seen = spark.sparkContext.collectionAccumulator[Int]("batch_sizes")
    val out = Multimodal.batchedInfer(media.repartition(2), batchSize = 4) {
      batch => seen.add(batch.length)
        batch.map(r => Multimodal.fakeDecodeFeatures(r.media, 8))
    }.collect().sortBy(_.doc_id)
    assert(out.length == 9)
    import scala.jdk.CollectionConverters._
    assert(seen.value.asScala.forall(_ <= 4)) // no batch exceeds the bound
    // batch boundaries must not change per-row results
    val whole = Multimodal.batchedInfer(media, batchSize = 100)()
      .collect().sortBy(_.doc_id)
    assert(out.map(_.features.toSeq).toSeq == whole.map(_.features.toSeq).toSeq)
  }

  test("resizeStub: fixed output geometry, deterministic, empty-input safe") {
    val media = Multimodal.asMediaTable(docs).as[Multimodal.MediaRow]
    val thumbs = Multimodal.resizeStub(media, 4, 3).collect().sortBy(_.doc_id)
    assert(thumbs.forall(t => t.thumb.length == 12 && t.width == 4 && t.height == 3))
    // content-dependent: "hello world" cycled into 12 bytes
    assert(new String(thumbs(0).thumb, "UTF-8") == "hello worldh")
    // empty payload → zeroed buffer, not a crash
    assert(thumbs(2).thumb.forall(_ == 0))
    // same input partitioned differently → same thumbs
    val again = Multimodal.resizeStub(media.repartition(3), 4, 3)
      .collect().sortBy(_.doc_id)
    assert(thumbs.map(_.thumb.toSeq).toSeq == again.map(_.thumb.toSeq).toSeq)
  }

  test("mediaMeta: chunk plan matches byte length") {
    val m = Multimodal.mediaMeta(docs, chunkBytes = 4).orderBy("doc_id").collect()
    assert(m(0).getAs[Long]("byte_len") == 11L)
    assert(m(0).getAs[Long]("n_chunks") == 3L) // ceil(11/4)
    assert(m(2).getAs[Long]("n_chunks") == 0L)
  }
  test("mediaNearDup: shared-frame Jaccard by hand; sub-frame payloads " +
    "absent; threshold filters; exact-dup payloads hit 1.0 on the " +
    "real corpus") {
    import graft.ops.Multimodal
    // 8-byte frames, stride 1: a = [AAAAAAAA][BBBBBBBB][CCCCCCCC],
    // b shares two of a's three frames, c shares none, d is too short
    val docs = Seq(
      (1L, "AAAAAAAA" + "BBBBBBBB" + "CCCCCCCC"),
      (2L, "AAAAAAAA" + "BBBBBBBB" + "DDDDDDDD"),
      (3L, "EEEEEEEE" + "FFFFFFFF" + "GGGGGGGG"),
      (4L, "short")).toDF("doc_id", "text")
    val r = Multimodal.mediaNearDup(Multimodal.asMediaTable(docs),
        0.3, 8, 1)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    assert(r == Map((1L, 2L) -> ((2L, 3L, 3L, 0.5))))
    // real corpus at the q187 parameters: bounds hold and exact text
    // dups surface as jaccard-1.0 media pairs
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Multimodal.mediaNearDup(Multimodal.asMediaTable(corpus),
      0.3, 32, 1).collect()
    got.foreach { x =>
      assert(x.getDouble(5) >= 0.3 && x.getDouble(5) <= 1.0)
      assert(x.getLong(2) <= math.min(x.getLong(3), x.getLong(4)))
    }
    val exactDups = corpus.groupBy(col("text")).count()
      .filter(col("count") > 1).count()
    if (exactDups > 0)
      assert(got.exists(_.getDouble(5) == 1.0),
        "exact payload dups must score 1.0")
  }
  test("dhashNearDup: identical payloads pair at hamming 0; a local " +
    "suffix edit stays near; candidates only via band match") {
    import graft.ops.Multimodal
    val base = "the quick brown fox jumps over the lazy dog " * 20
    val docs = Seq(
      (1L, base),
      (2L, base),                             // exact dup -> hamming 0
      (3L, base.dropRight(30) + "EDITED TAIL SUFFIX CHANGED HERE"),
      (4L, scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).alphanumeric.take(base.length).mkString))
      .toDF("doc_id", "text")
    val r = Multimodal.dhashNearDup(docs, col("doc_id"), col("text"),
        maxHamming = 6)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(r.get((1L, 2L)).contains(0L), s"exact dup must hash equal: $r")
    // the suffix edit touches only trailing cells: few bits flip
    assert(r.contains((1L, 3L)) && r((1L, 3L)) <= 6L, s"local edit: $r")
    // the random doc shares no band with base (overwhelmingly) — and if
    // it ever did, its hamming would exceed the threshold
    assert(!r.keys.exists(k => k._1 == 4L || k._2 == 4L))
    // bits are a pure function: repartition changes nothing
    val r2 = Multimodal.dhashNearDup(docs.repartition(5), col("doc_id"),
        col("text"), maxHamming = 6)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(r2 == r)
  }

  test("mediaQualityGates: geometry flags by hand — zero dimension, " +
    "extreme aspect, and healthy payloads") {
    import graft.ops.Multimodal
    // n_bytes = 640k -> width 0 (fails dims); pick sizes by arithmetic
    def mk(n: Int) = "x" * n
    val docs = Seq(
      (1L, mk(640)),   // width = 0 -> f_dims false, admit false
      (2L, mk(500)),   // w=500 h=20 -> aspect 25 -> f_aspect false
      (3L, mk(341)))   // w=341 h=341 -> aspect 1, bpp ~0.0029 -> density fails
      .toDF("doc_id", "text")
    val r = Multimodal.mediaQualityGates(Multimodal.asMediaTable(docs))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r(1L).getBoolean(6) && !r(1L).getBoolean(9)) // f_dims, admit
    assert(r(2L).getBoolean(6) && !r(2L).getBoolean(7))  // dims ok, aspect out
    assert(r(3L).getBoolean(6) && r(3L).getBoolean(7) &&
      !r(3L).getBoolean(8)) // bpp = 341/341^2 < 0.05
    // every flag NULL-safe: no NULL admit anywhere
    assert(r.values.forall(!_.isNullAt(9)))
  }

  test("mediaSemDedup: duplicate payloads collapse to the smaller id; " +
    "survivors carry their bucket") {
    import graft.ops.Multimodal
    val base = "some representative media payload content " * 10
    val other = "completely different other content entirely " * 10
    val docs = Seq((5L, base), (2L, base), (9L, other))
      .toDF("doc_id", "text")
    val kept = Multimodal.mediaSemDedup(docs, col("doc_id"), col("text"),
      threshold = 0.999).collect().map(_.getLong(0)).sorted.toSeq
    assert(kept.contains(2L) && !kept.contains(5L),
      s"smaller id must win: $kept")
    assert(kept.contains(9L))
  }

  test("crossModalRecall: paired-retrieval contract — per-method per-k " +
    "rows, exact hit ratios, flat ≥ bucket, repartition-invariant") {
    import graft.ops.Multimodal
    // enough docs that the md5 1/4 query sample is non-empty and the
    // flat scan has real competitors
    val docs = (1L to 60L).map(i => (i, s"payload body number $i " * 8))
      .toDF("doc_id", "text")
    val r = Multimodal.crossModalRecall(docs, col("doc_id"), col("text"),
      ks = Seq(1, 5, 10), queryMod = 4)
    val rows = r.collect().map(x => (x.getString(0), x.getLong(1)) ->
      (x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(rows.size == 6, s"2 methods x 3 ks: ${rows.keys}")
    val nQ = rows(("flat", 1L))._1
    assert(nQ > 0, "query sample must be non-empty")
    rows.foreach { case ((m, k), (n, h, rec)) =>
      assert(n == nQ, s"n_queries constant: $m/$k")
      assert(h >= 0 && h <= n, s"hits bounded: $m/$k -> $h")
      assert(math.abs(rec - h.toDouble / n) < 1e-6,
        s"recall is the exact ratio: $m/$k")
    }
    // recall is monotone in k within a method
    for (m <- Seq("flat", "bucket"))
      assert(rows((m, 1L))._2 <= rows((m, 5L))._2 &&
        rows((m, 5L))._2 <= rows((m, 10L))._2, s"monotone in k: $m")
    // (no flat-vs-bucket inequality is asserted: against PAIRED ground
    // truth a probe that drops competitors can legitimately score
    // higher hit@k than the flat scan — the two columns are a
    // trade-off readout, not an ordering)
    // the ±0.125 perturbation keeps the own media dominant in an
    // 8-dim [0,1) corpus: flat recall@10 should be high
    assert(rows(("flat", 10L))._3 >= 0.5,
      s"own media should mostly rank top-10: ${rows(("flat", 10L))}")
    // md5-pure: partitioning changes nothing
    val r2 = Multimodal.crossModalRecall(docs.repartition(7),
      col("doc_id"), col("text"), ks = Seq(1, 5, 10), queryMod = 4)
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r2 == rows)
  }

}
