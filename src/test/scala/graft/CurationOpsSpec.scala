package graft

import org.apache.spark.sql.functions._
import graft.expr.TextStats
import graft.ops.{Packing, Sampling, TextDedup}

/** Round-4 curation operators: prefix-filtered exact similarity join,
  * content-defined chunking, min-k sampling, Zipf fit. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy cat today"), // near-dup of 1
    (3L, "completely different content here entirely folks yes"),
    (4L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
    (5L, "another unrelated document about spark query planning"))
    .toDF("doc_id", "text")

  test("prefixFilterJoin is LOSSLESS: equals brute-force exact Jaccard >= t") {
    val got = TextDedup.prefixFilterJoin(docs, col("doc_id"), col("text"),
        3, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force: every pair, exact Jaccard over 3-shingle sets
    val sh = TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val ids = sh.keys.toSeq.sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      inter = (sh(a) & sh(b)).size
      uni = sh(a).size + sh(b).size - inter
      if inter * 5 >= uni * 3
    } yield (a, b) -> math.round(inter.toDouble / uni * 1e4) / 1e4).toMap
    assert(got == want)
    assert(got((1L, 4L)) == 1.0) // exact dup pair survives at J = 1
    assert(!got.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("cdcChunks: chunks tile each doc and dup docs share every chunk hash") {
    val r = Packing.cdcChunks(docs, col("doc_id"), col("text"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5)))
    val byDoc = r.groupBy(_._1)
    val nTok = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length).toMap
    // tiling: per doc, chunk token counts sum to the doc's token count,
    // chunks are contiguous (next start = prev start + prev len)
    for ((id, chunks) <- byDoc) {
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._4).sum == nTok(id), s"doc $id")
      assert(sorted.head._3 == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _           =>
      }
    }
    // exact dup docs 1 and 4 chunk identically → same hash multiset
    val h1 = byDoc(1L).map(c => (c._2, c._5)).toSet
    val h4 = byDoc(4L).map(c => (c._2, c._5)).toSet
    assert(h1 == h4)
    // and every shared chunk reports n_copies >= 2
    byDoc(1L).foreach(c => assert(c._6 >= 2L, s"chunk ${c._2}"))
  }

  test("cdcChunks boundaries are content-defined: a prefix edit only shifts, " +
    "never re-aligns, the following chunks") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val pair = Seq((1L, base), (2L, s"zzz $base")).toDF("doc_id", "text")
    val chunks = Packing.cdcChunks(pair, col("doc_id"), col("text"), 3)
      .collect().map(r => r.getLong(0) -> r.getString(4))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // all chunks of doc 1 after the first cut also appear in doc 2:
    // the inserted prefix can only perturb the FIRST chunk
    val shared = chunks(1L) & chunks(2L)
    assert(shared.size >= chunks(1L).size - 1,
      s"expected at most one perturbed chunk, shared=$shared")
  }

  test("minKSample: exact size, deterministic, and nested across k") {
    val df = spark.range(1000).toDF("id")
    val k10 = Sampling.minKSample(df, col("id"), 10)
      .collect().map(_.getLong(0)).toSet
    val k50 = Sampling.minKSample(df, col("id"), 50)
      .collect().map(_.getLong(0)).toSet
    val k50b = Sampling.minKSample(df.repartition(7), col("id"), 50)
      .collect().map(_.getLong(0)).toSet
    assert(k10.size == 10 && k50.size == 50)
    assert(k10.subsetOf(k50)) // samples nest
    assert(k50 == k50b)       // partitioning-independent
  }

  test("zipfFit recovers slope -1, r2 = 1 on an exact power law") {
    // freq(rank) = 24/rank for ranks 1..4 → ln f = ln 24 − 1·ln rank
    val text = (Seq.fill(24)("a") ++ Seq.fill(12)("b") ++
      Seq.fill(8)("c") ++ Seq.fill(6)("d")).mkString(" ")
    val r = TextStats.zipfFit(Seq((1L, text)).toDF("doc_id", "text"),
        lit("x"), col("text"))
      .collect().head
    assert(r.getLong(1) == 4L)              // vocab
    assert(r.getLong(2) == 50L)             // tokens
    assert(math.abs(r.getDouble(3) + 1.0) < 1e-3, s"slope ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - math.log(24.0)) < 1e-3)
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-3, s"r2 ${r.getDouble(5)}")
  }

  test("doremiStep: high-loss sources upweight, eta=0 is the identity " +
    "mixture, weights normalize to 1") {
    import graft.ops.Sampling
    // source 'hard' scores twice the loss of 'easy', equal sizes
    val docs = (1L to 10L).map(i =>
      (i, if (i <= 5) "easy" else "hard")).toDF("doc_id", "source")
    val scores = (1L to 10L).map(i =>
      (i, if (i <= 5) 2.0 else 4.0)).toDF("doc_id", "nll")
    val r = Sampling.doremiStep(docs, col("doc_id"), col("source"), scores)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))))
      .toMap
    val (_, meanH, excessH, w0H, wH) = r("hard")
    val (_, meanE, excessE, w0E, wE) = r("easy")
    assert(meanH == 4.0 && meanE == 2.0)
    assert(excessH == 1.0 && excessE == -1.0) // baseline = 3.0
    assert(w0H == 0.5 && w0E == 0.5)
    assert(wH > w0H && wE < w0E, s"hard $wH easy $wE")
    assert(math.abs(wH + wE - 1.0) < 2e-4)
    // eta = 0: exp(0) = 1 for every source — the mixture is unchanged
    val id0 = Sampling.doremiStep(docs, col("doc_id"), col("source"),
        scores, eta = 0.0)
      .collect().map(x => x.getString(0) -> (x.getDouble(4), x.getDouble(5)))
      .toMap
    id0.values.foreach { case (w0, w) => assert(w == w0) }
  }

  test("phraseTags: exact counts and first positions; hit-free docs " +
    "absent; 1- and 2-gram phrases both match") {
    import graft.expr.TextStats
    val docs = Seq(
      (1L, "a hash join beats a hash join here"),
      (2L, "stream stream table scan"),
      (3L, "nothing to see")).toDF("doc_id", "text")
    val r = TextStats.phraseTags(docs, col("doc_id"), col("text"),
        Seq("hash join", "table scan", "stream"))
      .collect().map(x => (x.getLong(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map(
      (1L, "hash join") -> ((2L, 2L)),
      (2L, "stream") -> ((2L, 1L)),
      (2L, "table scan") -> ((1L, 3L))))
  }

  test("spanCorruption: startPct=0 is the identity (no masking); " +
    "startPct=100 masks everything into ONE sentinel run; counts are " +
    "consistent and partition-invariant") {
    import graft.ops.Packing
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x y")).toDF("doc_id", "text")
    val none = Packing.spanCorruption(docs, col("doc_id"), col("text"), 0, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(none(1L) == (8L, 0L, 0L, md5s("a b c d e f g h"), md5s("")))
    assert(none(2L) == (2L, 0L, 0L, md5s("x y"), md5s("")))
    val all = Packing.spanCorruption(docs, col("doc_id"), col("text"), 100, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(all(1L) == (8L, 8L, 1L, md5s("<extra_id_0>"),
      md5s("<extra_id_0> a b c d e f g h")))
    assert(all(2L) == (2L, 2L, 1L, md5s("<extra_id_0>"),
      md5s("<extra_id_0> x y")))
    // real corpus: counts consistent, deterministic under repartition
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r1 = Packing.spanCorruption(corpus, col("doc_id"), col("text"))
      .orderBy("doc_id").collect().toSeq
    r1.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3) && r.getLong(2) <= r.getLong(1))
    }
    assert(r1.exists(_.getLong(3) > 0L), "masking never fired — vacuous")
    val r2 = Packing.spanCorruption(corpus.repartition(7), col("doc_id"),
      col("text")).orderBy("doc_id").collect().toSeq
    assert(r1 == r2)
  }

  test("fimSplit: cut points match the md5 derivation by hand; the " +
    "assembled example hashes to the expected PSM/SPM string; short " +
    "docs pass through; partition-invariant") {
    import graft.ops.Packing
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h(s: String, m: Long) = BigInt(md5s(s).substring(0, 8), 16).toLong % m
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x y"), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = Packing.fimSplit(docs, col("doc_id"), col("text"))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4),
          x.getString(5), x.getLong(6)))).toMap
    // doc 1: n=8 → a = 1 + md5("1|a")%6, b = a + 1 + md5("1|b")%(8-a-1)
    val toks = "a b c d e f g h".split(" ")
    val n = 8L
    val a = 1L + h("1|a", n - 2)
    val b = a + 1L + h("1|b", n - a - 1)
    val mode = if (h("1|m", 100) < 50) "spm" else "psm"
    val p = toks.slice(0, a.toInt).mkString(" ")
    val m = toks.slice(a.toInt, b.toInt).mkString(" ")
    val sfx = toks.slice(b.toInt, 8).mkString(" ")
    val expected = if (mode == "spm") s"<SUF> $sfx <PRE> $p <MID> $m"
      else s"<PRE> $p <SUF> $sfx <MID> $m"
    assert(r(1L) == ((n, a, b, mode, md5s(expected), b - a)))
    // doc 2 (n=2) and doc 3 (n=1): too short to split
    assert(r(2L) == ((2L, 0L, 0L, "plain", md5s("x y"), 0L)))
    assert(r(3L) == ((1L, 0L, 0L, "plain", md5s("solo"), 0L)))
    // corpus: every split doc has 1 ≤ a < b ≤ n-1, both modes occur,
    // and the construction is partition-invariant
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val r1 = Packing.fimSplit(corpus, col("doc_id"), col("text"))
      .orderBy("doc_id").collect().toSeq
    r1.filter(_.getString(4) != "plain").foreach { x =>
      assert(x.getLong(2) >= 1L && x.getLong(2) < x.getLong(3) &&
        x.getLong(3) <= x.getLong(1) - 1L, s"bad cuts: $x")
    }
    assert(r1.exists(_.getString(4) == "psm") &&
      r1.exists(_.getString(4) == "spm"), "mode mix never fired")
    val r2 = Packing.fimSplit(corpus.repartition(7), col("doc_id"),
      col("text")).orderBy("doc_id").collect().toSeq
    assert(r1 == r2)
  }

  test("startFimSink: union of streamed FIM batches ≡ batch " +
    "construction over the unioned docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 30).select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = graft.stream.StreamCuration.startFimSink(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", 50,
      java.nio.file.Files.createTempDirectory("fim-ckpt").toString,
      (df, epoch) => out.synchronized {
        out(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    try {
      ms.addData(rows.take(rows.length / 2).toSeq)
      q.processAllAvailable()
      ms.addData(rows.drop(rows.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = out.synchronized(out.values.flatten.toSeq.sorted)
    val expected = graft.ops.Packing.fimSplit(docs, col("doc_id"),
        col("text"), 50)
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(out.synchronized(out.size) == 2)
  }

test("startAdmissionSink: batching is invisible (1-batch union ≡ " +
    "2-batch union); all three gates fire somewhere; admit is their " +
    "conjunction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Sketch
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    // static artifacts, trained batch-side once
    val tf = docs.select(col("doc_id"),
        explode(graft.expr.TextStats.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val tot = tf.groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val gt = tot.agg(sum(col("ctf")).cast("double").as("gt"))
    val probs = tot.crossJoin(gt)
      .select(col("term"), (col("ctf") / col("gt")).as("p"))
      .localCheckpoint(true)
    val pUnseen = probs.agg(min(col("p"))).collect()(0).getDouble(0)
    val nll = tf.join(probs, "term").groupBy(col("doc_id"))
      .agg(round(-graft.expr.Snap.snappedSum(
          col("tf").cast("double") * log(col("p")), 1e9) /
        sum(col("tf")).cast("double"), 4).as("nll"))
    val thresholds = docs.select(col("doc_id"), col("source"))
      .join(nll, "doc_id").groupBy(col("source"))
      .agg(round(expr("percentile(nll, 0.75)"), 4).as("threshold"))
      .localCheckpoint(true)
    val mask = Sketch.bloomMask(
      graft.ops.TextDedup.shingleSet(docs.filter(col("doc_id") < 20),
        col("doc_id"), col("text"), 5).select(col("shingle")).distinct(),
      col("shingle"), 4096, 3).localCheckpoint(true)
    val rows = docs.as[(Long, String, String)].collect().sortBy(_._1)
    def run(splits: Seq[Seq[(Long, String, String)]]): Seq[String] = {
      implicit val sqlCtx = spark.sqlContext
      val ms = MemoryStream[(Long, String, String)]
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val q = graft.stream.StreamCuration.startAdmissionSink(
        ms.toDF().toDF("doc_id", "text", "source"), "doc_id", "text",
        "source", probs, pUnseen, thresholds, mask, 4096, 3,
        java.nio.file.Files.createTempDirectory("adm-ckpt").toString,
        (df, _) => out.synchronized {
          out ++= df.collect().map(_.toString) })
      try {
        splits.foreach { b => ms.addData(b); q.processAllAvailable() }
      } finally q.stop()
      out.synchronized(out.toSeq.sorted)
    }
    val one = run(Seq(rows.toSeq))
    val two = run(Seq(rows.take(rows.length / 2).toSeq,
      rows.drop(rows.length / 2).toSeq))
    assert(one == two)
    assert(one.size == rows.length)
    // the gates actually discriminate on this corpus
    assert(one.exists(_.contains("false")) && one.exists(_.contains("true")))
    val parsed = run(Seq(rows.toSeq))
    assert(parsed == one) // deterministic replay
  }

  test("startSpanCorruptionSink: union of streamed example batches ≡ " +
    "batch construction over the unioned docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 30).select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.Map[Long, Seq[String]]()
    val q = graft.stream.StreamCuration.startSpanCorruptionSink(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text", 5, 3,
      java.nio.file.Files.createTempDirectory("span-ckpt").toString,
      (df, epoch) => out.synchronized {
        out(epoch) = df.collect().map(_.toString).sorted.toSeq
      })
    try {
      ms.addData(rows.take(rows.length / 2).toSeq)
      q.processAllAvailable()
      ms.addData(rows.drop(rows.length / 2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val got = out.synchronized(out.values.flatten.toSeq.sorted)
    val expected = graft.ops.Packing.spanCorruption(docs, col("doc_id"),
        col("text"), 5, 3)
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(out.synchronized(out.size) == 2)
  }

  test("q161 curriculum: global positions are a strict total order, " +
    "round-robin interleaves sources, within-source order is easy-first") {
    val rows = SparkEntry.queries("q161_curriculum")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // strict total order: no two docs share a global position
    assert(rows.map(_._4).distinct.length == rows.length)
    // round-robin: the first |sources| positions are each source's
    // rank-1 doc, one per source
    val nSrc = rows.map(_._2).distinct.length
    val head = rows.filter(_._4 < nSrc)
    assert(head.length == nSrc && head.map(_._2).distinct.length == nSrc)
    assert(head.forall(_._3 == 1L))
    // within a source, global position is strictly increasing in rank
    rows.groupBy(_._2).values.foreach { g =>
      val pos = g.sortBy(_._3).map(_._4).toSeq
      assert(pos == pos.sorted)
    }
  }

  test("textRank: the hub of a co-occurrence star outranks the " +
    "spokes; a symmetric pair ranks equal") {
    val docs = Seq((0L, "hub x"), (1L, "hub y"), (2L, "hub z"))
      .toDF("doc_id", "text")
    val r = TextStats.textRank(docs, col("doc_id"), col("text"),
      window = 1, minCount = 1L, iters = 2, topK = 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("x"))
    assert(r("x") == r("y") && r("y") == r("z"))
    val pair = TextStats.textRank(Seq((0L, "a b a b"))
      .toDF("doc_id", "text"), col("doc_id"), col("text"),
      window = 1, minCount = 1L, iters = 2, topK = 10)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(pair("a") == pair("b"))
  }

  test("sparseCosinePairs: hand tf-idf cosine on the shared-term " +
    "pair; disjoint docs pair nothing; the df band excludes terms " +
    "from the SIMILARITY definition, not just the join") {
    val docs = Seq((1L, "p q r"), (2L, "p q s"), (3L, "z z z"))
      .toDF("doc_id", "text")
    val got = TextDedup.sparseCosinePairs(docs, col("doc_id"),
      col("text"), threshold = 0.1, dfMin = 1L, dfCap = 10L)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2))
      .toMap
    // N = 3; p/q: idf ln(1.5), r/s/z: ln(3); snapped norms/dot
    def sn(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * 1e9 + 0.5)).sum / 1e9
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val wpq = math.log(3.0 / 2.0); val w1 = math.log(3.0)
    val dot = sn(Seq(wpq * wpq, wpq * wpq))
    val n1 = sn(Seq(wpq * wpq, wpq * wpq, w1 * w1))
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == r4(dot / math.sqrt(n1 * n1)))
    // dfCap = 1 drops the shared p/q: no candidate pair survives
    assert(TextDedup.sparseCosinePairs(docs, col("doc_id"),
      col("text"), threshold = 0.01, dfMin = 1L, dfCap = 1L)
      .count() == 0L)
  }

  test("winnowFingerprints: the coverage guarantee (a shared run of " +
    "w+k-1 chars shares a fingerprint), rightmost min ties, short-doc " +
    "emptiness; winnowNearDup df-cap drops boilerplate hashes") {
    // k=4, w=3: any shared substring of length >= 6 must be caught
    val k = 4; val w = 3
    val shared = "zqxvbn" // 6 chars, guarantee threshold w+k-1 = 6
    val docs = Seq((0L, s"aaa${shared}bbb"), (1L, s"ccc${shared}ddd"),
      (2L, "eeefffggg")).toDF("doc_id", "text")
    val fp = TextDedup.winnowFingerprints(docs, col("doc_id"),
      col("text"), k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val h0 = fp.filter(_._1 == 0L).map(_._3).toSet
    val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
    assert((h0 & h1).nonEmpty, "coverage guarantee violated")
    assert((h0 & h2).isEmpty && (h1 & h2).isEmpty)
    // positions are 1-based and in-range
    assert(fp.forall(p => p._2 >= 1 && p._2 <= 12 - k + 1))
    // a doc with fewer than w k-grams yields nothing (the scheme's
    // precondition): 5 chars = 2 grams < w
    assert(TextDedup.winnowFingerprints(
      Seq((9L, "abcde")).toDF("doc_id", "text"), col("doc_id"),
      col("text"), k, w).count() == 0L)
    // rightmost tie rule: a constant document makes every gram hash
    // EQUAL, so each window's min must sit at its rightmost position
    // and the fingerprint set collapses to the last positions only
    val const = TextDedup.winnowFingerprints(
      Seq((5L, "aaaaaaaaaa")).toDF("doc_id", "text"), col("doc_id"),
      col("text"), k, w).collect().map(_.getLong(1)).sorted
    // 10 chars -> 7 grams -> windows at 1..5 select pos 3..7 (the
    // rightmost of each window of 3)
    assert(const.toSeq == Seq(3L, 4L, 5L, 6L, 7L))
    // df-cap: with the shared hash in BOTH docs and dfCap = 1, no
    // pair survives; with dfCap = 2 the (0,1) pair appears
    val none = TextDedup.winnowNearDup(docs, col("doc_id"), col("text"),
      k, w, dfCap = 1, minShared = 1)
    assert(none.count() == 0L)
    val pair = TextDedup.winnowNearDup(docs, col("doc_id"), col("text"),
      k, w, dfCap = 2, minShared = 1).collect()
    assert(pair.length == 1 &&
      pair.head.getLong(0) == 0L && pair.head.getLong(1) == 1L)
  }
}
