package graft

import org.apache.spark.sql.functions._
import graft.expr.{Similarity, TextStats}
import graft.ops.TextDedup

/** Text-analysis + near-dup extension layer. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content here entirely"),
    (4L, "the quick brown fox jumps over the lazy dog")) // exact dup of 1
    .toDF("doc_id", "text")

  test("shingles: 3-gram count and short-doc safety") {
    val r = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(r(1L) == Seq("a b c", "b c d"))
    assert(r(2L).isEmpty)
  }

  test("incrementalCandidates ≡ full re-band restricted to new-doc pairs") {
    val all = TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3)
    val sigs = TextDedup.minhashSignatures(all, 8)
    // corpus = docs 1..3 indexed once; doc 4 (exact dup of 1) arrives
    val corpusBands = TextDedup.bandTable(sigs.filter(col("doc_id") <= 3))
    val newSigs = sigs.filter(col("doc_id") === 4)
    val inc = TextDedup.incrementalCandidates(newSigs, corpusBands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = TextDedup.lshCandidates(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 == 4L || p._2 == 4L)
    assert(inc == full)
    assert(inc.contains((1L, 4L))) // the arriving dup is caught
  }

  test("minhash LSH finds the near-dup pair and exact Jaccard confirms") {
    val sh = TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3)
    val cands = TextDedup.lshCandidates(TextDedup.minhashSignatures(sh, 8))
    val pairs = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    val j = TextDedup.jaccard(cands, sh).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 4L)) == 1.0)
    j.get((1L, 2L)).foreach(v => assert(v > 0.5 && v < 1.0))
    // no candidate pairs with doc 3
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("LSH guarantee: exact-duplicate texts are ALWAYS candidates") {
    import graft.ops.TextDedup
    // identical text → identical shingle set → identical signatures →
    // same band signatures → candidate pair, with probability 1
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "the quick brown fox jumps over dogs"),
      (4L, "completely different content entirely here now"))
      .toDF("doc_id", "text")
    val cands = TextDedup.lshCandidates(
      TextDedup.minhashSignatures(
        TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3), 8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
  }

  test("simhash: identical docs get identical fingerprints, dissimilar differ") {
    val s = TextDedup.simhash16(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(4L))
    assert(s(1L) != s(3L))
    def popcount(x: Long) = java.lang.Long.bitCount(x)
    assert(popcount(s(1L) ^ s(2L)) < popcount(s(1L) ^ s(3L)))
  }

  test("text stats: token counts, stopwords, punct, quality bounds") {
    val r = Seq((1L, "the cat, and the dog!"))
      .toDF("doc_id", "text")
      .select(
        TextStats.nTokens(col("text")).as("n"),
        TextStats.stopwordCount(col("text")).as("stop"),
        TextStats.punctCount(col("text")).as("punct"),
        TextStats.langIdHeuristic(col("text")).as("lang"),
        TextStats.qualityScore(col("text")).as("q"))
      .collect()(0)
    assert(r.getAs[Int]("n") == 5)
    // "the" ×2 (the comma-attached token "cat," doesn't count; "and" counts)
    assert(r.getAs[Int]("stop") == 3)
    assert(r.getAs[Int]("punct") == 2) // ',' and '!'
    assert(r.getAs[String]("lang") == "en")
    val q = r.getAs[Double]("q")
    assert(q >= 0.0 && q <= 1.0)
  }

  test("fingerprint is token-order-insensitive") {
    val r = Seq((1L, "b a c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == r(2L))
    assert(r(1L) != r(3L))
  }

  test("spanDupStats: exact dup fully duplicated, unique doc fully unique") {
    val sh = TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3)
    val r = TextDedup.spanDupStats(sh).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) == 1.0 && r(4L) == 1.0) // every span of the dup pair shared
    assert(r(3L) == 0.0)                 // nothing of doc 3 appears elsewhere
    assert(r(2L) > 0.0 && r(2L) < 1.0)   // near-dup: partial overlap
  }

  test("containment: a doc quoted inside a longer one scores ~1 on its " +
    "side while Jaccard under-scores the pair; symmetric for mirrors") {
    val d = Seq(
      (1L, "alpha beta gamma delta"),                     // 2 trigrams
      (2L, "alpha beta gamma delta x1 x2 x3 x4 x5 x6 x7 x8"), // superset
      (3L, "alpha beta gamma delta"))                     // mirror of 1
      .toDF("doc_id", "text")
    val sh = TextDedup.shingleSet(d, col("doc_id"), col("text"), 3)
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val c = TextDedup.containment(pairs, sh, identity).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getDouble(2), x.getDouble(3)))).toMap
    // doc 1 wholly inside doc 2: containment_a = 1, but b-side is low
    val (ca, cb) = c((1L, 2L))
    assert(ca == 1.0 && cb < 0.5, s"$ca / $cb")
    // Jaccard on the same pair is the small cb-side value — the signal
    // containment exists to recover
    val j = TextDedup.jaccard(pairs, sh, identity)
      .filter(col("doc_b") === 2L).collect()(0).getDouble(2)
    assert(j < 0.5, s"jaccard $j")
    // exact mirror: both sides 1
    assert(c((1L, 3L)) == ((1.0, 1.0)))
  }

  test("contamination: only docs sharing a benchmark span are flagged") {
    val sh = TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3)
    val bench = sh.filter(col("doc_id") === 1L)   // doc 1 = the eval set
    val corpus = sh.filter(col("doc_id") =!= 1L)
    val r = TextDedup.contamination(corpus, bench).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(4L) == 7L)      // exact dup: all 7 3-gram spans shared
    assert(r.contains(2L))   // near-dup shares a prefix of spans
    assert(!r.contains(3L))  // clean doc absent from the report
  }

  test("repetitionStats: looping text scores high, varied text low") {
    val d = Seq((1L, "spam ham spam ham spam ham spam ham"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val r = TextStats.repetitionStats(d, col("doc_id"), col("text"))
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) > 0.5)            // "spam ham" dominates
    assert(r(2L) < 0.2)            // all 2-grams unique: 1/7
    val row = TextStats.repetitionStats(d, col("doc_id"), col("text"))
      .filter(col("doc_id") === 2L).collect()(0)
    assert(row.getLong(1) == 7L && row.getLong(2) == 1L)
  }

  test("Pii.scrub redacts all three classes in order; countPii matches") {
    val d = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "server at 192.168.0.1 port"),
      (3L, "call 555-123-4567 today"),
      (4L, "u1@a.io and 10.0.0.7 and 555-000-1111"),
      (5L, "nothing sensitive here")).toDF("id", "text")
    val r = d.select(col("id"), graft.expr.Pii.scrub(col("text")).as("s"),
        graft.expr.Pii.countPii(col("text")).as("n"))
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2)))).toMap
    assert(r(1L) == (("mail [EMAIL] now", 1L)))
    assert(r(2L) == (("server at [IP] port", 1L)))
    assert(r(3L) == (("call [PHONE] today", 1L)))
    assert(r(4L) == (("[EMAIL] and [IP] and [PHONE]", 3L)))
    assert(r(5L) == (("nothing sensitive here", 0L)))
  }

  test("countPii counts redactions, not raw matches (nested PII classes)") {
    // phone-shaped local part and IP-shaped domain: one email redaction
    // each, so the count must be 1 — not 2 (email + inner class)
    val d = Seq((1L, "reach 555-123-4567@corp.com ok"),
      (2L, "mail u@10.0.0.7.com today")).toDF("id", "text")
    val r = d.select(col("id"), graft.expr.Pii.scrub(col("text")).as("s"),
        graft.expr.Pii.countPii(col("text")).as("n"))
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2)))).toMap
    assert(r(1L) == (("reach [EMAIL] ok", 1L)))
    assert(r(2L) == (("mail [EMAIL] today", 1L)))
  }

  test("Count-Min sketch: never undercounts, and sketches merge by sum") {
    import graft.ops.Sketch
    val items = (1 to 400).map(i => s"w${i % 23}").toDF("w")
    val exact = items.groupBy(col("w")).agg(count(lit(1)).as("n"))
    val m = Sketch.countMinMatrix(items, col("w"), 3, 16)
    val est = Sketch.countMinEstimate(exact, col("w"), m, 3, 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(est.values.forall { case (n, e) => e >= n }) // CM lower bound
    // mergeability: matrix(A ∪ B) == matrix(A) + matrix(B) summed by cell
    val a = items.filter(col("w") < "w2")
    val b = items.filter(col("w") >= "w2")
    val merged = Sketch.countMinMatrix(a, col("w"), 3, 16)
      .unionByName(Sketch.countMinMatrix(b, col("w"), 3, 16))
      .groupBy("row", "bucket").agg(sum(col("cnt")).as("cnt"))
    val whole = m.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val part = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == part)
  }

  test("HLL registers: shard sketches merge by max; estimate in error envelope") {
    import graft.ops.Sketch
    val items = (1 to 3000).map(i => ("g", s"user${i % 700}")).toDF("g", "id")
    val whole = Sketch.hllRegisters(items, Seq("g"), col("id"))
    // mergeability: registers(A ∪ B) == max by cell of shard registers
    val a = items.filter(col("id") < "user4")
    val b = items.filter(col("id") >= "user4")
    val merged = Sketch.hllRegisters(a, Seq("g"), col("id"))
      .unionByName(Sketch.hllRegisters(b, Seq("g"), col("id")))
      .groupBy("g", "bucket").agg(max(col("reg")).as("reg"))
    val w = whole.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val p = merged.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(w == p)
    // duplicates never move registers: estimate(multiset) == estimate(set)
    val dedup = Sketch.hllRegisters(items.distinct(), Seq("g"), col("id"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(w == dedup)
    // m=64 ⇒ σ ≈ 13%; assert a generous 3σ window around the true 700
    val est = Sketch.hllEstimate(whole, Seq("g"))
      .select(col("est_distinct")).head().getDouble(0)
    assert(est > 700 * 0.6 && est < 700 * 1.4, s"estimate $est vs 700")
  }

  test("histogram sketch: shard bins merge by sum; quantiles bound error by one bin") {
    import graft.ops.Sketch
    val rnd = new scala.util.Random(3)
    val vals = Seq.fill(2000)(("g", rnd.nextDouble() * 100)).toDF("g", "v")
    val stats = Sketch.histStats(vals, Seq("g"), col("v"))
    val whole = Sketch.histBins(vals, Seq("g"), col("v"), stats)
    // mergeability (against SHARED edges): bins(A ∪ B) == shard bins summed
    val a = vals.filter(col("v") < 37.0)
    val b = vals.filter(col("v") >= 37.0)
    val merged = Sketch.histBins(a, Seq("g"), col("v"), stats)
      .unionByName(Sketch.histBins(b, Seq("g"), col("v"), stats))
      .groupBy("g", "bin").agg(sum(col("cnt")).as("cnt"))
    val w = whole.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val p = merged.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(w == p)
    // estimate error ≤ one bin width vs the exact quantile
    val est = Sketch.histQuantiles(whole, Seq("g"), stats,
      Seq("p50" -> 0.5, "p90" -> 0.9)).head()
    val exact = vals.stat.approxQuantile("v", Array(0.5, 0.9), 0.0)
    val binWidth = 100.0 / 128
    assert(math.abs(est.getDouble(2) - exact(0)) <= binWidth * 1.5,
      s"p50 ${est.getDouble(2)} vs ${exact(0)}")
    assert(math.abs(est.getDouble(3) - exact(1)) <= binWidth * 1.5,
      s"p90 ${est.getDouble(3)} vs ${exact(1)}")
  }

  test("Bloom filter: zero false negatives; pruning preserves the true join") {
    import graft.ops.Sketch
    val build = (1 to 200).filter(_ % 3 == 0).map(_.toLong).toDF("k")
    val probe = (1 to 400).map(_.toLong).toDF("k")
    val bits = Sketch.bloomBits(build, col("k"), 1024, 3)
    val pass = Sketch.bloomPrune(probe, col("k"), bits, 1024, 3)
      .collect().map(_.getLong(0)).toSet
    val truth = probe.join(build.withColumnRenamed("k", "bk"),
        col("k") === col("bk"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(truth.subsetOf(pass))           // no false negatives, ever
    assert(pass.size < 400)                // it actually prunes something
    // semi-join after pruning == semi-join without pruning
    val prunedJoin = Sketch.bloomPrune(probe, col("k"), bits, 1024, 3)
      .join(build.withColumnRenamed("k", "bk"), col("k") === col("bk"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(prunedJoin == truth)
    // packed single-row mask form ≡ the bit-set semi-join form, exactly
    val mask = Sketch.bloomMask(build, col("k"), 1024, 3)
    val passMask = Sketch.bloomPruneMask(probe, col("k"), mask, 1024, 3)
      .collect().map(_.getLong(0)).toSet
    assert(passMask == pass)
  }

  test("Pii.scrub is idempotent: placeholders never re-match any rule") {
    val texts = Seq("a@b.io at 10.0.0.1 call 555-123-4567",
      "x [EMAIL] y", "v1.2.3.4.5 not-an-ip-boundary 1.2.3.4",
      "plain text").toDF("text")
    val once = texts.select(graft.expr.Pii.scrub(col("text")).as("s"))
    val twice = once.select(graft.expr.Pii.scrub(col("s")).as("s"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
    // and a scrubbed corpus reports zero remaining PII
    assert(once.select(graft.expr.Pii.countPii(col("s")).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0) == 0L)
  }

  test("temperatureRates: alpha=1 keeps the natural mix; alpha<1 lifts small strata") {
    import graft.ops.Sampling
    val docs = ((1 to 900).map(i => (i.toLong, "en")) ++
      (901 to 1000).map(i => (i.toLong, "sw"))).toDF("id", "lang")
    def rates(a: Double) = Sampling.temperatureRates(docs, Seq("lang"), a)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    // alpha=1: target == share everywhere → every rate is exactly 1.0
    assert(rates(1.0).values.forall(_ == 1.0))
    // alpha=0.5: the small stratum is the most lifted → keeps everything;
    // the big one downsamples. Expected en rate = (sqrt(900)/sqrt(100)) /
    // (900/100) = 3/9 = 1/3.
    val r = rates(0.5)
    assert(r("sw") == 1.0)
    assert(math.abs(r("en") - 1.0 / 3.0) < 1e-12, r.toString)
    // rebalanced composition: en ≈ 300 docs kept of 900 (hash-Bernoulli)
    val kept = Sampling.weightedSample(
      docs.join(broadcast(Sampling.temperatureRates(docs, Seq("lang"), 0.5)
        .withColumnRenamed("lang", "__rl")), col("lang") === col("__rl")),
      col("id"), col("__keep_rate"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("sw") == 100L)
    assert(kept("en") > 250 && kept("en") < 350, kept.toString)
  }

  test("mixtureRebalance: over-cap strata shrink to the cap, others pass intact") {
    import graft.ops.Sampling
    // 800 "web" docs (80%) + 200 "books": cap 0.4 → web ≈ 320, books all
    val docs = ((1 to 800).map(i => (i.toLong, "web")) ++
      (801 to 1000).map(i => (i.toLong, "books"))).toDF("id", "src")
    val out = Sampling.mixtureRebalance(docs, Seq("src"), col("id"), 0.4)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("books") == 200L, s"under-cap stratum must pass intact: $out")
    // hash-Bernoulli at rate 0.5: expect ~400 ± binomial noise
    assert(out("web") > 320 && out("web") < 480, s"web ${out("web")}")
    // deterministic: the same rows are kept on a re-run
    val again = Sampling.mixtureRebalance(docs, Seq("src"), col("id"), 0.4)
      .agg(sum(col("id"))).head().getLong(0)
    val first = Sampling.mixtureRebalance(docs, Seq("src"), col("id"), 0.4)
      .agg(sum(col("id"))).head().getLong(0)
    assert(again == first)
    // a NULL stratum is a real stratum: its rows survive (null-safe join)
    val withNull = docs.unionByName(
      Seq((2001L, Option.empty[String]), (2002L, None))
        .toDF("id", "src"))
    val n = Sampling.mixtureRebalance(withNull, Seq("src"), col("id"), 0.9)
      .filter(col("src").isNull).count()
    assert(n == 2L, s"NULL-stratum rows dropped: kept $n of 2")
  }

  test("weightedSample: weight 0 keeps nothing, 1 keeps all, deterministic") {
    val d = spark.range(1000).toDF("id")
    assert(graft.ops.Sampling.weightedSample(d, col("id"), lit(0.0)).count() == 0)
    assert(graft.ops.Sampling.weightedSample(d, col("id"), lit(1.0)).count() == 1000)
    val half1 = graft.ops.Sampling.weightedSample(d, col("id"), lit(0.5))
      .collect().map(_.getLong(0)).toSet
    val half2 = graft.ops.Sampling.weightedSample(d, col("id"), lit(0.5))
      .collect().map(_.getLong(0)).toSet
    assert(half1 == half2)                        // pure function of id
    assert(half1.size > 400 && half1.size < 600)  // ~Binomial(1000, .5)
  }

  test("concatChunk: exact global offsets, straddling docs, bucket-width invariant") {
    // 5 docs × 100 tokens, ctx=256: doc 3 straddles seqs 0→1 (offset 200)
    val d = (0L to 4L).map(i => (i, 100L)).toDF("doc_id", "n")
    val packed = graft.ops.Packing.concatChunk(d, col("doc_id"), col("n"), 256L)
      .orderBy("doc_id").collect()
    assert(packed.map(_.getLong(2)).toSeq == Seq(0L, 100L, 200L, 300L, 400L))
    assert(packed.map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 1L), (1L, 1L)))
    // offsets are exact regardless of how the prefix sum is bucketed
    val alt = graft.ops.Packing.concatChunk(d, col("doc_id"), col("n"), 256L,
      bucketWidth = 2L).orderBy("doc_id").collect()
    assert(alt.map(_.getLong(2)).toSeq == packed.map(_.getLong(2)).toSeq)
  }

  test("slidingChunks: overlap = ctx-stride, full coverage, short-doc tail") {
    val d = Seq((1L, 300L), (2L, 64L), (3L, 65L), (4L, 0L)).toDF("doc_id", "n")
    val out = graft.ops.Packing
      .slidingChunks(d, col("doc_id"), col("n"), ctxTokens = 128L, stride = 64L)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1 (300): starts 0,64,128,192,256 — consecutive chunks share 64
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(0L, 64L, 128L, 192L, 256L))
    assert(d1.forall { case (_, i, s, e) => s == i * 64 && e == math.min(s + 128, 300L) })
    // coverage: every token position falls inside >= 1 chunk
    assert(d1.sliding(2).forall { case Array(a, b) => b._3 < a._4; case _ => true })
    // one-chunk docs: 64 tokens -> one [0,64) chunk; 65 -> [0,65) + [64,65)
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 64L)))
    assert(out.filter(_._1 == 3L).toSeq ==
      Seq((3L, 0L, 0L, 65L), (3L, 1L, 64L, 65L)))
    // empty docs vanish
    assert(!out.exists(_._1 == 4L))
  }

  test("encodeTokens: in-vocab ids, OOV -1, positions preserved") {
    val d = Seq((1L, "a b zzz a")).toDF("doc_id", "text")
    val vocab = Seq(("a", 0L), ("b", 1L)).toDF("token", "token_id")
    val r = TextStats.encodeTokens(d, col("doc_id"), col("text"), vocab)
      .orderBy("pos").collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((0L, 0L), (1L, 1L), (2L, -1L), (3L, 0L)))
  }

  test("cosine similarity: orthogonal/identical/zero-norm vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 0.0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("cos"))
    val r = df.collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r(1).getDouble(0)) < 1e-12)
    assert(r(2).isNullAt(0)) // zero norm → NULL, not NaN
  }

  test("cmJoinSize: inner-product bound holds; exact when buckets don't collide") {
    import graft.ops.Sketch
    val a = (Seq.fill(6)("x") ++ Seq.fill(3)("y") ++ Seq("z")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(5)("y") ++ Seq.fill(4)("w")).toDF("k")
    // true join size = 6·2 + 3·5 = 27
    def est(width: Int) = Sketch.cmJoinSize(
      Sketch.countMinMatrix(a, col("k"), 3, width),
      Sketch.countMinMatrix(b, col("k"), 3, width))
      .collect()(0).getDecimal(0).longValueExact()
    assert(est(4096) == 27L)   // wide sketch: no collisions → exact
    assert(est(2) >= 27L)      // collapsed sketch: still an upper bound
  }

  test("invertedIndex: df/cf exact, posting lists capped and sorted") {
    val docs = Seq(
      (1L, "a b a"), (2L, "a c"), (3L, "a"), (4L, "b c c"))
      .toDF("doc_id", "text")
    val idx = TextStats.invertedIndex(docs, col("doc_id"), col("text"),
        maxPostings = 2)
      .as[(String, Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // term a: docs 1,2,3 (df 3), cf = 2+1+1 = 4; postings capped to 2
    assert(idx("a") == ((3L, 4L, Seq(1L, 2L))))
    assert(idx("b") == ((2L, 2L, Seq(1L, 4L))))
    assert(idx("c") == ((2L, 3L, Seq(2L, 4L))))
  }

  test("pmiCollocations: always-adjacent pair scores high, support floors rare pairs") {
    // corpus: "x y" always adjacent (8×), fillers vary; pair "p q"
    // appears once — below minCount, must not surface
    val docs = (0 until 8).map(i => (i.toLong, s"x y f$i")) :+
      (8L, "p q")
    val out = TextStats.pmiCollocations(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), minCount = 5L)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(out.contains("x y") && !out.contains("p q"))
    // P(xy)=8/17 bigrams; P(x)=P(y)=8/26 tokens → pmi = ln(...) > 0
    val expected = math.log((8.0 * 26 * 26) / (17.0 * 8 * 8))
    assert(math.abs(out("x y") - expected) < 1e-4)
  }

  test("bigramNll: hand-computed corpus, repetitive text scores lower NLL") {
    // corpus of two docs: "a b a b" (4 tokens, bigrams ab, ba, ab) and
    // "c d" (bigram cd). Unigrams: a2 b2 c1 d1, T=6.
    // ctx(a)=2 (ab×2), ctx(b)=1 (ba), ctx(c)=1 (cd).
    // p(ab) = .5*(2/2) + .5*(2/6); p(ba) = .5*(1/1) + .5*(2/6);
    // p(cd) = .5*(1/1) + .5*(1/6)
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = TextStats.bigramNll(docs, col("doc_id"), col("text"), 0.5)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val pAb = 0.5 * 1.0 + 0.5 * (2.0 / 6); val pBa = 0.5 * 1.0 + 0.5 * (2.0 / 6)
    val pCd = 0.5 * 1.0 + 0.5 * (1.0 / 6)
    val nll1 = -(2 * math.log(pAb) + math.log(pBa)) / 3
    val nll2 = -math.log(pCd)
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - nll1) < 1e-3)
    assert(out(2L)._1 == 1L && math.abs(out(2L)._2 - nll2) < 1e-3)
    // the doc made of the corpus's dominant bigram is more predictable
    assert(out(1L)._2 < out(2L)._2)
  }

  test("knBigramNll: hand-computed KN, continuation diversity beats frequency") {
    // m follows 5 distinct contexts (u×2, a1..a4×1); n follows only v
    // (×2). The "u m" and "v n" docs have IDENTICAL surface statistics
    // (bc=2 within ctx=2, nfollow=1) — only the continuation diversity
    // of the second token differs, so KN must rank p(m|u) > p(n|v).
    val docs = Seq((1L, "u m"), (2L, "u m"), (3L, "a1 m"), (4L, "a2 m"),
      (5L, "a3 m"), (6L, "a4 m"), (7L, "v n"), (8L, "v n"))
      .toDF("doc_id", "text")
    val out = TextStats.knBigramNll(docs, col("doc_id"), col("text"), 0.75)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // bigram types: (u,m),(a1..a4,m),(v,n) → nt=6; nprec(m)=5, nprec(n)=1
    val pUm = (2.0 - 0.75) / 2 + (0.75 * 1 / 2) * (5.0 / 6)
    val pVn = (2.0 - 0.75) / 2 + (0.75 * 1 / 2) * (1.0 / 6)
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2 - (-math.log(pUm))) < 1e-3)
    assert(out(7L)._1 == 1L && math.abs(out(7L)._2 - (-math.log(pVn))) < 1e-3)
    assert(out(1L)._2 < out(7L)._2)
    // single-bigram docs only: every doc with >= 2 tokens is present
    assert(out.size == 8)
  }

  test("chrfPairs: hand-computed F_beta2=4, zero-overlap and short-side edges") {
    // identical pair → every F = 1; recall-weighted pair: cand "a" vs
    // ref "aa" has P1=1, R1=1/2 → F1 = 5·1·.5/(4·1+.5) = 5/9
    val refs = Seq((1L, "a b c"), (2L, "a a"), (3L, "b a")).toDF("doc_id", "text")
    val cands = Seq((1L, "a b c"), (2L, "a"), (3L, "a b")).toDF("doc_id", "text")
    val out = TextDedup.chrfPairs(refs, col("doc_id"), col("text"),
        cands, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out(1L) == ((Some(1.0), Some(1.0), Some(1.0), Some(1.0))))
    // pair 2: cand too short for n=2,3 → no base row → NULL f2/f3/chrf
    assert(out(2L)._1 == Some(math.round(5.0 / 9 * 1e6) / 1e6))
    assert(out(2L)._2.isEmpty && out(2L)._4.isEmpty)
    // pair 3: chars {a,b} match (f1=1) but bigrams "ab" vs "ba" are
    // disjoint → f2 = 0 by convention, f3 NULL (2 chars)
    assert(out(3L)._1 == Some(1.0) && out(3L)._2 == Some(0.0))
    assert(out(3L)._3.isEmpty && out(3L)._4.isEmpty)
  }

  test("chrfSelfPairs ≡ chrfPairs on the shifted self-pairing") {
    val two = TextDedup.chrfPairs(docs, col("doc_id") - 1L, col("text"),
      docs, col("doc_id"), col("text")).collect().map(_.toSeq).toSet
    val one = TextDedup.chrfSelfPairs(docs, col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet
    assert(one == two && one.nonEmpty)
  }

  test("distinctNgrams: hand-computed diversity ratios") {
    // s1: unigrams 6 total/2 distinct, bigrams 4/2, trigrams 2/2
    val d = Seq(("s1", "a b a b"), ("s1", "a b")).toDF("source", "text")
    val r = TextStats.distinctNgrams(d, col("source"), col("text"))
      .collect().head
    assert(r.getString(0) == "s1" && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 0.333333 && r.getDouble(3) == 0.5 &&
      r.getDouble(4) == 1.0)
  }

  test("blocklistGate: count and rate triggers, integer-only decision") {
    val d = Seq(
      ("s1", "slow slow slow x"), // 3 hits → count trigger
      ("s1", "x y z"), // clean
      ("s2", "slow a b c d e f g h i j k l m n o p q r"), // 1/19 → 20≥19 rate trigger
      ("s2", "slow a b c d e f g h i j k l m n o p q r s") // 1/20 → 20≥20 rate trigger (boundary)
    ).toDF("source", "text")
    val out = TextStats.blocklistGate(d, col("text"), col("source"),
        Seq("slow", "dup", "junk"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(out("s1") == ((2L, 1L, 3L)))
    assert(out("s2") == ((2L, 2L, 2L)))
  }

  test("leakageSafeSplit: near-dup groups never straddle splits") {
    import graft.ops.{Sampling, TextDedup}
    val pairs = TextDedup.lshCandidates(TextDedup.minhashSignatures(
      TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3), 8))
    val split = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
      "doc_a", "doc_b", Seq(50 -> "test", 100 -> "train"))
    // every group maps to exactly one split, so the near-dup cluster
    // {1,2,4} shares one side by construction
    val perGroup = split.groupBy(col("group_id"))
      .agg(countDistinct(col("split")).as("k")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L))
    val dupSides = split.filter(col("doc_id").isin(1L, 2L, 4L))
      .select(col("split")).distinct().count()
    assert(dupSides == 1L)
    // split is exhaustive over the corpus
    assert(split.filter(col("split").isNull).isEmpty)
    assert(split.count() == 4L)
  }

  test("oovRate: full vocab → 0, oov monotone in vocab size, partition-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "a a a b b c"),
      (2L, "de", "x y z a"),
      (3L, "de", "a b x q")).toDF("doc_id", "lang", "text")
    def run(v: Int) = graft.expr.TextStats
      .oovRate(docs, col("lang"), col("text"), v)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // vocab covers every type → zero OOV everywhere
    val full = run(100)
    assert(full.values.forall(v => v._2 == 0L && v._3 == 0.0))
    assert(full("en")._1 == 6L && full("de")._1 == 8L)
    // top-2 vocab = {a, b} (freq desc: a=6, b=3) → en misses only c;
    // de misses x(2) y z q = 5 of its 8 occurrences
    val top2 = run(2)
    assert(top2("en") == ((6L, 1L, math.rint(1.0 / 6 * 1e6) / 1e6)))
    assert(top2("de") == ((8L, 5L, 0.625)))
    // monotone: growing the vocab never raises any group's OOV count
    val counts = (1 to 7).map(v => run(v).view.mapValues(_._2).toMap)
    counts.sliding(2).foreach { case Seq(big, small) =>
      assert(big.forall { case (g, n) => small(g) <= n }) }
    // partitioning cannot move a rate
    val re = graft.expr.TextStats.oovRate(docs.repartition(5), col("lang"),
      col("text"), 2).collect().map(_.toString).sorted.toSeq
    assert(re == graft.expr.TextStats.oovRate(docs, col("lang"),
      col("text"), 2).collect().map(_.toString).sorted.toSeq)
  }

  test("lshPlanner: closed-form S-curve over a known pair distribution, " +
    "monotone in bands, exact s* anchors") {
    val verified = Seq((1L, 2L, 1.0), (3L, 4L, 0.5), (5L, 6L, 0.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val r = TextDedup.lshPlanner(verified, 8).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getDouble(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r.keySet == Set((1L, 8L), (2L, 4L), (4L, 2L), (8L, 1L)))
    // s* anchors: (1/b)^(1/r) with exact values at three of four points
    assert(r((1L, 8L))._1 == 1.0)
    assert(r((4L, 2L))._1 == 0.5)
    assert(r((8L, 1L))._1 == 0.125)
    assert(r((2L, 4L))._1 == 0.8409) // 0.5^0.25 to 4 dp
    // every (b,r) sees all 3 pairs; j=1 contributes p=1, j=0 p=0, so
    // expected ∈ (1, 2) with the j=0.5 term the only variable:
    // (8,1): 1 + (1-(1-0.5)^8) = 1.996094; (1,8): 1 + 0.5^8 = 1.003906
    assert(r.values.forall(_._2 == 3L))
    assert(math.abs(r((8L, 1L))._3 - 1.996094) < 1e-4)
    assert(math.abs(r((1L, 8L))._3 - 1.003906) < 1e-4)
    // more bands (fewer rows) is strictly more permissive
    val e = Seq((1L, 8L), (2L, 4L), (4L, 2L), (8L, 1L)).map(r(_)._3)
    assert(e == e.sorted)
  }

  test("minhashCalibration: est is matches/n on the signature table; " +
    "exact dups calibrate to est=1, jac=1, err=0") {
    val sh = TextDedup.shingleSet(docs, col("doc_id"), col("text"), 3)
    val sigs = TextDedup.minhashSignatures(sh, 8)
    val cands = TextDedup.lshCandidates(sigs)
    val exact = TextDedup.jaccard(cands, sh)
    val r = TextDedup.minhashCalibration(cands, sigs, exact, 8).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    // every estimate is a multiple of 1/8 in [0,1]
    assert(r.values.forall { case (e, _, _) =>
      e >= 0 && e <= 1 && math.abs(e * 8 - math.round(e * 8)) < 1e-9 })
    // docs 1 and 4 are identical: signatures agree on all 8 slots
    assert(r((1L, 4L)) == (1.0, 1.0, 0.0))
    // err is |est − jac| for every pair
    assert(r.values.forall { case (e, j, err) =>
      math.abs(err - math.abs(e - j)) < 1e-3 })
  }

  test("semanticDecontam: flags exactly the corpus vectors whose best " +
    "benchmark cosine clears tau, with lowest-id argmax tie-break") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 1f)),
      (10L, Array(1f, 0f)), (20L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") < 10)
    val bench = emb.filter(col("vec_id") >= 10)
    val r = graft.ops.Ann.semanticDecontam(corpus, bench, 0.9)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2)))
      .toMap
    // vec 1: cos(10)=1.0, cos(20)=0.6 → flagged via 10
    // vec 2: cos(10)=0, cos(20)=0.8 → below tau, not flagged
    // vec 3: cos(10)=0.7071, cos(20)=0.9899 → flagged via 20
    assert(r.keySet == Set(1L, 3L))
    assert(r(1L) == (10L, 1.0))
    assert(r(3L)._1 == 20L && math.abs(r(3L)._2 - 0.9899) < 1e-4)
    // tau below -1 flags the whole corpus (argmax always exists)
    assert(graft.ops.Ann.semanticDecontam(corpus, bench, -2).count() == 3)
  }

  test("decontamApply: benchmark-covered windows excise from every " +
    "occurrence; clean docs untouched; short docs pass through") {
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val bench = Seq((1L, "q w e r t")).toDF("doc_id", "text")
    val corpus = Seq(
      (20L, "x q w e r t y q w e r t"), // two occurrences, both excised
      (21L, "clean text with no overlap at all"),
      (22L, "q w e")) // shorter than l — no grams, untouched
      .toDF("doc_id", "text")
    val r = TextDedup.decontamApply(corpus, bench, col("doc_id"),
        col("text"), 5)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(20L) == (12L, 10L, md5s("x y")))
    assert(r(21L) == (7L, 0L, md5s("clean text with no overlap at all")))
    assert(r(22L) == (3L, 0L, md5s("q w e")))
    // agreement with detection (q54): removal fires exactly on the
    // docs the contamination check flags
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val g = TextDedup.shingleSet(docs, col("doc_id"), col("text"), 5)
    val flagged = TextDedup.contamination(
      g.filter(col("doc_id") >= 20), g.filter(col("doc_id") < 20))
      .collect().map(_.getLong(0)).toSet
    val removed = TextDedup.decontamApply(docs.filter(col("doc_id") >= 20),
        docs.filter(col("doc_id") < 20), col("doc_id"), col("text"), 5)
      .filter(col("n_removed") > 0).collect().map(_.getLong(0)).toSet
    assert(removed == flagged)
  }

  test("bloomStagedContamination: verdicts exactly match the one-stage " +
    "exact check (no false negatives); FP accounting is non-negative " +
    "and shrinks with more bits") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val g = TextDedup.shingleSet(docs, col("doc_id"), col("text"), 5)
    val corpus = g.filter(col("doc_id") >= 20)
    val bench = g.filter(col("doc_id") < 20)
    val staged = TextDedup.bloomStagedContamination(corpus, bench)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val exact = TextDedup.contamination(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // stage 2 makes the verdict exact: per-doc exact-hit counts agree
    assert(staged.filter(_._2._4).view.mapValues(_._2).toMap == exact)
    staged.values.foreach { case (nb, nex, nfp, _) =>
      assert(nfp == nb - nex && nfp >= 0L && nex >= 0L)
    }
    // a bigger filter can only lower the bloom-hit count (fewer FPs)
    val wide = TextDedup.bloomStagedContamination(corpus, bench, bits = 65536)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    staged.foreach { case (d, (nb, _, _, _)) =>
      assert(wide.getOrElse(d, 0L) <= nb, s"doc $d")
    }
  }

  test("blockBoilerplate: corpus-frequent blocks drop from EVERY doc, " +
    "rare blocks survive, fully-boilerplate doc hashes md5('')") {
    // b=2 blocks; "nav bar" opens three docs (freq 3 → drop everywhere,
    // including all its occurrences); "body one"/"body two" are unique
    val docs = Seq(
      (1L, "nav bar body one"),
      (2L, "nav bar body two"),
      (3L, "nav bar"),          // nothing left after removal
      (4L, "plain text only"))  // 2 blocks: "plain text" + short tail "only"
      .toDF("doc_id", "text")
    val r = TextDedup.blockBoilerplate(docs, col("doc_id"), col("text"), 2, 1L)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3))))
      .toMap
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(1L) == (2L, 1L, md5s("body one")))
    assert(r(2L) == (2L, 1L, md5s("body two")))
    assert(r(3L) == (1L, 1L, md5s("")))
    assert(r(4L) == (2L, 0L, md5s("plain text only")))
  }

  test("blockBoilerplate: maxFreq raises the bar; partition-invariant") {
    val docs = Seq(
      (1L, "a b x"), (2L, "a b y"), (3L, "c d z"))
      .toDF("doc_id", "text")
    // maxFreq=2 keeps the twice-seen "a b"
    val keep2 = TextDedup.blockBoilerplate(docs, col("doc_id"), col("text"), 2, 2L)
      .agg(sum(col("n_dropped"))).head().getLong(0)
    assert(keep2 == 0L)
    val once = TextDedup.blockBoilerplate(docs, col("doc_id"), col("text"), 2, 1L)
    val rep = TextDedup.blockBoilerplate(docs.repartition(7), col("doc_id"),
      col("text"), 2, 1L)
    assert(once.orderBy("doc_id").collect().toSeq ==
      rep.orderBy("doc_id").collect().toSeq)
  }
  test("canonicalDupGroups: case/punct/whitespace variants collide on " +
    "the canonical key; raw-identical dups count ONE raw variant; " +
    "singletons drop") {
    import spark.implicits._
    def md5s(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "HELLO  WORLD"),
      (4L, "same text"), (5L, "same text"), // raw-identical pair
      (6L, "a singleton")).toDF("doc_id", "text")
    val r = TextDedup.canonicalDupGroups(docs, col("doc_id"), col("text"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.size == 2)
    assert(r(md5s("hello world")) == ((3L, 3L, 1L)))
    assert(r(md5s("same text")) == ((2L, 1L, 4L)))
  }

  test("rouge1Prf: hand P/R/F1 on distinct-unigram sets; repeated " +
    "tokens dedup; zero-overlap pairs report zeros") {
    import spark.implicits._
    val refs = Seq((10L, "a b c d"), (20L, "x x y"), (30L, "p q"))
      .toDF("id", "text")
    val cands = Seq((10L, "a b e"), (20L, "x y y z"), (30L, "zz"))
      .toDF("id", "text")
    val r = TextDedup.rouge1Prf(refs, col("id"), col("text"),
        cands, col("id"), col("text"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getDouble(4), x.getDouble(5), x.getDouble(6))))
      .toMap
    // pair 10: ref {a,b,c,d}, cand {a,b,e}: h=2, P=2/3, R=1/2, F=4/7
    assert(r(10L) == ((4L, 3L, 2L, 0.666667, 0.5, 0.571429)))
    // pair 20: ref {x,y} (dedup), cand {x,y,z}: h=2, P=2/3, R=1, F=4/5
    assert(r(20L) == ((2L, 3L, 2L, 0.666667, 1.0, 0.8)))
    assert(r(30L) == ((2L, 1L, 0L, 0.0, 0.0, 0.0)))
  }
  test("templateAffixGroups: shared 8-token prefixes and suffixes " +
    "group; multi-source counted; <8-token docs and singletons drop") {
    import spark.implicits._
    val h = "t1 t2 t3 t4 t5 t6 t7 t8"
    val f = "f1 f2 f3 f4 f5 f6 f7 f8"
    val docs = Seq(
      (1L, "sa", s"$h alpha beta"), (2L, "sb", s"$h gamma"),
      (3L, "sa", s"$h delta epsilon zeta"),
      (4L, "sa", s"opening words first $f"), (5L, "sa", s"other start $f"),
      (6L, "sa", "too short"),
      (7L, "sa", "a lone document with eight plus tokens in it"))
      .toDF("doc_id", "src", "text")
    val r = graft.ops.TextDedup.templateAffixGroups(docs, col("doc_id"),
        col("text"), col("src"), 8)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    def md5s(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.size == 2)
    assert(r(("prefix", md5s(h))) == ((3L, 2L, 1L)))
    assert(r(("suffix", md5s(f))) == ((2L, 1L, 4L)))
  }
  test("topVocabOverlap: top-k by (weight desc, term) with ties pinned; " +
    "exact pair Jaccard; zero-overlap pairs present; k-truncation") {
    import spark.implicits._
    val d = Seq(
      ("A", "t1", 5L), ("A", "t2", 4L), ("A", "t3", 3L),
      ("B", "t2", 9L), ("B", "t3", 1L), ("B", "t4", 1L),
      ("C", "zz", 1L)).toDF("g", "term", "w")
    val r = graft.ops.TextDedup.topVocabOverlap(d, col("g"), col("term"),
        col("w"), 2)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    // top-2: A={t1,t2}; B={t2,t3} (w tie t3/t4 breaks to t3); C={zz}
    assert(r.size == 3)
    assert(r(("A", "B")) == ((2L, 2L, 1L, 0.333333)))
    assert(r(("A", "C")) == ((2L, 1L, 0L, 0.0)))
    assert(r(("B", "C")) == ((2L, 1L, 0L, 0.0)))
  }

  test("bleu2Pairs: hand clipped precisions, identity = 1, repetition " +
    "is clipped, short candidate -> NULL p2/bleu2 with brevity penalty") {
    import graft.ops.TextDedup
    val refs = Seq((1L, "a b c"), (2L, "x y z"), (3L, "the cat"),
      (4L, "same text here")).toDF("id", "txt")
    val cands = Seq((1L, "a a b"), (2L, "x"), (3L, "the the the the"),
      (4L, "same text here")).toDF("id", "txt")
    val r = TextDedup.bleu2Pairs(refs, col("id"), col("txt"),
        cands, col("id"), col("txt"))
      .collect().map(x => x.getLong(0) -> x).toMap
    def d6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // pair 1: p1 = 2/3 (clip a to 1), p2 = 1/2 ("a b" hits), bp = 1
    assert(r(1L).getDouble(3) == d6(2.0 / 3.0))
    assert(r(1L).getDouble(4) == 0.5)
    assert(r(1L).getDouble(5) == 1.0)
    assert(r(1L).getDouble(6) == d6(1.0 * math.sqrt(d6(2.0 / 3.0) * 0.5)))
    // pair 2: 1-token candidate -> p2/bleu2 NULL, bp = e^(1-3)
    assert(r(2L).getDouble(3) == 1.0)
    assert(r(2L).isNullAt(4) && r(2L).isNullAt(6))
    assert(r(2L).getDouble(5) == d6(math.exp(-2.0)))
    // pair 3: repetition clipped — p1 = min(4,1)/4
    assert(r(3L).getDouble(3) == 0.25)
    assert(r(3L).getDouble(4) == 0.0)
    assert(r(3L).getDouble(6) == 0.0)
    // pair 4: identity scores exactly 1
    assert(r(4L).getDouble(3) == 1.0 && r(4L).getDouble(4) == 1.0 &&
      r(4L).getDouble(5) == 1.0 && r(4L).getDouble(6) == 1.0)
    // partition invariance
    val r7 = TextDedup.bleu2Pairs(refs.repartition(7), col("id"),
        col("txt"), cands.repartition(3), col("id"), col("txt"))
      .collect().map(_.toString).sorted.toSeq
    assert(r7 == r.values.map(_.toString).toSeq.sorted)
  }

  test("mojibakeStats: hand counts for replacement/control chars; " +
    "tab/newline/CR are NOT flagged; clean text is all-zero; " +
    "partition-invariant") {
    import graft.expr.TextStats
    // s1 doc 1: 2 replacement chars + 1 BEL in 10 chars; doc 2 clean;
    // s2: tab+newline+CR only -> legitimately clean
    val df = Seq(
      ("s1", "ab\uFFFDc\uFFFDdef\u0007g"),
      ("s1", "clean text"),
      ("s2", "a\tb\nc\rd")).toDF("src", "txt")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextStats.mojibakeStats(d, col("txt"), col("src"))
        .collect().map(x => x.getString(0) ->
          ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4),
            x.getLong(5), x.getDouble(6), x.getDouble(7)))).toMap
    val r = run(df)
    // repl density: 2 per (10 + 10) chars = 100/kchar; ctrl: 50/kchar
    assert(r("s1") == ((2L, 1L, 0.5, 2L, 1L, 100.0, 50.0)),
      r("s1").toString)
    assert(r("s2") == ((1L, 0L, 0.0, 0L, 0L, 0.0, 0.0)),
      r("s2").toString)
    assert(run(df.repartition(7)) == r)
  }

  test("mojibakeStats: a group of only-empty texts gives NULL " +
    "per-kchar densities (the 0/0 guard), not NaN") {
    import graft.expr.TextStats
    val df = Seq(("e", ""), ("e", ""), ("s", "ok")).toDF("src", "txt")
    val r = TextStats.mojibakeStats(df, col("txt"), col("src"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("e").getLong(1) == 2L && r("e").getDouble(3) == 0.0)
    assert(r("e").isNullAt(6) && r("e").isNullAt(7), r("e").toString)
    assert(r("s").getDouble(6) == 0.0 && r("s").getDouble(7) == 0.0)
  }

  test("kmvDistinct: below-k exactness, estimate sanity, sketch mergeability") {
    import graft.ops.Sketch
    // group "big": 500 distinct keys (sketched, k=64); group "small":
    // 10 distinct keys (below k -> exact count reported as est)
    val rows = (1 to 500).map(i => ("big", s"k$i")) ++
      (1 to 10).map(i => ("small", s"s$i")) ++
      (1 to 10).map(i => ("small", s"s$i")) // duplicates collapse
    val df = rows.toDF("g", "key")
    val out = Sketch.kmvDistinct(df, col("g"), col("key"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), r.getDouble(3)))).toMap
    assert(out("small")._1 == 10L && out("small")._2.isEmpty &&
      out("small")._3 == 10.0)
    assert(out("big")._1 == 500L)
    // KMV with k=64 on 500 distinct: relative error ~ 1/sqrt(k-1) ~ 13%;
    // allow 3 sigma
    assert(math.abs(out("big")._3 - 500.0) < 200.0, out("big").toString)
    // the __union row sketches the merged hash set
    assert(out("__union")._1 == 510L)
    // mergeability: the union sketch's kth equals the kth of the
    // merged per-group hash sets — recompute by relabeling all rows
    // into one group and comparing (kth, est)
    val one = Sketch.kmvDistinct(df.select(lit("all").as("g"), col("key")),
        col("g"), col("key"))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(2)), r.getDouble(3)))).toMap
    assert(one("all")._1 == out("__union")._2 &&
      one("all")._2 == out("__union")._3)
  }

  test("kmvIntersect: below-k exactness, symmetry, sketched estimate " +
    "within sampling error") {
    import graft.ops.Sketch
    // union 8 < k -> lossless: est == exact, jaccard = 2/8
    val a = (1 to 5).map(i => s"u$i").toDF("key")
    val b = (4 to 8).map(i => s"u$i").toDF("key")
    val r = Sketch.kmvIntersect(a, col("key"), b, col("key"))
      .collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L)
    assert(r.getLong(2) == 8L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 8.0 && r.getDouble(5) == 2.0)
    assert(r.getDouble(6) == 0.25)
    // sketched path (k = 64 < union 600): estimates land within ~3σ of
    // truth (σ/est ≈ 1/√(k−1) ≈ 13%), and the operator is symmetric
    // in its set arguments
    val bigA = (1 to 400).map(i => s"x$i").toDF("key")
    val bigB = (201 to 600).map(i => s"x$i").toDF("key")
    val s1 = Sketch.kmvIntersect(bigA, col("key"), bigB, col("key"))
      .collect().head
    assert(s1.getLong(2) == 600L && s1.getLong(3) == 200L)
    assert(math.abs(s1.getDouble(4) - 600.0) < 250.0, s1.toString)
    assert(math.abs(s1.getDouble(5) - 200.0) < 150.0, s1.toString)
    val s2 = Sketch.kmvIntersect(bigB, col("key"), bigA, col("key"))
      .collect().head
    assert(s2.getDouble(4) == s1.getDouble(4) &&
      s2.getDouble(5) == s1.getDouble(5) &&
      s2.getDouble(6) == s1.getDouble(6))
  }

  test("deltaMethodRatio: with unit denominators it reduces to the " +
    "two-sample mean z; a perfect ratio metric has zero variance") {
    import graft.ops.Analytics
    // x = 1 everywhere -> R = mean(y), Var(R) = Var(y)/n: arm A
    // y = (1, 5) -> R = 3, v = 8/2 = 4; arm B y = (1, 3) -> R = 2,
    // v = 2/2 = 1; z = 1/sqrt(5)
    val units = Seq((true, 1.0, 1L), (true, 5.0, 1L),
      (false, 1.0, 1L), (false, 3.0, 1L)).toDF("a", "y", "x")
    val r = Analytics.deltaMethodRatio(units, col("a"), col("y"),
      col("x")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == 2.236068) // sqrt(5) @ 6 dp
    assert(r.getDouble(5) == 0.447214) // 1/sqrt(5) @ 6 dp
    assert(r.getDouble(6) > 0.6 && r.getDouble(6) < 0.7)
    // y = 2x exactly in both arms: the ratio is deterministic, the
    // delta-method variance vanishes -> z/p NULL (not a fake zero SE)
    val perfect = Seq((true, 2.0, 1L), (true, 4.0, 2L),
      (false, 6.0, 3L), (false, 8.0, 4L)).toDF("a", "y", "x")
    val p = Analytics.deltaMethodRatio(perfect, col("a"), col("y"),
      col("x")).collect().head
    assert(p.getDouble(2) == 2.0 && p.getDouble(3) == 2.0)
    assert(p.isNullAt(4) && p.isNullAt(5) && p.isNullAt(6))
  }

  test("postStratify: hand pooled-share reweighting; an arm-empty " +
    "stratum yields NULL, never a silently dropped stratum") {
    import graft.ops.Analytics
    // strata s1/s2 each hold half the units (w = 0.5): treat means
    // (2, 10) -> ps = 6; ctrl means (5, 25) -> ps = 15
    val u = Seq((true, "s1", 1.0), (true, "s1", 3.0), (false, "s1", 5.0),
      (true, "s2", 10.0), (false, "s2", 20.0), (false, "s2", 30.0))
      .toDF("a", "s", "y")
    val r = Analytics.postStratify(u, col("a"), col("s"), col("y"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r("treat") == ((3L, math.floor(14.0 / 3.0 * 1e6 + 0.5) / 1e6, 6.0)))
    assert(r("ctrl") == ((3L, math.floor(55.0 / 3.0 * 1e6 + 0.5) / 1e6, 15.0)))
    // a stratum with no treat units: the treat estimator is undefined
    val miss = Analytics.postStratify(
      u.unionByName(Seq((false, "s3", 7.0)).toDF("a", "s", "y")),
      col("a"), col("s"), col("y")).collect()
      .map(x => x.getString(0) -> x.isNullAt(3)).toMap
    assert(miss("treat") && !miss("ctrl"))
  }

  test("chao1Richness: hand counts-of-counts and the exhausted-source case") {
    // s1 bigrams: "a b" x2, "b a" x1, "c d" x1 -> D=3, F1=2, F2=1,
    // chao1 = 3 + 2*1/(2*2) = 3.5
    val d = Seq(("s1", "a b a b"), ("s1", "c d"),
      ("s2", "x y x y x y")).toDF("source", "text")
    val out = TextStats.chao1Richness(d, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("s1") == ((3L, 2L, 1L, 3.5)))
    // s2: "x y" x3, "y x" x2 -> no singletons -> chao1 == D exactly
    // (the source has shown us everything it has)
    assert(out("s2") == ((2L, 0L, 1L, 2.0)))
  }

  test("jmLambdaEm: hand EM trajectory on a two-doc corpus") {
    // train (even): "x y x y" -> uni x:2 y:2 T=4; big "x y":2 "y x":1;
    // ctx(x)=2 ctx(y)=1. held (odd): "x y z x" -> events:
    //   "x y": pb=2/2=1, pu=2/4=0.5; "y z": w2 unseen -> dropped;
    //   "z x": pb=0 (unseen bigram), pu=0.5
    val d = Seq((0L, "x y x y"), (1L, "x y z x")).toDF("doc_id", "text")
    val r = TextStats.jmLambdaEm(d, col("doc_id"), col("text"))
      .collect().head
    assert(r.getLong(0) == 2L)
    // replay the snapped trajectory in plain Scala
    def snap9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    def step(lam: Double): Double = {
      val w1 = (lam * 1.0) / (lam * 1.0 + (1.0 - lam) * 0.5) // "x y"
      val w2 = 0.0                                            // "z x"
      val num = snap9(1.0 * w1) + snap9(1.0 * w2)
      math.floor(num / 2.0 * 1e6 + 0.5) / 1e6
    }
    val l1 = step(0.5)
    assert(r.getDouble(1) == l1 && l1 == 0.333333)
    assert(r.getDouble(2) == step(l1))
    // the unseen held-out bigram ("z x") is exactly the evidence that
    // pulls lambda DOWN from 0.5 toward the unigram component
    assert(r.getDouble(2) < 0.5)
  }

  test("srmCheck: hand chi-square, duplicate exposures collapse") {
    import graft.ops.Analytics
    // g: 4 vs 6 -> chi2 = 4/10 = 0.4, fine; h: 40 vs 10 -> 900/50 = 18, SRM
    val rows = (1 to 10).map(u => ("g", u.toLong, u <= 4)) ++
      (1 to 50).map(u => ("h", u.toLong, u <= 40)) ++
      Seq(("g", 1L, true)) // duplicate exposure of the same unit
    val out = Analytics.srmCheck(rows.toDF("t", "u", "a"),
        col("t"), col("u"), col("a"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(out("g") == ((4L, 6L, 0.4, false)))
    assert(out("h") == ((40L, 10L, 18.0, true)))
  }

  test("heapsLawFit: hand curve + exact-power-law fit recovery") {
    // 4 docs (pos 1..4, checkpoints 1,2,4): vocabulary doubles with
    // corpus size -> V(n) = 2 * n^1 exactly, so the log-log OLS must
    // return beta = 1, lnk = ln 2 (up to the 1e6 round)
    val d = Seq(
      (0L, "a b"),         // V(1) = 2
      (1L, "a c d"),       // V(2) = 4
      (2L, "e f b"),       // ...
      (3L, "g h")          // V(4) = 8
    ).toDF("doc_id", "text")
    val out = TextStats.heapsLawFit(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L)._1 == 2L && out(2L)._1 == 4L && out(4L)._1 == 8L)
    val (_, beta, lnk) = out(1L)
    assert(beta == 1.0)
    assert(math.abs(lnk - math.log(2.0)) < 1e-6)
    // fit columns are constant across curve rows
    assert(out.values.map(v => (v._2, v._3)).toSet.size == 1)
  }

  test("abSampleSize: hand formula, any-converted unit collapse") {
    import graft.ops.Analytics
    // group g: units 1..4, unit 1 converts via its SECOND exposure ->
    // p = 1/4; n = ceil((1.96+0.8416)^2 * 2 * .25 * .75 / 0.0004)
    val rows = Seq(("g", 1L, false), ("g", 1L, true), ("g", 2L, false),
      ("g", 3L, false), ("g", 4L, false))
    val out = Analytics.abSampleSize(rows.toDF("t", "u", "c"),
        col("t"), col("u"), col("c"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).head
    val zz = (1.96 + 0.8416) * (1.96 + 0.8416)
    val expect = math.ceil(zz * 2.0 * 0.25 * 0.75 / 0.0004).toLong
    assert(out == ((4L, 1L, 0.25, expect)))
    assert(expect == 7359L) // pin the digit the formula should give
  }

  test("normalPValue2: A&S approximation hits the classic quantiles") {
    import graft.ops.Analytics
    val d = Seq(0.0, 1.96, -1.96, 2.5758).toDF("z")
    val out = d.select(Analytics.normalPValue2(col("z")).as("p"))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 2e-7)        // z = 0 -> p = 1
    assert(math.abs(out(1) - 0.05) < 1e-5)       // the 95% two-sided z
    assert(out(1) == out(2))                     // symmetric in z
    assert(math.abs(out(3) - 0.01) < 1e-5)       // the 99% two-sided z
  }

  test("bhFdr: step-up rejects below-k* ranks even past a local miss") {
    import graft.ops.Analytics
    // m = 3, q = 0.1 -> thresholds 1/30, 2/30, 3/30: p(1) = .04 fails
    // ITS OWN threshold but p(2) = .065 passes -> k* = 2, so BOTH
    // rank-1 and rank-2 reject (the step-up property naive per-rank
    // thresholding gets wrong)
    val tests = Seq(("a", 0.04), ("b", 0.065), ("c", 0.2)).toDF("g", "p")
    val out = Analytics.bhFdr(tests, col("g"), col("p"), 0.1)
      .collect().map(r => r.getString(0) -> ((r.getInt(2), r.getBoolean(3))))
      .toMap
    assert(out("a") == ((1, true)) && out("b") == ((2, true)))
    assert(out("c") == ((3, false)))
    // nothing significant -> k* = 0, zero rejections
    val none = Analytics.bhFdr(Seq(("a", 0.5), ("b", 0.9)).toDF("g", "p"),
      col("g"), col("p"), 0.1).collect()
    assert(none.forall(!_.getBoolean(3)))
  }

  test("bhFdr yekutieli: the harmonic penalty blocks what plain BH " +
    "passes; NULL p neither counts in m nor in c(m)") {
    import graft.ops.Analytics
    // m = 3, c(3) = 1 + 1/2 + 1/3 (snapped) ≈ 1.833333333 →
    // BY thresholds .018181…, .036363…, .054545… vs BH's .0333/.0667/.1:
    // p = (.01, .03, .06) rejects ALL THREE under BH (k* = 3) but only
    // the first two under BY (.06 > .054545 → k* = 2)
    val tests = Seq(("a", 0.01), ("b", 0.03), ("c", 0.06)).toDF("g", "p")
    val bh = Analytics.bhFdr(tests, col("g"), col("p"), 0.1)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(bh == Map("a" -> true, "b" -> true, "c" -> true))
    val by = Analytics.bhFdr(tests, col("g"), col("p"), 0.1,
      yekutieli = true)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(by == Map("a" -> true, "b" -> true, "c" -> false))
    // a NULL p ranks last and joins neither m nor the harmonic sum:
    // identical decisions for the real tests
    val withNull = Seq(("a", Some(0.01)), ("b", Some(0.03)),
      ("c", Some(0.06)), ("d", None)).toDF("g", "p")
    val by2 = Analytics.bhFdr(withNull, col("g"), col("p"), 0.1,
      yekutieli = true)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(by2 == Map("a" -> true, "b" -> true, "c" -> false,
      "d" -> false))
  }

  test("cupedAdjust: exact θ on a y = 2x corpus (variance fully " +
    "explained); constant covariate → NULL θ") {
    import graft.ops.Analytics
    // y = 2x exactly: θ = Cov/Var = 2, Var(y') = 0, both adjusted
    // arm means collapse onto the pooled ȳ = 5
    val units = Seq((true, 1.0, 2.0), (true, 3.0, 6.0),
      (false, 2.0, 4.0), (false, 4.0, 8.0)).toDF("a", "x", "y")
    val r = Analytics.cupedAdjust(units, col("a"), col("x"), col("y"))
      .collect().map(row => row.getString(0) -> row).toMap
    for ((_, row) <- r) {
      assert(row.getLong(1) == 2L)
      assert(row.getDouble(2) == 2.0)      // theta
      assert(row.getDouble(4) == 5.0)      // mean_y_adj
      assert(row.getDouble(5) == 5.0)      // var_y
      assert(row.getDouble(6) == 0.0)      // var_y_adj
      assert(row.getDouble(7) == 1.0)      // var_reduction
    }
    assert(r("treat").getDouble(3) == 4.0) // raw treat mean
    assert(r("ctrl").getDouble(3) == 6.0)  // raw ctrl mean
    // constant x: Var(x) = 0 → θ and the adjusted columns are NULL
    val const = Seq((true, 1.0, 2.0), (false, 1.0, 4.0)).toDF("a", "x", "y")
    val c = Analytics.cupedAdjust(const, col("a"), col("x"), col("y"))
      .collect()
    assert(c.forall(_.isNullAt(2)) && c.forall(_.isNullAt(4)))
  }

  test("jackknifeRatio: hand leave-one-out variance; single group → " +
    "NULL se (every LOO denominator vanishes)") {
    import graft.ops.Analytics
    // groups (num, den): a (2,1), b (4,1), c (6,1) → R = 4,
    // R_(i) = 5, 4, 3 → se² = (2/3)·Σ(R_i − 4)² = 4/3
    val d = Seq(("a", 2.0), ("b", 4.0), ("c", 6.0)).toDF("g", "v")
    val r = Analytics.jackknifeRatio(d, col("g"), col("v"), lit(1.0))
      .collect().head
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 4.0)
    assert(r.getDouble(2) == 1.154701) // sqrt(4/3) @ 6 dp
    assert(r.getDouble(3) == 1.736787 && r.getDouble(4) == 6.263213)
    val one = Analytics.jackknifeRatio(
      Seq(("a", 2.0)).toDF("g", "v"), col("g"), col("v"), lit(1.0))
      .collect().head
    assert(one.getLong(0) == 1L && one.getDouble(1) == 2.0)
    assert(one.isNullAt(2) && one.isNullAt(3) && one.isNullAt(4))
  }

  test("concentrationReport: hand Gini/HHI/entropy; uniform -> gini 0") {
    import graft.ops.Analytics
    // weights a:1 b:1 c:2 -> sorted ranks 1,2,3; gini = 2*9/(3*4) - 4/3
    val d = Seq(("a", 1L), ("b", 1L), ("c", 2L)).toDF("g", "w")
    val r = Analytics.concentrationReport(d, col("g"), col("w"))
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == math.floor((18.0 / 12.0 - 4.0 / 3.0) * 1e6 + 0.5) / 1e6)
    assert(r.getDouble(3) == 0.375) // .25^2 + .25^2 + .5^2
    assert(math.abs(r.getDouble(4) - 1.5 * math.log(2.0)) < 1e-6)
    assert(r.getDouble(5) == 0.5)
    // equal shares: gini exactly 0, top = 1/n
    val u = Seq(("a", 5L), ("b", 5L)).toDF("g", "w")
    val r2 = Analytics.concentrationReport(u, col("g"), col("w"))
      .collect().head
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(5) == 0.5)
  }

  test("dirichletQl: hand scores ln((tf + mu·cf/T)/(len + mu)), every " +
    "doc scores via the background model, OOV query terms drop, topK " +
    "cuts with doc_id ties") {
    val d = Seq((1L, "a b"), (2L, "a a"), (3L, "c c")).toDF("id", "t")
    // T = 6, cf(a) = 3, mu = 2: score = ln((tf + 1)/(len + 2))
    def run(q: Seq[String], k: Int) =
      TextStats.dirichletQl(d, col("id"), col("t"), q, mu = 2.0,
        topK = k).collect().map(r => (r.getLong(0), r.getDouble(2)))
    val r = run(Seq("a"), 3)
    assert(r.map(_._1).toSeq == Seq(2L, 1L, 3L)) // by score desc
    val hand = Map(2L -> math.log(3.0 / 4.0), 1L -> math.log(2.0 / 4.0),
      3L -> math.log(1.0 / 4.0))
    r.foreach { case (id, s) => assert(math.abs(s - hand(id)) < 1e-6) }
    // an out-of-corpus query term contributes no ranking information
    assert(run(Seq("a", "zzz"), 3).toSeq == r.toSeq)
    assert(run(Seq("a"), 2).map(_._1).toSeq == Seq(2L, 1L))
  }

  test("rmExpansion: single-doc feedback set yields p_ML(w|d) weights " +
    "for non-query terms only; fbTerms cuts") {
    val d = Seq((1L, "a x x y"), (2L, "b b b b")).toDF("id", "t")
    def run(k: Int) = TextStats.rmExpansion(d, col("id"), col("t"),
      Seq("a"), mu = 2.0, fbDocs = 1, fbTerms = k).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val r = run(5)
    // fb = {d1} (only doc containing 'a'), p(d1|q) = 1: weights are
    // d1's MLE term probs, query term excluded
    assert(r.toSeq == Seq(("x", 0.5), ("y", 0.25)))
    assert(run(1).toSeq == Seq(("x", 0.5)))
  }

  test("skipgramCounts: hand window-2 pair grid (both directions, " +
    "offset 1 and 2); window 1 drops the skip pairs; minCount floors") {
    val d = Seq((1L, "a b c")).toDF("id", "t")
    def run(w: Int, mc: Long) = TextStats.skipgramCounts(d, col("id"),
      col("t"), window = w, minCount = mc).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val r2 = run(2, 1L)
    assert(r2 == Map(("a", "b") -> 1L, ("b", "a") -> 1L,
      ("b", "c") -> 1L, ("c", "b") -> 1L,
      ("a", "c") -> 1L, ("c", "a") -> 1L))
    val r1 = run(1, 1L)
    assert(r1.keySet == Set(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")))
    assert(run(2, 2L).isEmpty)
  }

  test("dunningCollocations: matches a plain-Scala replay of the 2x2 " +
    "G2; an evidence-heavy pair outranks a rare coincidence") {
    // "x y" co-occurs 5 times; "p q" once as a COINCIDENCE (p usually
    // precedes other words, q usually follows other words — the case
    // PMI over-scores and G2 must not)
    val texts = Seq("x y x y x y x y x y", "p q",
      "x m y n x k", "p a p b p c", "w q w q")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val r = TextStats.dunningCollocations(d, col("id"), col("t"),
      minCount = 1L, topK = 50).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // independent replay from raw bigram counts
    val bigs = texts
      .flatMap(_.split(" ").sliding(2).map(_.mkString(" ")).toSeq)
    val bc = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bigs.map(_.split(" ")(0)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val c2 = bigs.map(_.split(" ")(1)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = bigs.size.toDouble
    def g2(bg: String): Double = {
      val Array(w1, w2) = bg.split(" ")
      val k11 = bc(bg).toDouble; val r1 = c1(w1).toDouble
      val r2v = c2(w2).toDouble
      def t(o: Double, e: Double) = if (o > 0) o * math.log(o / e) else 0.0
      val g = 2.0 * (t(k11, r1 * r2v / n) +
        t(r1 - k11, r1 * (n - r2v) / n) +
        t(r2v - k11, (n - r1) * r2v / n) +
        t(n - r1 - r2v + k11, (n - r1) * (n - r2v) / n))
      math.floor(g * 1e4 + 0.5) / 1e4
    }
    assert(r(("x y"))._1 == 5L && r(("x y"))._2 == g2("x y"))
    assert(r(("p q"))._2 == g2("p q"))
    assert(r(("x y"))._2 > r(("p q"))._2)
  }

  test("phraseSearch: adjacency only (reversed and gapped pairs don't " +
    "match); overlapping repeats each count; 3-term chain") {
    val d = Seq((1L, "a b c a b"), (2L, "b a"), (3L, "a c b"),
      (4L, "x y z x y z"), (5L, "a a b"))
      .toDF("id", "t")
    def run(p: Seq[String]) = TextStats.phraseSearch(d, col("id"),
      col("t"), p).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Seq("a", "b")) == Map(1L -> 2L, 5L -> 1L))
    assert(run(Seq("x", "y", "z")) == Map(4L -> 2L))
  }

  test("kendallTauB: perfect concordance 1, reversal -1; tie " +
    "corrections on a hand case; duplicated rows collapse correctly") {
    import graft.ops.Analytics
    def tau(rows: Seq[(Double, Double)]): Option[Double] = {
      val r = Analytics.kendallTauB(rows.toDF("x", "y"), col("x"),
        col("y")).collect().head
      if (r.isNullAt(3)) None else Some(r.getDouble(3))
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(tau(Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0))) == Some(1.0))
    assert(tau(Seq((1.0, 3.0), (2.0, 2.0), (3.0, 1.0))) == Some(-1.0))
    // x = (1,1,2), y = (1,2,3): c = 2, d = 0, one x-tie pair ->
    // tau_b = 2/sqrt(3·2) -- wait: n0 = 3, n1 = 1, n2 = 0
    assert(tau(Seq((1.0, 1.0), (1.0, 2.0), (2.0, 3.0))) ==
      Some(r6(2.0 / math.sqrt((3.0 - 1.0) * 3.0))))
    // duplicated fully-tied rows enter n1/n2 via txy, not the joins
    assert(tau(Seq((1.0, 1.0), (1.0, 1.0), (2.0, 2.0))) == Some(1.0))
    // all tied on x: denominator 0 -> NULL
    assert(tau(Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0))) == None)
  }

  test("newcombeDiffCi: hand Wilson-composed bounds; empty arm NULLs") {
    import graft.ops.Analytics
    val u = (Seq.fill(8)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(4)((false, true)) ++ Seq.fill(6)((false, false)))
      .toDF("a", "s")
    val r = Analytics.newcombeDiffCi(u, col("a"), col("s"))
      .collect().head
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def r6n(x: Double): Double =
      if (x < 0) -math.floor(-x * 1e6 + 0.5) / 1e6 else r6(x)
    val z = 1.959964; val z2 = z * z
    def wilson(n: Double, s: Double): (Double, Double, Double) = {
      val p = s / n
      val den = 1.0 + z2 / n
      val c = (p + z2 / (2.0 * n)) / den
      val h = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n)) / den
      (p, c - h, c + h)
    }
    val (p1, l1, u1) = wilson(10.0, 8.0)
    val (p2, l2, u2) = wilson(10.0, 4.0)
    val d = p1 - p2
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 0.8 && r.getDouble(3) == 0.4)
    assert(r.getDouble(4) == r6(d))
    assert(r.getDouble(5) == r6n(d - math.sqrt((p1 - l1) * (p1 - l1) +
      (u2 - p2) * (u2 - p2))))
    assert(r.getDouble(6) == r6(d + math.sqrt((u1 - p1) * (u1 - p1) +
      (p2 - l2) * (p2 - l2))))
    val one = Analytics.newcombeDiffCi(
      Seq((true, true), (true, false)).toDF("a", "s"),
      col("a"), col("s")).collect().head
    assert(one.isNullAt(4) && one.isNullAt(6))
  }

  test("seasonalMase: a perfectly periodic series scores MASE 0 at " +
    "its season; a constant series NULLs out (zero naive MAE)") {
    import graft.ops.Analytics
    // period-2 alternation: lag-2 errors are all 0, lag-1 all 10
    val s2 = (1 to 9).map(d => (d.toLong,
      if (d % 2 == 1) 10.0 else 20.0)).toDF("p", "y")
    val r = Analytics.seasonalMase(s2, col("p"), col("y"), season = 2)
      .collect().head
    assert(r.getLong(0) == 9L)
    assert(r.getDouble(1) == 10.0 && r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 1.0)
    // at season 7 the alternation carries over: lag-7 errors are 10
    // too (odd lag) -> MASE = 1, no skill
    val r7 = Analytics.seasonalMase(s2, col("p"), col("y"), season = 7)
      .collect().head
    assert(r7.getDouble(3) == 1.0 && r7.getDouble(4) == 0.0)
    // constant series: naive MAE = 0 -> undefined ratio
    val const = Analytics.seasonalMase(
      (1 to 5).map(d => (d.toLong, 3.0)).toDF("p", "y"),
      col("p"), col("y"), season = 2).collect().head
    assert(const.isNullAt(3) && const.isNullAt(4))
  }

  test("changepoint: a clean level shift is found at the exact split " +
    "with the hand CUSUM statistic; constant and short series NULL") {
    import graft.ops.Analytics
    val u = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 5.0), (5L, 5.0),
      (6L, 5.0)).toDF("p", "y")
    val r = Analytics.changepoint(u, col("p"), col("y")).collect().head
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val sd = math.sqrt((78.0 - 18.0 * 18.0 / 6.0) / 5.0)
    val t3 = math.sqrt(3.0 * 3.0 / 6.0) * math.abs(1.0 - 5.0) / sd
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == r6(t3))
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 5.0)
    // constant series: zero variance -> NULL verdict, never Inf
    val const = Analytics.changepoint(
      (1 to 6).map(d => (d.toLong, 2.0)).toDF("p", "y"),
      col("p"), col("y")).collect().head
    assert(const.getLong(0) == 6L && const.isNullAt(1) && const.isNullAt(2))
    // n < 4: too short to split
    val short = Analytics.changepoint(
      Seq((1L, 1.0), (2L, 9.0), (3L, 1.0)).toDF("p", "y"),
      col("p"), col("y")).collect().head
    assert(short.isNullAt(1))
  }

  test("stationaryDistribution: flip chain keeps uniform with tv 0; " +
    "biased 2-state chain replays the hand snapped trajectory") {
    import graft.ops.Graph
    val flip = Seq(("A", "B", 5L), ("B", "A", 5L)).toDF("s", "d", "n")
    val r0 = Graph.stationaryDistribution(flip, col("s"), col("d"),
        col("n")).collect().map(x => x.getString(0) -> x).toMap
    assert(r0("A").getDouble(1) == 0.5 && r0("B").getDouble(1) == 0.5)
    assert(r0("A").getDouble(2) == 0.0)
    // P = [[.75,.25],[.5,.5]]: π₃ = (.664063, .335938) on the 6-dp
    // grid, tv(π₃, π₂) = .0078125 → .007813
    val biased = Seq(("A", "A", 3L), ("A", "B", 1L), ("B", "A", 2L),
      ("B", "B", 2L)).toDF("s", "d", "n")
    val r1 = Graph.stationaryDistribution(biased, col("s"), col("d"),
        col("n")).collect().map(x => x.getString(0) -> x).toMap
    assert(r1("A").getDouble(1) == 0.664063 &&
      r1("B").getDouble(1) == 0.335938)
    assert(r1("A").getDouble(2) == 0.007813)
  }

  test("contingencyAssociation: perfect association scores MI 1 bit " +
    "and V 1; independence scores 0; single-column V is NULL") {
    import graft.ops.Analytics
    val perfect = (Seq.fill(5)(("a", "a")) ++ Seq.fill(5)(("b", "b")))
      .toDF("r", "c")
    val r = Analytics.contingencyAssociation(perfect, col("r"), col("c"))
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 10.0 &&
      r.getDouble(5) == 1.0)
    val indep = (for { x <- Seq("a", "b"); y <- Seq("u", "v");
      _ <- 1 to 3 } yield (x, y)).toDF("r", "c")
    val ri = Analytics.contingencyAssociation(indep, col("r"), col("c"))
      .collect().head
    assert(ri.getDouble(3) == 0.0 && ri.getDouble(4) == 0.0 &&
      ri.getDouble(5) == 0.0)
    val one = Analytics.contingencyAssociation(
      Seq(("a", "u"), ("b", "u")).toDF("r", "c"), col("r"), col("c"))
      .collect().head
    assert(one.getDouble(3) == 0.0 && one.isNullAt(5))
  }

  test("benfordReport: digits read from exact integer cents; zeros/" +
    "negatives counted as skipped; tiny conforming-ish sample keeps " +
    "the null") {
    import graft.ops.Quality
    val df = Seq(1.00, 2.5, 19.99, 0.30, -5.0, 0.0, 900.0).toDF("v")
    val r = Quality.benfordReport(df, col("v"))
      .collect().map(x => x.getLong(0) -> x).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r(1L).getLong(7) == 5L && r(1L).getLong(8) == 2L)
    assert(r(1L).getLong(1) == 2L && r(2L).getLong(1) == 1L &&
      r(3L).getLong(1) == 1L && r(9L).getLong(1) == 1L &&
      r(4L).getLong(1) == 0L)
    assert(r(1L).getDouble(2) == r6(math.log(2.0) / math.log(10.0)))
    assert(r(1L).getDouble(3) == 0.4)
    assert(!r(1L).getBoolean(6)) // χ² ≈ 4.8 « 15.507
    assert(r.keySet == (1L to 9L).toSet)
  }

  test("theilDecomposition: equal-within groups put ALL inequality " +
    "between (T_within 0, share 1, T matches the analytic value); " +
    "uniform corpus has T 0 and NULL share") {
    import graft.ops.Sampling
    val df = Seq(("g1", 2L), ("g1", 2L), ("g2", 4L), ("g2", 4L))
      .toDF("g", "x")
    val r = Sampling.theilDecomposition(df, col("g"), col("x"))
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(4) == 0.0) // within: docs equal inside groups
    assert(r.getDouble(2) == r.getDouble(3)) // total ≡ between here
    assert(r.getDouble(5) == 1.0)
    val want = (1.0 / 3.0) * math.log(2.0 / 3.0) +
      (2.0 / 3.0) * math.log(4.0 / 3.0)
    assert(math.abs(r.getDouble(2) - want) < 2e-6)
    val flat = Sampling.theilDecomposition(
      Seq(("a", 3L), ("a", 3L), ("b", 3L)).toDF("g", "x"),
      col("g"), col("x")).collect().head
    assert(flat.getDouble(2) == 0.0 && flat.isNullAt(5))
  }

  test("tokenizerEconomics: hand corpus counts both token streams " +
    "exactly (totals, distincts, per-doc and per-char rates)") {
    import graft.expr.TextStats
    val docs = Seq((1L, "ab cd"), (2L, "a-b")).toDF("doc_id", "text")
    val r = TextStats.tokenizerEconomics(docs, col("doc_id"), col("text"))
      .collect().map(x => x.getString(0) -> x).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // whitespace: [ab, cd] + [a-b] → 3 total, 3 distinct
    assert(r("whitespace").getLong(1) == 2L)
    assert(r("whitespace").getLong(2) == 3L &&
      r("whitespace").getLong(3) == 3L)
    assert(r("whitespace").getDouble(4) == 1.5 &&
      r("whitespace").getDouble(5) == r6(8.0 / 3.0))
    // bpeish: [ab, cd] + [a, -, b] → 5 total, 5 distinct
    assert(r("bpeish").getLong(2) == 5L && r("bpeish").getLong(3) == 5L)
    assert(r("bpeish").getDouble(4) == 2.5 &&
      r("bpeish").getDouble(5) == 1.6)
  }

  test("mannKendall: strictly increasing series has S = n(n-1)/2 and " +
    "the hand continuity-corrected z; constant series NULL verdict") {
    import graft.ops.Analytics
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def erfc2(z: Double): Double = {
      val yv = math.abs(z) / math.sqrt(2.0)
      val t = 1.0 / (1.0 + 0.3275911 * yv)
      t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
        t * (-1.453152027 + t * 1.061405429)))) * math.exp(-(yv * yv))
    }
    val up = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("p", "y")
    val r = Analytics.mannKendall(up, col("p"), col("y")).collect().head
    val vs = 8.0 * 7.0 * 21.0 / 18.0
    assert(r.getLong(0) == 8L && r.getLong(1) == 28L)
    assert(r.getDouble(2) == r6(vs))
    assert(r.getDouble(3) == r6(27.0 / math.sqrt(vs)))
    assert(r.getDouble(4) == r6(erfc2(27.0 / math.sqrt(vs))))
    assert(r.getString(5) == "increasing")
    val const = Analytics.mannKendall(
      (1 to 8).map(i => (i.toLong, 5.0)).toDF("p", "y"),
      col("p"), col("y")).collect().head
    assert(const.getLong(1) == 0L && const.isNullAt(3) &&
      const.isNullAt(5))
  }

  test("runsTest: hand monotone case (median-tied day excluded and " +
    "counted, 2 runs over 3-above/2-below) matches the exact moments") {
    import graft.ops.Analytics
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0),
      (5L, 50.0), (6L, 60.0)).toDF("p", "y")
    val r = Analytics.runsTest(df, col("p"), col("y")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 1L)
    assert(r.getLong(3) == 2L)
    assert(r.getDouble(4) == 3.4)
    assert(r.getDouble(5) == r6(-1.4 / math.sqrt(0.84)))
    // |z| ≈ 1.53 → p ≈ 0.127: consistent with randomness
    assert(r.getBoolean(7))
  }

  test("deseasonalized changepoint composition: a level shift the " +
    "weekly rhythm magnitude-dominates is found at the exact day " +
    "once q291's seasonal component is subtracted") {
    import graft.ops.Analytics
    val s = Map(0L -> 10.0, 1L -> -6.0, 2L -> 2.0, 3L -> 4.0,
      4L -> -8.0, 5L -> 6.0, 6L -> -8.0) // sums to 0, amplitude >> shift
    val df = (0L to 27L)
      .map(p => (p, 20.0 + s(p % 7) + (if (p >= 14L) 3.0 else 0.0)))
      .toDF("p", "y")
    val dec = Analytics.seasonalDecompose(df, col("p"), col("y"))
    val r = Analytics.changepoint(
      dec.select(col("p"), (col("y") - col("seasonal")).as("y")),
      col("p"), col("y")).collect().head
    assert(r.getLong(1) == 13L, s"split at ${r.getLong(1)}")
    assert(r.getDouble(3) < r.getDouble(4)) // level rose
  }

  test("neymanAllocation: hand two-strata case gives the exact " +
    "N_h·sigma_h shares, variance pair, and gain") {
    import graft.ops.Analytics
    val rows = (1 to 100).map(i => ("A", if (i % 2 == 0) 2.0 else 0.0)) ++
      (1 to 50).map(i => ("B", if (i % 2 == 0) 6.0 else 0.0))
    val r = Analytics.neymanAllocation(rows.toDF("h", "y"), col("h"),
        col("y")).collect().map(x => x.getString(0) -> x).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def r9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    // σ_A = 1, σ_B = 3: N·σ = 100 and 150, Σ = 250 over nt = 150
    assert(r("A").getDouble(2) == 1.0 && r("B").getDouble(2) == 3.0)
    assert(r("A").getDouble(3) == 4000.0 && r("B").getDouble(3) == 6000.0)
    assert(r("A").getDouble(4) == r6(10000.0 * 100 / 150))
    val vn = (250.0 / 150) * (250.0 / 150) / 10000
    val vp = (550.0 / 150) / 10000
    assert(r("A").getDouble(5) == r9(vn) && r("A").getDouble(6) == r9(vp))
    assert(r("A").getDouble(7) == r6((1.0 - vn / vp) * 100))
  }

  test("seasonalDecompose: linear trend + zero-sum weekly pattern " +
    "recovers both exactly with remainder 0; edges carry NULL trend") {
    import graft.ops.Analytics
    val s = Map(0L -> 3.0, 1L -> -1.0, 2L -> 0.0, 3L -> 2.0, 4L -> -2.0,
      5L -> 1.0, 6L -> -3.0) // sums to 0
    val df = (0L to 20L).map(p => (p, p.toDouble + s(p % 7)))
      .toDF("p", "y")
    val r = Analytics.seasonalDecompose(df, col("p"), col("y"))
      .collect().map(x => x.getLong(0) -> x).toMap
    // interior day: MA(7) of the periodic part is 0, so trend = p,
    // seasonal = s(phase), remainder = 0 — exactly
    for (p <- 3L to 17L) {
      assert(r(p).getDouble(2) == p.toDouble, s"trend at $p")
      assert(r(p).getDouble(4) == s(p % 7), s"seasonal at $p")
      assert(r(p).getDouble(5) == 0.0, s"remainder at $p")
    }
    // edge day: incomplete window → NULL trend/remainder, but the
    // phase's seasonal index still serves
    assert(r(0L).isNullAt(2) && r(0L).isNullAt(5) &&
      r(0L).getDouble(4) == s(0L))
    assert(r(20L).isNullAt(2))
  }

  test("cartographyReport: a mislabeled example maps to the hard " +
    "region with correct_frac 0; clean examples easy; k=2 gives one " +
    "model per doc and variability 0") {
    import graft.ops.Quality
    val docs = Seq(
      (0L, "a", "xx xx xx"), (1L, "a", "xx xx xx"), (2L, "a", "xx xx xx"),
      (3L, "b", "yy yy yy"), (4L, "b", "yy yy yy"),
      (5L, "b", "xx xx xx")) // mislabeled: b-text is a-vocabulary
      .toDF("doc_id", "lang", "text")
    val r = Quality.cartographyReport(docs, col("doc_id"), col("text"),
        col("lang"), k = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.values.forall(_.getLong(2) == 1L)) // k−1 = 1 model each
    assert(r.values.forall(_.getDouble(4) == 0.0)) // std over 1 model
    assert(r(0L).getString(6) == "easy" &&
      r(0L).getDouble(5) == 1.0 && r(0L).getDouble(3) > 0.9)
    assert(r(3L).getString(6) == "easy")
    // the mislabel: its in-training model still reads xx as a-ish
    assert(r(5L).getString(6) == "hard" && r(5L).getDouble(5) == 0.0 &&
      r(5L).getDouble(3) < 0.35)
  }

  test("ljungBox: alternating series has r1=-7/8, r2=6/8 and the " +
    "hand Q trajectory; constant series all NULL") {
    import graft.ops.Analytics
    val alt = (1 to 8).map(t => (t.toLong, if (t % 2 == 1) 1.0 else 2.0))
      .toDF("p", "y")
    val r = Analytics.ljungBox(alt, col("p"), col("y"))
      .collect().map(x => x.getLong(0) -> x).toMap
    // z = ±1: r1 = -7/8, r2 = +6/8; Q1 = 80·(7/8)²/7 = 8.75,
    // Q2 = 80·((7/8)²/7 + (6/8)²/6) = 16.25
    assert(r(1L).getDouble(1) == -0.875 && r(1L).getDouble(2) == 8.75)
    assert(r(1L).getDouble(3) == 3.841 && r(1L).getBoolean(4))
    assert(r(2L).getDouble(1) == 0.75 && r(2L).getDouble(2) == 16.25)
    assert(r(2L).getBoolean(4))
    assert(r.keySet == (1L to 7L).toSet)
    val const = Analytics.ljungBox(
      (1 to 8).map(t => (t.toLong, 3.0)).toDF("p", "y"),
      col("p"), col("y")).collect().map(x => x.getLong(0) -> x).toMap
    assert(const(1L).isNullAt(1) && const(1L).isNullAt(2) &&
      const(1L).isNullAt(4))
  }

  test("holtForecast: a perfectly linear series is tracked exactly " +
    "(level = last y, trend = slope, MAE 0); n<2 NULL fit") {
    import graft.ops.Analytics
    val lin = (1 to 6).map(t => (t.toLong, 10.0 + 2.0 * t)).toDF("p", "y")
    val r = Analytics.holtForecast(lin, col("p"), col("y")).collect().head
    // ℓ₁=12, b₁=2; every one-step forecast is exact, so the state
    // rides the line: ℓ=22, b=2, ŷ(+7)=36, MAE=0
    assert(r.getLong(0) == 6L && r.getDouble(1) == 22.0 &&
      r.getDouble(2) == 2.0 && r.getDouble(3) == 36.0 &&
      r.getDouble(4) == 0.0)
    val one = Analytics.holtForecast(Seq((1L, 5.0)).toDF("p", "y"),
      col("p"), col("y")).collect().head
    assert(one.getLong(0) == 1L && one.isNullAt(1) && one.isNullAt(3))
  }

  test("pettitt: exact integer U trajectory finds a clean shift; " +
    "constant series K=0 p=1 splitting at the earliest day; n<2 NULL") {
    import graft.ops.Analytics
    // distinct values 1,2,3,10,11,12 -> 2r̄ = 2,4,6,8,10,12;
    // U = -5,-8,-9,-8,-5 -> K = 9 at t = 3
    val u = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 10.0), (5L, 11.0),
      (6L, 12.0)).toDF("p", "y")
    val r = Analytics.pettitt(u, col("p"), col("y")).collect().head
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getLong(2) == 9L)
    assert(r.getDouble(3) ==
      r6(math.min(1.0, 2.0 * math.exp(-6.0 * 81.0 / (216.0 + 36.0)))))
    // all-tied series: every 2r̄ = n+1, U ≡ 0, K = 0, p capped at 1,
    // argmax ties resolve to the earliest period
    val const = Analytics.pettitt(
      (1 to 6).map(d => (d.toLong, 2.0)).toDF("p", "y"),
      col("p"), col("y")).collect().head
    assert(const.getLong(1) == 1L && const.getLong(2) == 0L &&
      const.getDouble(3) == 1.0)
    val one = Analytics.pettitt(Seq((1L, 5.0)).toDF("p", "y"),
      col("p"), col("y")).collect().head
    assert(one.isNullAt(1) && one.isNullAt(2) && one.isNullAt(3))
  }

  test("jarqueBera: symmetric two-point mass has skew 0, kurtosis 1, " +
    "JB = n/6, p = e^(-n/12); constant group NULL; partition-invariant") {
    import graft.ops.Analytics
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val g = (1 to 4).flatMap(_ => Seq(("g", -1.0), ("g", 1.0))) :+
      (("c", 7.0)) :+ (("c", 7.0))
    val df = g.toDF("grp", "y")
    val r = Analytics.jarqueBera(df, col("grp"), col("y"))
      .collect().map(x => x.getString(0) -> x).toMap
    // g: μ=0, σ=1, z=±1 -> skew 0, kurt 1 (excess -2), JB = 8/6
    assert(r("g").getLong(1) == 8L && r("g").getDouble(2) == 0.0)
    assert(r("g").getDouble(3) == -2.0)
    assert(r("g").getDouble(4) == r6(8.0 / 6.0))
    assert(r("g").getDouble(5) == r6(math.exp(-8.0 / 12.0)))
    assert(!r("g").getBoolean(6))
    // constant group: σ = 0 -> NULL-for-undefined, never "normal"
    assert(r("c").isNullAt(2) && r("c").isNullAt(4) && r("c").isNullAt(6))
    val r7 = Analytics.jarqueBera(df.repartition(7), col("grp"), col("y"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r7("g").toString == r("g").toString)
  }

  test("dataConstrainedForecast: repeats decay per the fitted form; " +
    "budget below unique tokens is fully effective (capped at alloc)") {
    import graft.ops.Sampling
    // u = {s1: 100, s2: 400}, budget 800 -> alloc 400 each.
    // s1: R = 3, D' = 100 + 1500·(1 − e^{−0.2}); s2: R = 0, D' = 400
    val docs = Seq(("s1", 100L), ("s2", 400L)).toDF("src", "nt")
    val r = Sampling.dataConstrainedForecast(docs, col("src"),
      col("nt"), 800L)
      .collect().map(x => x.getString(0) -> x).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val d1 = 100.0 + 100.0 * 15.0 * (1.0 - math.exp(-(3.0) / 15.0))
    assert(r("s1").getDouble(2) == 400.0 && r("s1").getDouble(3) == 3.0)
    assert(r("s1").getDouble(4) == r6(d1))
    assert(r("s1").getDouble(5) == r6(d1 / 400.0))
    assert(r("s2").getDouble(3) == 0.0 && r("s2").getDouble(4) == 400.0)
    assert(r("s2").getDouble(5) == 1.0)
    // plentiful data: alloc 100 < u 400 -> effective = alloc exactly
    val rich = Sampling.dataConstrainedForecast(
      Seq(("s", 400L)).toDF("src", "nt"), col("src"), col("nt"), 100L)
      .collect().head
    assert(rich.getDouble(3) == 0.0 && rich.getDouble(4) == 100.0 &&
      rich.getDouble(5) == 1.0)
  }

  test("hedgesG: hand d/J/g/se replay; degenerate inputs (empty arm, " +
    "zero variance) give NULL") {
    import graft.ops.Analytics
    // arms (3,5,4) vs (1,2,3): diff 2, s2 = 1, d = 2, J = 0.8, g = 1.6
    val u = Seq((true, 3.0), (true, 5.0), (true, 4.0),
      (false, 1.0), (false, 2.0), (false, 3.0)).toDF("a", "y")
    val r = Analytics.hedgesG(u, col("a"), col("y")).collect().head
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val se = math.sqrt(6.0 / 9.0 + 1.6 * 1.6 / 12.0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 2.0)
    assert(r.getDouble(4) == r6(0.8 * 2.0))
    assert(r.getDouble(5) == r6(se))
    assert(r.getDouble(6) == r6(1.6 - 1.959964 * se))
    assert(r.getDouble(7) == r6(1.6 + 1.959964 * se))
    val one = Analytics.hedgesG(Seq((true, 1.0), (true, 2.0))
      .toDF("a", "y"), col("a"), col("y")).collect().head
    assert(one.isNullAt(3) && one.isNullAt(7))
    val const = Analytics.hedgesG(Seq((true, 2.0), (true, 2.0),
      (false, 2.0), (false, 2.0)).toDF("a", "y"),
      col("a"), col("y")).collect().head
    assert(const.isNullAt(3) && const.isNullAt(5))
  }

  test("entropyRate: hand Shannon F2 on a 3-token corpus; a 1-type " +
    "corpus has zero conditional entropy and NULL redundancy") {
    import graft.expr.TextStats
    val docs = Seq((0L, "a a b")).toDF("doc_id", "text")
    val r = TextStats.entropyRate(docs, col("doc_id"), col("text"))
      .collect().head
    def sn(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // uni: a=2, b=1 -> H1 = ln3 − snap(2·ln2)/3; bigrams "a a","a b"
    // once each -> H2 = ln2 (s2 = 0); cond = H2 − H1
    val h1 = math.log(3.0) - sn(2.0 * math.log(2.0)) / 3.0
    val h2 = math.log(2.0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == r6(h1) && r.getDouble(4) == r6(h2))
    assert(r.getDouble(5) == r6(h2 - h1))
    assert(r.getDouble(6) == r6(1.0 - (h2 - h1) / math.log(2.0)))
    // one type: both entropies 0, cond 0, redundancy undefined
    val one = TextStats.entropyRate(Seq((0L, "a a a"))
      .toDF("doc_id", "text"), col("doc_id"), col("text")).collect().head
    assert(one.getDouble(5) == 0.0 && one.isNullAt(6))
  }

  test("zoneMapPruning: a shuffled arrival layout scans MORE zones " +
    "than the value-sorted layout on the same data; exact hand counts") {
    import graft.ops.Layout
    // aid->v: 0->4, 1->1, 2->3, 3->2; 2 zones, probe all 4 values.
    // arrival zones [1,4],[2,3] -> hits 6/8; sorted [1,2],[3,4] -> 4/8
    val u = Seq((0L, 4.0), (1L, 1.0), (2L, 3.0), (3L, 2.0))
      .toDF("aid", "v")
    val r = Layout.zoneMapPruning(u, col("aid"), col("v"),
      nSegments = 2, probeK = 4)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r("arrival") == ((2L, 4L, 0.75)))
    assert(r("sorted") == ((2L, 4L, 0.5)))
  }

  test("goodTuring: hand spectrum — Turing estimates with a gap NULL, " +
    "LGT from the snapped log-log fit, p_unseen = N1/N") {
    import graft.expr.TextStats
    // one doc, word species: counts a=1 b=1 c=2 d=3 ->
    // spectrum N_1=2, N_2=1, N_3=1; total N=7
    val docs = Seq((0L, "a b c c d d d")).toDF("doc_id", "text")
    val r = TextStats.goodTuring(docs, col("doc_id"), col("text"))
      .collect().map(x => x.getLong(0) -> x).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // raw Turing: r*=(r+1)N_{r+1}/N_r; the r=3 row has N_4=0 -> NULL
    assert(r(1L).getLong(1) == 2L && r(1L).getDouble(2) == 1.0)
    assert(r(2L).getDouble(2) == 3.0)
    assert(r(3L).isNullAt(2))
    assert(r(1L).getDouble(4) == r6(2.0 / 7.0)) // p_unseen
    // LGT replay: Z_1 = 2/(0.5*(2-0)) = 2, Z_2 = 1/(0.5*2) = 1,
    // Z_3 = 1/(0.5*(4-2)) = 1 (t = 2r - q at the high end)
    def snapSum(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * 1e9 + 0.5)).sum / 1e9
    val pts = Seq((math.log(1.0), math.log(2.0)),
      (math.log(2.0), math.log(1.0)), (math.log(3.0), math.log(1.0)))
    val n = 3.0
    val sx = snapSum(pts.map(_._1)); val sy = snapSum(pts.map(_._2))
    val sxx = snapSum(pts.map(p => p._1 * p._1))
    val sxy = snapSum(pts.map(p => p._1 * p._2))
    val vx = n * sxx - sx * sx
    val b = (n * sxy - sx * sy) / vx
    val a = (sy - b * sx) / n
    def lgt(rr: Double): Double =
      (rr + 1.0) * math.exp(a + b * math.log(rr + 1.0)) /
        math.exp(a + b * math.log(rr))
    assert(r(1L).getDouble(3) == r6(lgt(1.0)))
    assert(r(3L).getDouble(3) == r6(lgt(3.0)))
  }

  test("burstiness: clumped terms score VMR > 0, perfectly uniform " +
    "terms score 0 (zero-docs count in the moments); top-k by ctf") {
    import graft.expr.TextStats
    // x clumps (2,1,0 across 3 docs): mean 1, E[x^2] = 5/3, vmr = 2/3
    // y is uniform (1,1,1): variance 0
    val docs = Seq((0L, "x x y"), (1L, "x y"), (2L, "y"))
      .toDF("doc_id", "text")
    val r = TextStats.burstiness(docs, col("doc_id"), col("text"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r("x") == ((3L, 2L, r6((5.0 / 3.0 - 1.0) / 1.0))))
    assert(r("y") == ((3L, 3L, 0.0)))
    // top-k caps the output by collection frequency, ties term-asc
    val top1 = TextStats.burstiness(docs, col("doc_id"), col("text"),
      topK = 1).collect()
    assert(top1.length == 1 && top1.head.getString(0) == "x")
  }

  test("designEffect: perfectly clustered outcomes give ICC = 1, " +
    "deff = m_kish; a single cluster gives NULL") {
    import graft.ops.Analytics
    // two clusters, outcomes constant within each: all variance is
    // between -> ICC = 1, deff = 1 + (2-1)*1 = 2, ESS = N/2
    val u = Seq(("c1", 1.0), ("c1", 1.0), ("c2", 5.0), ("c2", 5.0))
      .toDF("c", "y")
    val r = Analytics.designEffect(u, col("c"), col("y"))
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 2.0) // m_kish = (4+4)/4
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 2.0)
    assert(r.getDouble(5) == 2.0) // ESS = 4/2
    // one cluster: k < 2 -> NULL verdicts, counts still reported
    val one = Analytics.designEffect(
      Seq(("c1", 1.0), ("c1", 2.0)).toDF("c", "y"), col("c"), col("y"))
      .collect().head
    assert(one.getLong(0) == 1L && one.isNullAt(3) && one.isNullAt(4))
  }

  test("mantelHaenszel: hand two-stratum pooled OR/CMH/RBG replay; " +
    "within-stratum OR = 1 pools to 1 with chi2 = 0; a single-arm " +
    "input NULLs out; NULL strata are excluded") {
    import graft.ops.Analytics
    def cells(a: Int, b: Int, c: Int, d: Int, s: String) =
      Seq.fill(a)((true, true, s)) ++ Seq.fill(b)((true, false, s)) ++
        Seq.fill(c)((false, true, s)) ++ Seq.fill(d)((false, false, s))
    val u = (cells(3, 1, 2, 4, "s1") ++ cells(1, 3, 2, 2, "s2"))
      .toDF("arm", "o", "s")
    val r = Analytics.mantelHaenszel(u, col("arm"), col("o"), col("s"))
      .collect().head
    // plain-Scala replay of the snapped pooled sums
    def sn(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val tabs = Seq((3.0, 1.0, 2.0, 4.0), (1.0, 3.0, 2.0, 2.0))
    def pool(f: ((Double, Double, Double, Double)) => Double): Double =
      tabs.map(t => math.floor(f(t) * 1e9 + 0.5)).sum / 1e9
    val sr = pool { case (a, b, c, d) => a * d / (a + b + c + d) }
    val ss = pool { case (a, b, c, d) => b * c / (a + b + c + d) }
    val sa = pool { case (a, _, _, _) => a }
    val sea = pool { case (a, b, c, d) =>
      (a + b) * (a + c) / (a + b + c + d) }
    val sv = pool { case (a, b, c, d) =>
      val n = a + b + c + d
      (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1.0)) }
    val spr = pool { case (a, b, c, d) =>
      val n = a + b + c + d; ((a + d) / n) * (a * d / n) }
    val spsqr = pool { case (a, b, c, d) =>
      val n = a + b + c + d
      ((a + d) / n) * (b * c / n) + ((b + c) / n) * (a * d / n) }
    val sqs = pool { case (a, b, c, d) =>
      val n = a + b + c + d; ((b + c) / n) * (b * c / n) }
    val or = sr / ss
    val varLn = spr / (2 * sr * sr) + spsqr / (2 * sr * ss) +
      sqs / (2 * ss * ss)
    val chi2 = (sa - sea) * (sa - sea) / sv
    def p2(z: Double): Double = {
      val y = math.abs(z) / math.sqrt(2.0)
      val t = 1.0 / (1.0 + 0.3275911 * y)
      t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 +
        t * (-1.453152027 + t * 1.061405429)))) * math.exp(-(y * y))
    }
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == r6(or))
    assert(r.getDouble(2) == r6(or * math.exp(-1.959964 * math.sqrt(varLn))))
    assert(r.getDouble(3) == r6(or * math.exp(1.959964 * math.sqrt(varLn))))
    assert(r.getDouble(4) == r6(chi2))
    assert(r.getDouble(5) == r6(p2(math.sqrt(chi2))))
    assert(sn(sr) == sr) // sanity: replay used the snapped grid
    // OR = 1 inside both strata pools to exactly 1 with chi2 = 0
    val unit = (cells(4, 1, 4, 1, "s1") ++ cells(1, 4, 1, 4, "s2"))
      .toDF("arm", "o", "s")
    val ru = Analytics.mantelHaenszel(unit, col("arm"), col("o"),
      col("s")).collect().head
    assert(ru.getDouble(1) == 1.0 && ru.getDouble(4) == 0.0)
    // single-arm input: both MH legs are one-sided -> NULL verdicts
    val single = cells(3, 2, 0, 0, "s1").toDF("arm", "o", "s")
    val rs = Analytics.mantelHaenszel(single, col("arm"), col("o"),
      col("s")).collect().head
    assert(rs.isNullAt(1) && rs.isNullAt(4))
    // NULL stratum rows are excluded, not half-counted
    val withNull = (cells(3, 1, 2, 4, "s1") ++ cells(1, 3, 2, 2, "s2"))
      .toDF("arm", "o", "s")
      .unionByName(Seq((true, true, null.asInstanceOf[String]))
        .toDF("arm", "o", "s"))
    val rn = Analytics.mantelHaenszel(withNull, col("arm"), col("o"),
      col("s")).collect().head
    assert(rn.getLong(0) == 2L && rn.getDouble(1) == r.getDouble(1))
  }

  test("msprt: plain-Scala replay of the log-space mixture LR; " +
    "p <= 1 always; degenerate inputs (empty arm, zero variance) " +
    "give NULL") {
    import graft.ops.Analytics
    val u = Seq((true, 3.0), (true, 5.0), (true, 4.0),
      (false, 1.0), (false, 2.0), (false, 3.0)).toDF("a", "y")
    val r = Analytics.msprt(u, col("a"), col("y"), 1.0).collect().head
    def sn(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def snSum(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * 1e9 + 0.5)).sum / 1e9
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def r6n(x: Double): Double =
      if (x < 0) -math.floor(-x * 1e6 + 0.5) / 1e6 else r6(x)
    val ya = Seq(3.0, 5.0, 4.0); val yb = Seq(1.0, 2.0, 3.0)
    val sya = snSum(ya); val syya = snSum(ya.map(x => x * x))
    val syb = snSum(yb); val syyb = snSum(yb.map(x => x * x))
    val (na, nb) = (3.0, 3.0)
    val diff = sya / na - syb / nb
    val s2 = ((syya - sya * sya / na) + (syyb - syb * syb / nb)) /
      (na + nb - 2.0)
    val v = s2 * (1.0 / na + 1.0 / nb)
    val lnLam = 0.5 * math.log(v / (v + 1.0)) +
      diff * diff / (2.0 * v * (v + 1.0))
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == r6(diff))
    assert(r.getDouble(3) == r6n(lnLam))
    assert(r.getDouble(4) ==
      r6(math.exp(math.min(0.0, -lnLam))))
    assert(r.getDouble(4) <= 1.0)
    // empty arm -> NULL
    val one = Analytics.msprt(Seq((true, 3.0), (true, 4.0)).toDF("a", "y"),
      col("a"), col("y"), 1.0).collect().head
    assert(one.isNullAt(2) && one.isNullAt(4))
    // zero pooled variance (all-constant y) -> NULL, never Inf
    val const = Analytics.msprt(Seq((true, 2.0), (true, 2.0),
      (false, 2.0), (false, 2.0)).toDF("a", "y"),
      col("a"), col("y"), 1.0).collect().head
    assert(const.isNullAt(3) && const.isNullAt(4))
  }
}

