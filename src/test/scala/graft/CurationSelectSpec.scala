package graft

import org.apache.spark.sql.functions._
import graft.ops.{Analytics, Ann, Graph, Sampling}

/** Round-4 corpus-selection operators: SemDeDup pruning, per-source
  * budgets, DSIR importance weights, shard manifests, RRF fusion, and
  * canonical-member selection. */
class CurationSelectSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    // bucket 0: 1 ≈ 2 ≈ 3 (near-dups), 4 orthogonal
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.99f, 0.1f, 0.0f), 0),
    (3L, Array(0.98f, 0.15f, 0.0f), 0),
    (4L, Array(0.0f, 1.0f, 0.0f), 0),
    // bucket 1: same direction as 1 but different bucket — never pruned
    (5L, Array(1.0f, 0.0f, 0.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("semDedup: exactly the smaller-id-neighbor rule, bucket-local") {
    val kept = Ann.semDedup(vecs, "label", 0.9)
      .select("vec_id").as[Long].collect().toSet
    // 2 and 3 drop (near-dup of 1); 4 orthogonal survives; 5 is in
    // another bucket so its identical direction to 1 cannot prune it
    assert(kept == Set(1L, 4L, 5L))
    // survivors have NO smaller-id near-dup pair left among themselves
    val pairs = Ann.cosineNearDupPairs(vecs, "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((a, b) <- pairs if kept(b)) assert(!kept(a) || a > b)
  }

  private lazy val sized = Seq(
    (1L, "s0", 100L), (2L, "s0", 100L), (3L, "s0", 100L),
    (4L, "s1", 250L), (5L, "s1", 10L))
    .toDF("doc_id", "source", "n_chars")

  test("sourceBudget: running total within budget; budget-monotone keeps") {
    def keeps(b: Long): Set[Long] =
      Sampling.sourceBudget(sized, col("source"), col("doc_id"),
        col("n_chars"), b).select("doc_id").as[Long].collect().toSet
    val k200 = keeps(200L)
    // per source: docs admitted in md5 order until the budget fills
    val r = Sampling.sourceBudget(sized, col("source"), col("doc_id"),
        col("n_chars"), 200L)
      .collect().map(r => (r.getString(1), r.getLong(3))).groupBy(_._1)
    for ((_, rows) <- r) assert(rows.map(_._2).max <= 200L)
    // monotone: every smaller-budget keep survives any larger budget
    assert(k200.subsetOf(keeps(300L)))
    assert(keeps(300L).subsetOf(keeps(1000L)))
    assert(keeps(1000L) == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("dsirWeights: target-domain text scores above off-domain text") {
    // target (t) docs speak "alpha", raw background speaks "beta"
    val docs = Seq(
      (1L, "alpha alpha alpha", true), (2L, "alpha alpha alpha", true),
      (3L, "beta beta beta", false), (4L, "beta beta beta", false),
      (5L, "alpha alpha alpha", false), // alpha text OUTSIDE the target
      (6L, "alpha beta alpha", false))
      .toDF("doc_id", "text", "is_t")
    val w = Sampling.dsirWeights(docs, col("doc_id"), col("text"),
        col("is_t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // alpha-speaking docs look like the target regardless of membership
    assert(w(5L) == w(1L)) // weight is a pure function of the text
    assert(w(1L) > w(3L))
    assert(w(6L) > w(3L) && w(6L) < w(1L)) // mixed doc lands between
  }

  test("shardManifest: shards tile the corpus, ranges and sizes consistent") {
    val m = Sampling.shardManifest(sized, col("doc_id"), col("n_chars"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(m.map(_._2).sum == 5L)
    assert(m.map(_._3).sum == 560L)
    assert(m.forall(s => s._1 >= 0 && s._1 < 3))
    assert(m.forall(s => s._4 <= s._5))
    // assignment matches hashBucket: recompute membership per shard
    val assign = sized.select(col("doc_id"),
        Sampling.hashBucket(col("doc_id"), 3).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((shard, n, _, lo, hi) <- m) {
      val members = assign.filter(_._2 == shard).map(_._1)
      assert(members.length.toLong == n)
      assert(members.min == lo && members.max == hi)
    }
  }

  test("rrfFuse: both-list members beat single-list members; exact scores") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val b = Seq((11L, 1L), (10L, 2L), (13L, 3L)).toDF("id", "rank")
    val got = Analytics.rrfFuse(a, b, "id", 60, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // exact two-term scores
    def s(ra: Option[Long], rb: Option[Long]): Double =
      math.round((ra.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rb.map(r => 1.0 / (60 + r)).getOrElse(0.0)) * 1e6) / 1e6
    val want = Map(10L -> s(Some(1L), Some(2L)), 11L -> s(Some(2L), Some(1L)),
      12L -> s(Some(3L), None), 13L -> s(None, Some(3L)))
    assert(got.toMap == want)
    // fused order: both-list docs first (10 and 11 tie by symmetry →
    // id tiebreak), then the singles
    assert(got.map(_._1).toSeq == Seq(10L, 11L, 12L, 13L))
  }

  test("BPE fertility: freq-weighted subwords per word, hand-computed") {
    // word freqs: aa:3, bb:3, cc:1 → m1=(a,a</w>) (lex tie-break over
    // (b,b</w>)), m2=(b,b</w>) → encoded lengths aa:1, bb:1, cc:2
    val docs = Seq(("aa aa aa", "en"), ("bb bb", "en"), ("bb cc", "fr"))
      .toDF("text", "lang")
    val merges = graft.ops.Bpe.train(docs, col("text"), 2)
    assert(merges == Vector(("a", "a</w>"), ("b", "b</w>")))
    val wlf = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("freq"))
    val nSub = graft.ops.Bpe.encode(wlf.select(col("w")).distinct(),
        col("w"), col("w"), merges)
      .groupBy(col("doc_id").as("w")).agg(count(lit(1)).as("n_sub"))
    val fert = wlf.join(nSub, Seq("w"))
      .groupBy(col("lang"))
      .agg((sum(col("freq") * col("n_sub")).cast("double") /
        sum(col("freq"))).as("fertility"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // en: (3·1 + 2·1) / 5 = 1.0 ; fr: (1·1 + 1·2) / 2 = 1.5
    assert(fert == Map("en" -> 1.0, "fr" -> 1.5))
  }

  test("gopherRules: each rule fires on its designed violation") {
    val docs = Seq(
      (1L, "the " + Seq.fill(30)("word").mkString(" ")),       // repetitive
      (2L, "the " + (1 to 29).map(i => f"wrd$i%02d").mkString(" ")), // clean: 30 toks, avg len 4.93
      (3L, "the tiny doc"),                                     // too short
      (4L, (1 to 30).map(i => s"zzz$i").mkString(" ")),         // no stopword
      (5L, "the " + (1 to 30).map(i => s"verylongtoken$i").mkString(" "))) // long tokens
      .toDF("doc_id", "text")
    val r = graft.expr.TextStats.gopherRules(docs, col("doc_id"),
        col("text"), minTokens = 10, maxTokens = 60)
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(2), x.getBoolean(3), x.getBoolean(4),
          x.getBoolean(5), x.getBoolean(6), x.getBoolean(7))).toMap
    assert(!r(1L)._3, "doc 1 must fail the distinct-ratio rule")
    assert(r(2L) == ((true, true, true, true, true, true)))
    assert(!r(3L)._1, "doc 3 must fail the length rule")
    assert(!r(4L)._4, "doc 4 must fail the stopword rule")
    assert(!r(5L)._5, "doc 5 must fail the longest-token rule")
    // keep is exactly the conjunction
    for ((_, f) <- r)
      assert(f._6 == (f._1 && f._2 && f._3 && f._4 && f._5))
  }

  test("lengthBatchingManifest: batches tile each shard; sorted batching " +
    "wastes no padding on equal-length runs") {
    // one shard (shards=1): lengths 8,8,8,8,4,4 in desc order, batch=4
    // → batch 0 = four 8s (padding 0), batch 1 = two 4s (padding 0);
    // arrival-order batching of the same rows could mix 8s and 4s
    val df = Seq((1L, 4L), (2L, 8L), (3L, 8L), (4L, 4L), (5L, 8L),
      (6L, 8L)).toDF("id", "len")
    val m = graft.ops.Multimodal.lengthBatchingManifest(df, col("id"),
        col("len"), 1, 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(m.toSet == Set((0L, 4L, 8L, 32L, 0L), (1L, 2L, 4L, 8L, 0L)))
    // multi-shard: every row lands in exactly one batch; sizes ≤ batch
    val m2 = graft.ops.Multimodal.lengthBatchingManifest(df, col("id"),
      col("len"), 3, 4).collect()
    assert(m2.map(_.getLong(2)).sum == 6L)
    assert(m2.forall(_.getLong(2) <= 4L))
  }

  test("knnGraph: exact bucket-local neighbors, k rows per source") {
    val g = graft.ops.Ann.knnGraph(vecs, "label", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // bucket 1 has one vector (5): no pairs, no rows
    assert(!g.exists(r => r._1 == 5L || r._2 == 5L))
    // bucket 0: every source emits min(k, |bucket|-1) = 2 neighbors
    for (src <- Seq(1L, 2L, 3L, 4L))
      assert(g.count(_._1 == src) == 2, s"src $src")
    // 1's nearest is 2 (cos(1,2) > cos(1,3) > cos(1,4))
    assert(g.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq == Seq(2L, 3L))
  }

  test("incrementalCosinePairs ≡ full pair detection restricted to the batch") {
    // split vecs into corpus {1,2,4,5} and new batch {3}
    val batch = vecs.filter(col("vec_id") === 3L)
    val corpus = vecs.filter(col("vec_id") =!= 3L)
    val inc = graft.ops.Ann.incrementalCosinePairs(batch, corpus, "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.ops.Ann.cosineNearDupPairs(vecs, "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val touching = full.filter(p => p._1 == 3L || p._2 == 3L)
    assert(inc == touching, s"inc=$inc touching=$touching")
    assert(inc.nonEmpty) // 3 is a near-dup of 1 and 2
  }

  test("apportionBudget: allocations sum EXACTLY to the budget; " +
    "largest remainders win the leftover units") {
    val df = Seq(("a", 100L), ("a", 300L), ("b", 100L), ("c", 100L))
      .toDF("src", "sz")
    for (budget <- Seq(7L, 100L, 999L, 1000000L)) {
      val r = graft.ops.Sampling.apportionBudget(df, col("src"),
          col("sz"), budget)
        .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
      assert(r.values.sum == budget, s"budget $budget: $r")
      // a has 4x the sz of b/c → sqrt weights 2:1:1 → a gets ~half
      assert(r("a") >= r("b") && r("a") >= r("c"))
      assert(math.abs(r("b") - r("c")) <= 1L) // equal weights differ ≤1
    }
  }

  test("exactSubstringDedup: duplicated spans removed, first occurrence " +
    "kept, unique docs untouched") {
    val dup = "alpha beta gamma delta epsilon" // a shared 5-gram
    val docs = Seq(
      (1L, dup + " one two three four five"),   // canonical (min doc)
      (2L, dup + " six seven eight nine ten"),  // loses the shared span
      (3L, "unique tokens only here nothing shared at all"))
      .toDF("doc_id", "text")
    val r = graft.ops.TextDedup.exactSubstringDedup(docs, col("doc_id"),
        col("text"), 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getString(3))).toMap
    // doc 1 holds the canonical occurrence: nothing removed
    assert(r(1L)._2 == 0L)
    assert(r(1L)._3 == md5Hex(dup + " one two three four five"))
    // doc 2 loses exactly the 5 shared tokens; the rest survives
    assert(r(2L)._2 == 5L)
    assert(r(2L)._3 == md5Hex("six seven eight nine ten"))
    // untouched doc keeps its original text hash
    assert(r(3L)._2 == 0L)
  }

  test("exactSubstringDedup: canonical argmin is exact past 1024 tokens " +
    "(struct min, no packing-shift overflow)") {
    // doc 1 holds the true canonical occurrence at pos 1051 — under the
    // old doc_id*1024+pos packing, 1*1024+1051 > 2*1024+2 would have
    // flipped the canonical to doc 2. struct min must keep doc 1.
    val filler = (0 until 1050).map(i => s"f$i").mkString(" ")
    val dup = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, filler + " " + dup),
      (2L, "pad " + dup + " tail1 tail2 tail3 tail4"))
      .toDF("doc_id", "text")
    val r = graft.ops.TextDedup.exactSubstringDedup(docs, col("doc_id"),
        col("text"), 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getString(3))).toMap
    assert(r(1L)._1 == 1055L && r(1L)._2 == 0L) // canonical: intact
    assert(r(2L)._2 == 5L)                      // loses the shared span
    assert(r(2L)._3 == md5Hex("pad tail1 tail2 tail3 tail4"))
  }

  test("ngramNovelty: corpus-first grams count as novel; derivative " +
    "docs score low; sub-l docs absent") {
    val docs = Seq(
      (1L, "a b c d"),     // trigrams "a b c","b c d" — both corpus-first
      (2L, "a b c x"),     // "a b c" premiered in doc 1; "b c x" novel
      (3L, "hi"))          // < 3 tokens: no grams
      .toDF("doc_id", "text")
    val r = graft.ops.TextDedup.ngramNovelty(docs, col("doc_id"),
        col("text"), 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3)))).toMap
    assert(r(1L) == ((2L, 2L, 1.0)))
    assert(r(2L) == ((2L, 1L, 0.5)))
    assert(!r.contains(3L))
  }

  test("perplexityGate: per-source quantile cut — each source keeps its " +
    "own fraction regardless of scale differences") {
    val scored = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), // p75 = 3.25
      ("b", 10.0), ("b", 20.0))                       // p75 = 17.5
      .toDF("source", "score")
    val r = graft.ops.Sampling.perplexityGate(scored, col("source"),
        col("score"), 0.75)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3)))).toMap
    assert(r("a") == ((4L, 3L, 3.25))) // 1,2,3 pass; 4 > 3.25 cut
    assert(r("b") == ((2L, 1L, 17.5))) // a global cut would keep ALL of a
  }

  test("perplexityGate: approx_percentile scale path ≡ exact on an " +
    "exact-rank domain (5 scores/source → p75 is an element, no " +
    "interpolation)") {
    val scored = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 9.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0), ("b", 40.0), ("b", 90.0))
      .toDF("source", "score")
    def rows(acc: Option[Int]) =
      graft.ops.Sampling.perplexityGate(scored, col("source"),
          col("score"), 0.75, approxAccuracy = acc)
        .collect().map(_.toString).sorted.toSeq
    val exact = rows(None)
    val approx = rows(Some(10000))
    assert(exact == approx, s"exact $exact vs approx $approx")
    // and the decision is the right one: p75 of 5 = the 4th element
    assert(exact.exists(_.contains("[a,5,4,4.0]")), exact.toString)
  }

  test("dedupChainAudit: transitively-merged groups flagged by their " +
    "weakest edge; tight groups pass; singletons absent") {
    val docs = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.3), (5L, 6L, 0.8))
      .toDF("doc_a", "doc_b", "jaccard")
    val groups = Graph.dedupGroups(docs, "doc_id", pairs, "doc_a", "doc_b")
    val r = Graph.dedupChainAudit(groups, pairs, 0.5)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4), x.getBoolean(5)))).toMap
    // group 1 = {1,2,3}: 1~3 only via chaining, weakest edge 0.3
    assert(r(1L) == ((3L, 2L, 0.3, 0.6, true)))
    // group 5 = {5,6}: genuinely similar
    assert(r(5L) == ((2L, 1L, 0.8, 0.8, false)))
    assert(!r.contains(9L)) // no edges, nothing to audit
  }

  test("groupedCorr: exact ±1 on linear data; NULL when a variance is " +
    "zero; snapped sums make it partition-invariant") {
    val df = Seq(
      ("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 30.0),
      ("down", 1.0, 3.0), ("down", 2.0, 2.0), ("down", 3.0, 1.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0), ("flat", 3.0, 5.0))
      .toDF("g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Quality.groupedCorr(d, col("g"), col("x"), col("y"))
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val r = run(df)
    assert(r("up") == Some(1.0) && r("down") == Some(-1.0))
    assert(r("flat").isEmpty) // zero y-variance: correlation undefined
    assert(run(df.repartition(7)) == r)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("canonical pick: longest member represents its dedup group") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 20L), (9L, 5L))
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = Graph.dedupGroups(docs, "doc_id", pairs, "doc_a", "doc_b")
      .join(docs, Seq("doc_id"))
      .groupBy(col("group_id"))
      .agg(max(col("group_size")).as("group_size"),
        max_by(col("doc_id"),
          struct(col("n_chars"), (-col("doc_id")).as("neg"))).as("canon_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 2L), (9L, 1L, 9L)))
  }
  test("aesSample: exact-k per group, md5-deterministic, weight-" +
    "monotone inclusion tendency, non-positive weights excluded") {
    import graft.ops.Sampling
    val df = ((1L to 60L).map(i => ("a", i, (i % 6 + 1).toDouble)) ++
      (61L to 70L).map(i => ("b", i, 1.0)) ++
      Seq(("a", 999L, 0.0), ("a", 998L, -3.0))) // excluded
      .toDF("src", "id", "w")
    val r = Sampling.aesSample(df, col("src"), col("id"), col("w"), 5)
      .collect()
    val byGrp = r.groupBy(_.getString(0))
    assert(byGrp("a").length == 5 && byGrp("b").length == 5)
    assert(!r.exists(x => x.getLong(1) >= 998L && x.getLong(1) <= 999L))
    // ranks are 1..5 with snapped keys non-increasing
    val aKeys = byGrp("a").sortBy(_.getLong(4)).map(_.getDouble(3)).toSeq
    assert(aKeys == aKeys.sorted.reverse)
    // pure function of ids: repartition changes nothing
    val r2 = Sampling.aesSample(df.repartition(7), col("src"), col("id"),
      col("w"), 5).collect()
    assert(r2.map(_.toString).sorted.toSeq == r.map(_.toString).sorted.toSeq)
    // statistical sanity: with weights 1..6 cycling, the selected ids
    // skew heavy — mean weight of the a-sample beats the population mean
    val meanSel = byGrp("a").map(_.getDouble(2)).sum / 5
    assert(meanSel > 3.5, s"weighted draw looks uniform: $meanSel")
  }

}
