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
}
