package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
  * training step of an LLM data pipeline, in the formulation that
  * scales: everything after the first aggregation operates on the WORD
  * FREQUENCY table (vocabulary-sized — ~10^5-10^6 rows for a 100 TB
  * corpus), never the corpus itself. This is how reference BPE trainers
  * work too (counts over unique words); the corpus contributes one
  * map-side-combined word count and is done.
  *
  * The merge loop mirrors [[Ann.kmeansLloyd]]'s shape: learned state
  * (the merge list) lives on the driver and enters each pass as plan
  * literals; each iteration is
  *   1. adjacent-pair counts over the symbolized vocab (explode + one
  *      aggregation, weighted by word frequency),
  *   2. a deterministic argmax on the driver (count desc, then pair
  *      lexicographic — no RNG, bit-stable across runs/engines),
  *   3. one fold projection applying the merge greedily left-to-right
  *      inside the plan (`aggregate` HOF — no UDF, no collect; HOF
  *      lambdas evaluate interpreted, fine at vocabulary scale).
  * Iteration cost is O(|vocab| × avg word length), independent of
  * corpus size.
  */
object Bpe {

  /** (left, right) merge pairs in learned order. */
  type Merges = Seq[(String, String)]

  /** Word frequency table: (w, freq) — the ONLY corpus-sized pass. */
  def wordFreqs(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(split(text, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Symbolize a word column under an end-of-word marker: "low" →
    * ["l","o","w</w>"]. The marker keeps word-final units distinct from
    * word-internal ones (standard BPE). */
  private def symbolize(w: Column): Column = {
    val chars = split(w, "")
    val n = size(chars)
    concat(slice(chars, lit(1), n - 1),
      array(concat(element_at(chars, -1), lit("</w>"))))
  }

  /** One greedy left-to-right merge pass of (a, b) → a+b over a symbol
    * array, as an in-plan fold: overlapping occurrences resolve
    * leftmost-first ("aaa" under (a,a) → ["aa","a"]), matching
    * reference BPE. */
  private def mergePass(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Apply an ordered merge list to the symbolized vocab. */
  def symbolized(freqs: DataFrame, merges: Merges): DataFrame =
    merges.foldLeft(
      freqs.select(col("w"), col("freq"), symbolize(col("w")).as("sym"))) {
      case (df, (a, b)) =>
        df.withColumn("sym", mergePass(col("sym"), a, b))
    }

  /** Learn `numMerges` merges from the corpus. Returns the ordered merge
    * list. Deterministic: ties break on the pair's lexicographic order.
    *
    * The symbolized vocab is MAINTAINED across iterations: each pass
    * applies only the NEWEST merge to the previous materialized state,
    * so learning m merges costs m mergePass projections total —
    * re-deriving `symbolized(freqs, merges)` from scratch each round
    * would apply O(m²) passes and grow the per-pass plan depth linearly
    * with the learned count (analyzer/codegen cost explodes around
    * 10^4 merges). `materialize` defaults to eager localCheckpoint:
    * constant plan depth, blocks self-release on GC. */
  def train(docs: DataFrame, text: Column, numMerges: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true)): Merges = {
    if (numMerges <= 0) return Vector.empty // before the eager corpus count
    var syms = materialize(wordFreqs(docs, text)
      .select(col("freq"), symbolize(col("w")).as("sym")))
    var merges = Vector.empty[(String, String)]
    var continue = true
    while (merges.size < numMerges && continue) {
      val pairs = syms
        .filter(size(col("sym")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("sym")) - 1), i =>
            struct(element_at(col("sym"), i).as("a"),
              element_at(col("sym"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (pairs.isEmpty) continue = false
      else {
        val (a, b) = (pairs(0).getString(0), pairs(0).getString(1))
        merges :+= ((a, b))
        if (merges.size < numMerges)
          syms = materialize(syms.withColumn("sym",
            mergePass(col("sym"), a, b)))
      }
    }
    merges
  }

  /** Unigram-LM Viterbi segmentation (the SentencePiece-style
    * INFERENCE step — the tokenizer family's second member next to the
    * BPE merge loop): segment each document's first `prefixLen` chars
    * into pieces of length 1..`maxPiece` minimizing total piece cost
    * under a corpus-trained substring unigram model. The cost is the
    * INTEGER bit-length `len(bin(T div f))` = ⌊log₂(T/f)⌋+1 (a
    * log₂-quantized −log p surrogate): integer DP is bit-exact across
    * engines, where a float-cost argmin could flip on a libm ulp and
    * change the piece count. Ties resolve inside the packed value —
    * state = cost·64 + pieces (pieces ≤ 48 < 64), so min() orders by
    * cost, then by piece count, deterministically.
    *
    * Scale shape: the model is a substring-frequency table bounded by
    * |Σ|^maxPiece (alphabet-bounded, broadcast-safe — NOT corpus-
    * bounded); the corpus explodes once per piece length into
    * map-side-combined counts. Scoring is one broadcast join from the
    * (doc, end-pos, len) piece table, one pivot aggregation, and a
    * per-doc `aggregate` fold over ≤ `prefixLen` steps — the Viterbi
    * recurrence b(i) = min_l b(i−l) + cost(piece ending at i, len l)
    * carries only a maxPiece-wide window, O(prefixLen) work per doc,
    * no shuffle after the pivot. Every substring of a scored prefix
    * exists in the model by construction (trained on the same corpus's
    * full texts), so the DP never strands. Docs with empty text are
    * excluded (no segmentable prefix). */
  def unigramSegment(docs: DataFrame, id: Column, text: Column,
      prefixLen: Int = 48, maxPiece: Int = 4): DataFrame = {
    // the DP window (acc width, c1..c4 slots) is fixed at 4
    require(maxPiece == 4, "unigramSegment: the Viterbi window is fixed at 4")
    val BIG = 1000000000000L
    val fanned = Fanout.fanout(docs).select(id.as("doc_id"), text.as("__t"))
    // substring unigram model over FULL texts, all lengths
    // 1..maxPiece in ONE corpus pass, shaped as two codegen Generates:
    // positions stream out of sequence(1, len), each position emits
    // its ≤maxPiece candidate pieces straight into the map-side-
    // combined count. Nothing per-doc ever materializes (the earlier
    // flatten-of-transforms built a 4·len(doc) string ARRAY per doc
    // inside an interpreted higher-order chain — both the suite's
    // biggest transient allocator and a WholeStageCodegen hole;
    // measured 6.7s → 5.1s single-partition on the sf0.1 model half).
    val subs = fanned.filter(length(col("__t")) >= 1)
      .select(col("__t").as("s"),
        explode(sequence(lit(1), length(col("__t")))).as("i"))
      .select(explode(array((1 to maxPiece).map(l =>
          when(col("i") + lit(l - 1) <= length(col("s")),
            col("s").substr(col("i"), lit(l)))): _*)).as("piece"))
      .filter(col("piece").isNotNull)
    val voc = subs.groupBy(col("piece")).agg(count(lit(1)).as("f"))
      .localCheckpoint(true) // 2 consumers: total + cost table
    val tTot = {
      val r = voc.agg(sum(col("f"))).first()
      if (r.isNullAt(0)) 1L else r.getLong(0)
    }
    val costTab = voc.select(col("piece"),
      length(bin(expr(s"${tTot}L DIV f"))).cast("long").as("c"))
    // (doc, end-pos i) scoring rows over the prefix: the maxPiece
    // candidate pieces are COLUMNS (null where i < l), resolved by
    // maxPiece broadcast hash joins — all map-side, so the only
    // shuffle in the scoring half is the final per-doc collect
    val pf = fanned.filter(length(col("__t")) >= 1)
      .select(col("doc_id"),
        col("__t").substr(lit(1), lit(prefixLen)).as("s"))
    val base = pf.select(col("doc_id"),
        explode(sequence(lit(1), length(col("s")))).as("i"), col("s"))
      .select(col("doc_id") +: col("i") +:
        (1 to maxPiece).map { l =>
          when(col("i") >= l,
            col("s").substr(col("i") - (l - 1), lit(l))).as(s"p$l")
        }: _*)
    val cp = (1 to maxPiece).foldLeft(base) { (df, l) =>
      df.join(broadcast(costTab.select(col("piece").as(s"p$l"),
        col("c").as(s"c$l"))), Seq(s"p$l"), "left")
    }.select(col("doc_id"), col("i"),
      col("c1"), col("c2"), col("c3"), col("c4"))
    // Viterbi fold: acc = [b(i-4), b(i-3), b(i-2), b(i-1)] packed as
    // cost*64+pieces; steps arrive i-ascending via sort_array on the
    // distinct-i struct array
    val folded = cp.groupBy(col("doc_id"))
      .agg(max(col("i")).cast("long").as("n_chars"),
        sort_array(collect_list(struct(col("i"), col("c1"), col("c2"),
          col("c3"), col("c4")))).as("steps"))
      .select(col("doc_id"), col("n_chars"),
        element_at(aggregate(col("steps"),
          array(lit(BIG), lit(BIG), lit(BIG), lit(0L)),
          (acc, x) => array(element_at(acc, 2), element_at(acc, 3),
            element_at(acc, 4),
            least(
              element_at(acc, 4) + coalesce(x.getField("c1"), lit(BIG)) * 64 + 1,
              element_at(acc, 3) + coalesce(x.getField("c2"), lit(BIG)) * 64 + 1,
              element_at(acc, 2) + coalesce(x.getField("c3"), lit(BIG)) * 64 + 1,
              element_at(acc, 1) + coalesce(x.getField("c4"), lit(BIG)) * 64 + 1))),
          4).as("b"))
    folded.select(col("doc_id"), col("n_chars"),
      expr("b DIV 64").as("cost_bits"), pmod(col("b"), lit(64L)).as("n_pieces"))
  }

  /** Tokenize text under a learned merge list (training-consistent
    * greedy application in merge order), one (doc, pos, token) row per
    * subword unit. */
  def encode(docs: DataFrame, id: Column, text: Column,
      merges: Merges): DataFrame = {
    val words = docs.select(id.as("doc_id"),
      posexplode(split(text, " ")).as(Seq("word_pos", "w")))
      .filter(length(col("w")) > 0)
    val sym = merges.foldLeft(
      words.withColumn("sym", symbolize(col("w")))) {
      case (df, (a, b)) => df.withColumn("sym", mergePass(col("sym"), a, b))
    }
    sym.select(col("doc_id"), col("word_pos"),
      posexplode(col("sym")).as(Seq("sub_pos", "token")))
  }
}
