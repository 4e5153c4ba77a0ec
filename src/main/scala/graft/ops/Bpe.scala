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
