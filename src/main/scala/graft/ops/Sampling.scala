package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling/splitting for training-data pipelines.
  *
  * Hash-based, not `rand()`-based: the assignment is a pure function of
  * the row's id, so it is stable across runs, executors, retries, and
  * engine versions — the property that makes a train/test split
  * defensible. Buckets come from the first 8 hex chars of md5 (shared
  * vocabulary with any other engine; xxhash64 would be Spark-only).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the id. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Deterministic percentage split: `cuts` are ascending percentile
    * upper bounds mapped to labels, e.g.
    * `Seq(10 -> "val", 20 -> "test", 100 -> "train")`. */
  def hashSplit(df: DataFrame, id: Column, cuts: Seq[(Int, String)]): DataFrame = {
    val b = hashBucket(id, 100)
    // nested when, innermost = smallest cut → first-match semantics
    val assigned = cuts.sortBy(_._1).reverse
      .foldLeft(lit(null).cast("string")) { case (elseC, (hi, label)) =>
        when(b < hi, lit(label)).otherwise(elseC)
      }
    df.withColumn("split", assigned)
  }

  /** Deterministic fractional sample: keep ~`percent`% of rows by id
    * hash — repeatable, join-stable (the same ids are kept everywhere). */
  def hashSample(df: DataFrame, id: Column, percent: Int): DataFrame =
    df.filter(hashBucket(id, 100) < percent)

  /** Deterministic weighted (Bernoulli) sample: keep a row iff its
    * hash-uniform u(id) ∈ [0,1) falls below the row's weight — the
    * quality-weighted / temperature-sampling step of corpus mixing,
    * reproducible because u is a pure function of the id (same rows kept
    * on every run, every engine, every retry). Weights are clamped to
    * [0,1]; the hash has 1e6 distinct levels. */
  def weightedSample(df: DataFrame, id: Column, weight: Column): DataFrame =
    df.filter(hashBucket(id, 1000000).cast("double") / 1000000.0 <
      least(lit(1.0), greatest(lit(0.0), weight)))

  /** Class-balanced sample: up to `nPerClass` rows per class, chosen by
    * hash order of the id — deterministic (no rand()), and the per-class
    * shuffle carries only class-partitioned rows (one window sort). */
  def stratifiedBalanced(df: DataFrame, classCol: Column, id: Column,
      nPerClass: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(classCol).orderBy(md5(id.cast("string")), id)
    df.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(org.apache.spark.sql.functions.col("__rn") <= nPerClass)
      .drop("__rn")
  }
}
