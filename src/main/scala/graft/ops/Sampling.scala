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

  /** Deterministic EXACT-size uniform sample (min-k / bottom-k): rank
    * every row by a uniform hash of its id and keep the k smallest —
    * the fixed-budget complement to [[hashSample]]'s fixed-rate keep
    * (eval-set carving, "exactly 10k docs for ablation", distinct-value
    * sketching). Reproducible: membership is a pure function of
    * (id, k), so the same ids are sampled on every run and engine, and
    * samples NEST — the min-k sample contains the min-j sample for all
    * j < k.
    *
    * Scale shape: orderBy+limit compiles to TakeOrderedAndProject —
    * each task keeps a k-row heap and only k rows per partition ever
    * move — NOT a corpus sort (no range-partitioned exchange of the
    * data; verified in PLANS.md). */
  def minKSample(df: DataFrame, id: Column, k: Int): DataFrame = {
    require(k > 0, s"minKSample: need k > 0 ($k)")
    df.withColumn("rank_hash", md5(id.cast("string")))
      .orderBy(col("rank_hash")).limit(k)
  }

  /** Leakage-safe train/val/test split: the split is assigned to the
    * DEDUP GROUP, not the document — near-duplicates (as connected
    * components over `pairs`, [[Graph.dedupGroups]]) land on the same
    * side by construction, so evaluation never scores memorized
    * near-copies of training docs (the contamination mode a doc-keyed
    * [[hashSplit]] cannot prevent). Output = dedupGroups' columns +
    * `split`; group sizes/keep flags ride along, so "train on canonical
    * members only" is one extra filter. Cost over hashSplit: the CC
    * fixpoint on the candidate-pair graph — pair-sized, not
    * corpus-sized. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, cuts: Seq[(Int, String)]): DataFrame =
    hashSplit(Graph.dedupGroups(docs, idCol, pairs, aCol, bCol),
      col("group_id"), cuts)

  /** Deterministic weighted (Bernoulli) sample: keep a row iff its
    * hash-uniform u(id) ∈ [0,1) falls below the row's weight — the
    * quality-weighted / temperature-sampling step of corpus mixing,
    * reproducible because u is a pure function of the id (same rows kept
    * on every run, every engine, every retry). Weights are clamped to
    * [0,1]; the hash has 1e6 distinct levels. */
  def weightedSample(df: DataFrame, id: Column, weight: Column): DataFrame =
    df.filter(hashBucket(id, 1000000).cast("double") / 1000000.0 <
      least(lit(1.0), greatest(lit(0.0), weight)))

  /** Per-stratum keep rates that cap any stratum's share of the corpus
    * at `capShare`: strata over the cap get rate = cap/share, the rest
    * pass through at 1.0. Output: strataCols + (`__n`, `__keep_rate`).
    * The measure half of mixture rebalancing — corpus-composition
    * control (source/language balancing) for training-data pipelines.
    * Stratum stats are group-counts (map-side combined); the total is a
    * 1-row broadcast, so rates never shuffle the corpus. */
  def mixtureRates(df: DataFrame, strataCols: Seq[String],
      capShare: Double): DataFrame = {
    val strata = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val total = strata.agg(sum(col("__n")).cast("double").as("__total"))
    strata.crossJoin(broadcast(total))
      .select((strataCols.map(col) :+ col("__n") :+
        least(lit(1.0), lit(capShare) / (col("__n") / col("__total")))
          .as("__keep_rate")): _*)
  }

  /** Temperature-based mixture rates (the T5/mT5 mixing rule): target
    * share of stratum i ∝ share_i^alpha — alpha=1 keeps the natural
    * mix, alpha→0 flattens toward uniform, lifting low-resource strata.
    * Since lifting can only OVERSAMPLE the small strata (rate > 1,
    * which Bernoulli sampling cannot do), rates are normalized so the
    * LARGEST requested lift maps to keep-everything: rate_i =
    * lift_i / max_j lift_j where lift_i = target_i / share_i — the
    * downsample-only projection of the temperature mix. Same plan shape
    * as [[mixtureRates]]: group counts map-side combined, a one-row
    * total broadcast, the corpus untouched. */
  def temperatureRates(df: DataFrame, strataCols: Seq[String],
      alpha: Double): DataFrame = {
    val strata = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val norm = strata.agg(
      sum(col("__n")).cast("double").as("__total"),
      sum(pow(col("__n").cast("double"), alpha)).as("__powsum"))
    strata.crossJoin(broadcast(norm))
      .withColumn("__share", col("__n") / col("__total"))
      .withColumn("__target",
        pow(col("__n").cast("double"), alpha) / col("__powsum"))
      .withColumn("__lift", col("__target") / col("__share"))
      // max lift = the most-lifted (smallest) stratum: scale it to 1.0
      .withColumn("__keep_rate",
        col("__lift") / max(col("__lift")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .select((strataCols.map(col) :+ col("__n") :+ col("__share") :+
        col("__target") :+ col("__keep_rate")): _*)
  }

  /** Mixture rebalancing: deterministically downsample each stratum to
    * its [[mixtureRates]] cap (hash-Bernoulli on `id` — same rows kept
    * on every run/engine/retry). Rates are a strata-sized broadcast;
    * the corpus passes through one filter, no extra shuffle. */
  def mixtureRebalance(df: DataFrame, strataCols: Seq[String], id: Column,
      capShare: Double): DataFrame = {
    // null-safe join: a NULL stratum (e.g. lang unknown) is a real
    // stratum with a rate — a plain equi-join would silently drop it
    val rates = mixtureRates(df, strataCols, capShare)
      .select((strataCols.map(c => col(c).as(s"__r_$c")) :+
        col("__keep_rate")): _*)
    val cond = strataCols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
    weightedSample(df.join(broadcast(rates), cond), id, col("__keep_rate"))
      .drop(("__keep_rate" +: strataCols.map(c => s"__r_$c")): _*)
  }

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
