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
    pmod(graft.expr.Similarity.md5PrefixLong(id.cast("string"), 8),
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

  /** One exponentiated-gradient step of domain reweighting (the DoReMi
    * update rule, Xie et al. 2023 §3, collapsed to a single closed-form
    * step over measured losses): sources whose mean LM loss EXCEEDS the
    * corpus baseline get upweighted — w_s ∝ share_s · exp(η·excess_s) —
    * the "train more where the model is worst" mixture correction,
    * computed entirely from a per-doc score table (the shared q73 NLL
    * artifact; DoReMi proper iterates this with proxy-model retraining
    * between steps — the BETWEEN-steps data math is exactly this).
    *
    * Deterministic: per-source mean losses are [[graft.expr.Snap]]
    * snapped sums over the 4-dp doc scores (rounded to 6 dp); the
    * exp(η·excess) factor is snapped to the 1e9 grid BEFORE the
    * multiply (libm exp is not correctly rounded — one snapped grid
    * keeps both engines identical); final weights round to 4 dp after
    * the |sources|-sized normalization.
    *
    * Scale shape: one doc-keyed join (docs → scores), one
    * map-side-combined per-source aggregation, then arithmetic over a
    * |sources|-row table with a one-row broadcast total — the corpus
    * moves through exactly one exchange. */
  def doremiStep(docs: DataFrame, id: Column, source: Column,
      scores: DataFrame, eta: Double = 1.0): DataFrame = {
    import graft.expr.Snap
    def snap9(c: Column): Column =
      floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val perSrc = docs.select(id.as("doc_id"), source.as("source"))
      .join(scores, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(Snap.snappedSum(col("nll"), 1e9) /
          count(lit(1)).cast("double"), 6).as("mean_nll"))
    val tot = perSrc.agg(sum(col("n_docs")).cast("double").as("ntot"),
      // corpus baseline = doc-weighted mean of the source means (6-dp
      // inputs, snapped sum) — source-count-independent
      round(Snap.snappedSum(col("mean_nll") *
          col("n_docs").cast("double"), 1e9) /
        sum(col("n_docs")).cast("double"), 6).as("baseline"))
    val lifted = perSrc.crossJoin(broadcast(tot))
      .withColumn("excess", round(col("mean_nll") - col("baseline"), 6))
      .withColumn("w0", col("n_docs").cast("double") / col("ntot"))
      .withColumn("wraw", col("w0") * snap9(exp(lit(eta) * col("excess"))))
    lifted
      .crossJoin(broadcast(lifted.agg(
        Snap.snappedSum(col("wraw"), 1e9).as("z"))))
      .select(col("source"), col("n_docs"), col("mean_nll"), col("excess"),
        round(col("w0"), 4).as("weight0"),
        round(col("wraw") / col("z"), 4).as("weight"))
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
    * hash order of the id — deterministic (no rand()).
    *
    * Scale shape: two-phase cap. The final per-class rank would
    * serialize a head class through one task, so a PRE-CAP window
    * partitioned by (class, first-two-md5-hex bucket) first cuts each
    * of the 256 buckets to `nPerClass` rows — since the global keep set
    * is the first `nPerClass` in md5 order and bucket order is a prefix
    * of that order, no bucket can contribute more than `nPerClass`
    * keeps, so the pre-cap is lossless. The final window then ranks
    * ≤ 256·nPerClass rows per class — bounded by the CAP, not the
    * corpus. */
  def stratifiedBalanced(df: DataFrame, classCol: Column, id: Column,
      nPerClass: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val h = md5(id.cast("string"))
    val wPre = W.partitionBy(classCol, substring(h, 1, 2)).orderBy(h, id)
    val wFinal = W.partitionBy(classCol).orderBy(h, id)
    df.withColumn("__prn", row_number().over(wPre))
      .filter(col("__prn") <= nPerClass)
      .withColumn("__rn", row_number().over(wFinal))
      .filter(col("__rn") <= nPerClass)
      .drop("__prn", "__rn")
  }

  /** Per-source SIZE budget (RefinedWeb-style corpus composition): keep
    * documents, in deterministic md5(id) order, while the source's
    * RUNNING total of `size` stays within `budget` — "every domain
    * contributes at most B bytes/tokens", the budget-capped complement
    * of [[stratifiedBalanced]]'s count cap. A doc is kept iff the
    * budget was not yet exhausted when its turn came (cumulative size
    * INCLUDING itself ≤ budget — a doc never straddles the cap).
    *
    * Deterministic: the keep set is a pure function of (ids, sizes,
    * budget) — stable across runs, engines, and partitionings — and
    * budget-monotone: raising the budget only ever ADDS documents
    * (the hash order is fixed, so smaller budgets keep a prefix of the
    * larger budget's keeps per source).
    *
    * Scale shape: the running total is a DISTRIBUTED two-level prefix
    * sum (the [[Packing.concatChunk]] pattern), not one per-source
    * window — a head-heavy source would otherwise serialize its whole
    * scan through a single task. The first two md5 hex chars bucket
    * each source's rows into 256 CONTIGUOUS ranges of the admission
    * order (the bucket is a prefix of the sort key, so bucket-major
    * order IS the md5 order); per-(source, bucket) totals aggregate
    * map-side, bucket offsets are a window over the tiny totals table
    * (≤256 rows per source), and the within-bucket running sum joins
    * its offset back broadcast — 256-way parallel per source, state
    * bounded by one bucket's rows. */
  def sourceBudget(df: DataFrame, source: Column, id: Column,
      size: Column, budget: Long): DataFrame = {
    require(budget > 0, s"sourceBudget: need budget > 0 ($budget)")
    val W = org.apache.spark.sql.expressions.Window
    val base = df.withColumn("__h", md5(id.cast("string")))
      .withColumn("__b", substring(col("__h"), 1, 2))
    val bucketTotals = base
      .groupBy(source.as("__src"), col("__b").as("__bb"))
      .agg(sum(size.cast("long")).as("__bt"))
    val wBuckets = W.partitionBy(col("__src")).orderBy(col("__bb"))
      .rowsBetween(W.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("__boff", coalesce(sum(col("__bt")).over(wBuckets), lit(0L)))
      .drop("__bt")
    val wInBucket = W.partitionBy(source, col("__b"))
      .orderBy(col("__h"), id).rowsBetween(W.unboundedPreceding, 0)
    base
      .join(broadcast(offsets),
        source <=> col("__src") && col("__b") === col("__bb"))
      .withColumn("cum_size",
        col("__boff") + sum(size.cast("long")).over(wInBucket))
      .filter(col("cum_size") <= budget)
      .drop("__h", "__b", "__src", "__bb", "__boff")
  }

  /** Deterministic shard assignment + per-shard manifest for the
    * training-data writer: every row lands in `hashBucket(id, shards)`,
    * and the manifest row carries the shard's doc count, total payload
    * size, and id range — the sidecar a downstream loader checks before
    * streaming a shard. One map-side-combined aggregation; the manifest
    * is shard-sized (constant) at any corpus scale. */
  def shardManifest(df: DataFrame, id: Column, size: Column,
      shards: Int): DataFrame = {
    require(shards > 0, s"shardManifest: need shards > 0 ($shards)")
    df.groupBy(hashBucket(id, shards).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size.cast("long")).as("tot_size"),
        min(id).as("min_id"), max(id).as("max_id"))
  }

  /** Exact integer budget apportionment across strata (Hamilton /
    * largest-remainder method) over temperature-flattened weights:
    * allocate `budget` tokens so stratum i gets ⌊budget·w_i⌋ plus one
    * of the leftover units by largest fractional part — Σ alloc ==
    * budget EXACTLY, the property a batch-composition planner needs
    * (rates alone under- or over-shoot by rounding). Weights are
    * √size (temperature τ = 0.5, the [[temperatureRates]] flattening),
    * normalized by a [[graft.expr.Snap]]-snapped total so the quota
    * doubles are identical on any engine or partitioning; IEEE sqrt is
    * correctly rounded everywhere, so no pow() portability hazard.
    *
    * Scale shape: one map-side-combined aggregation to stratum sizes;
    * everything after (quota, ranks, remainder) runs on the
    * strata-sized table — the only unpartitioned window frames are
    * strata-count rows. */
  def apportionBudget(df: DataFrame, strata: Column, size: Column,
      budget: Long,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(budget > 0, s"apportionBudget: need budget > 0 ($budget)")
    val W = org.apache.spark.sql.expressions.Window
    // strata-sized but corpus-aggregated — materialized because the
    // normalizer and the quota projection both consume it
    val s = materialize(df.groupBy(strata.as("stratum"))
      .agg(sum(size.cast("long")).as("sz")))
    val tot = s.agg(graft.expr.Snap
      .snappedSum(sqrt(col("sz").cast("double")), 1e9).as("tot"))
    val q = s.crossJoin(broadcast(tot))
      .withColumn("quota",
        lit(budget) * sqrt(col("sz").cast("double")) / col("tot"))
      .withColumn("base", floor(col("quota")).cast("long"))
      .withColumn("frac", col("quota") - floor(col("quota")))
    q.withColumn("rk",
        row_number().over(W.orderBy(col("frac").desc, col("stratum"))))
      .withColumn("rem", lit(budget) - sum(col("base")).over(
        W.partitionBy().rowsBetween(W.unboundedPreceding,
          W.unboundedFollowing)))
      .select(col("stratum"), col("sz"),
        (col("base") + when(col("rk") <= col("rem"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** DSIR-style hashed-unigram importance weights (Xie et al., "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much more likely its tokens are under the
    * TARGET distribution (rows satisfying `isTarget`) than under the
    * RAW corpus distribution. Unigrams hash into `buckets` feature
    * buckets (the hashed n-gram trick — vocabulary-independent, fixed
    * memory); per-bucket probabilities are Laplace-smoothed; the doc
    * weight is Σ_tokens ln(p_target(b)/p_raw(b)). High weight = looks
    * like the target domain; feed to [[weightedSample]] for the actual
    * resampling step.
    *
    * Deterministic: buckets come from md5 (cross-engine), and the
    * per-doc sum uses the shared [[graft.expr.Snap]] grid — identical
    * output under any partitioning or engine.
    *
    * Scale shape: one tokenize+count aggregation (map-side combined);
    * the bucket stats table is `buckets`-sized and broadcast back —
    * the corpus shuffles once, exactly like the tf-idf/NLL family. */
  def dsirWeights(docs: DataFrame, id: Column, text: Column,
      isTarget: Column, buckets: Int = 1024,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(buckets > 0, s"dsirWeights: need buckets > 0 ($buckets)")
    // per-(doc, bucket) tf — feeds BOTH the bucket stats and the final
    // per-doc scoring join; materialized so tokenize+count runs once
    val docTf = materialize(Fanout.fanout(docs)
      .select(id.as("doc_id"), isTarget.as("is_target"),
        explode(graft.expr.TextStats.tokens(text)).as("tok"))
      .groupBy(col("doc_id"), col("is_target"),
        hashBucket(col("tok"), buckets).as("b"))
      .agg(count(lit(1)).as("tf")))
    // bucket-sized (`buckets` rows) but aggregated FROM the corpus-
    // sized docTf — materialized because both the ratio table and the
    // grand totals consume it (otherwise the docTf aggregation runs
    // twice, once per consumer)
    val bStats = materialize(docTf.groupBy(col("b"))
      .agg(sum(col("tf")).as("craw"),
        sum(when(col("is_target"), col("tf")).otherwise(lit(0L))).as("ctgt")))
    val totals = bStats.agg(sum(col("craw")).as("traw"),
      sum(col("ctgt")).as("ttgt"))
    val logRatio = bStats.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ctgt") + lit(1L)).cast("double") /
            (col("ttgt") + lit(buckets.toLong)).cast("double")) -
          log((col("craw") + lit(1L)).cast("double") /
            (col("traw") + lit(buckets.toLong)).cast("double"))).as("lr"))
    docTf.join(broadcast(logRatio), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(graft.expr.Snap.snappedSum(
          col("tf").cast("double") * col("lr"), 1e9), 4).as("dsir_w"))
  }

  /** Effective sample size of an importance-weighting per group (Kong
    * 1992; ESS = (Σw)²/Σw²) — the health check [[dsirWeights]] needs
    * before anyone trains on it: a reweighting that concentrates mass
    * on a few documents has quietly shrunk the corpus (ess_ratio → 1/n
    * means ONE doc carries the source). Log-scores exponentiate under
    * a per-group MAX SHIFT (the q169 softmax discipline — w ∈ (0, 1],
    * snap-safe, and ESS is scale-invariant so the shift changes
    * nothing); both moment sums 1e9-snap. One group-max pass broadcast
    * back + one map-side-combined moment pass. Returns
    * (grp, n_docs, ess, ess_ratio). */
  def essReport(weights: DataFrame, grp: Column, logW: Column)
      : DataFrame = {
    import graft.expr.Snap
    val base = weights.select(grp.as("grp"), logW.as("lw"))
    val mx = base.groupBy(col("grp")).agg(max(col("lw")).as("mx"))
    val w = exp(col("lw") - col("mx"))
    val s = base.join(broadcast(mx), "grp")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        Snap.snappedSum(w, 1e9).as("s1"),
        Snap.snappedSum(w * w, 1e9).as("s2"))
    s.select(col("grp"), col("n_docs"),
      round(col("s1") * col("s1") / col("s2"), 4).as("ess"),
      round(col("s1") * col("s1") / col("s2") /
        col("n_docs").cast("double"), 6).as("ess_ratio"))
  }

  /** CCNet-style per-source perplexity gate: cut each source at its OWN
    * score quantile instead of a global threshold (sources differ in
    * style, so one global LM-score cut over-prunes formal sources and
    * under-prunes noisy ones — the reason CCNet buckets per snapshot/
    * language). Input is any per-doc score table (the q73 unigram NLL or
    * q113 bigram NLL); emits per-source admission stats:
    * (source, n_docs, n_kept, threshold).
    *
    * Determinism: the threshold is the exact interpolated percentile
    * over 4-dp-rounded scores, itself rounded to 4 dp BEFORE the keep
    * comparison — the decision is a comparison of two 4-dp quantities,
    * replayable in any engine. Exact percentile buffers one source's
    * score multiset per task — fine for per-source thresholds over
    * rounded scores (bounded distinct values). For unbounded score
    * domains at extreme scale pass `approxAccuracy = Some(a)`: the
    * threshold becomes `approx_percentile(score, q, a)` (the q41
    * pattern — a GK sketch with rank error ≤ 1/a, constant memory per
    * source regardless of distinct-score count). The approx threshold
    * is an actual element of the score multiset (no interpolation), so
    * when the quantile lands on an exact rank the two paths agree
    * bit-for-bit (CurationSelectSpec pins this on the bounded test
    * domain). */
  def perplexityGate(scored: DataFrame, sourceCol: Column, scoreCol: Column,
      q: Double,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true),
      approxAccuracy: Option[Int] = None)
      : DataFrame = {
    require(q > 0 && q < 1, s"perplexityGate: quantile q=$q outside (0,1)")
    require(approxAccuracy.forall(_ > 0),
      s"perplexityGate: approxAccuracy=$approxAccuracy must be positive")
    // (source, score) feeds BOTH the threshold aggregation and the keep
    // join — materialized (doc-sized, 2 narrow columns) so an expensive
    // upstream scorer (the q73/q113 NLL DAG) runs once, not twice
    val s = materialize(
      scored.select(sourceCol.as("source"), scoreCol.as("score")))
    val thrExpr = approxAccuracy match {
      case Some(acc) => expr(s"approx_percentile(score, $q, $acc)")
      case None      => expr(s"percentile(score, $q)")
    }
    val thr = s.groupBy(col("source"))
      .agg(round(thrExpr, 4).as("threshold"))
    s.join(broadcast(thr), "source")
      .groupBy(col("source"), col("threshold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") <= col("threshold"), 1L).otherwise(0L))
          .as("n_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"), col("threshold"))
  }

  /** Data-constrained scaling forecast (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models"): when the training
    * budget exceeds a source's unique tokens, repeated epochs carry
    * DECAYING value — the paper's fitted form counts
    *   D' = U + U·R*·(1 − exp(−R/R*)),  R = epochs beyond the first,
    * with R* ≈ 15 (their fitted repeat half-life constant); beyond
    * ~4 epochs repeats are nearly free of new signal. Given an equal
    * per-source split of `budgetTokens`, reports per source the
    * repeat count the budget forces and the EFFECTIVE tokens it
    * actually buys — the number a mixture planner (q130/q71) should
    * budget with instead of raw token counts. R = 0 (enough unique
    * data) → D' = allocated exactly; efficiency = D'/allocated.
    *
    * Scale shape: one map-side-combined pass to per-source token
    * totals (|sources| rows), then row-local arithmetic — the one
    * exp() per source rounds at 6 dp (single closed-form call, both
    * engines' libm agree at that grid). Returns one row per source:
    * (source, unique_tokens, budget_tokens, repeats, effective_tokens,
    * efficiency), 6 dp. */
  def dataConstrainedForecast(docs: DataFrame, source: Column,
      nTokens: Column, budgetTokens: Long, rStar: Double = 15.0)
      : DataFrame = {
    require(budgetTokens > 0 && rStar > 0.0,
      s"dataConstrainedForecast: budget=$budgetTokens rStar=$rStar")
    val per = docs.select(source.as("source"),
        nTokens.cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("u"))
    val nSrc = org.apache.spark.sql.functions.broadcast(
      per.agg(count(lit(1)).as("k")))
    val uD = col("u").cast("double")
    val alloc = lit(budgetTokens.toDouble) / col("k").cast("double")
    val r = greatest(lit(0.0), alloc / uD - lit(1.0))
    val dEff = when(col("u") > 0L,
      least(uD + uD * lit(rStar) * (lit(1.0) - exp(-r / lit(rStar))),
        alloc))
    per.crossJoin(nSrc)
      .select(col("source"), col("u").as("unique_tokens"),
        round(alloc, 6).as("budget_tokens"),
        round(when(col("u") > 0L, r), 6).as("repeats"),
        round(dEff, 6).as("effective_tokens"),
        round(dEff / alloc, 6).as("efficiency"))
  }

  /** Theil T inequality index of a size measure, decomposed by group
    * (Theil 1967; Shorrocks 1980 on why Theil and not Gini: T is the
    * ONE standard index that decomposes ADDITIVELY,
    * T = T_between + T_within) — for a corpus-token budget: is the
    * imbalance a few giant SOURCES (between — fix the mixture) or
    * giant docs inside each source (within — fix per-doc caps)?
    * q105's Gini says only "how unequal".
    *
    *   T        = (1/N)·Σ_i (x_i/μ)·ln(x_i/μ)
    *   T_between= Σ_g (X_g/X)·ln((X_g/X)/(N_g/N))
    *   T_within = Σ_g (X_g/X)·T_g
    *
    * Exactness: all counts and size sums are exact longs, so every
    * μ and share is an IEEE-identical ratio; per-element entropy
    * terms snap at 1e9 (the q104 entropy convention; x = 0
    * contributes 0 by the x·ln x convention); the group layer is
    * |groups|-sized exact arithmetic. The additive identity holds to
    * snap resolution and is spec-asserted.
    *
    * Scale shape: ONE map-side-combined corpus pass to per-group
    * (N_g, X_g) plus one snapped per-group term sum over the same
    * pass's rows; the decomposition is |groups|-row arithmetic with
    * the totals as a one-row broadcast. Returns one row: (n, n_groups,
    * theil_total, theil_between, theil_within, between_share). */
  def theilDecomposition(df: DataFrame, grp: Column, x: Column)
      : DataFrame = {
    import graft.expr.Snap
    val b = df.select(grp.as("g"), x.cast("long").as("x"))
    val per = b.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("xg"))
    val tot = per.agg(sum(col("ng")).as("n"), sum(col("xg")).as("xt"),
      count(lit(1)).as("k"))
    val nD = col("n").cast("double"); val xD = col("xt").cast("double")
    val mu = xD / nD
    // per-element terms against the GLOBAL mean (total) and the GROUP
    // mean (within) in one pass over the corpus rows
    val wj = b.join(broadcast(per), "g").crossJoin(broadcast(tot))
    val xE = col("x").cast("double")
    val muG = col("xg").cast("double") / col("ng").cast("double")
    val terms = wj.groupBy(col("g"))
      .agg(Snap.snappedSum(when(col("x") > 0L,
          xE / mu * log(xE / mu)).otherwise(lit(0.0)), 1e9).as("tg"),
        Snap.snappedSum(when(col("x") > 0L,
          xE / muG * log(xE / muG)).otherwise(lit(0.0)), 1e9).as("tw"))
    val dec = per.join(terms, "g").crossJoin(broadcast(tot))
      .select(
        Snap.snappedSum(col("tg") / nD, 1e9).as("t_total"),
        Snap.snappedSum(when(col("xg") > 0L,
          col("xg").cast("double") / xD *
            log((col("xg").cast("double") / xD) /
              (col("ng").cast("double") / nD))).otherwise(lit(0.0)), 1e9)
          .as("t_between"),
        Snap.snappedSum(col("xg").cast("double") / xD *
          (col("tw") / col("ng").cast("double")), 1e9).as("t_within"),
        max(col("n")).as("n"), max(col("k")).as("k"))
    dec.select(col("n"), col("k").as("n_groups"),
      round(col("t_total"), 6).as("theil_total"),
      round(col("t_between"), 6).as("theil_between"),
      round(col("t_within"), 6).as("theil_within"),
      round(when(col("t_total") > 0.0, col("t_between") / col("t_total")),
        6).as("between_share"))
  }
  /** A-ES weighted sampling WITHOUT replacement (Efraimidis &
    * Spirtakis 2006, "Weighted random sampling with a reservoir"): per
    * group keep the `k` items with the largest key u^(1/w) — the
    * classic one-pass weighted reservoir, here with the repo's
    * md5-deterministic uniform u = (h + 1)/(2^32 + 1) (h = the first
    * 32 digest bits of the id) so the SAMPLE IS A PURE FUNCTION of the
    * ids: any engine draws the identical sample, reruns are idempotent,
    * and the oracle replays the draw. The complement to
    * [[weightedSample]]'s Bernoulli form: exact-k per group, inclusion
    * probability ∝ weight.
    *
    * Ranking uses the monotone-equivalent key ln(u)/w (no pow), SNAPPED
    * to 6 dp before the rank with id tie-break — the rank never hinges
    * on a final-ulp ln() disagreement between engines. Items with
    * non-positive weight are excluded (stated; a zero-weight item has
    * zero inclusion probability in the scheme's limit anyway).
    *
    * Scale shape: one projection + ONE per-group rank window
    * (WindowGroupLimit keeps a k-row heap per group per task — the
    * |corpus| never sorts globally). */
  def aesSample(df: DataFrame, grp: Column, id: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, s"aesSample: k=$k")
    val u = (graft.expr.Similarity.md5PrefixLong(id.cast("string"), 8).cast("double") + lit(1.0)) / lit(4294967297.0)
    val key = floor(log(u) / weight.cast("double") * lit(1e6) + lit(0.5)) /
      lit(1e6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("key").desc, col("id"))
    df.select(grp.as("grp"), id.as("id"),
        weight.cast("double").as("weight"), key.as("key"))
      .filter(col("weight") > 0.0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("grp"), col("id"), col("weight"), col("key"),
        col("rank").cast("long").as("rank"))
  }

}
