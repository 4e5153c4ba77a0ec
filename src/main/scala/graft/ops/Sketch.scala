package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch in pure relational form: the sketch matrix is
  * `depth` tiny (bucket, count) tables — built with one map-side-combined
  * aggregation each — and a point estimate is the min over depth of the
  * item's bucket counts. Deterministic md5 bucketing (no seeds/RNG), so
  * estimates are identical across engines, runs, and retries.
  *
  * Why not `functions.count_min_sketch`: its result is an opaque binary
  * blob queryable only driver-side after deserialization. This form
  * keeps the whole structure in the plan: the matrix is data
  * (depth × width rows — broadcastable by construction), estimates are
  * joins, and merging two sketches is `union → sum by (row, bucket)` —
  * the mergeability that matters for 100 TB partial aggregation.
  *
  * CM guarantee asserted by spec and oracle: estimate ≥ true count
  * always; overestimate bounded by collisions in the narrowest row.
  */
object Sketch {

  /** One source of truth for the histogram bin count: [[histBins]] and
    * [[histQuantiles]] must agree on it or quantile edges are wrong —
    * callers overriding one MUST override the other identically. */
  val DefaultHistBins = 128


  /** Bucket of `item` for sketch row `i`: first 8 md5 hex chars of
    * "i|item" mod width — the same shared-vocabulary hashing as
    * [[Sampling.hashBucket]]/minhash (portable to any engine with md5). */
  def cmBucket(i: Int, item: Column, width: Int): Column =
    pmod(graft.expr.Similarity.md5PrefixLong(concat_ws("|", lit(i), item), 8), lit(width.toLong))

  /** The sketch matrix: (row, bucket, cnt) — ONE scan of the item
    * stream: each item explodes to its `depth` (row, bucket) cells
    * in-task and ONE (row, bucket)-keyed aggregation combines them
    * map-side (≤ depth·width combined rows per task). The former
    * per-row union planned `depth` separate scans + shuffles of the
    * corpus — 3× the I/O for the same cells (q96's whole constant
    * factor at depth 3).
    * `weight` lets a pre-aggregated (item, count) table stand in for
    * the raw item stream — the matrix is identical (cells sum the
    * weights) and the corpus never re-explodes. */
  def countMinMatrix(items: DataFrame, item: Column, depth: Int,
      width: Int, weight: Column = lit(1L)): DataFrame =
    items.select(item.as("it"), weight.as("w"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col("it"), col("w"))
      .groupBy(col("row"),
        pmod(graft.expr.Similarity.md5PrefixLong(concat_ws("|", col("row"), col("it")), 8), lit(width.toLong)).as("bucket"))
      .agg(sum(col("w")).as("cnt"))
      .select(col("row"), col("bucket"), col("cnt"))

  /** Bloom filter in the same relational style: the filter is the
    * DISTINCT set of set-bit indices (≤ `bits` rows — broadcastable),
    * built with one explode + distinct over the build side's keys.
    * Membership = all `k` of an item's bit positions present —
    * chained broadcast left-semi joins. No false negatives by
    * construction; false-positive rate set by bits/keys/k. The
    * relational form of runtime bloom-filter join pruning: ship the
    * tiny bit set to the probe side, drop rows early, verify with the
    * real join. */
  def bloomBits(build: DataFrame, item: Column, bits: Int, k: Int): DataFrame =
    build.select(explode(array((0 until k).map(i =>
        cmBucket(i, item, bits)): _*)).as("bit"))
      .distinct()

  /** Probe-side pruning: keep rows whose `k` bit positions are ALL set.
    * `bitsDf` must be the matching [[bloomBits]] output. */
  def bloomPrune(probe: DataFrame, item: Column, bitsDf: DataFrame,
      bits: Int, k: Int): DataFrame =
    (0 until k).foldLeft(probe) { (df, i) =>
      df.join(broadcast(bitsDf),
        cmBucket(i, item, bits) === col("bit"), "left_semi")
    }

  /** The same bloom filter packed into ONE row holding `bits/64` longs —
    * the broadcast-scalar form of [[bloomBits]]: membership becomes a
    * codegen'd bitwise test against a single broadcast row instead of
    * `k` semi-joins (k× fewer join operators, and the build subplan
    * executes once, not per join). Identical set-bit positions. */
  def bloomMask(build: DataFrame, item: Column, bits: Int, k: Int): DataFrame = {
    require(bits % 64 == 0, s"bloomMask: bits=$bits must be a multiple of 64")
    val words = bloomBits(build, item, bits, k)
      .groupBy((col("bit") / 64).cast("int").as("word"))
      .agg(call_function("bit_or",
        call_function("shiftleft", lit(1L), (col("bit") % 64).cast("int")))
        .as("w"))
    // dense word array (absent word = 0), one row total
    words
      .agg(map_from_arrays(collect_list(col("word")), collect_list(col("w")))
        .as("m"))
      .select(transform(sequence(lit(1), lit(bits / 64)),
        i => coalesce(element_at(col("m"), i - 1), lit(0L))).as("mask"))
  }

  /** [[bloomPrune]] against a [[bloomMask]] single-row filter: the mask
    * broadcasts once and the whole k-probe membership test stays inside
    * one codegen'd filter — no joins on the probe path at all. */
  def bloomPruneMask(probe: DataFrame, item: Column, maskDf: DataFrame,
      bits: Int, k: Int): DataFrame = {
    val pred = (0 until k).map { i =>
      val b = cmBucket(i, item, bits)
      element_at(col("__mask"), (b / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (b % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)
    probe.crossJoin(broadcast(maskDf.select(col("mask").as("__mask"))))
      .filter(pred)
      .drop("__mask")
  }

  /** HyperLogLog in the same relational style: per group the sketch is
    * ≤ `m` (bucket, reg) rows — one map-side-combined `max` aggregation
    * over the item stream. Merging shard sketches is
    * `union → max by (group, bucket)`; the registers, not an opaque
    * blob, travel through the plan, so 100 TB partials combine without
    * re-scanning. Deterministic md5 hashing (Flajolet et al. 2007
    * register rule: bucket = low `b` hash bits, reg = 1 + leading
    * zeros of the remaining 32−b bits), so registers — and therefore
    * estimates — are bit-identical across engines, runs, and retries.
    */
  def hllRegisters(items: DataFrame, groupCols: Seq[String], item: Column,
      b: Int = 6): DataFrame = {
    val bits = 32 - b
    val h = graft.expr.Similarity.md5PrefixLong(item.cast("string"), 8)
    // NULLs are not values: count-distinct semantics ignore them (a null
    // would otherwise form a 65th null-bucket register and skew `zeros`)
    val nonNull = items.filter(item.isNotNull)
    val bucket = h.bitwiseAND(lit((1L << b) - 1))
    val w = shiftright(h, b)
    // length(bin(w)) = floor(log2 w)+1 via strings — exact, no float log
    val rho = when(w > 0, lit(bits + 1) - length(bin(w)))
      .otherwise(lit(bits + 1))
    nonNull.groupBy((groupCols.map(col) :+ bucket.as("bucket")): _*)
      .agg(max(rho).cast("long").as("reg"))
  }

  /** Cardinality estimate per group from a [[hllRegisters]] matrix:
    * harmonic mean of 2^-reg with empty buckets at 2^0, linear-counting
    * fallback for the small-range regime. All-dyadic running sums (the
    * 2^-reg terms span < 53 bits), so the double arithmetic is exact
    * and order-free — the estimate is reproducible to the last bit.
    * `reg_checksum` = Σ bucket·reg: an exact integer fingerprint of the
    * whole register matrix, a stronger equality witness than the
    * estimate itself. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
      b: Int = 6): DataFrame = {
    val m = 1 << b
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    val agg = registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(pow(lit(2.0), -col("reg"))).as("sp"),
        sum(col("bucket") * col("reg")).cast("long").as("reg_checksum"))
    val zeros = lit(m) - col("n_buckets")
    val raw = lit(alpha * m * m) / (col("sp") + zeros.cast("double"))
    agg.select((groupCols.map(col) :+ col("n_buckets") :+ col("reg_checksum") :+
      round(when(raw <= 2.5 * m && zeros > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
        .otherwise(raw), 3).as("est_distinct")): _*)
  }

  /** Per-group value stats for [[histBins]]: (group…, lo, hi, n). The
    * first pass of the two-pass histogram — bin EDGES must be shared
    * before shard binning, or shard histograms would not be mergeable. */
  def histStats(items: DataFrame, groupCols: Seq[String],
      v: Column): DataFrame =
    items.filter(v.isNotNull).groupBy(groupCols.map(col): _*)
      .agg(min(v).as("lo"), max(v).as("hi"), count(lit(1)).as("n"))

  /** Equi-width histogram completing the sketch family (Count-Min =
    * frequency, Bloom = membership, HLL = cardinality, histogram =
    * quantiles): per group ≤ `bins` (bin, cnt) rows from one map-side-
    * combined aggregation. Shards binned against the same `stats`
    * edges merge by `union → sum by (group, bin)` — no re-scan. All
    * edge arithmetic is plain double ops evaluated identically in any
    * engine. */
  def histBins(items: DataFrame, groupCols: Seq[String], v: Column,
      stats: DataFrame, bins: Int = DefaultHistBins): DataFrame = {
    val scaled = (v - col("lo")) * bins / (col("hi") - col("lo"))
    val bin = when(col("hi") > col("lo"),
      least(floor(scaled), lit(bins - 1))).otherwise(lit(0))
      .cast("long").as("bin")
    items.filter(v.isNotNull)
      .join(broadcast(stats), groupCols)
      .groupBy((groupCols.map(col) :+ bin): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a [[histBins]] matrix: smallest bin whose
    * cumulative count reaches q·n, mapped to the bin's upper edge. One
    * tiny window pass (≤ bins rows per group) + one aggregation. */
  def histQuantiles(binsDf: DataFrame, groupCols: Seq[String],
      stats: DataFrame, qs: Seq[(String, Double)],
      bins: Int = DefaultHistBins): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
    val cum = binsDf.withColumn("cum", sum(col("cnt")).over(w))
      .join(broadcast(stats), groupCols)
    val picks = qs.map { case (name, q) =>
      min(when(col("cum") >= lit(q) * col("n"), col("bin"))).as(s"__$name")
    }
    val outCols = groupCols.map(col) ++ Seq(col("n")) ++
      qs.map { case (name, _) =>
        round(col("lo") + (col(s"__$name") + 1) * (col("hi") - col("lo")) / bins, 4)
          .as(name)
      }
    cum.groupBy((groupCols.map(col) :+ col("n") :+ col("lo") :+ col("hi")): _*)
      .agg(picks.head, picks.tail: _*)
      .select(outCols: _*)
  }

  /** Equi-join cardinality estimate from two [[countMinMatrix]] sketches
    * over the two join keys: the CM inner-product bound (Cormode &
    * Muthukrishnan §4.3) — per sketch row, Σ_bucket cnt₁·cnt₂ upper-
    * bounds Σ_key n₁(k)·n₂(k) (the true join size), and the min over
    * rows tightens it. This is what a cost model wants BEFORE running a
    * 100 TB join: both inputs reduce to depth×width matrices
    * independently (map-side combined, mergeable by cell sum), the
    * estimate itself joins two sketch-sized tables. Products run as
    * decimals — two petabyte-scale counts multiply past long range. */
  def cmJoinSize(m1: DataFrame, m2: DataFrame): DataFrame =
    m1.select(col("row"), col("bucket"), col("cnt").as("c1"))
      .join(m2.select(col("row"), col("bucket"), col("cnt").as("c2")),
        Seq("row", "bucket"))
      .groupBy(col("row"))
      .agg(sum(col("c1").cast("decimal(19,0)") *
        col("c2").cast("decimal(19,0)")).as("dot"))
      .agg(min(col("dot")).cast("decimal(38,0)").as("est_join_size"))

  /** Point estimates for each distinct item in `queries(itemCol)`:
    * min over rows of the item's bucket count. The matrix is
    * depth × width rows → broadcast joins. */
  def countMinEstimate(queries: DataFrame, item: Column,
      matrix: DataFrame, depth: Int, width: Int): DataFrame = {
    val withEst = (0 until depth).foldLeft(
        queries.withColumn("__est", lit(Long.MaxValue))) { (df, i) =>
      df.join(broadcast(matrix.filter(col("row") === i)
          .select(col("bucket").as(s"__b$i"), col("cnt").as(s"__c$i"))),
          cmBucket(i, item, width) === col(s"__b$i"), "left")
        .withColumn("__est", least(col("__est"), coalesce(col(s"__c$i"), lit(0L))))
        .drop(s"__b$i", s"__c$i")
    }
    withEst.withColumnRenamed("__est", "cm_est")
  }

  /** KMV (k minimum values) distinct sketch per group — the theta-
    * sketch family's simplest member (Bar-Yossef et al. 2002; Beyer et
    * al. "Distinct-Value Synopses" 2007), next to the HLL register
    * table (q68): keep the k SMALLEST 60-bit md5 hashes of the keys;
    * if the kth smallest maps to fraction R of the hash space, about
    * k/R distinct keys exist — est = (k−1)·2⁶⁰/h_k (the unbiased
    * form). Unlike HLL, the sketch supports SET OPERATIONS by
    * construction: the union sketch is the k smallest of the merged
    * hash sets (spec-pinned mergeability), which is why theta sketches
    * are the audience-overlap tool. Emits one row per group plus the
    * `__union` row over all groups; a group with fewer than k distinct
    * hashes reports its EXACT count (the sketch is lossless below k).
    *
    * Deterministic: md5-derived hashes (no seeds), integer ranks, one
    * double division at the end. Scale shape: one distinct-aggregation
    * shuffle of (group, hash) rows, then the rank ≤ k filter plans as
    * WindowGroupLimit (partial per-partition top-k — a group never
    * ships more than k·partitions hashes); the exact count is an
    * audit column this synthetic gate can afford, not part of the
    * sketch contract. */
  def kmvDistinct(df: DataFrame, grp: Column, key: Column, k: Int = 64,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = graft.expr.Similarity.md5PrefixLong(key.cast("string"), 15)
    val d = materialize(Fanout.fanout(df)
      .select(grp.as("grp"), h.as("h")).distinct())
    // the union row is an IN-BAND sentinel (part of the output
    // contract); a genuine "__union" group would silently merge into
    // it and double-count in n_exact — fail loudly instead. Cheap:
    // `d` is already materialized, this is a checkpoint re-scan.
    require(d.filter(col("grp") === "__union").limit(1).isEmpty,
      "kmvDistinct: input contains the reserved group label '__union'")
    val all = d.unionByName(
      d.select(lit("__union").as("grp"), col("h")).distinct())
    val topk = all
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .groupBy(col("grp"))
      .agg(max(when(col("rn") === k, col("h"))).as("kth"))
    val cnt = all.groupBy(col("grp")).agg(count(lit(1)).as("n_exact"))
    cnt.join(topk, "grp")
      .select(col("grp"), col("n_exact"), col("kth"),
        when(col("kth").isNotNull,
          round(lit((k - 1).toDouble * 1152921504606846976.0) /
            col("kth").cast("double"), 4))
          .otherwise(col("n_exact").cast("double")).as("est"))
  }

  /** Theta-sketch intersection estimate between two key sets (the
    * audience-overlap question [[kmvDistinct]]'s union mergeability
    * exists to answer — Dasgupta, Lang, Rhodes & Thaler, "Theta
    * Sketches" / the DataSketches intersection rule): θ = the union
    * sketch's k-th smallest normalized hash; every retained hash
    * < θ·2⁶⁰ present in BOTH sets is an intersection sample, and
    *   est∩ = |samples| / θ = |samples| · 2⁶⁰ / h_k.
    * Also reports est∪ (the [[kmvDistinct]] unbiased form) and the
    * derived Jaccard estimate. Fewer than k distinct union hashes →
    * the sketch is lossless: exact counts, est = exact.
    *
    * Deterministic: md5-derived 60-bit hashes, integer ranks and
    * counts, double division only at the end. Scale shape: one
    * distinct-aggregation shuffle of (hash, inA, inB) rows (the
    * membership flags OR-combine map-side), the rank ≤ k filter plans
    * as WindowGroupLimit, and the retained-sample count is a filter
    * over the ≤ k-row sketch — never a join of the raw sets. Returns
    * one row: (n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
    * est_union, est_inter, jaccard_est). */
  def kmvIntersect(dfA: DataFrame, keyA: Column, dfB: DataFrame,
      keyB: Column, k: Int = 64,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"kmvIntersect: k=$k")
    def h(key: Column): Column =
      graft.expr.Similarity.md5PrefixLong(key.cast("string"), 15)
    val a = Fanout.fanout(dfA).select(h(keyA).as("h"),
      lit(true).as("ia"), lit(false).as("ib"))
    val b = Fanout.fanout(dfB).select(h(keyB).as("h"),
      lit(false).as("ia"), lit(true).as("ib"))
    // one distinct-agg shuffle: membership flags OR-combine map-side
    val d = materialize(a.unionByName(b).groupBy(col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib")))
    // global k-smallest via orderBy.limit = TakeOrderedAndProject (a
    // k-row heap per task + driver merge — the q118 contract; an
    // unpartitioned rank window would funnel the whole distinct-key
    // table to one task, and InferWindowGroupLimit does not fire on
    // empty partitionSpec). The ≤ k-row result then ranks trivially.
    val sk = d.orderBy(col("h")).limit(k)
      .withColumn("rn", row_number().over(Window.orderBy(col("h"))))
    val stats = sk.agg(
      max(when(col("rn") === k, col("h"))).as("kth"),
      // intersection samples STRICTLY below the k-th hash: h_k itself
      // is the θ boundary, not a sample (the DataSketches convention)
      sum(when(col("ia") && col("ib") &&
        (col("rn") < k), 1L).otherwise(0L)).as("c_both"))
    val ex = d.agg(
      sum(when(col("ia"), 1L).otherwise(0L)).as("n_a_exact"),
      sum(when(col("ib"), 1L).otherwise(0L)).as("n_b_exact"),
      count(lit(1)).as("n_union_exact"),
      sum(when(col("ia") && col("ib"), 1L).otherwise(0L))
        .as("n_inter_exact"))
    val two60 = 1152921504606846976.0
    val estU = when(col("kth").isNotNull,
        round(lit((k - 1).toDouble * two60) / col("kth").cast("double"), 4))
      .otherwise(col("n_union_exact").cast("double"))
    val estI = when(col("kth").isNotNull,
        round(col("c_both").cast("double") * lit(two60) /
          col("kth").cast("double"), 4))
      .otherwise(col("n_inter_exact").cast("double"))
    ex.crossJoin(broadcast(stats))
      .select(col("n_a_exact"), col("n_b_exact"), col("n_union_exact"),
        col("n_inter_exact"), estU.as("est_union"), estI.as("est_inter"),
        when(estU > 0.0, round(estI / estU, 6)).as("jaccard_est"))
  }

  /** Count-Min point-estimate error calibration (Cormode &
    * Muthukrishnan 2005 Theorem 1: err ≤ (e/w)·N with probability
    * ≥ 1 − e^(−d) per query) — the q316 audit story pointed at the
    * OTHER workhorse sketch: q61's heavy hitters and q96's join-size
    * estimate read CM cells as counts; this measures the realized
    * over-estimation against the exact truth table and reports how
    * often the analytic (e/w)·N bound held. Over-estimation only —
    * a negative error here would falsify the sketch itself (the spec
    * asserts err ≥ 0 structurally).
    *
    * Determinism: cells and truth are exact longs off the shared md5
    * bucket arithmetic; the e and e^(−d) constants enter as their
    * closest-double literals in both engines; mean error is an
    * exact-integer ratio. Scale: the matrix is (d × w) rows; the
    * estimate join fans the DISTINCT item table ×d against the
    * w-bounded cells — never the raw stream. Returns one row:
    * (n_items, n_total, mean_err, max_err, eps_bound, n_over_bound,
    * frac_over, bound_prob, guarantee_met). */
  def cmErrorCalibration(items: DataFrame, item: Column, depth: Int,
      width: Int,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(depth > 0 && width > 0,
      s"cmErrorCalibration: depth=$depth width=$width")
    val b = items.select(item.as("it"))
    val truth = materialize(b.groupBy(col("it"))
      .agg(count(lit(1)).as("tc")))
    val cm = countMinMatrix(b, col("it"), depth, width)
    val est = (0 until depth).map { i =>
        truth.select(col("it"), lit(i).as("row"),
          cmBucket(i, col("it"), width).as("bucket"))
      }.reduce(_ unionByName _)
      .join(cm, Seq("row", "bucket"))
      .groupBy(col("it")).agg(min(col("cnt")).as("est"))
    val nTot = truth.agg(sum(col("tc")).as("n_total"))
    val e = lit(2.718281828459045)
    val bound = e / lit(width.toDouble) * col("n_total").cast("double")
    val joined = truth.join(est, "it")
      .select((col("est") - col("tc")).as("err"))
      .crossJoin(broadcast(nTot))
    val m = joined.agg(count(lit(1)).as("n_items"),
      max(col("n_total")).as("n_total"),
      sum(col("err")).as("serr"), max(col("err")).as("max_err"),
      sum(when(col("err").cast("double") > bound, 1L).otherwise(0L))
        .as("n_over_bound"))
    val frac = round(col("n_over_bound").cast("double") /
      col("n_items").cast("double"), 6)
    val bp = round(exp(lit(-depth.toDouble)), 6)
    m.select(col("n_items"), col("n_total"),
      round(col("serr").cast("double") / col("n_items").cast("double"), 6)
        .as("mean_err"),
      col("max_err"), round(bound, 6).as("eps_bound"),
      col("n_over_bound"), frac.as("frac_over"), bp.as("bound_prob"),
      (frac <= bp).as("guarantee_met"))
  }

  /** Bloom-filter false-positive-rate calibration (Bloom 1970; the
    * exact finite-m FPR form (1−(1−1/m)^{kn})^k per Bose et al. 2008's
    * analysis) — the AUDIT the sketch family owes its consumers: q62
    * prunes with a bloom filter and q158 gates decontamination on one;
    * this measures the realized FPR on a DISJOINT probe set against
    * the analytic prediction, so "the filter is the size the math
    * says" is a checked claim, not an assumption. Caller guarantees
    * probe ∩ build = ∅ (here by parity split) — every pass is a false
    * positive by construction.
    *
    * Determinism: membership is the exact md5 bucket arithmetic of
    * [[bloomBits]]; counts are exact longs; the analytic FPR is one
    * pow composition rounded at 6 dp. Scale: the filter is a
    * single-row broadcast mask; probing is a codegen'd bitwise test
    * (zero joins); three one-row aggregates. Returns one row:
    * (n_build, n_probe, n_false_pos, fpr_measured, fpr_theoretical,
    * ratio). */
  def bloomFprCalibration(build: DataFrame, buildItem: Column,
      probe: DataFrame, probeItem: Column, bits: Int, k: Int)
      : DataFrame = {
    require(bits > 0 && k > 0, s"bloomFprCalibration: bits=$bits k=$k")
    val bset = build.select(buildItem.as("it")).distinct()
    val mask = bloomMask(bset, col("it"), bits, k)
    val nb = bset.agg(count(lit(1)).as("n_build"))
    val pset = probe.select(probeItem.as("it")).distinct()
    val np = pset.agg(count(lit(1)).as("n_probe"))
    val fp = bloomPruneMask(pset, col("it"), mask, bits, k)
      .agg(count(lit(1)).as("n_false_pos"))
    val mD = lit(bits.toDouble)
    val theo = pow(lit(1.0) - pow(lit(1.0) - lit(1.0) / mD,
      lit(k.toDouble) * col("n_build").cast("double")), lit(k.toDouble))
    val meas = col("n_false_pos").cast("double") /
      col("n_probe").cast("double")
    val ok = col("n_probe") > 0L
    nb.crossJoin(np).crossJoin(fp)
      .select(col("n_build"), col("n_probe"), col("n_false_pos"),
        round(when(ok, meas), 6).as("fpr_measured"),
        round(theo, 6).as("fpr_theoretical"),
        round(when(ok && theo > 0.0, meas / theo), 6).as("ratio"))
  }
}
