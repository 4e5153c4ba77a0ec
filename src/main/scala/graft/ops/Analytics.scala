package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytical workload (Tableau layer,
  * /root/reference/README.md:257-282) plus the daily-aggregate extension
  * (README.md:361), generalized over (time, group, measure) columns.
  *
  * Float policy for oracle parity: sums are computed over DECIMAL casts
  * (exact, order-independent) and only converted to double at the end;
  * averages are exact-sum / exact-count division.
  */
object Analytics {

  /** Exact decimal sum of a double measure, emitted as double. */
  def decSum(c: Column, as: String): Column =
    sum(c.cast("decimal(18,4)")).cast("double").as(as)

  /** Order-independent average: decimal sum / count, rounded. */
  def decAvg(c: Column, as: String, scale: Int = 4): Column =
    round(sum(c.cast("decimal(18,4)")).cast("double") / count(c), scale).as(as)

  /** A5: rate-over-time trend — avg of a 0/1 flag per time bucket. */
  def rateTrend(df: DataFrame, timeBucket: Column, flag: Column): DataFrame =
    df.groupBy(timeBucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum(flag).cast("double") / count(flag), 4).as("rate"))

  /** A6: average measure per group, sorted descending. */
  def avgByGroup(df: DataFrame, group: Column, measure: Column): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n"), decAvg(measure, "avg_measure"))

  /** A7/O1: top-k groups by a descending measure with deterministic
    * tie-break on the label. Plans as partial-agg → shuffle → TakeOrdered. */
  def topK(grouped: DataFrame, measure: Column, label: Column, k: Int): DataFrame =
    grouped.orderBy(measure.desc, label.asc).limit(k)

  /** A8/ST5: tumbling-window aggregate — the daily-materialization
    * extension (/root/reference/README.md:361) in its streaming-ready
    * form. `window()` keys partial aggregation map-side exactly like a
    * groupBy on the bucketed time, so the shuffle carries one row per
    * (partition, window): identical plan batch or streaming. */
  def tumblingAgg(df: DataFrame, ts: Column, width: String,
      measure: Column): DataFrame =
    df.groupBy(window(ts, width).as("w"))
      .agg(count(lit(1)).as("n"), decSum(measure, "sum_measure"))
      .select(col("w.start").as("window_start"), col("n"), col("sum_measure"))

  /** Sliding-window aggregate: width/slide, each row lands in
    * width/slide windows (the explode happens BEFORE partial agg, so the
    * shuffle still carries only per-window partials — no row blow-up
    * crosses the wire). */
  def slidingAgg(df: DataFrame, ts: Column, width: String, slide: String,
      measure: Column): DataFrame =
    df.groupBy(window(ts, width, slide).as("w"))
      .agg(count(lit(1)).as("n"), decSum(measure, "sum_measure"))
      .select(col("w.start").as("window_start"), col("n"), col("sum_measure"))

  /** Approx distinct (HLL++) with an in-plan accuracy check against the
    * exact count. HLL insertion is order/partitioning-independent →
    * deterministic; the oracle asserts `ok` (bounded relative error)
    * rather than the sketch value itself. */
  def approxDistinct(df: DataFrame, group: Column, key: Column,
      maxRelErr: Double = 0.15): DataFrame =
    df.groupBy(group.as("grp"))
      .agg(countDistinct(key).as("n_exact"),
        approx_count_distinct(key, 0.05).as("n_approx"))
      .select(col("grp"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") /
          col("n_exact") <= maxRelErr).as("ok"))

  /** Session windows via the built-in `session_window` (streaming-capable
    * twin of [[sessionize]]; state merges adjacent windows, watermark
    * closes them). */
  def sessionWindowAgg(df: DataFrame, user: Column, ts: Column,
      gap: String): DataFrame =
    df.groupBy(session_window(ts, gap).as("w"), user.as("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Winsorization: clamp `measure` to its per-group [`lo`, `hi`] exact
    * interpolated percentiles — the outlier-clipping step of a feature /
    * quality-score pipeline. Group bounds are ONE aggregation over the
    * data (group-count rows out), broadcast back; the corpus itself
    * passes through a single clamp projection and never shuffles. At
    * 100 TB swap `percentile` for `approx_percentile` in `boundsAgg`:
    * identical plan shape, sketch-sized (mergeable) partials instead of
    * a per-group value buffer. */
  def winsorize(df: DataFrame, group: Column, measure: Column,
      lo: Double, hi: Double): DataFrame = {
    val bounds = df.groupBy(group.as("__g"))
      .agg(percentile(measure, lit(lo)).as("__lo"),
        percentile(measure, lit(hi)).as("__hi"))
    df.join(broadcast(bounds), group <=> col("__g"))
      .withColumn("clamped",
        least(greatest(measure, col("__lo")), col("__hi")))
      .drop("__g", "__lo", "__hi")
  }

  /** Time-series gap fill: materialize every `1 day` bucket between each
    * key's first and last observation and carry the last value forward
    * into the empty buckets — the resample/ffill step that turns an
    * event stream into an equally-spaced series (the reference's daily
    * on-time trend has silent holes on empty days).
    *
    * `observed` must be one row per (key, day). Scale shape: the span
    * agg is map-side combined (one row per key); the calendar explode
    * emits key×span rows — bounded by the time horizon, not the event
    * count; the join back to observations shuffles on (key, day) once;
    * the carry-forward is one per-key window sort, same cost class as
    * sessionize. No driver loops, no global sort. */
  def gapFillDaily(observed: DataFrame, key: Column, day: Column,
      measure: Column): DataFrame = {
    val span = observed.groupBy(key.as("__k"))
      .agg(min(day).as("__min_d"), max(day).as("__max_d"))
    val cal = span.select(col("__k"),
      explode(sequence(col("__min_d"), col("__max_d"),
        expr("INTERVAL 1 DAY"))).as("__d"))
    val obs = observed.select(key.as("__ok"), day.as("__od"),
      measure.as("__m"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cal.join(obs, col("__k") === col("__ok") && col("__d") === col("__od"),
        "left")
      .select(col("__k").as("key"), col("__d").as("day"),
        last(col("__m"), ignoreNulls = true).over(w).as("filled"),
        col("__od").isNotNull.as("observed"))
  }

  /** Distribution drift between two corpus snapshots: per-stratum counts
    * and shares plus the stratum's add-one-smoothed KL(new‖old) term —
    * the composition monitor that catches a pipeline silently changing
    * its language/source mix. Two group-counts (map-side combined), one
    * strata-sized full-outer join, totals broadcast: the corpora
    * themselves shuffle nothing. Total drift = `sum(kl_term)`. */
  def distributionDrift(oldDf: DataFrame, newDf: DataFrame,
      stratum: Column): DataFrame = {
    val o = oldDf.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("n_old"))
    val n = newDf.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("n_new"))
    val joined = o.join(n, Seq("stratum"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    val tot = joined.agg(sum(col("n_old")).as("t_old"),
      sum(col("n_new")).as("t_new"), count(lit(1)).as("s"))
    val p = (col("n_old") + 1d) / (col("t_old") + col("s")) // Laplace
    val q = (col("n_new") + 1d) / (col("t_new") + col("s"))
    joined.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_old"), col("n_new"),
        round(col("n_old") / col("t_old"), 4).as("share_old"),
        round(col("n_new") / col("t_new"), 4).as("share_new"),
        round(q * log(q / p), 6).as("kl_term"))
  }

  /** Population Stability Index per group between an expected and an
    * actual snapshot of a SCORE distribution — the numeric complement
    * of [[distributionDrift]]'s categorical KL (the drift monitor a
    * scored admission pipeline runs on its own scores: PSI < 0.1 calm,
    * 0.1–0.25 watch, > 0.25 shifted, the standard credit-scoring
    * bands): 10 equal-width bins over the GLOBAL [min, max] of the
    * score, per-group smoothed shares on each side, and
    * psi = Σ_bins (p_e − p_a)·ln(p_e/p_a).
    *
    * Deterministic: bin edges derive from exact global min/max of the
    * (rounded-grid) score — no quantile estimation; add-half smoothing
    * ((c + 0.5)/(n + bins/2)) keeps every term finite INCLUDING
    * scaffolded empty bins (all groups carry all `bins` bins — a bin
    * empty on one side is exactly the signal PSI must charge for, not
    * a dropped row); each term snaps to the Snap 1e9 grid before the
    * order-free sum; psi rounds to 6 dp.
    *
    * Scale shape: ONE map-side-combined corpus pass into the
    * MATERIALIZED (group × side × score-grid) count table (the rankAuc
    * shape — the grid is bounded by the score's rounding, not |rows|);
    * global min/max, binning, the scaffold, and the terms all derive
    * from it, so the corpora never re-enter the plan (the q175
    * contract asserts zero parquet scans). A group present in only one
    * half gets psi = NULL (undefined — same convention as [[ksDrift]];
    * smoothing must not silently score it against uniform). Returns
    * (grp, n_expected, n_actual, psi). */
  def psiDrift(expected: DataFrame, actual: DataFrame, grp: Column,
      x: Column, bins: Int = 10,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(bins >= 2, s"psiDrift: bins=$bins")
    import graft.expr.Snap
    val e = expected.select(grp.as("grp"), x.cast("double").as("x"),
      lit("e").as("half"))
    val all = e.unionByName(actual.select(grp.as("grp"),
      x.cast("double").as("x"), lit("a").as("half")))
    // the ONLY corpus pass (the rankAuc shape): aggregate both sides to
    // the (group × side × score-grid)-bounded count table; min/max and
    // binning derive from it, so the corpora never re-enter the plan
    val cnt = materialize(all.groupBy(col("grp"), col("half"), col("x"))
      .agg(count(lit(1)).as("n")))
    val mm = cnt.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val binned = cnt.crossJoin(broadcast(mm))
      .select(col("grp"), col("half"), col("n"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(floor((col("x") - col("mn")) * lit(bins.toDouble) /
            (col("mx") - col("mn"))), lit(bins - 1L))).as("bin"))
    val ct = binned.groupBy(col("grp"), col("bin"))
      .agg(sum(when(col("half") === "e", col("n")).otherwise(0L)).as("ce"),
        sum(when(col("half") === "a", col("n")).otherwise(0L)).as("ca"))
    // scaffold: every group carries all bins, so empty-on-one-side AND
    // empty-on-both bins contribute their smoothed terms identically
    // in any engine
    val scaffold = ct.select(col("grp")).distinct()
      .crossJoin(broadcast(expected.sparkSession.range(bins)
        .select(col("id").as("bin"))))
    val fl = scaffold.join(ct, Seq("grp", "bin"), "left")
      .select(col("grp"), col("bin"),
        coalesce(col("ce"), lit(0L)).as("ce"),
        coalesce(col("ca"), lit(0L)).as("ca"))
    val tt = fl.groupBy(col("grp"))
      .agg(sum(col("ce")).as("te"), sum(col("ca")).as("ta"))
    val half = lit(bins * 0.5)
    val pe = (col("ce").cast("double") + lit(0.5)) /
      (col("te").cast("double") + half)
    val pa = (col("ca").cast("double") + lit(0.5)) /
      (col("ta").cast("double") + half)
    fl.join(tt, "grp")
      .select(col("grp"), col("te"), col("ta"),
        ((pe - pa) * log(pe / pa)).as("term"))
      .groupBy(col("grp"))
      // the ksDrift guard, mirrored: a group present in only ONE half
      // has no second distribution — smoothing would silently score it
      // against implicit-uniform, so PSI is undefined → NULL
      .agg(max(col("te")).as("n_expected"), max(col("ta")).as("n_actual"),
        when(max(col("te")) > 0L && max(col("ta")) > 0L,
          round(Snap.snappedSum(col("term"), 1e9), 6)).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group — the
    * distribution-free drift TEST next to [[psiDrift]]'s banded index:
    * D = max_x |ECDF_e(x) − ECDF_a(x)|, plus the sample-size-scaled
    * statistic √(n_e·n_a/(n_e+n_a))·D that the asymptotic K-S
    * significance bands read (≈1.36 at α=0.05). PSI says "how much
    * mass moved between bins"; D says "how far apart the CDFs ever
    * get" with no binning choice at all.
    *
    * Exactness: both ECDFs evaluate on the pooled DISTINCT-score grid
    * (D is attained there — between grid points both CDFs are flat);
    * cumulative counts are exact integers via a group-partitioned
    * running window over the grid-bounded count table (the q137/q168
    * bounded-distinct argument); each |diff| is two exact-integer
    * divisions; max is order-free. D and the scaled statistic round
    * to 6 dp.
    *
    * Scale shape: identical to [[psiDrift]] — ONE map-side-combined
    * corpus pass into the materialized (group × side × grid) count
    * table, then all work is grid-bounded and the running window is
    * PARTITIONED by group. Returns (grp, n_expected, n_actual, d,
    * scaled_d). */
  def ksDrift(expected: DataFrame, actual: DataFrame, grp: Column,
      x: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    val e = expected.select(grp.as("grp"), x.cast("double").as("x"),
      lit("e").as("half"))
    val all = e.unionByName(actual.select(grp.as("grp"),
      x.cast("double").as("x"), lit("a").as("half")))
    val cnt = materialize(all.groupBy(col("grp"), col("x"))
      .agg(sum(when(col("half") === "e", 1L).otherwise(0L)).as("ce"),
        sum(when(col("half") === "a", 1L).otherwise(0L)).as("ca")))
    ksFromGrid(cnt)
  }

  /** [[ksDrift]] from its (grp, x, ce, ca) value-grid sufficient
    * statistic — additive counts, the streaming monitor's state shape
    * ([[graft.stream.StreamCuration.startKsSink]]); same contract as
    * [[cvmFromGrid]]. */
  def ksFromGrid(cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy(col("grp"))
      .agg(sum(col("ce")).as("te"), sum(col("ca")).as("ta"))
    val w = Window.partitionBy(col("grp")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cnt.select(col("grp"),
        sum(col("ce")).over(w).as("cce"), sum(col("ca")).over(w).as("cca"))
      .join(broadcast(tot), "grp")
      // a group present in only ONE half has no second ECDF: 0/0 would
      // be IEEE NaN, not a statistic — guard to NULL (D is undefined)
      .select(col("grp"), col("te"), col("ta"),
        when(col("te") > 0L && col("ta") > 0L,
          abs(col("cce").cast("double") / col("te").cast("double") -
            col("cca").cast("double") / col("ta").cast("double"))).as("dx"))
      .groupBy(col("grp"))
      .agg(max(col("te")).as("n_expected"), max(col("ta")).as("n_actual"),
        round(max(col("dx")), 6).as("d"))
      .select(col("grp"), col("n_expected"), col("n_actual"), col("d"),
        round(sqrt(col("n_expected").cast("double") *
            col("n_actual").cast("double") /
            (col("n_expected") + col("n_actual")).cast("double")) *
          col("d"), 6).as("scaled_d"))
  }

  /** Quantile-shift profile between two score snapshots per group —
    * the drift MAGNITUDE readout next to [[ksDrift]]'s max-distance
    * test and [[psiDrift]]'s banded index: at each decile p, the exact
    * type-1 quantile of both sides and their difference — WHERE in the
    * distribution the shift lives (a tail-only regression and a bulk
    * shift have the same KS D but opposite fixes). Quantiles are
    * value-at-rank-⌈p·n⌉ via cumulative windows over the per-(group,
    * side) DISTINCT-value grid (the q137/q240 bounded-distinct
    * discipline — no estimator); the decile axis is a broadcast 9-row
    * frame. Groups present on one side only drop (no second
    * distribution — the ksDrift convention, via the inner join).
    * Returns (grp, pct, q_expected, q_actual, shift). */
  def quantileShift(expected: DataFrame, actual: DataFrame, grp: Column,
      x: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    val all = expected.select(grp.as("grp"), x.cast("double").as("x"),
      lit("e").as("half"))
      .unionByName(actual.select(grp.as("grp"), x.cast("double").as("x"),
        lit("a").as("half")))
    // the ONLY corpus pass: the (grp × side × value-grid) count table
    val cnt = materialize(all.groupBy(col("grp"), col("half"), col("x"))
      .agg(count(lit(1)).as("n")))
    val run = Window.partitionBy(col("grp"), col("half")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col("grp"), col("half"))
    val cum = cnt.withColumn("cum", sum(col("n")).over(run))
      .withColumn("nt", sum(col("n")).over(tot))
    val deciles = broadcast(expected.sparkSession.range(1, 10)
      .select((col("id") * 10L).as("pct")))
    val q = cum.join(deciles,
        col("cum") >= ceil(col("nt").cast("double") *
          (col("pct").cast("double") / lit(100.0))))
      .groupBy(col("grp"), col("half"), col("pct"))
      .agg(min(col("x")).as("q"))
    q.filter(col("half") === "e")
      .select(col("grp"), col("pct"), col("q").as("q_expected"))
      .join(q.filter(col("half") === "a")
        .select(col("grp"), col("pct"), col("q").as("q_actual")),
        Seq("grp", "pct"))
      .select(col("grp"), col("pct"), col("q_expected"), col("q_actual"),
        round(col("q_actual") - col("q_expected"), 6).as("shift"))
  }

  /** Sessionization: split each user's event stream at gaps > `gapSec`,
    * aggregate per session. Integer microsecond arithmetic end-to-end
    * (exact, oracle-comparable). One shuffle on user, one window sort. */
  def sessionize(df: DataFrame, user: Column, ts: Column, id: Column,
      gapSec: Long): DataFrame = {
    // NTZ-safe: cast through LTZ under the UTC session so unix_micros
    // matches DuckDB's epoch_us on naive timestamps.
    def micros(c: Column) = unix_micros(c.cast("timestamp"))
    val w = Window.partitionBy(user).orderBy(ts, id)
    val prev = lag(micros(ts), 1).over(w)
    val isNew = when(prev.isNull ||
      micros(ts) - prev > gapSec * 1000000L, 1).otherwise(0)
    val sess = df
      .withColumn("__user", user)
      .withColumn("__new", isNew)
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    sess.groupBy(col("__user").as("user_id"), col("session_idx"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"),
        ((unix_micros(max(ts).cast("timestamp")) -
          unix_micros(min(ts).cast("timestamp"))) / lit(1000000L))
          .as("duration_sec"))
  }
  /** Reciprocal-rank fusion (Cormack et al.): combine two ranked
    * candidate lists into one — score(d) = Σ_lists 1/(c + rank_d), the
    * rank-only fusion that needs no score calibration between the lists
    * (the standard hybrid-retrieval merge: lexical list + semantic
    * list). Inputs carry (`idCol`, `rank`); a doc absent from a list
    * contributes 0 from it. Deterministic: the fused score is computed
    * from integer ranks by a fixed two-term expression, rounded to 6 dp
    * before the final order (ties broken by id) — bit-stable across
    * engines.
    *
    * Scale shape: the inputs are top-k LISTS (k-sized, not
    * corpus-sized) — the fusion join, scoring, and final sort all run
    * over ≤ 2k rows no matter the corpus behind the lists. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, c: Int,
      topK: Int): DataFrame = {
    require(c > 0 && topK > 0, s"rrfFuse: need c ($c), topK ($topK) > 0")
    val ra = a.select(col(idCol), col("rank").as("rank_a"))
    val rb = b.select(col(idCol), col("rank").as("rank_b"))
    ra.join(rb, Seq(idCol), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }

  /** Sample-ratio mismatch check per group (the A/B-test guardrail
    * that runs BEFORE q110's z-test is allowed to mean anything: a
    * nominal 50/50 assignment that lands 48/52 under a buggy bucketer
    * silently biases every downstream metric). For a two-cell 50/50
    * design the chi-square statistic collapses to the exact rational
    * `(n_a − n_b)² / (n_a + n_b)` — integer-derived, engine-exact —
    * flagged against the df=1 α=0.05 critical value (3.841). One
    * distinct pass over (group, unit, arm) + one group-sized rollup;
    * units with a NULL arm count in neither cell (both negated-when
    * branches miss), mirroring q110's cohort semantics. */
  def srmCheck(df: DataFrame, grp: Column, unit: Column, isA: Column,
      critical: Double = 3.841): DataFrame = {
    val u = df.select(grp.as("grp"), unit.as("u"), isA.as("a")).distinct()
    val c = u.groupBy(col("grp")).agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"))
    val chi = ((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
      .cast("double") / (col("n_a") + col("n_b")).cast("double")
    c.select(col("grp"), col("n_a"), col("n_b"),
      round(chi, 6).as("chi2"), (chi > lit(critical)).as("srm"))
  }

  /** A/B experiment sizing per group — the OTHER pre-test guardrail
    * next to [[srmCheck]]: given the observed baseline conversion
    * rate p̂, the per-arm sample size needed to detect an absolute
    * lift `delta` at two-sided level α and the given power, via the
    * standard two-proportion normal approximation
    * n = ⌈(z_α/2 + z_β)² · 2p̂(1−p̂) / δ²⌉. A unit converts if ANY of
    * its rows satisfies `converted` (exposure-level dupes collapse,
    * the q208 distinct-exposure semantics). The z literals are fixed
    * constants (1.96, 0.8416 ≈ 80% power), every input an exact
    * integer count, one fixed evaluation order — both engines replay
    * identical sizes. Two map-side-combined aggregations: exposures →
    * units → |groups| rows. */
  def abSampleSize(df: DataFrame, grp: Column, unit: Column,
      converted: Column, delta: Double = 0.02, zAlpha: Double = 1.96,
      zBeta: Double = 0.8416): DataFrame = {
    val u = df.select(grp.as("grp"), unit.as("u"), converted.as("cv"))
      .groupBy(col("grp"), col("u"))
      .agg(max(when(col("cv"), 1L).otherwise(0L)).as("c"))
    val c = u.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_units"), sum(col("c")).as("n_conv"))
    val p = col("n_conv").cast("double") / col("n_units").cast("double")
    val zz = (zAlpha + zBeta) * (zAlpha + zBeta) // driver double, = SQL literal fold
    c.select(col("grp"), col("n_units"), col("n_conv"),
      round(p, 6).as("p_hat"),
      ceil(lit(zz) * lit(2.0) * p * (lit(1.0) - p) /
        lit(delta * delta)).cast("long").as("n_per_arm"))
  }

  /** Two-sided normal p-value 2·(1 − Φ(|z|)) = erfc(|z|/√2) via the
    * Abramowitz & Stegun 7.1.26 rational approximation (|err| <
    * 1.5e-7, far below the 1e-6 grid results round to) — the
    * cluster-side p-value primitive that removes the SciPy driver
    * round-trip from every significance gate. Pure codegen arithmetic
    * (one exp, one fixed Horner nesting), so any engine replaying the
    * same expression reproduces identical bits. */
  def normalPValue2(z: Column): Column = {
    val y = abs(z) / lit(math.sqrt(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * y)
    // erfc(y) = t·(a1 + t·(a2 + t·(a3 + t·(a4 + t·a5))))·e^(−y²)
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) +
        t * lit(1.061405429)))))
    poly * exp(-(y * y))
  }

  /** Benjamini–Hochberg step-up FDR control over a table of test
    * p-values (Benjamini & Hochberg 1995) — the correction layer a
    * monitoring suite needs once it runs one z-test PER source/slice
    * every run: at 1 000 slices, α = 0.05 fires ~50 false alarms per
    * sweep; BH caps the EXPECTED false-discovery fraction at `q`
    * instead. Procedure: rank p ascending (group id breaks ties
    * deterministically), k* = max{i : p(i) ≤ i·q/m}, reject ranks
    * ≤ k*.
    *
    * The input is a per-test table — |tests| rows, one per slice, the
    * already-aggregated output of a corpus-sized pass — so the
    * single-partition rank window and the two scalar windows (m, k*)
    * are test-table-sized, never data-sized. Returns
    * (grp, p, rnk, reject). */
  def bhFdr(tests: DataFrame, grp: Column, p: Column,
      q: Double = 0.1, yekutieli: Boolean = false): DataFrame = {
    // NULLS LAST: an undefined test (NULL p) ranks after every real
    // p-value in ANY engine (Spark's ASC default is nulls-first,
    // DuckDB's is nulls-last — pin the portable order)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("p").asc_nulls_last, col("grp"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // Benjamini–Yekutieli 2001: divide every threshold by the harmonic
    // number c(m) = Σ_{i≤m} 1/i — valid under ARBITRARY dependence
    // between the tests (overlapping slices, shared denominators),
    // where plain BH assumes positive regression dependence. The
    // harmonic terms accumulate as 1e9-snapped decimals (order-free);
    // non-NULL rows rank exactly 1..m, so summing 1/rnk over them IS
    // c(m). c(m) = 1.0 for plain BH.
    val cm =
      if (!yekutieli) lit(1.0)
      else sum(when(col("p").isNotNull,
          floor(lit(1e9) / col("rnk").cast("double") + lit(0.5))
            .cast("decimal(38,0)"))).over(all)
        .cast("double") / lit(1e9)
    tests.select(grp.as("grp"), p.as("p"))
      .withColumn("rnk", row_number().over(w))
      // m = the number of ACTUAL tests (BH's m): NULL-p rows are
      // undefined tests, not evidence — counting them would deflate
      // every i·q/m threshold and make the procedure conservative
      .withColumn("m", count(col("p")).over(all))
      .withColumn("ok",
        col("p") <= col("rnk").cast("double") * lit(q) /
          (col("m").cast("double") * cm))
      .withColumn("kstar",
        coalesce(max(when(col("ok"), col("rnk"))).over(all), lit(0)))
      .select(col("grp"), col("p"), col("rnk"),
        (col("rnk") <= col("kstar")).as("reject"))
  }

  /** Corpus concentration datasheet over a weighted group share (the
    * "how dominated is the mix" panel a datasheet prints next to the
    * q83/q183 per-source breakdowns): exact Gini via the sorted-rank
    * identity G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n (integer numerators —
    * engine-exact), Herfindahl–Hirschman Σ share², Shannon entropy
    * −Σ share·ln share (both 1e9-snapped sums), and the top group's
    * share. Everything after the one map-side-combined weight rollup
    * is |groups|-sized: the rank window, the scalar windows, the
    * single-row aggregate. Returns one row:
    * (n_groups, total, gini, hhi, entropy, top_share). */
  def concentrationReport(df: DataFrame, grp: Column, weight: Column)
      : DataFrame = {
    import graft.expr.Snap
    val x = df.groupBy(grp.as("grp")).agg(sum(weight).as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("x"), col("grp"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val ranked = x.withColumn("i", row_number().over(w).cast("long"))
      .withColumn("tot", sum(col("x")).over(all))
    val share = col("x").cast("double") / col("tot").cast("double")
    val a = ranked.agg(count(lit(1)).as("n"), max(col("tot")).as("total"),
      sum(col("i") * col("x")).as("six"),
      Snap.snappedSum(share * share, 1e9).as("hhi"),
      Snap.snappedSum(-share * log(share), 1e9).as("ent"),
      max(share).as("top"))
    a.select(col("n").as("n_groups"), col("total"),
      round(col("six").cast("double") * lit(2.0) /
          (col("n").cast("double") * col("total").cast("double")) -
        (col("n") + lit(1L)).cast("double") / col("n").cast("double"), 6)
        .as("gini"),
      round(col("hhi"), 6).as("hhi"),
      round(col("ent"), 6).as("entropy"),
      round(col("top"), 6).as("top_share"))
  }

  /** One-sided upper CUSUM change detector (Page 1954) over a
    * per-(group, step) series — the sequential drift monitor that
    * catches SLOW rate creep a per-step z-test never sees (each step
    * looks fine; the accumulated excess doesn't). The textbook
    * recursion S_t = max(0, S_{t−1} + x_t − k) looks like a serial
    * fold, but the prefix identity S_t = C_t − min(0, min_{j≤t} C_j)
    * (C = running sum of x − k) turns it into two window functions —
    * fully parallel across groups, deterministic because a window
    * cumulative sum is an ordered left fold in any engine. Reference
    * k = μ·(1+slack), alarm at S > μ·hMult, both from the group's own
    * mean (exact rational). Returns one row per (grp, step):
    * (grp, step, x, cusum, alarm). */
  def cusumDrift(counts: DataFrame, grp: Column, step: Column, x: Column,
      slack: Double = 0.1, hMult: Double = 0.5,
      mu0: Option[Double] = None): DataFrame = {
    val g = Window.partitionBy(col("grp"))
    val run = Window.partitionBy(col("grp")).orderBy(col("step"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // mu0: an OFFLINE reference rate (the train-once/serve-many split
    // [[graft.stream.StreamCuration.startCusumSink]] monitors against);
    // None = self-calibrate on the series' own mean
    val base = counts.select(grp.as("grp"), step.as("step"), x.as("x"))
      .withColumn("mu", mu0.map(lit(_)).getOrElse(
        sum(col("x")).over(g).cast("double") /
          count(lit(1)).over(g).cast("double")))
    // the running sums stay on 1e9-snapped integers carried as
    // DECIMAL(38,0): a window engine is free to re-associate its
    // segment-tree partials (the q99 decimal-rolling-sum lesson),
    // which exact integer addition shrugs off — and decimal width
    // keeps a 1e9-rate × years series inside range (long caps ~9e18)
    val dI = floor((col("x").cast("double") -
      col("mu") * lit(1.0 + slack)) * lit(1e9) + lit(0.5))
      .cast("decimal(38,0)")
    val zero = lit(0).cast("decimal(38,0)")
    val s = base.withColumn("c", sum(dI).over(run))
      .withColumn("m", min(col("c")).over(run))
      .withColumn("s", col("c") - least(col("m"), zero))
    s.select(col("grp"), col("step"), col("x"),
      round(col("s").cast("double") / lit(1e9), 6).as("cusum"),
      (col("s").cast("double") / lit(1e9) > col("mu") * lit(hMult))
        .as("alarm"))
  }

  /** Ordered-funnel conversion (view → click → purchase …): a unit
    * reaches stage k when it has a stage-k event STRICTLY AFTER its
    * first stage-(k−1) arrival — the product-analytics operator whose
    * naive form (per-user event-list collect) doesn't distribute.
    * Here each stage is one conditional-min aggregation plus one
    * unit-keyed join against the previous stage's arrival table — all
    * shuffles on the unit key (co-partitioned chain), state per unit
    * is ONE timestamp per stage, never an event list. The per-stage
    * counts are a |stages|-row frame; rates derive via a lag window
    * there. Returns (stage_idx, stage, n_units, conv_prev,
    * conv_first). */
  def funnel(df: DataFrame, unit: Column, ts: Column, stage: Column,
      stages: Seq[String],
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    val arrivals = funnelArrivals(df, unit, ts, stage, stages, materialize)
    val counts = arrivals.zip(stages).zipWithIndex.map {
      case ((a, st), i) => a.agg(count(lit(1)).as("n_units"))
        .select(lit(i + 1L).as("stage_idx"), lit(st).as("stage"),
          col("n_units"))
    }.reduce(_.unionByName(_))
    val w = Window.orderBy(col("stage_idx")) // |stages|-row frame
    counts.withColumn("prev", lag(col("n_units"), 1).over(w))
      .withColumn("first", first(col("n_units")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("stage_idx"), col("stage"), col("n_units"),
        round(col("n_units").cast("double") / col("prev").cast("double"), 6)
          .as("conv_prev"),
        round(col("n_units").cast("double") / col("first").cast("double"), 6)
          .as("conv_first"))
  }

  /** The [[funnel]] arrival chain itself — one (u, t) min-arrival
    * table per stage, each materialized (two consumers: the next
    * stage's join and whatever the caller aggregates). Exposed so
    * [[funnelTimes]] (and any dwell-time analysis) reads the SAME
    * strictly-after semantics the count funnel reports. */
  def funnelArrivals(df: DataFrame, unit: Column, ts: Column,
      stage: Column, stages: Seq[String],
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel: no stages")
    val ev = df.select(unit.as("u"), ts.as("ts"), stage.as("st"))
    stages.tail.scanLeft(
      materialize(ev.filter(col("st") === stages.head).groupBy(col("u"))
        .agg(min(col("ts")).as("t")))) { (prev, st) =>
      materialize(ev.filter(col("st") === st)
        .join(prev.select(col("u"), col("t").as("tp")), "u")
        .filter(col("ts") > col("tp"))
        .groupBy(col("u")).agg(min(col("ts")).as("t")))
    }
  }

  /** Segmented funnel — the [[funnel]] counts split by a UNIT
    * attribute (the A/B readout: does arm B's funnel convert
    * differently?). The arrival chain is computed ONCE,
    * segment-agnostic (a unit's stage progression doesn't depend on
    * its segment), then each stage's arrivals join the unit→segment
    * map (one distinct pass over the corpus, unit-keyed equi-joins)
    * and roll up per (segment, stage); conversion windows run on the
    * (|segments|×|stages|)-row count frame. A unit with multiple
    * segment values takes the MIN (deterministic; honest inputs have
    * one). Returns (segment, stage_idx, stage, n_units, conv_prev,
    * conv_first). */
  def funnelBySegment(df: DataFrame, unit: Column, ts: Column,
      stage: Column, stages: Seq[String], segment: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    val arrivals = funnelArrivals(df, unit, ts, stage, stages, materialize)
    val segMap = materialize(df.select(unit.as("u"), segment.as("seg"))
      .groupBy(col("u")).agg(min(col("seg")).as("seg")))
    val counts = arrivals.zip(stages).zipWithIndex.map {
      case ((a, st), i) => a.join(segMap, "u")
        .groupBy(col("seg").as("segment"))
        .agg(count(lit(1)).as("n_units"))
        .select(col("segment"), lit(i + 1L).as("stage_idx"),
          lit(st).as("stage"), col("n_units"))
    }.reduce(_.unionByName(_))
    val w = Window.partitionBy(col("segment")).orderBy(col("stage_idx"))
    counts.withColumn("prev", lag(col("n_units"), 1).over(w))
      .withColumn("first", first(col("n_units")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("segment"), col("stage_idx"), col("stage"),
        col("n_units"),
        round(col("n_units").cast("double") / col("prev").cast("double"), 6)
          .as("conv_prev"),
        round(col("n_units").cast("double") / col("first").cast("double"), 6)
          .as("conv_first"))
  }

  /** Time-to-convert percentiles over the [[funnelArrivals]] chain —
    * the "HOW LONG does the funnel take" number next to q216's "how
    * many convert": for each stage k ≥ 2, exact type-1 quantiles of
    * (arrival_k − arrival_1) over the units completing stage k. `ts`
    * must be an integer time (e.g. unix micros — the sessionize
    * convention): every dwell is an exact integer, the quantile is the
    * value at rank ⌈q·n⌉ via a cumulative window over the per-stage
    * DISTINCT-dwell grid (the q137 bounded-distinct discipline — no
    * approx-percentile estimator), converted to seconds only at the
    * 3-dp output. Returns (stage_idx, stage, n_units, p50_sec,
    * p90_sec). */
  def funnelTimes(df: DataFrame, unit: Column, ts: Column, stage: Column,
      stages: Seq[String],
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(stages.size >= 2, "funnelTimes: need at least two stages")
    val arrivals = funnelArrivals(df, unit, ts, stage, stages, materialize)
    val first = arrivals.head.select(col("u"), col("t").as("t1"))
    arrivals.zip(stages).zipWithIndex.drop(1).map { case ((a, st), i) =>
      val d = a.join(first, "u")
        .select((col("t") - col("t1")).as("d"))
      val grid = d.groupBy(col("d")).agg(count(lit(1)).as("n"))
      val run = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = grid.withColumn("cum", sum(col("n")).over(run))
        .crossJoin(broadcast(grid.agg(sum(col("n")).as("nt"))))
      def q(p: Double) = min(when(col("cum") >=
        ceil(col("nt").cast("double") * lit(p)), col("d")))
      cum.agg(max(col("nt")).as("n_units"),
          q(0.5).as("q50"), q(0.9).as("q90"))
        .select(lit(i + 1L).as("stage_idx"), lit(st).as("stage"),
          col("n_units"),
          round(col("q50").cast("double") / lit(1e6), 3).as("p50_sec"),
          round(col("q90").cast("double") / lit(1e6), 3).as("p90_sec"))
    }.reduce(_.unionByName(_))
  }

  /** Mann–Whitney U rank-sum test per group (Mann & Whitney 1947) —
    * the nonparametric two-sample location test for "did arm B's value
    * distribution shift" when nothing says the metric is normal (the
    * parametric q110 z-test's robust sibling). Everything up to the
    * final z is EXACT integer arithmetic via the bounded-distinct
    * trick ([[q137]]'s percentile contract): counts per (group,
    * distinct value), tie-averaged ranks from a cumulative window over
    * the VALUE-GROUP table (never the raw rows), doubled rank sums so
    * the ½-steps stay integral (2·rankavg = 2·(cum−n) + n + 1), the
    * tie correction Σ(t³−t) likewise integral. Normal approximation
    * with tie-corrected variance, p via [[normalPValue2]]. Returns
    * (grp, n_a, n_b, u, z, p_value). */
  def mannWhitneyU(df: DataFrame, grp: Column, isA: Column, value: Column)
      : DataFrame = {
    val c = df.select(grp.as("grp"), value.as("v"), isA.as("a"))
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("nb"))
    val run = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val n = col("na") + col("nb")
    val r = c.withColumn("n", n).withColumn("cum", sum(n).over(run))
    val s = r.groupBy(col("grp")).agg(
      sum(col("na")).as("na_tot"), sum(col("nb")).as("nb_tot"),
      // Σ na · 2·rankavg, rankavg = (cum − n) + (n+1)/2 — the doubled
      // rank sum reaches ~2N² (past signed-64 at ~10⁹ rows/group):
      // exact DECIMAL(38,0) accumulation, the spearmanCorr discipline
      sum((col("na") * (lit(2L) * (col("cum") - col("n")) + col("n") +
        lit(1L))).cast("decimal(38,0)")).as("r2a"),
      sum((col("n") * col("n") * col("n") - col("n"))
        .cast("decimal(38,0)")).as("ties"))
    val naD = col("na_tot").cast("double")
    val nbD = col("nb_tot").cast("double")
    val nD = (col("na_tot") + col("nb_tot")).cast("double")
    val u2 = col("r2a") - col("na_tot").cast("decimal(38,0)") *
      (col("na_tot") + 1L) // = 2U, exact decimals end to end
    val variance = naD * nbD / lit(12.0) *
      ((nD + lit(1.0)) - col("ties").cast("double") /
        (nD * (nD - lit(1.0))))
    val z = (u2.cast("double") - naD * nbD) / lit(2.0) / sqrt(variance)
    // degenerate variance (one arm empty, or a single distinct value)
    // makes z undefined: NULL, not NaN/Inf — the theilSenTrend /
    // spearmanCorr / chi2Drift NULL-for-undefined convention
    val zDef = when(variance > lit(0.0), round(z, 4))
    s.select(col("grp"), col("na_tot").as("n_a"), col("nb_tot").as("n_b"),
      (u2.cast("double") / lit(2.0)).as("u"), zDef.as("z"),
      when(variance > lit(0.0), round(normalPValue2(z), 6)).as("p_value"))
  }

  /** EWMA control chart (Roberts 1959) over a per-(group, step) series —
    * the small-persistent-shift monitor between [[cusumDrift]]'s
    * accumulator and a raw per-step z-test: z_t = λ·x_t + (1−λ)·z_{t−1},
    * z_0 = μ, flagged outside μ ± L·σ·√(λ/(2−λ)·(1−(1−λ)^{2t})) (the
    * exact time-varying limits, not the asymptote — early steps get the
    * tighter band).
    *
    * The recursion unrolls to z_t = r^t·μ + λ·Σ_{j≤t} r^{t−j}·x_j
    * (r = 1−λ). Rather than a serial fold or an exploding cumsum of
    * x_j·r^{−j} (r^{−j} overflows past ~10³ steps), each z_t is its own
    * 1e9-snapped weighted sum over the step GRID: the corpus first
    * aggregates to the (grp, step)-bounded series (that part is the only
    * corpus pass — callers hand the already-bounded daily table), and the
    * triangular grid self-join is |steps|² per group — calendar-bounded,
    * independent of corpus size, embarrassingly parallel across groups.
    * μ and σ (sample) are the group's own exact-rational moments
    * (exact for the integer-valued series this monitors — counts; a
    * non-integer x would make the raw moment sums order-sensitive,
    * which the snapped z-sums never are).
    * Returns (grp, step, x, ewma, lcl, ucl, alarm), 6 dp. */
  def ewmaDrift(counts: DataFrame, grp: Column, step: Column, x: Column,
      lambda: Double = 0.2, lMult: Double = 3.0,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(lambda > 0 && lambda < 1, s"ewmaDrift: lambda=$lambda")
    import graft.expr.Snap
    val r = 1.0 - lambda
    val w = Window.partitionBy(col("grp")).orderBy(col("step"))
    // 3 consumers (stats, both join sides) of the indexed series grid
    val base = materialize(counts
      .select(grp.as("grp"), step.as("step"), x.cast("double").as("x"))
      .withColumn("i", row_number().over(w).cast("long")))
    val stats = base.groupBy(col("grp")).agg(
      (sum(col("x")) / count(lit(1))).as("mu"),
      count(lit(1)).as("n"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x")).as("sx"))
      .select(col("grp"), col("mu"),
        when(col("n") > 1L, sqrt((col("sxx") - col("sx") * col("sx") /
          col("n").cast("double")) / (col("n") - 1L).cast("double")))
          .otherwise(lit(0.0)).as("sigma"))
    val j = base.select(col("grp"), col("i").as("j"), col("x").as("xj"))
    val zt = base.join(j, Seq("grp"))
      .filter(col("j") <= col("i"))
      .groupBy(col("grp"), col("step"), col("x"), col("i"))
      // fixed-exponent integer powers: both engines evaluate the same
      // pow(r, i−j) literals; the 1e9 snap absorbs any last-ulp libm skew
      .agg(Snap.snappedSum(lit(lambda) * pow(lit(r), (col("i") - col("j"))
        .cast("double")) * col("xj"), 1e9).as("zsum"))
    zt.join(broadcast(stats), "grp")
      .select(col("grp"), col("step"), col("x"),
        round(pow(lit(r), col("i").cast("double")) * col("mu") +
          col("zsum"), 6).as("ewma"),
        round(col("mu") - lit(lMult) * col("sigma") *
          sqrt(lit(lambda / (2.0 - lambda)) *
            (lit(1.0) - pow(lit(r), col("i").cast("double") * 2.0))), 6)
          .as("lcl"),
        round(col("mu") + lit(lMult) * col("sigma") *
          sqrt(lit(lambda / (2.0 - lambda)) *
            (lit(1.0) - pow(lit(r), col("i").cast("double") * 2.0))), 6)
          .as("ucl"))
      .withColumn("alarm", col("ewma") < col("lcl") || col("ewma") > col("ucl"))
  }

  /** Pearson chi-squared test of homogeneity per group between two
    * categorical snapshots (the TEST companion of [[distributionDrift]]'s
    * KL accounting): cells (side × category), χ² = Σ (o−e)²/e with
    * e = row·col/N, effect size Cramér's V = √(χ²/(N·(min(r,c)−1))),
    * p-value via the Wilson–Hilferty cube-root normal approximation
    * (χ²/df)^⅓ ≈ N(1−2/(9df), 2/(9df)) — pure codegen arithmetic, no
    * driver SciPy (the [[normalPValue2]] discipline; one-sided upper
    * tail, so p = erfc(z/√2)/2 for z > 0 — expressed as half the
    * two-sided value on |z| with a sign flip for the lower tail).
    *
    * Scale shape: one map-side-combined pass to the (grp × side ×
    * category) count table, category-grid-sized rollups after. Groups
    * with a side missing or df = 0 (single category) get NULL stats
    * (the [[ksDrift]] undefined convention). Returns
    * (grp, n_e, n_a, df, chi2, cramers_v, p_value). */
  def chi2Drift(expected: DataFrame, actual: DataFrame, grp: Column,
      category: Column): DataFrame = {
    val e = expected.select(grp.as("grp"), category.as("cat"),
      lit("e").as("half"))
    val all = e.unionByName(actual.select(grp.as("grp"),
      category.as("cat"), lit("a").as("half")))
    val cnt = all.groupBy(col("grp"), col("cat"))
      .agg(sum(when(col("half") === "e", 1L).otherwise(0L)).as("ce"),
        sum(when(col("half") === "a", 1L).otherwise(0L)).as("ca"))
    val tot = cnt.groupBy(col("grp"))
      .agg(sum(col("ce")).as("te"), sum(col("ca")).as("ta"),
        count(lit(1)).as("k"))
    // (o−e)²/e summed over BOTH cells of each category row — a fixed
    // two-term expression per category, then a snapped order-free sum
    val n = (col("te") + col("ta")).cast("double")
    val ee = col("te").cast("double") * (col("ce") + col("ca")).cast("double") / n
    val ea = col("ta").cast("double") * (col("ce") + col("ca")).cast("double") / n
    val term = (col("ce").cast("double") - ee) * (col("ce").cast("double") - ee) / ee +
      (col("ca").cast("double") - ea) * (col("ca").cast("double") - ea) / ea
    import graft.expr.Snap
    val s = cnt.join(broadcast(tot), "grp")
      .groupBy(col("grp"))
      .agg(max(col("te")).as("n_e"), max(col("ta")).as("n_a"),
        (max(col("k")) - 1L).as("df"),
        Snap.snappedSum(term, 1e9).as("chi2raw"))
    val dfd = col("df").cast("double")
    val nd = (col("n_e") + col("n_a")).cast("double")
    // Wilson–Hilferty: z = ((χ²/df)^⅓ − (1 − 2/(9df))) / √(2/(9df))
    val zwh = (pow(col("chi2raw") / dfd, lit(1.0 / 3.0)) -
      (lit(1.0) - lit(2.0) / (lit(9.0) * dfd))) / sqrt(lit(2.0) / (lit(9.0) * dfd))
    val ok = col("n_e") > 0L && col("n_a") > 0L && col("df") > 0L
    s.select(col("grp"), col("n_e"), col("n_a"),
      when(ok, col("df")).as("df"),
      when(ok, round(col("chi2raw"), 6)).as("chi2"),
      when(ok, round(sqrt(col("chi2raw") / nd), 6)).as("cramers_v"),
      when(ok, round(
        when(zwh >= 0, normalPValue2(zwh) / lit(2.0))
          .otherwise(lit(1.0) - normalPValue2(zwh) / lit(2.0)), 6))
        .as("p_value"))
  }

  /** Jensen–Shannon divergence between two corpus snapshots per stratum
    * (Lin 1991) — [[distributionDrift]]'s KL made symmetric and bounded
    * ([0, ln 2]): with m = (p+q)/2, JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m).
    * Same Laplace smoothing and scale shape as the KL version (two
    * map-side-combined counts, one strata-sized join, totals broadcast);
    * per-stratum term emitted so total JSD = Σ jsd_term is auditable to
    * the stratum that moved. Returns (stratum, n_old, n_new, share_old,
    * share_new, jsd_term). */
  def jsDivergence(oldDf: DataFrame, newDf: DataFrame,
      stratum: Column): DataFrame = {
    val o = oldDf.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("n_old"))
    val n = newDf.groupBy(stratum.as("stratum")).agg(count(lit(1)).as("n_new"))
    val joined = o.join(n, Seq("stratum"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    val tot = joined.agg(sum(col("n_old")).as("t_old"),
      sum(col("n_new")).as("t_new"), count(lit(1)).as("s"))
    val p = (col("n_old") + 1d) / (col("t_old") + col("s")) // Laplace
    val q = (col("n_new") + 1d) / (col("t_new") + col("s"))
    val m = (p + q) / lit(2.0)
    joined.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_old"), col("n_new"),
        round(col("n_old") / col("t_old"), 4).as("share_old"),
        round(col("n_new") / col("t_new"), 4).as("share_new"),
        round((p * log(p / m) + q * log(q / m)) / lit(2.0), 6).as("jsd_term"))
  }

  /** Spearman rank correlation per group (Spearman 1904) — "is this
    * metric monotonically trending / co-moving", the rank sibling of
    * [[graft.ops.Quality.groupedCorr]]'s Pearson that no outlier can
    * drag: Pearson over tie-averaged ranks. Ranks come from the
    * [[mannWhitneyU]] doubled-rank trick (2·rankavg = 2(cum−n)+n+1 over
    * the per-group distinct-value grid — exact integers, no ½-steps),
    * joined back to rows by (grp, value); every moment of the doubled
    * ranks is then an exact DECIMAL(38,0) sum (products reach ~8n³ —
    * long would wrap at ~10⁶ rows/group), and ρ is one double ratio at
    * the end. Two grid-bounded rank tables + two equi-joins + one
    * map-side-combined moment pass; no per-row window over the corpus.
    * Returns (grp, n_rows, rho). */
  def spearmanCorr(df: DataFrame, grp: Column, x: Column, y: Column)
      : DataFrame = {
    def ranks2(v: Column, tag: String): DataFrame = {
      val c = df.select(grp.as("grp"), v.as("v"))
        .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("n"))
      val run = Window.partitionBy(col("grp")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      c.withColumn("cum", sum(col("n")).over(run))
        .select(col("grp"), col("v").as(s"v_$tag"),
          (lit(2L) * (col("cum") - col("n")) + col("n") + lit(1L))
            .as(s"r_$tag"))
    }
    val rows = df.select(grp.as("grp"), x.as("v_x"), y.as("v_y"))
      .join(ranks2(x, "x"), Seq("grp", "v_x"))
      .join(ranks2(y, "y"), Seq("grp", "v_y"))
    def dsum(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    val s = rows.groupBy(col("grp")).agg(
      count(lit(1)).as("n_rows"), dsum(col("r_x")).as("sx"),
      dsum(col("r_y")).as("sy"),
      dsum(col("r_x") * col("r_x")).as("sxx"),
      dsum(col("r_y") * col("r_y")).as("syy"),
      dsum(col("r_x") * col("r_y")).as("sxy"))
    val nn = col("n_rows").cast("double")
    val den = sqrt((nn * col("sxx") - col("sx") * col("sx")) *
      (nn * col("syy") - col("sy") * col("sy")))
    s.select(col("grp"), col("n_rows"),
      // a constant column on either side (denominator 0) has no rank
      // variance — ρ undefined → NULL, the ksDrift convention
      when(den > 0.0, round((nn * col("sxy") - col("sx") * col("sy")) /
        den, 6)).as("rho"))
  }

  /** Join/shuffle skew advisor over a key column — the 100 TB ops
    * question asked AS A QUERY: which keys would hot-spot a shuffle on
    * this column, and how many salts would level them. For the top
    * `topK` keys by row count: share of the table, skew ratio
    * n/mean(n) (a ratio ≫ 1 is the straggler task), and the salt
    * recommendation ⌈n/targetRowsPerTask⌉ — the fan-out factor a
    * salted join ([[graft.ops.Star.saltedJoin]]) or AQE skew split
    * needs to keep every task under the target. One map-side-combined
    * key count, |keys|-sized stats, TakeOrdered top-k — the advisor
    * costs one aggregation pass regardless of table size. Returns
    * (key, n_rows, share, skew_ratio, salt). */
  def skewAdvisor(df: DataFrame, key: Column, targetRowsPerTask: Long,
      topK: Int = 20): DataFrame = {
    require(targetRowsPerTask > 0 && topK > 0,
      s"skewAdvisor: target=$targetRowsPerTask topK=$topK")
    val c = df.groupBy(key.as("key")).agg(count(lit(1)).as("n_rows"))
    val tot = c.agg(sum(col("n_rows")).as("t"),
      count(lit(1)).as("n_keys"))
    c.crossJoin(broadcast(tot))
      .select(col("key"), col("n_rows"),
        round(col("n_rows").cast("double") / col("t").cast("double"), 6)
          .as("share"),
        round(col("n_rows").cast("double") /
          (col("t").cast("double") / col("n_keys").cast("double")), 4)
          .as("skew_ratio"),
        ceil(col("n_rows").cast("double") / lit(targetRowsPerTask.toDouble))
          .cast("long").as("salt"))
      .orderBy(col("n_rows").desc, col("key"))
      .limit(topK)
  }

  /** Diagonal-covariance Fréchet distance between two embedding
    * snapshots (the FID construction of Heusel et al. 2017 restricted
    * to per-dimension moments — the full matrix square root needs an
    * SVD the cluster shouldn't do, and for DRIFT MONITORING the
    * diagonal term answers the question): d² = ‖μ₁−μ₂‖² +
    * Σ_d (σ₁d − σ₂d)² — "did the embedding distribution move" after a
    * model update or corpus swap, the embedding-space sibling of
    * [[psiDrift]].
    *
    * One posexplode per side into a map-side-combined (dim, n, Σv,
    * Σv²) table (each task emits ≤ dims partial rows regardless of
    * corpus size — the q76 centroid shape); moments are 1e9-snapped
    * sums, population σ² = Σv²/n − μ² clamped at 0 (the snap can leave
    * a −1e−15 residue on constant dims), the dim rollup snaps again.
    * Returns one row: (dim, n_old, n_new, mean_dist2, cov_dist,
    * frechet). */
  def embeddingFrechet(oldDf: DataFrame, newDf: DataFrame, vec: Column)
      : DataFrame = {
    import graft.expr.Snap
    def moments(df: DataFrame, tag: String): DataFrame =
      df.select(posexplode(vec).as(Seq("pos", "v")))
        .select(col("pos"), col("v").cast("double").as("v"))
        .groupBy(col("pos"))
        .agg(count(lit(1)).as(s"n_$tag"),
          Snap.snappedSum(col("v"), 1e9).as(s"s_$tag"),
          Snap.snappedSum(col("v") * col("v"), 1e9).as(s"ss_$tag"))
    def mu(tag: String) = col(s"s_$tag") / col(s"n_$tag").cast("double")
    def sig(tag: String) = sqrt(greatest(
      col(s"ss_$tag") / col(s"n_$tag").cast("double") - mu(tag) * mu(tag),
      lit(0.0)))
    moments(oldDf, "o").join(moments(newDf, "n"), "pos")
      .select(col("pos"), col("n_o"), col("n_n"),
        ((mu("o") - mu("n")) * (mu("o") - mu("n"))).as("t1"),
        ((sig("o") - sig("n")) * (sig("o") - sig("n"))).as("t2"))
      .agg(count(lit(1)).as("dim"),
        (max(col("n_o"))).as("n_old"), (max(col("n_n"))).as("n_new"),
        Snap.snappedSum(col("t1"), 1e9).as("m2"),
        Snap.snappedSum(col("t2"), 1e9).as("c2"))
      .select(col("dim"), col("n_old"), col("n_new"),
        round(col("m2"), 6).as("mean_dist2"),
        round(col("c2"), 6).as("cov_dist"),
        round(col("m2") + col("c2"), 6).as("frechet"))
  }

  /** Mann–Kendall trend test + Theil–Sen slope per group over a
    * (step, x) series (Mann 1945; Sen 1968) — the ROBUST trend readout
    * next to [[spearmanCorr]]'s rank correlation: MK asks "is there a
    * monotone trend" from pair signs alone (S = Σ_{i<j} sign(x_j−x_i),
    * tie-corrected variance, z = (S∓1)/√Var, p via [[normalPValue2]]);
    * Sen's slope is the MEDIAN of all pairwise slopes — one wild day
    * can't drag it (the estimator behind robust rate-of-change
    * dashboards).
    *
    * The corpus first aggregates to the per-(group, step) series; the
    * triangular pair table is |steps|²/2 per group — calendar-bounded,
    * independent of corpus size (the [[ewmaDrift]] grid argument). S
    * and the tie counts are exact integers; slopes are single double
    * divisions of integer-derived values; the median is the average of
    * the two middle order statistics (rank window over the bounded
    * pair table, slope-then-pair-id ordered). Steps are day indices —
    * slope is per STEP-UNIT as given by `stepNum`. Returns (grp,
    * n_steps, n_pairs, s_stat, z, p_value, sen_slope). */
  def theilSenTrend(counts: DataFrame, grp: Column, stepNum: Column,
      x: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    // 3 consumers of the series grid: both pair-join sides + tie counts
    val base = materialize(counts.select(grp.as("grp"),
      stepNum.cast("double").as("d"), x.cast("double").as("x")))
    val pairs = materialize(base
      .join(base.select(col("grp"), col("d").as("d2"), col("x").as("x2")),
        Seq("grp"))
      .filter(col("d2") > col("d"))
      .select(col("grp"),
        signum(col("x2") - col("x")).cast("long").as("sgn"),
        ((col("x2") - col("x")) / (col("d2") - col("d"))).as("slope")))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("slope"), col("sgn"))
    val g = Window.partitionBy(col("grp"))
    val med = pairs.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("m", count(lit(1)).over(g))
      // Spark `/` on longs is fractional — floor back to the integer
      // middle ranks (the oracle's `//`)
      .filter(col("rk") === floor((col("m") + 1L) / 2L).cast("long") ||
        col("rk") === floor((col("m") + 2L) / 2L).cast("long"))
      .groupBy(col("grp"))
      // odd m: both ranks hit the same row — avg of min/max, not a
      // count-dependent sum, stays exact
      .agg(((min(col("slope")) + max(col("slope"))) / lit(2.0))
        .as("sen_slope"))
    val sAgg = pairs.groupBy(col("grp"))
      .agg(sum(col("sgn")).as("s"), count(lit(1)).as("n_pairs"))
    // tie groups over the VALUE grid: Σ t(t−1)(2t+5)
    val ties = base.groupBy(col("grp"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_vals"), sum(col("t")).as("n_steps"),
        sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
          .as("tsum"))
    val nD = col("n_steps").cast("double")
    val varS = (nD * (nD - lit(1.0)) * (lit(2.0) * nD + lit(5.0)) -
      col("tsum").cast("double")) / lit(18.0)
    val z = when(col("s") > 0L, (col("s") - 1L).cast("double") / sqrt(varS))
      .when(col("s") < 0L, (col("s") + 1L).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    sAgg.join(ties, "grp").join(med, Seq("grp"), "left")
      .select(col("grp"), col("n_steps"), col("n_pairs"),
        col("s").as("s_stat"),
        // a fully-tied series has Var = 0 only when every step shares
        // one value AND n ≤ 2 effectively — guard the 0/0 to NULL
        when(varS > 0.0, round(z, 4)).as("z"),
        when(varS > 0.0, round(normalPValue2(z), 6)).as("p_value"),
        round(col("sen_slope"), 6).as("sen_slope"))
  }

  /** Poisson-bootstrap confidence interval for a per-group mean
    * (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
    * Streams" — THE distributed bootstrap: classical resampling needs
    * the whole sample on one machine; Poissonization makes each
    * replicate's weight a PER-ROW independent draw, so all B replicates
    * compute in one map-side-combined pass). Each (row, replicate)
    * weight is Poisson(1) via the inverse-CDF ladder on a deterministic
    * md5-derived uniform (the q208 hash-arm construction — replayable
    * in any engine, no RNG state); replicate means are snapped-sum /
    * exact-count; the CI is the empirical [⌈B·α/2⌉, ⌈B·(1−α/2)⌉]-th
    * order statistics of the B means (rank ties broken by replicate id).
    *
    * Scale shape: the corpus expands ×B (B bounded, default 100) into
    * ONE aggregation to the (grp × B)-sized replicate table; ranking
    * and the CI rollup run on that bounded table. Replicates that draw
    * total weight 0 (tiny groups) have no mean and drop from the order
    * statistics (B_eff counts the rest). Returns
    * (grp, n_rows, mean, ci_lo, ci_hi, b_eff). */
  def bootstrapCiMean(df: DataFrame, grp: Column, id: Column, x: Column,
      b: Int = 100, alpha: Double = 0.05): DataFrame = {
    require(b >= 10 && alpha > 0 && alpha < 1,
      s"bootstrapCiMean: b=$b, alpha=$alpha")
    import graft.expr.Snap
    // Poisson(1) inverse-CDF cut points: cum_k = e^{-1}·Σ_{j≤k} 1/j!,
    // computed ONCE on the driver and baked as literals (the oracle
    // bakes the identical round-trip doubles)
    val cuts = poisson1Cuts
    val base = df.select(grp.as("grp"), id.cast("string").as("k"),
      x.cast("double").as("x"))
    val rep = base.select(col("grp"), col("k"), col("x"),
      explode(sequence(lit(1), lit(b))).as("r"))
    val u = graft.expr.Similarity.md5PrefixLong(concat_ws(":", col("k"), col("r")), 8).cast("double") / lit(4294967296.0)
    val w = cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
      case ((c, i), rest) => when(u < lit(c), lit(i)).otherwise(rest)
    }.cast("long")
    val means = rep.withColumn("w", w)
      .groupBy(col("grp"), col("r"))
      .agg(Snap.snappedSum(col("w").cast("double") * col("x"), 1e9)
        .as("num"), sum(col("w")).as("den"))
      .filter(col("den") > 0L)
      .select(col("grp"), col("r"),
        (col("num") / col("den").cast("double")).as("m"))
    val wr = Window.partitionBy(col("grp")).orderBy(col("m"), col("r"))
    val g = Window.partitionBy(col("grp"))
    val ranked = means.withColumn("rk", row_number().over(wr))
      .withColumn("beff", count(lit(1)).over(g))
    val loRk = ceil(col("beff").cast("double") * lit(alpha / 2.0))
    val hiRk = ceil(col("beff").cast("double") * lit(1.0 - alpha / 2.0))
    val ci = ranked.groupBy(col("grp"))
      .agg(max(col("beff")).as("b_eff"),
        min(when(col("rk") === loRk, col("m"))).as("lo"),
        min(when(col("rk") === hiRk, col("m"))).as("hi"))
    val overall = df.select(grp.as("grp"), x.cast("double").as("x"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        (Snap.snappedSum(col("x"), 1e9) / count(lit(1)).cast("double"))
          .as("mean"))
    overall.join(ci, Seq("grp"), "left")
      .select(col("grp"), col("n_rows"), round(col("mean"), 6).as("mean"),
        round(col("lo"), 6).as("ci_lo"), round(col("hi"), 6).as("ci_hi"),
        coalesce(col("b_eff"), lit(0L)).as("b_eff"))
  }

  /** The Poisson(1) inverse-CDF cut points cum_k = e^{-1}·Σ_{j≤k} 1/j!
    * for k = 0..7 (beyond 7 the tail mass is < 1e-8 — the ladder's ELSE
    * arm). Driver-computed; [[bootstrapCiMean]] and its oracle bake the
    * same round-trip doubles. */
  def poisson1Cuts: Seq[Double] = {
    val e1 = math.exp(-1.0)
    (0 to 7).map { k =>
      e1 * (0 to k).map { j =>
        var f = 1.0; (1 to j).foreach(f *= _); 1.0 / f
      }.sum
    }
  }

  /** Sequential probability ratio test per group over an ordered
    * conversion series (Wald 1945) — the EARLY-STOPPING layer on top of
    * [[abSampleSize]]'s fixed-horizon sizing: after each step the
    * cumulative log-likelihood ratio between H1: p = p0·liftMult and
    * H0: p = p0 is checked against ln((1−β)/α) (accept H1) and
    * ln(β/(1−α)) (accept H0); the FIRST crossing freezes the decision
    * (a sequential test that keeps sampling after crossing forfeits its
    * error guarantee). p0 is the group's own overall success rate
    * (exact rational) — the self-calibrated "did the rate lift above
    * its own average" monitor shape, same convention as [[cusumDrift]].
    *
    * LLR terms are per-step fixed expressions on exact integer (c, n);
    * the running sum 1e9-snaps each term and accumulates as
    * DECIMAL(38,0) over the step window (integer addition — window
    * re-association safe); first-crossing freeze is two windowed "min
    * step where crossed" marks. All windows run on the (grp × step)
    * series grid, never the corpus. Returns (grp, step, n, c, llr,
    * decision). */
  def sprtAb(df: DataFrame, grp: Column, step: Column, success: Column,
      liftMult: Double = 1.25, alpha: Double = 0.05, beta: Double = 0.05)
      : DataFrame = {
    val series = df.select(grp.as("grp"), step.as("step"),
      success.cast("long").as("s"))
      .groupBy(col("grp"), col("step"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("c"))
    val g = Window.partitionBy(col("grp"))
    val run = Window.partitionBy(col("grp")).orderBy(col("step"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val p0 = sum(col("c")).over(g).cast("double") /
      sum(col("n")).over(g).cast("double")
    val base = series.withColumn("p0", p0)
      .withColumn("p1", least(col("p0") * lit(liftMult), lit(0.999)))
    // per-step LLR term: c·ln(p1/p0) + (n−c)·ln((1−p1)/(1−p0)),
    // snapped to 1e9 integers BEFORE the window sum (exact addition)
    val term = col("c").cast("double") * log(col("p1") / col("p0")) +
      (col("n") - col("c")).cast("double") *
        log((lit(1.0) - col("p1")) / (lit(1.0) - col("p0")))
    val up = math.log((1.0 - beta) / alpha)
    val lo = math.log(beta / (1.0 - alpha))
    // a group at p0 = 0 or 1 has no likelihood ratio (ln 0 terms):
    // LLR/decision are undefined → NULL, the ksDrift convention; p0 is
    // group-constant so the whole group nulls together
    val ok = col("p0") > 0.0 && col("p0") < 1.0
    // snapped-integer accumulation as DECIMAL(38,0) — the cusumDrift
    // width argument (a 1e9-rate series outgrows long)
    val cum = base
      .withColumn("ti", when(ok,
        floor(term * lit(1e9) + lit(0.5)).cast("decimal(38,0)"))
        .otherwise(lit(0).cast("decimal(38,0)")))
      .withColumn("llr9", sum(col("ti")).over(run))
      .withColumn("llr", when(ok,
        col("llr9").cast("double") / lit(1e9)))
    // freeze at first crossing: min step whose running LLR crossed
    val firstUp = min(when(col("llr") >= lit(up), col("step"))).over(g)
    val firstLo = min(when(col("llr") <= lit(lo), col("step"))).over(g)
    cum.withColumn("fu", firstUp).withColumn("fl", firstLo)
      .select(col("grp"), col("step"), col("n"), col("c"),
        round(col("llr"), 6).as("llr"),
        when(col("llr").isNull, lit(null).cast("string"))
          .when(col("fu").isNotNull &&
          (col("fl").isNull || col("fu") <= col("fl")) &&
          col("step") >= col("fu"), lit("accept_h1"))
          .when(col("fl").isNotNull &&
            (col("fu").isNull || col("fl") < col("fu")) &&
            col("step") >= col("fl"), lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013 —
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data"): adjust each unit's experiment
    * metric y by its PRE-period covariate x,
    *   y' = y − θ·(x − x̄),  θ = Cov(x, y) / Var(x)  (pooled),
    * which leaves every arm-mean difference unbiased (randomization
    * makes x independent of assignment) while shrinking metric
    * variance by the factor (1 − ρ²) — the standard way an A/B stack
    * doubles its effective sample size without running longer.
    *
    * `units` is one row per experimental unit: `isA` the arm, `x` the
    * pre-period covariate, `y` the experiment metric. One map-side-
    * combined aggregation collects ALL moments (pooled and per-arm) in
    * a single pass as 1e9-snapped sums (order-free — the q104
    * contract); θ, means, and the variance identity
    * Var(y') = Var(y) − 2θ·Cov + θ²·Var(x) are driver-free scalar
    * arithmetic on that one row. Degenerate Var(x) = 0 → NULL θ and
    * adjusted columns (NULL-for-undefined). Returns one row per arm:
    * (arm, n_units, theta, mean_y, mean_y_adj, var_y, var_y_adj,
    * var_reduction). */
  def cupedAdjust(units: DataFrame, isA: Column, x: Column, y: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import graft.expr.Snap
    val g = 1e9
    val base = units.select(isA.as("a"), x.cast("double").as("x"),
      y.cast("double").as("y"))
    def arm(flag: Column, c: Column): Column =
      Snap.snappedSum(when(flag, c).otherwise(lit(0.0)), g)
    // the single corpus pass; two consumers (one per arm row)
    val m = materialize(base.agg(
      count(lit(1)).as("n"),
      Snap.snappedSum(col("x"), g).as("sx"),
      Snap.snappedSum(col("y"), g).as("sy"),
      Snap.snappedSum(col("x") * col("x"), g).as("sxx"),
      Snap.snappedSum(col("x") * col("y"), g).as("sxy"),
      Snap.snappedSum(col("y") * col("y"), g).as("syy"),
      sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
      arm(col("a"), col("x")).as("sx_a"),
      arm(col("a"), col("y")).as("sy_a"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
      arm(!col("a"), col("x")).as("sx_b"),
      arm(!col("a"), col("y")).as("sy_b")))
    val n = col("n").cast("double")
    val varX = (col("sxx") - col("sx") * col("sx") / n) / n
    val covXY = (col("sxy") - col("sx") * col("sy") / n) / n
    val varY = (col("syy") - col("sy") * col("sy") / n) / n
    val theta = when(varX > 0.0, covXY / varX)
    val xbar = col("sx") / n
    // Var(y − θx) = Var(y) − 2θCov + θ²Var(x) = Var(y) − Cov²/Var(x)
    val varAdj = varY - theta * covXY
    val arms = Seq(("treat", col("n_a"), col("sx_a"), col("sy_a")),
      ("ctrl", col("n_b"), col("sx_b"), col("sy_b")))
    arms.map { case (label, na, sxa, sya) =>
      val nd = na.cast("double")
      val meanY = sya / nd
      val meanAdj = meanY - theta * (sxa / nd - xbar)
      m.select(lit(label).as("arm"), na.as("n_units"),
        round(theta, 6).as("theta"),
        round(meanY, 6).as("mean_y"),
        round(meanAdj, 6).as("mean_y_adj"),
        round(varY, 6).as("var_y"),
        round(varAdj, 6).as("var_y_adj"),
        when(varY > 0.0, round(lit(1.0) - varAdj / varY, 6))
          .as("var_reduction"))
    }.reduce(_.unionByName(_))
  }

  /** Delta-method z-test for a RATIO metric between two arms (Deng,
    * Knoblich & Lu, KDD 2018, "Applying the Delta Method in Metric
    * Analytics" — the closed-form alternative to q249's jackknife,
    * and the correct test where a per-row z-test is biased: the unit
    * of randomization (user) is coarser than the unit of analysis
    * (event), so R = Ȳ/X̄ is a ratio of PER-UNIT means with correlated
    * numerator and denominator). Per arm,
    *   Var(R) ≈ (Var(y) − 2R·Cov(y,x) + R²·Var(x)) / (n · x̄²),
    * z = (R_a − R_b)/√(Var_a + Var_b), p via [[normalPValue2]].
    *
    * `units` is one row per randomization unit with per-unit totals
    * (y numerator, x denominator). ONE map-side-combined moment pass
    * collects both arms' snapped sums (the q104 order-free contract);
    * everything after is scalar arithmetic on a single row. An arm
    * with n ≤ 1, x̄ = 0, or zero variance sum → NULL z/p (the
    * NULL-for-undefined convention). Returns one row:
    * (n_a, n_b, ratio_a, ratio_b, se, z, p_value). */
  def deltaMethodRatio(units: DataFrame, isA: Column, num: Column,
      den: Column): DataFrame = {
    import graft.expr.Snap
    val g = 1e9
    val base = units.select(isA.as("a"), num.cast("double").as("y"),
      den.cast("double").as("x"))
    def s(flag: Column, c: Column): Column =
      Snap.snappedSum(when(flag, c).otherwise(lit(0.0)), g)
    val m = base.agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
      s(col("a"), col("y")).as("sy_a"), s(col("a"), col("x")).as("sx_a"),
      s(col("a"), col("y") * col("y")).as("syy_a"),
      s(col("a"), col("x") * col("x")).as("sxx_a"),
      s(col("a"), col("x") * col("y")).as("sxy_a"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
      s(!col("a"), col("y")).as("sy_b"), s(!col("a"), col("x")).as("sx_b"),
      s(!col("a"), col("y") * col("y")).as("syy_b"),
      s(!col("a"), col("x") * col("x")).as("sxx_b"),
      s(!col("a"), col("x") * col("y")).as("sxy_b"))
    def stats(n0: Column, sy: Column, sx: Column, syy: Column,
        sxx: Column, sxy: Column): (Column, Column) = {
      val n = n0.cast("double")
      val xbar = sx / n
      val r = sy / sx
      val varY = (syy - sy * sy / n) / (n - lit(1.0))
      val varX = (sxx - sx * sx / n) / (n - lit(1.0))
      val covYX = (sxy - sx * sy / n) / (n - lit(1.0))
      val v = (varY - lit(2.0) * r * covYX + r * r * varX) /
        (n * xbar * xbar)
      (when(sx =!= 0.0, r), when(n0 > 1L && sx =!= 0.0, v))
    }
    val (ra, va) = stats(col("n_a"), col("sy_a"), col("sx_a"),
      col("syy_a"), col("sxx_a"), col("sxy_a"))
    val (rb, vb) = stats(col("n_b"), col("sy_b"), col("sx_b"),
      col("syy_b"), col("sxx_b"), col("sxy_b"))
    val se = sqrt(va + vb)
    val z = (ra - rb) / se
    val zDef = when(va + vb > 0.0, z)
    m.select(col("n_a"), col("n_b"),
      round(ra, 6).as("ratio_a"), round(rb, 6).as("ratio_b"),
      round(when(va + vb > 0.0, se), 6).as("se"),
      round(zDef, 6).as("z"),
      round(when(va + vb > 0.0, normalPValue2(z)), 6).as("p_value"))
  }

  /** Post-stratified A/B estimator (Miratrix, Sekhon & Yu 2013 —
    * "Adjusting treatment effect estimates by post-stratification"):
    * [[cupedAdjust]]'s CATEGORICAL sibling — when the pre-treatment
    * covariate is a band/segment rather than a number, reweight each
    * arm's per-stratum means by the POOLED stratum shares,
    *   ȳ_ps = Σ_s (n_s / n) · ȳ_{arm,s},
    * which removes the variance contributed by which strata each arm
    * happened to over-sample. One map-side-combined pass to the
    * (arm × stratum) moment table (y sums 1e9-snapped); everything
    * after is |strata|-sized. A stratum absent from one arm makes that
    * arm's estimator undefined → NULL (NULL-for-undefined — silently
    * dropping the stratum would bias the comparison). Returns one row
    * per arm: (arm, n_units, mean_raw, mean_poststrat). */
  def postStratify(units: DataFrame, isA: Column, stratum: Column,
      y: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import graft.expr.Snap
    val g = 1e9
    val base = units.select(isA.as("a"), stratum.as("s"),
      y.cast("double").as("y"))
    // the single corpus pass; consumers: weights + both arm rows
    val m = materialize(base.groupBy(col("s")).agg(
      count(lit(1)).as("ns"),
      sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
      Snap.snappedSum(when(col("a"), col("y")).otherwise(lit(0.0)), g)
        .as("sy_a"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
      Snap.snappedSum(when(!col("a"), col("y")).otherwise(lit(0.0)), g)
        .as("sy_b")))
    val tot = m.agg(sum(col("ns")).as("n"),
      sum(col("n_a")).as("na_tot"), sum(col("n_b")).as("nb_tot"))
    val arms = Seq(("treat", col("n_a"), col("sy_a"), col("na_tot")),
      ("ctrl", col("n_b"), col("sy_b"), col("nb_tot")))
    arms.map { case (label, ns, sy, nArm) =>
      val w = col("ns").cast("double") / col("n").cast("double")
      val mean = when(ns > 0L, sy / ns.cast("double"))
      val term = floor(w * mean * lit(g) + lit(0.5)).cast("decimal(38,0)")
      m.crossJoin(broadcast(tot)).agg(
        max(nArm).as("n_units"),
        Snap.snappedSum(sy, g).as("sy_sum"),
        (sum(term).cast("double") / lit(g)).as("ps"),
        // a stratum with NO units in this arm makes the estimator
        // undefined — SQL sum would silently skip the NULL term and
        // BIAS the reweighting, so track the emptiest cell explicitly
        min(ns).as("mn"))
        .select(lit(label).as("arm"), col("n_units"),
          round(col("sy_sum") /
            when(col("n_units") > 0L, col("n_units").cast("double")), 6)
            .as("mean_raw"),
          round(when(col("mn") > 0L, col("ps")), 6).as("mean_poststrat"))
    }.reduce(_.unionByName(_))
  }

  /** Delete-one-group jackknife for a ratio metric R = Σnum / Σden
    * (Quenouille 1956; the Tukey jackknife as operationalized for
    * online-metric ratios — per-user or per-slice leave-one-out is how
    * large A/B platforms put error bars on ratio metrics whose
    * numerator and denominator are correlated, where the naive
    * per-row variance is simply wrong). With g groups and leave-one-
    * out estimates R_(i) = (N − n_i)/(D − d_i),
    *   se² = (g−1)/g · Σ_i (R_(i) − R̄_(·))².
    *
    * Scale shape: ONE map-side-combined rollup to the per-group sums
    * (the only corpus pass), the grand totals broadcast back, and the
    * leave-one-out table is |groups|-sized with snapped Σ-moments —
    * no window anywhere. A group that holds the ENTIRE denominator
    * makes its R_(i) undefined → that group is skipped in the moments
    * (se reflects the defined estimates; g counts all groups). Returns
    * one row: (n_groups, ratio, se_jack, ci_lo, ci_hi) — 95% normal
    * interval. */
  def jackknifeRatio(df: DataFrame, grp: Column, num: Column, den: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import graft.expr.Snap
    val g = 1e9
    // the single corpus pass; two consumers (grand totals + LOO table)
    val pg = materialize(df.select(grp.as("grp"),
        num.cast("double").as("u"), den.cast("double").as("v"))
      .groupBy(col("grp"))
      .agg(Snap.snappedSum(col("u"), g).as("n_i"),
        Snap.snappedSum(col("v"), g).as("d_i")))
    val tot = pg.agg(Snap.snappedSum(col("n_i"), g).as("nt"),
      Snap.snappedSum(col("d_i"), g).as("dt"),
      count(lit(1)).as("ng"))
    val loo = pg.crossJoin(broadcast(tot))
      .select(col("ng"), col("nt"), col("dt"),
        when(col("dt") - col("d_i") =!= 0.0,
          (col("nt") - col("n_i")) / (col("dt") - col("d_i"))).as("r_i"))
    val s = loo.groupBy()
      .agg(max(col("ng")).as("n_groups"),
        max(col("nt")).as("nt"), max(col("dt")).as("dt"),
        count(col("r_i")).as("k"),
        Snap.snappedSum(coalesce(col("r_i"), lit(0.0)), g).as("sr"),
        Snap.snappedSum(coalesce(col("r_i") * col("r_i"), lit(0.0)), g)
          .as("srr"))
    val k = col("k").cast("double")
    val ratio = col("nt") / col("dt")
    val se = sqrt(((col("srr") - col("sr") * col("sr") / k) / k) *
      (k - lit(1.0)))
    val seDef = when(col("k") > 1L && col("dt") =!= 0.0, se)
    s.select(col("n_groups"), round(ratio, 6).as("ratio"),
      round(seDef, 6).as("se_jack"),
      round(ratio - lit(1.96) * seDef, 6).as("ci_lo"),
      round(ratio + lit(1.96) * seDef, 6).as("ci_hi"))
  }

  /** Standardized effect size with the small-sample correction —
    * Cohen's d and Hedges' g (Cohen 1969; Hedges 1981; CI per
    * Borenstein et al. 2009 §4): the UNITLESS companion every
    * significance verdict here (q110 z, q264 mSPRT) needs — a p-value
    * says "not noise", the effect size says "how big in σ units", and
    * Hedges' J = 1 − 3/(4·df − 1) removes d's known small-sample
    * upward bias. se²_g = (n_a+n_b)/(n_a·n_b) + g²/(2(n_a+n_b)),
    * CI = g ± 1.96·se. One map-side-combined moment pass (snapped
    * Σy, Σy² per arm), single-row arithmetic after — the
    * [[deltaMethodRatio]] shape. Empty arm / zero pooled variance /
    * df ≤ 0 → NULL. Returns one row: (n_a, n_b, mean_diff, d_cohen,
    * g_hedges, se, ci_lo, ci_hi), 6 dp. */
  def hedgesG(units0: DataFrame, isA: Column, y: Column): DataFrame = {
    import graft.expr.Snap
    val g9 = 1e9
    val units = units0.filter(isA.isNotNull)
    def s9(flag: Column, c: Column): Column =
      Snap.snappedSum(when(flag, c).otherwise(lit(0.0)), g9)
    val base = units.select(isA.as("a"), y.cast("double").as("y"))
    val m = base.agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("na"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("nb"),
      s9(col("a"), col("y")).as("sya"),
      s9(col("a"), col("y") * col("y")).as("syya"),
      s9(!col("a"), col("y")).as("syb"),
      s9(!col("a"), col("y") * col("y")).as("syyb"))
    val naD = col("na").cast("double"); val nbD = col("nb").cast("double")
    val diff = col("sya") / naD - col("syb") / nbD
    val df = naD + nbD - lit(2.0)
    val s2 = ((col("syya") - col("sya") * col("sya") / naD) +
      (col("syyb") - col("syb") * col("syb") / nbD)) / df
    val d = diff / sqrt(s2)
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * df - lit(1.0))
    val g = j * d
    val se = sqrt((naD + nbD) / (naD * nbD) +
      g * g / (lit(2.0) * (naD + nbD)))
    val ok = col("na") > 0L && col("nb") > 0L && df > 0.0 && s2 > 0.0
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      round(when(ok, diff), 6).as("mean_diff"),
      round(when(ok, d), 6).as("d_cohen"),
      round(when(ok, g), 6).as("g_hedges"),
      round(when(ok, se), 6).as("se"),
      round(when(ok, g - lit(1.959964) * se), 6).as("ci_lo"),
      round(when(ok, g + lit(1.959964) * se), 6).as("ci_hi"))
  }

  /** Kendall's τ-b rank correlation with tie corrections (Kendall
    * 1938; the τ-b form of Kendall 1945) over a BOUNDED paired table —
    * the pair-counting companion to Spearman (q221): τ reads
    * CONCORDANCE directly (P(agree) − P(disagree)), is robust to any
    * monotone transform, and τ-b's denominator √((n₀−n₁)(n₀−n₂))
    * keeps ties from inflating agreement. Exact INTEGER pair counts —
    * concordant, discordant, x-ties, y-ties from one self-join over
    * the grid-sized input (the operator REQUIRES a bounded aggregate
    * table: pairs are O(n²), so corpus-sized inputs belong in q217's
    * rank-sum machinery instead). All-tied axes → NULL.
    * Returns one row: (n, concordant, discordant, tau_b), 6 dp. */
  def kendallTauB(df: DataFrame, x: Column, y: Column): DataFrame = {
    // duplicate rows collapse to weighted (x, y) groups FIRST: pairs
    // between two distinct groups count wa·wb; fully-tied pairs are
    // per-group w(w−1)/2 arithmetic — no self-pair/double-count traps
    val g = df.select(x.cast("double").as("x"), y.cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("w"))
    val a = g.select(col("x").as("xa"), col("y").as("ya"), col("w").as("wa"))
    val b = g.select(col("x").as("xb"), col("y").as("yb"), col("w").as("wb"))
    // each unordered pair of DISTINCT groups exactly once
    val pairs = a.join(b,
      struct(col("xa"), col("ya")) < struct(col("xb"), col("yb")))
    val wgt = col("wa") * col("wb")
    val sgn = (col("xa") - col("xb")) * (col("ya") - col("yb"))
    val m = pairs.agg(
      coalesce(sum(when(sgn > 0.0, wgt).otherwise(0L)), lit(0L)).as("c"),
      coalesce(sum(when(sgn < 0.0, wgt).otherwise(0L)), lit(0L)).as("d"),
      coalesce(sum(when(col("xa") === col("xb"), wgt).otherwise(0L)),
        lit(0L)).as("tx"),
      coalesce(sum(when(col("ya") === col("yb"), wgt).otherwise(0L)),
        lit(0L)).as("ty"))
    val tot = g.agg(count(lit(1)).as("ng"), sum(col("w")).as("n"),
      sum(col("w") * (col("w") - 1L) / 2L).as("txy"))
    m.crossJoin(broadcast(tot)).select(col("n"),
      col("c").as("concordant"), col("d").as("discordant"),
      round({
        val n0 = (col("n") * (col("n") - 1L) / 2L).cast("double")
        val n1 = (col("tx") + col("txy")).cast("double")
        val n2 = (col("ty") + col("txy")).cast("double")
        val den = sqrt((n0 - n1) * (n0 - n2))
        when(den > 0.0, (col("c") - col("d")).cast("double") / den)
      }, 6).as("tau_b"))
  }

  /** Newcombe score interval for a DIFFERENCE of proportions
    * (Newcombe 1998, method 10 — the MOVER/square-and-add composition
    * of two Wilson intervals): the conversion-rate-diff CI that stays
    * honest near 0 and 1 where the Wald interval collapses — the
    * two-arm sibling of q205's single-rate Wilson. With per-arm
    * Wilson bounds (l, u):
    *   CI = [d − √((p₁−l₁)² + (u₂−p₂)²), d + √((u₁−p₁)² + (p₂−l₂)²)].
    * Closed form over exact integer counts and the literal z — one
    * fixed parenthesization, so both engines replay identical bounds.
    * One map-side-combined pass; an empty arm → NULL (never a fake
    * zero-width interval). Returns one row: (n_a, n_b, rate_a,
    * rate_b, diff, ci_lo, ci_hi), 6 dp. */
  def newcombeDiffCi(units0: DataFrame, isA: Column, success: Column,
      z: Double = 1.959964): DataFrame = {
    val units = units0.filter(isA.isNotNull)
    val m = units.select(isA.as("a"),
        success.cast("boolean").as("s"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("na"),
        sum(when(col("a") && col("s"), 1L).otherwise(0L)).as("sa"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("nb"),
        sum(when(!col("a") && col("s"), 1L).otherwise(0L)).as("sb"))
    val z2 = lit(z) * lit(z)
    def wilson(nC: Column, sC: Column): (Column, Column, Column) = {
      val n = nC.cast("double")
      val p = sC.cast("double") / n
      val denom = lit(1.0) + z2 / n
      val center = (p + z2 / (lit(2.0) * n)) / denom
      val half = lit(z) * sqrt(p * (lit(1.0) - p) / n +
        z2 / (lit(4.0) * n * n)) / denom
      (p, center - half, center + half)
    }
    val (p1, l1, u1) = wilson(col("na"), col("sa"))
    val (p2, l2, u2) = wilson(col("nb"), col("sb"))
    val d = p1 - p2
    val lo = d - sqrt((p1 - l1) * (p1 - l1) + (u2 - p2) * (u2 - p2))
    val hi = d + sqrt((u1 - p1) * (u1 - p1) + (p2 - l2) * (p2 - l2))
    val ok = col("na") > 0L && col("nb") > 0L
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      round(when(ok, p1), 6).as("rate_a"),
      round(when(ok, p2), 6).as("rate_b"),
      round(when(ok, d), 6).as("diff"),
      round(when(ok, lo), 6).as("ci_lo"),
      round(when(ok, hi), 6).as("ci_hi"))
  }

  /** Mean-absolute-scaled-error of the seasonal-naive forecast over a
    * per-period series (Hyndman & Koehler 2006 — the scale-free
    * forecast-accuracy standard): MASE = MAE(lag-`season` forecast) /
    * MAE(lag-1 naive). MASE < 1 says the seasonal pattern beats
    * last-value carry-forward — the measured answer to "is there
    * weekly seasonality worth modeling in this metric" before anyone
    * builds a model. Series rows must be one per period (the caller's
    * aggregation); lags run over the ORDERED period grid, so both
    * error pools snap at 1e9 and the ratio is engine-exact. Fewer than
    * season+1 periods, or a zero naive MAE → NULL (NULL-for-
    * undefined).
    *
    * Scale shape: input is the |periods|-row series (the output of a
    * corpus-sized aggregation); both lag windows run on that
    * calendar-bounded grid. Returns one row:
    * (n_periods, mae_naive, mae_seasonal, mase, skill = 1 − mase). */
  def seasonalMase(series: DataFrame, period: Column, y: Column,
      season: Int = 7): DataFrame = {
    import graft.expr.Snap
    import org.apache.spark.sql.expressions.Window
    require(season >= 2, s"seasonalMase: season=$season")
    val w = Window.orderBy(col("p"))
    val base = series.select(period.as("p"), y.cast("double").as("y"))
      .withColumn("e1", abs(col("y") - lag(col("y"), 1).over(w)))
      .withColumn("es", abs(col("y") - lag(col("y"), season).over(w)))
    val m = base.agg(count(lit(1)).as("n"),
      count(col("e1")).as("n1"), count(col("es")).as("ns"),
      Snap.snappedSum(coalesce(col("e1"), lit(0.0)), 1e9).as("s1"),
      Snap.snappedSum(coalesce(col("es"), lit(0.0)), 1e9).as("ss"))
    val maeN = when(col("n1") > 0L, col("s1") / col("n1").cast("double"))
    val maeS = when(col("ns") > 0L, col("ss") / col("ns").cast("double"))
    val mase = when(maeN > 0.0, maeS / maeN)
    m.select(col("n").as("n_periods"),
      round(maeN, 6).as("mae_naive"),
      round(maeS, 6).as("mae_seasonal"),
      round(mase, 6).as("mase"),
      round(lit(1.0) - mase, 6).as("skill"))
  }

  /** Single changepoint by CUSUM-normalized binary segmentation over a
    * per-period series (Page 1954's statistic in the binseg form of
    * Scott & Knott 1974 / Killick et al.): for every split s,
    *   T_s = √(s·(n−s)/n) · |ȳ_L − ȳ_R| / σ̂
    * (σ̂ = the series' overall sd); report the argmax split — WHERE the
    * level shifted, the question the drift monitors (q83 KS, q215
    * CUSUM, q218 EWMA) answer only with "somewhere". Ties break to the
    * earliest period (deterministic); n < 4 or σ̂ = 0 → NULL. Prefix
    * sums snap at 1e9; the argmax is a max over the packed
    * (6-dp-snapped T, period) struct — order-free.
    *
    * Scale shape: input is the |periods|-row series; one prefix-sum
    * window over the calendar-bounded grid, one single-row aggregate.
    * Returns one row: (n_periods, split_period, t_stat, mean_before,
    * mean_after). */
  def changepoint(series: DataFrame, period: Column, y: Column)
      : DataFrame = {
    import graft.expr.Snap
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val base = series.select(period.as("p"), y.cast("double").as("y"))
      .withColumn("i", row_number().over(Window.orderBy(col("p"))))
      .withColumn("cs",
        sum(floor(col("y") * lit(1e9) + lit(0.5)).cast("decimal(38,0)"))
          .over(w).cast("double") / lit(1e9))
    val tot = base.agg(count(lit(1)).as("n"),
      Snap.snappedSum(col("y"), 1e9).as("sy"),
      Snap.snappedSum(col("y") * col("y"), 1e9).as("syy"))
    val nD = col("n").cast("double")
    val sd = sqrt((col("syy") - col("sy") * col("sy") / nD) /
      (nD - lit(1.0)))
    val iD = col("i").cast("double")
    val mL = col("cs") / iD
    val mR = (col("sy") - col("cs")) / (nD - iD)
    val t = sqrt(iD * (nD - iD) / nD) * abs(mL - mR) / col("sd")
    val scored = base.crossJoin(broadcast(
        tot.select(col("n"), col("sy"),
          when(nD > 1.0 && sd > 0.0, sd).as("sd"))))
      .filter(col("i") < col("n"))
      .select(col("n"),
        struct(round(t, 6).as("t"), (-col("p").cast("long")).as("np"),
          col("p").cast("long").as("sp"), round(mL, 6).as("ml"),
          round(mR, 6).as("mr")).as("cand"))
    // global agg (one row even on empty input); a zero-variance series
    // leaves every candidate's t NULL -> NULL verdict, never Inf
    val ok = col("n") >= 4L && col("best").getField("t").isNotNull
    scored.agg(coalesce(max(col("n")), lit(0L)).as("n"),
        max(col("cand")).as("best"))
      .select(col("n").as("n_periods"),
        when(ok, col("best").getField("sp")).as("split_period"),
        when(ok, col("best").getField("t")).as("t_stat"),
        when(ok, col("best").getField("ml")).as("mean_before"),
        when(ok, col("best").getField("mr")).as("mean_after"))
  }

  /** Cluster design effect for a unit-level metric randomized at the
    * CLUSTER level (Kish 1965 §8; Donner & Klar 2000): events within a
    * user are correlated, so an A/B test that randomizes users but
    * reads event-level rows has an effective sample size N/deff, not
    * N — ignoring it is the classic false-positive factory. One-way
    * ANOVA moments over clusters:
    *   MSB = (Σ(Σy_i)²/m_i − (Σy)²/N)/(k−1),
    *   MSW = (Σy² − Σ(Σy_i)²/m_i)/(N−k),
    *   n₀  = (N − Σm²/N)/(k−1)           (the ANOVA size constant),
    *   σ²_b = (MSB − MSW)/n₀,  ICC = σ²_b/(σ²_b + MSW),
    *   deff = 1 + (m_kish − 1)·ICC,  m_kish = Σm²/N,  ESS = N/deff.
    * ICC may legitimately be negative (within-cluster anti-
    * correlation) — reported raw, never clamped. k < 2, N ≤ k, or a
    * zero variance denominator → NULL (NULL-for-undefined).
    *
    * Scale shape: one map-side-combined pass to per-cluster
    * (m, Σy, Σy²) — the only corpus-sized work; cluster-table Σs are
    * 1e9-snapped (m and m² exact longs); single-row output, no window
    * anywhere. Returns one row: (n_clusters, n_units, m_kish, icc,
    * deff, ess), 6 dp. */
  def designEffect(df: DataFrame, cluster: Column, y: Column)
      : DataFrame = {
    import graft.expr.Snap
    val g = 1e9
    val per = df.select(cluster.as("c"), y.cast("double").as("y"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("m"),
        Snap.snappedSum(col("y"), g).as("sy"),
        Snap.snappedSum(col("y") * col("y"), g).as("syy"))
    val s = per.agg(count(lit(1)).as("k"), sum(col("m")).as("n"),
      sum(col("m") * col("m")).as("smm"),
      Snap.snappedSum(col("sy"), g).as("syt"),
      Snap.snappedSum(col("syy"), g).as("syyt"),
      Snap.snappedSum(col("sy") * col("sy") / col("m").cast("double"), g)
        .as("sb"))
    val kD = col("k").cast("double")
    val nD = col("n").cast("double")
    val mKish = col("smm").cast("double") / nD
    val msb = (col("sb") - col("syt") * col("syt") / nD) / (kD - lit(1.0))
    val msw = (col("syyt") - col("sb")) / (nD - kD)
    val n0 = (nD - mKish) / (kD - lit(1.0))
    val sb2 = (msb - msw) / n0
    val icc = when(sb2 + msw =!= 0.0, sb2 / (sb2 + msw))
    val ok = col("k") >= 2L && col("n") > col("k")
    val deff = lit(1.0) + (mKish - lit(1.0)) * icc
    s.select(col("k").as("n_clusters"), col("n").as("n_units"),
      round(mKish, 6).as("m_kish"),
      round(when(ok, icc), 6).as("icc"),
      round(when(ok, deff), 6).as("deff"),
      // a strongly negative ICC can drive deff to 0: ESS undefined
      round(when(ok && deff > 0.0, nD / deff), 6).as("ess"))
  }

  /** Mantel–Haenszel pooled odds ratio across strata with the CMH test
    * and the Robins–Breslow–Greenland variance (Mantel & Haenszel
    * 1959; Robins, Breslow & Greenland 1986) — the stratified 2×2
    * verdict: "does the arm move the binary outcome once the stratum
    * mix is held fixed?" A confounded margin can show an effect the
    * strata don't have (Simpson's inversion); MH pools the per-stratum
    * tables without ever forming rates across strata. Per stratum
    * (a, b | c, d) with n units:
    *   OR_MH = Σ a·d/n ÷ Σ b·c/n,
    *   CMH χ² = (Σ a − Σ E[a])² / Σ V,  E = r1·c1/n,
    *   V = r1·r0·c1·c0 / (n²(n−1))  (no continuity correction),
    *   Var(ln OR) by RBG: ΣPR/2R² + Σ(PS+QR)/2RS + ΣQS/2S².
    * Every Σ is a 1e9-snapped term sum. Strata with n ≤ 1 contribute
    * nothing to the test; ΣV = 0, a zero MH denominator, or a zero
    * RBG leg → NULL for the affected outputs (NULL-for-undefined).
    * NULL-arm/-outcome/-stratum units are excluded up front.
    *
    * Scale shape: ONE map-side-combined pass to the |strata|-row 2×2
    * table; everything after is strata-sized arithmetic, no window
    * anywhere. Returns one row: (n_strata, or_mh, ci_lo, ci_hi,
    * chi2, p_value) — the CI is the 95% RBG log-normal interval. */
  def mantelHaenszel(units0: DataFrame, isA: Column, outcome: Column,
      stratum: Column): DataFrame = {
    import graft.expr.Snap
    val g = 1e9
    val units = units0.filter(
      isA.isNotNull && outcome.isNotNull && stratum.isNotNull)
    val t2 = units.select(stratum.cast("string").as("s"),
        isA.as("arm"), outcome.cast("boolean").as("o"))
      .groupBy(col("s"))
      .agg(sum(when(col("arm") && col("o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("arm") && !col("o"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("arm") && col("o"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("arm") && !col("o"), 1L).otherwise(0L)).as("d"))
    val n = (col("a") + col("b") + col("c") + col("d")).cast("double")
    val aD = col("a").cast("double"); val bD = col("b").cast("double")
    val cD = col("c").cast("double"); val dD = col("d").cast("double")
    val r1 = aD + bD; val r0 = cD + dD
    val c1 = aD + cD; val c0 = bD + dD
    // RBG legs: P = (a+d)/n, Q = (b+c)/n, R = ad/n, S = bc/n
    val pT = (aD + dD) / n; val qT = (bD + cD) / n
    val rT = aD * dD / n;   val sT = bD * cD / n
    def s9(c: Column): Column = Snap.snappedSum(c, g)
    val m = t2.agg(count(lit(1)).as("n_strata"),
      s9(rT).as("sr"), s9(sT).as("ss"),
      s9(when(n > 1.0, aD).otherwise(lit(0.0))).as("sa"),
      s9(when(n > 1.0, r1 * c1 / n).otherwise(lit(0.0))).as("se_a"),
      s9(when(n > 1.0, r1 * r0 * c1 * c0 / (n * n * (n - lit(1.0))))
        .otherwise(lit(0.0))).as("sv"),
      s9(pT * rT).as("spr"), s9(pT * sT + qT * rT).as("spsqr"),
      s9(qT * sT).as("sqs"))
    val orMh = when(col("ss") > 0.0 && col("sr") > 0.0,
      col("sr") / col("ss"))
    val varLn = when(col("sr") > 0.0 && col("ss") > 0.0,
      col("spr") / (lit(2.0) * col("sr") * col("sr")) +
        col("spsqr") / (lit(2.0) * col("sr") * col("ss")) +
        col("sqs") / (lit(2.0) * col("ss") * col("ss")))
    val chi2 = (col("sa") - col("se_a")) * (col("sa") - col("se_a")) /
      col("sv")
    m.select(col("n_strata"),
      round(orMh, 6).as("or_mh"),
      round(orMh * exp(lit(-1.959964) * sqrt(varLn)), 6).as("ci_lo"),
      round(orMh * exp(lit(1.959964) * sqrt(varLn)), 6).as("ci_hi"),
      round(when(col("sv") > 0.0, chi2), 6).as("chi2"),
      round(when(col("sv") > 0.0, normalPValue2(sqrt(chi2))), 6)
        .as("p_value"))
  }

  /** Two-sample mixture SPRT — the ALWAYS-VALID p-value for a running
    * A/B mean difference (Johari, Koomen, Pekelis & Walsh 2017/2022,
    * "Peeking at A/B tests"): a fixed-n z-test's p is only valid at
    * one pre-registered look, but dashboards are read continuously;
    * the mSPRT's mixture likelihood ratio against H₀: θ = 0 with a
    * N(0, τ²) mixing prior,
    *   Λ = √(V/(V+τ²)) · exp(θ̂²τ² / (2V(V+τ²))),
    *   V = s²_pooled·(1/n_a + 1/n_b),  p_av = min(1, 1/Λ),
    * is a test martingale: P(∃n: Λ_n ≥ 1/α) ≤ α under H₀, so p_av may
    * be read at EVERY batch without inflating false positives. τ² is
    * the caller's effect-size prior scale (match it to the MDE).
    *
    * Scale shape: ONE map-side-combined moment pass (snapped Σy, Σy²
    * per arm), single-row arithmetic after — the same shape as
    * [[deltaMethodRatio]], and the always-valid batch twin of the
    * q222 sequential SPRT. Λ reports in LOG space (a strong effect at
    * large n overflows exp to Inf; ln Λ never does, and
    * p = exp(min(0, −ln Λ)) stays exact) — the no-NaN/Inf discipline.
    * Degenerate inputs (an empty arm, zero pooled variance, n ≤ 2) →
    * NULL (NULL-for-undefined). Returns one row:
    * (n_a, n_b, mean_diff, log_lambda, p_always_valid), 6 dp. */
  def msprt(units0: DataFrame, isA: Column, y: Column, tau2: Double)
      : DataFrame = {
    import graft.expr.Snap
    require(tau2 > 0.0, s"msprt: tau2=$tau2")
    val g = 1e9
    val units = units0.filter(isA.isNotNull)
    def s9(flag: Column, c: Column): Column =
      Snap.snappedSum(when(flag, c).otherwise(lit(0.0)), g)
    val base = units.select(isA.as("a"), y.cast("double").as("y"))
    val m = base.agg(
      sum(when(col("a"), 1L).otherwise(0L)).as("na"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("nb"),
      s9(col("a"), col("y")).as("sya"),
      s9(col("a"), col("y") * col("y")).as("syya"),
      s9(!col("a"), col("y")).as("syb"),
      s9(!col("a"), col("y") * col("y")).as("syyb"))
    val naD = col("na").cast("double"); val nbD = col("nb").cast("double")
    val diff = col("sya") / naD - col("syb") / nbD
    // pooled unbiased variance: (Σ(y−ȳ_a)² + Σ(y−ȳ_b)²)/(n−2)
    val ssA = col("syya") - col("sya") * col("sya") / naD
    val ssB = col("syyb") - col("syb") * col("syb") / nbD
    val s2 = (ssA + ssB) / (naD + nbD - lit(2.0))
    val v = s2 * (lit(1.0) / naD + lit(1.0) / nbD)
    val lnLam = lit(0.5) * log(v / (v + lit(tau2))) +
      diff * diff * lit(tau2) / (lit(2.0) * v * (v + lit(tau2)))
    val ok = col("na") > 0L && col("nb") > 0L &&
      (naD + nbD) > 2.0 && v > 0.0
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      round(when(ok, diff), 6).as("mean_diff"),
      round(when(ok, lnLam), 6).as("log_lambda"),
      round(when(ok, exp(least(lit(0.0), -lnLam))), 6)
        .as("p_always_valid"))
  }

  /** Two-sample Cramér–von Mises drift statistic per group (Anderson
    * 1962, "On the distribution of the two-sample Cramér–von Mises
    * criterion") — the INTEGRATED ECDF discrepancy next to
    * [[ksDrift]]'s max-distance D: T = (n·m/N²)·Σ_pooled (F−G)², the
    * sum over every pooled observation (with multiplicity). A
    * distribution whose CDFs differ a little everywhere (which KS's
    * single max under-reads) and one that spikes once score the same D
    * but very different T. `reject` flags T above the asymptotic
    * α=0.05 critical value 0.461 (Anderson's limiting ω² law).
    *
    * Exactness: the ECDFs evaluate on the pooled distinct-value grid
    * (both are flat between grid points, so the pooled sum is
    * Σ_grid (ce+ca)·diff² exactly); each diff is a ratio of exact
    * integers (IEEE-identical in any engine), diff² snaps to 1e9 and
    * multiplies the integer multiplicity as DECIMAL — an
    * order-independent exact-integer accumulation whose terms stay
    * exact at 100 TB counts (w·1e9·diff² ≤ 1e21 « 10³⁸), where a
    * double-snap of w·diff² would overflow the 2⁶³ floor domain.
    *
    * Scale shape: identical to [[ksDrift]] — ONE map-side-combined
    * corpus pass to the (grp × value-grid) count table, a
    * grp-PARTITIONED running window over the grid, one grid-sized
    * rollup. Groups present on one side only → NULL t (undefined).
    * Returns (grp, n_expected, n_actual, t, reject), 6 dp. */
  def cvmDrift(expected: DataFrame, actual: DataFrame, grp: Column,
      x: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    val all = expected.select(grp.as("grp"), x.cast("double").as("x"),
        lit("e").as("half"))
      .unionByName(actual.select(grp.as("grp"), x.cast("double").as("x"),
        lit("a").as("half")))
    val cnt = materialize(all.groupBy(col("grp"), col("x"))
      .agg(sum(when(col("half") === "e", 1L).otherwise(0L)).as("ce"),
        sum(when(col("half") === "a", 1L).otherwise(0L)).as("ca")))
    cvmFromGrid(cnt)
  }

  /** [[cvmDrift]] from its value-grid sufficient statistic — the
    * (grp, x, ce, ca) per-value class counts. The counts are purely
    * ADDITIVE, which is exactly what the streaming monitor sink needs:
    * maintain the grid incrementally, re-read the statistic per epoch
    * ([[graft.stream.StreamCuration.startCvmSink]]). */
  def cvmFromGrid(cnt: DataFrame): DataFrame = {
    val tot = cnt.groupBy(col("grp"))
      .agg(sum(col("ce")).as("te"), sum(col("ca")).as("ta"))
    val w = Window.partitionBy(col("grp")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val diff = col("cce").cast("double") / col("te").cast("double") -
      col("cca").cast("double") / col("ta").cast("double")
    // both factors as DECIMAL(18,0): the product rule needs p1+p2(+1)
    // ≤ 38 in both engines; w ≤ 1e12 rows and snapped diff² ≤ 1e9 both
    // fit 18 digits, the product ≤ 1e21 fits the 37-digit result
    val term = (col("ce") + col("ca")).cast("decimal(18,0)") *
      floor(diff * diff * lit(1e9) + lit(0.5)).cast("decimal(18,0)")
    val teD = col("te").cast("double"); val taD = col("ta").cast("double")
    val t = when(col("te") > 0L && col("ta") > 0L,
      teD * taD / ((teD + taD) * (teD + taD)) *
        (col("s").cast("double") / lit(1e9)))
    cnt.select(col("grp"), col("ce"), col("ca"),
        sum(col("ce")).over(w).as("cce"), sum(col("ca")).over(w).as("cca"))
      .join(broadcast(tot), "grp")
      .groupBy(col("grp"))
      .agg(max(col("te")).as("te"), max(col("ta")).as("ta"),
        sum(when(col("te") > 0L && col("ta") > 0L, term)).as("s"))
      .select(col("grp"), col("te").as("n_expected"),
        col("ta").as("n_actual"), round(t, 6).as("t"),
        when(t.isNotNull, round(t, 6) > lit(0.461)).as("reject"))
  }

  /** Exact 1-D Wasserstein-1 (earth mover's) distance per group between
    * the `expected` and `actual` distributions of `x` (Ramdas,
    * García Trillos & Cuturi 2017, "On Wasserstein two-sample
    * testing") — the drift MAGNITUDE in the units of x itself:
    * W₁ = ∫|F−G| dx, the minimum mass·distance to morph one
    * distribution into the other. PSI and KS are unitless and
    * bin/shape-sensitive; W₁ = 0.8 means "the mass moved 0.8 value
    * units on average", directly comparable across snapshots.
    *
    * Exactness: empirical CDFs are step functions flat between pooled
    * distinct values, so the integral is EXACTLY
    * Σ_grid |F(x_i)−G(x_i)|·(x_{i+1}−x_i) — no binning, no estimator.
    * Each |diff| is a ratio of exact integers, each gap a difference
    * of the raw doubles (both IEEE-identical cross-engine); terms snap
    * to 1e9 and sum as decimals (order-free).
    *
    * Scale shape: identical to [[ksDrift]] — one corpus pass to the
    * (grp × value-grid) count table, then a grp-partitioned
    * cumulative + lead window over the grid. One-sided groups → NULL.
    * Returns (grp, n_expected, n_actual, w1), 6 dp. */
  def wassersteinDrift(expected: DataFrame, actual: DataFrame,
      grp: Column, x: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import graft.expr.Snap
    val all = expected.select(grp.as("grp"), x.cast("double").as("x"),
        lit("e").as("half"))
      .unionByName(actual.select(grp.as("grp"), x.cast("double").as("x"),
        lit("a").as("half")))
    val cnt = materialize(all.groupBy(col("grp"), col("x"))
      .agg(sum(when(col("half") === "e", 1L).otherwise(0L)).as("ce"),
        sum(when(col("half") === "a", 1L).otherwise(0L)).as("ca")))
    wassersteinFromGrid(cnt)
  }

  /** [[wassersteinDrift]] from its value-grid sufficient statistic —
    * the (grp, x, ce, ca) per-value class counts. The counts are
    * purely ADDITIVE, which is exactly what the streaming monitor sink
    * needs: maintain the grid incrementally, re-read the statistic per
    * epoch ([[graft.stream.StreamCuration.startWassersteinSink]]) —
    * the same contract as [[cvmFromGrid]] / [[ksFromGrid]]. */
  def wassersteinFromGrid(cnt: DataFrame): DataFrame = {
    import graft.expr.Snap
    val tot = cnt.groupBy(col("grp"))
      .agg(sum(col("ce")).as("te"), sum(col("ca")).as("ta"))
    val wCum = Window.partitionBy(col("grp")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wLead = Window.partitionBy(col("grp")).orderBy(col("x"))
    val diff = abs(col("cce").cast("double") / col("te").cast("double") -
      col("cca").cast("double") / col("ta").cast("double"))
    // the gap past the last grid point is where both CDFs are 1 — the
    // integrand is 0 there; lead() NULL drops it from the snapped sum
    val term = diff * (lead(col("x"), 1).over(wLead) - col("x"))
    cnt.select(col("grp"), col("x"),
        sum(col("ce")).over(wCum).as("cce"),
        sum(col("ca")).over(wCum).as("cca"))
      .join(broadcast(tot), "grp")
      .select(col("grp"), col("te"), col("ta"),
        when(col("te") > 0L && col("ta") > 0L,
          coalesce(term, lit(0.0))).as("term"))
      .groupBy(col("grp"))
      .agg(max(col("te")).as("n_expected"), max(col("ta")).as("n_actual"),
        round(Snap.snappedSum(col("term"), 1e9), 6).as("w1"))
  }

  /** Pettitt rank-based changepoint test (Pettitt 1979, "A
    * non-parametric approach to the change-point problem") — the
    * ROBUST sibling of [[changepoint]]'s CUSUM binseg: a single
    * outlier day drags a mean-based split toward itself, while
    * Pettitt's Mann–Whitney-flavored statistic only sees ranks.
    * U_t = Σ_{i≤t}Σ_{j>t} sgn(y_i − y_j), computed EXACTLY in
    * integers via average ranks: Σ_j sgn(y_i − y_j) = 2r̄_i − (n+1)
    * with 2r̄_i = 2·(#smaller) + (#equal) + 1, and the within-prefix
    * part cancels by antisymmetry, so U_t is a running integer sum.
    * K = max_t |U_t| (t < n), p ≈ 2·exp(−6K²/(n³+n²)) capped at 1.
    * Ties break to the earliest period (packed struct max — the
    * [[changepoint]] argmax convention). n < 2 → NULL verdict.
    *
    * Scale shape: the input is the |periods|-row series; the rank
    * table is value-grid-bounded, both windows run on the
    * calendar-bounded grid (whitelisted with that bound), everything
    * integer until the final p. Returns one row: (n_periods,
    * split_period, k_stat, p_value). */
  def pettitt(series: DataFrame, period: Column, y: Column): DataFrame = {
    val base = series.select(period.cast("long").as("p"),
      y.cast("double").as("y"))
    val cnt = base.groupBy(col("y")).agg(count(lit(1)).as("c"))
    val wv = Window.orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val s2r = cnt.select(col("y"),
      (lit(2L) * coalesce(sum(col("c")).over(wv), lit(0L)) +
        col("c") + lit(1L)).as("s2r"))
    val tot = base.agg(count(lit(1)).as("n"))
    val wp = Window.orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cand = base.join(s2r, "y").crossJoin(broadcast(tot))
      .withColumn("u", sum(col("s2r") - (col("n") + lit(1L))).over(wp))
      .withColumn("i", row_number().over(Window.orderBy(col("p"))))
      .filter(col("i") < col("n"))
      .select(col("n"), struct(abs(col("u")).as("k"),
        (-col("p")).as("np"), col("p").as("sp")).as("cand"))
    val nD = col("n").cast("double")
    val kD = col("best").getField("k").cast("double")
    val p = least(lit(1.0), lit(2.0) *
      exp(lit(-6.0) * kD * kD / (nD * nD * nD + nD * nD)))
    val ok = col("n") >= 2L && col("best").isNotNull
    cand.agg(coalesce(max(col("n")), lit(0L)).as("n"),
        max(col("cand")).as("best"))
      .select(col("n").as("n_periods"),
        when(ok, col("best").getField("sp")).as("split_period"),
        when(ok, col("best").getField("k")).as("k_stat"),
        round(when(ok, p), 6).as("p_value"))
  }

  /** Contingency-table association report: plug-in mutual information
    * in bits (Shannon 1948; Cover & Thomas 2006 §2.3) plus Cramér's V
    * (Cramér 1946 §21.9) for two categorical columns — the EFFECT
    * SIZE pair next to q219's χ² significance test: χ² says "not
    * independent", MI says how many bits one column reveals about the
    * other, V puts it on the [0,1] scale comparable across table
    * shapes.
    *
    * Exactness: the full r×c cell grid materializes (zero cells
    * INCLUDED — χ² needs their expected mass; MI's 0·log 0 = 0
    * convention drops them); every margin is an exact long; MI terms
    * (n/N)·log₂(nN/(n_r·n_c)) snap at 1e9, χ² terms at 1e6 (they
    * scale with N). min(r,c) < 2 → NULL V (undefined).
    *
    * Scale shape: one map-side-combined corpus pass to the cell
    * table; the grid completion is a (distinct-rows × distinct-cols)
    * bounded fanout; single-row output. Returns (n, n_rows, n_cols,
    * mi_bits, chi2, cramers_v). */
  def contingencyAssociation(df: DataFrame, row: Column, colC: Column)
      : DataFrame = {
    import graft.expr.Snap
    val cell = df.select(row.cast("string").as("r"),
        colC.cast("string").as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("n"))
    val rm = cell.groupBy(col("r")).agg(sum(col("n")).as("nr"))
    val cm = cell.groupBy(col("c")).agg(sum(col("n")).as("nc"))
    val tot = cell.agg(sum(col("n")).as("nt"),
      countDistinct(col("r")).as("kr"), countDistinct(col("c")).as("kc"))
    val grid = rm.crossJoin(cm)
      .join(cell, Seq("r", "c"), "left")
      .select(col("nr"), col("nc"), coalesce(col("n"), lit(0L)).as("n"))
      .crossJoin(broadcast(tot))
    val nD = col("n").cast("double"); val ntD = col("nt").cast("double")
    val nrD = col("nr").cast("double"); val ncD = col("nc").cast("double")
    val eCell = nrD * ncD / ntD
    val miTerm = when(col("n") > 0L,
      nD / ntD * (log(nD * ntD / (nrD * ncD)) / log(lit(2.0))))
      .otherwise(lit(0.0))
    val chiTerm = (nD - eCell) * (nD - eCell) / eCell
    val m = grid.agg(max(col("nt")).as("nt"), max(col("kr")).as("kr"),
      max(col("kc")).as("kc"),
      Snap.snappedSum(miTerm, 1e9).as("mi"),
      Snap.snappedSum(chiTerm, 1e6).as("chi2"))
    val minK = least(col("kr"), col("kc")).cast("double")
    val ok = col("nt") > 0L && least(col("kr"), col("kc")) >= 2L
    m.select(col("nt").as("n"), col("kr").as("n_rows"),
      col("kc").as("n_cols"),
      round(when(col("nt") > 0L, col("mi")), 6).as("mi_bits"),
      round(when(col("nt") > 0L, col("chi2")), 6).as("chi2"),
      round(when(ok, sqrt(col("chi2") /
        (col("nt").cast("double") * (minK - lit(1.0))))), 6)
        .as("cramers_v"))
  }

  /** O'Brien–Fleming group-sequential monitoring of an A/B mean
    * difference (O'Brien & Fleming 1979; two-sided α=0.05 K=5
    * boundary constants from Jennison & Turnbull 2000, Table 2.3) —
    * "when could this experiment have STOPPED": K equal-spaced
    * calendar looks over the observed day range, each look's Welch z
    * against the conservative-early OBF bound, so peeking is
    * licensed instead of p-hacked. The sequential companion to
    * q264's always-valid mSPRT.
    *
    * Exactness: look cutoffs are exact integer day arithmetic
    * (dmin−1 + range·k DIV K, so look K covers everything); per-look
    * per-arm moments are snapped sums over the look-fanned corpus;
    * z is a fixed IEEE composition; crossing compares the 6-dp z to
    * the literal bound. Degenerate looks (an arm missing or zero
    * variance) → NULL z, never a fake verdict.
    *
    * Scale shape: the corpus fans ×K via the K-row look axis and
    * collapses map-side to (K × arm) rows — the q298 replicate-axis
    * cost shape. Returns per look: (look, day_cut, n_a, n_b,
    * mean_diff, z, bound, crossed). */
  def obrienFleming(df: DataFrame, ts: Column, y: Column, isA: Column,
      looks: Int = 5): DataFrame = {
    import graft.expr.Snap
    require(looks == 5, "obrienFleming: boundary constants carried " +
      "for K=5 (Jennison & Turnbull 2000, Table 2.3)")
    // epoch-day via exact floor division (micros ≤ ~2e15 « 2^53, so
    // the double path is exact and equals integer DIV)
    val day = floor(unix_micros(ts.cast("timestamp")).cast("double") /
      lit(86400000000.0))
    val b = df.select(day.as("d"), y.cast("double").as("y"), isA.as("a"))
    val rng = b.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
    val lookAxis = broadcast(df.sparkSession.range(1, looks + 1)
      .select(col("id").as("look")))
    // exact integer cutoffs: day values are epoch-days (≤ ~1e5), so
    // the double floor-division is exact; look K covers the full range
    val cut = col("dmin") - lit(1L) +
      floor(((col("dmax") - col("dmin") + lit(1L)) * col("look"))
        .cast("double") / lit(looks.toDouble))
    val fanned = b.crossJoin(broadcast(rng)).crossJoin(lookAxis)
      .filter(col("d") <= cut)
      .withColumn("day_cut", cut)
    val s9 = (c: Column, t: Column) =>
      Snap.snappedSum(when(c, t).otherwise(lit(0.0)), 1e9)
    val m = fanned.groupBy(col("look"), col("day_cut"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("nb"),
        s9(col("a"), col("y")).as("sa"),
        s9(col("a"), col("y") * col("y")).as("saa"),
        s9(!col("a"), col("y")).as("sb"),
        s9(!col("a"), col("y") * col("y")).as("sbb"))
    val naD = col("na").cast("double"); val nbD = col("nb").cast("double")
    val va = (col("saa") - col("sa") * col("sa") / naD) / (naD - lit(1.0))
    val vb = (col("sbb") - col("sb") * col("sb") / nbD) / (nbD - lit(1.0))
    val diff = col("sa") / naD - col("sb") / nbD
    val se = sqrt(va / naD + vb / nbD)
    val bound = element_at(array(lit(4.562), lit(3.226), lit(2.634),
      lit(2.281), lit(2.04)), col("look").cast("int"))
    val ok = col("na") >= 2L && col("nb") >= 2L && se > 0.0
    m.select(col("look"), col("day_cut"), col("na").as("n_a"),
      col("nb").as("n_b"),
      round(when(ok, diff), 6).as("mean_diff"),
      round(when(ok, diff / se), 6).as("z"), bound.as("bound"),
      when(ok, abs(round(diff / se, 6)) > bound).as("crossed"))
  }

  /** Sample-size / duration planner for a mean-difference A/B test
    * (Cohen 1988 §2.4; Lehr 1992's 16/Δ² rule as the cross-check):
    * from the OBSERVED unit-level variance, the per-arm n to detect a
    * `mdeRel` relative lift at α=0.05 two-sided / 80% power:
    *   n = 2·(z_{α/2}+z_β)²·σ²/δ²,  δ = mdeRel·μ.
    * The q211 proportions planner's continuous sibling — run BEFORE
    * the experiment, on the metric it will read.
    *
    * Exactness: snapped moments → μ/σ² as IEEE-identical scalars;
    * the z constants are the 6-dp literals (1.959964, 0.841621);
    * ceil at the end. μ = 0 or σ² = 0 or n < 2 → NULL (no MDE to
    * scale, nothing to power). One map-side pass, one row. Returns
    * (n_units, mean, sd, mde_abs, n_per_arm, lehr_n). */
  def meanSampleSize(units: DataFrame, y: Column, mdeRel: Double = 0.05)
      : DataFrame = {
    import graft.expr.Snap
    require(mdeRel > 0.0, s"meanSampleSize: mdeRel=$mdeRel")
    val b = units.select(y.cast("double").as("y"))
    val m = b.agg(count(lit(1)).as("n"),
      Snap.snappedSum(col("y"), 1e9).as("sy"),
      Snap.snappedSum(col("y") * col("y"), 1e9).as("syy"))
    val nD = col("n").cast("double")
    val mu = col("sy") / nD
    val v = (col("syy") - col("sy") * col("sy") / nD) / (nD - lit(1.0))
    val delta = lit(mdeRel) * mu
    val zsum = lit(1.959964) + lit(0.841621)
    val nArm = ceil(lit(2.0) * (zsum * zsum) * v / (delta * delta))
    val lehr = ceil(lit(16.0) * v / (delta * delta))
    val ok = col("n") >= 2L && v > 0.0 && mu =!= 0.0
    m.select(col("n").as("n_units"),
      round(when(ok, mu), 6).as("mean"),
      round(when(ok, sqrt(v)), 6).as("sd"),
      round(when(ok, delta), 6).as("mde_abs"),
      when(ok, nArm).cast("long").as("n_per_arm"),
      when(ok, lehr).cast("long").as("lehr_n"))
  }

  /** Markov removal-effect attribution (Anderl, Becker, von Wangenheim
    * & Schumann 2016, "Mapping the customer journey") — the
    * data-driven alternative to q107's positional rules: model user
    * journeys as a first-order chain START → events → {purchase, END},
    * score each event type by how much total conversion REACH
    * disappears when every transition into it is redirected to END
    * (the removal effect), and normalize into attribution shares.
    * Position rules answer "who touched the converter"; this answers
    * "who the conversions actually flow through".
    *
    * Mechanics: journeys truncate at the FIRST purchase ((ts, id)
    * order); purchase and END are absorbing; reach = P¹⁶[START,
    * purchase] computed by FOUR snapped matrix squarings (the q93/
    * q299 fixed-trajectory contract — a convergence loop would not
    * replay), one matrix per removal variant. Transition
    * probabilities are exact-integer ratios; every squaring snaps
    * cell sums at 1e9 and cells to the 6-dp grid, so the whole
    * trajectory replays bit-for-bit in any engine.
    *
    * Scale shape: ONE corpus pass builds the journey transition
    * counts (user-partitioned windows); everything after runs on
    * |states|²-bounded matrices — (variants × 4) tiny join-aggs.
    * Returns per removable state: (state, reach_full, reach_removed,
    * removal_effect, attribution_share), 6 dp. */
  def markovAttribution(events: DataFrame, user: Column, ts: Column,
      id: Column, eventType: Column, conversion: String,
      removable0: Option[Seq[String]] = None,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import graft.expr.Snap
    def snap6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val w = Window.partitionBy(col("u")).orderBy(col("t"), col("i"))
    val base = events.select(user.as("u"), ts.as("t"), id.as("i"),
        eventType.cast("string").as("e"))
      .withColumn("np", sum(when(col("e") === conversion, 1L)
        .otherwise(0L)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(coalesce(col("np"), lit(0L)) === 0L) // ≤ first conversion
    val steps = base
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead(col("e"), 1).over(w))
    // edges/pFull are ALWAYS materialized (independent of the caller's
    // per-squaring policy): the corpus pass must run exactly once
    // however many lattice consumers read it — the q277 hits
    // discipline; `materialize` below governs only the |states|²-sized
    // squaring steps (identity = run the whole lattice as one lazy
    // plan, the cheap choice at small state counts)
    val edges =
      steps.filter(col("rn") === 1)
        .select(lit("START").as("src"), col("e").as("dst"))
      .unionByName(steps.filter(col("nxt").isNotNull)
        .select(col("e").as("src"), col("nxt").as("dst")))
      .unionByName(steps.filter(col("nxt").isNull &&
          col("e") =!= conversion)
        .select(col("e").as("src"), lit("END").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = true)
    val rowTot = edges.groupBy(col("src")).agg(sum(col("n")).as("rt"))
    val pFull = edges.join(rowTot, "src")
      .select(col("src"), col("dst"),
        snap6(col("n").cast("double") / col("rt").cast("double")).as("p"))
      .localCheckpoint(eager = true)
    // absorbing self-loops so P^k keeps absorbed mass where it landed
    val absorb = events.sparkSession
      .createDataFrame(Seq((conversion, conversion, 1.0), ("END", "END", 1.0)))
      .toDF("src", "dst", "p")
    // removable states: caller-pinned (oracle-replayable), or
    // discovered — a bounded |event types|-sized driver read
    val removable = removable0.map(_.sorted).getOrElse(
      pFull.select(col("src").as("state")).distinct()
        .filter(col("state") =!= "START" && col("state") =!= conversion &&
          col("state") =!= "END")
        .collect().map(_.getString(0)).sorted.toSeq)
    require(removable.nonEmpty,
      "markovAttribution: no removable intermediate states — every " +
        s"journey goes directly START→$conversion/END, so there is " +
        "nothing to attribute; pass removable0 explicitly if the state " +
        "set is known")
    // ALL removal variants + the untouched chain evaluated as ONE
    // v-keyed block-diagonal matrix: the four squarings run ONCE over
    // the union instead of once per variant — a driver loop of
    // (|variants|+1) × 4 tiny materialized jobs was this operator's
    // whole constant factor (VERDICT r11 #3). Per-variant math is
    // bit-identical to the loop form: every (v, src, dst) group
    // carries exactly the terms the per-variant plan carried, and the
    // snapped sums are summation-order-independent by construction.
    val FULL = "__FULL__" // sentinel v for the untouched chain:
    // the control-char prefix cannot appear in a sane event type,
    // and the guard makes the assumption explicit, not silent
    require(!removable.contains(FULL),
      "markovAttribution: a removable state collides with the " +
        "internal full-chain sentinel; rename the event type")
    val rem = events.sparkSession.createDataFrame(
      removable.map(Tuple1(_))).toDF("v")
    val remAll = rem.unionByName(events.sparkSession
      .createDataFrame(Seq(Tuple1(FULL))).toDF("v"))
    // redirect every transition INTO v to END (row sums stay 1)
    val variants = pFull.crossJoin(broadcast(rem))
      .filter(col("src") =!= col("v"))
      .select(col("v"), col("src"),
        when(col("dst") === col("v"), lit("END")).otherwise(col("dst"))
          .as("dst"),
        col("p"))
      .groupBy(col("v"), col("src"), col("dst"))
      .agg(snap6(Snap.snappedSum(col("p"), 1e9)).as("p"))
    val allM = variants.unionByName(
      pFull.select(lit(FULL).as("v"), col("src"), col("dst"), col("p")))
    val absorbV = absorb.crossJoin(broadcast(remAll))
      .select(col("v"), col("src"), col("dst"), col("p"))
    def closeV(m: DataFrame): DataFrame = m.unionByName(absorbV)
    def squareV(m: DataFrame): DataFrame = {
      val a = m.select(col("v"), col("src").as("i"), col("dst").as("k"),
        col("p").as("pa"))
      val b = m.select(col("v"), col("src").as("k"), col("dst").as("j"),
        col("p").as("pb"))
      materialize(a.join(b, Seq("v", "k"))
        .groupBy(col("v"), col("i").as("src"), col("j").as("dst"))
        .agg(snap6(Snap.snappedSum(col("pa") * col("pb"), 1e9)).as("p"))
        .filter(col("p") > 0.0))
    }
    // reach = P^16[START→conversion]; absorbed = P^16[START→{conv,END}].
    // 1 − absorbed is the UNABSORBED residual: mass still in transient
    // states after 16 transitions — the visible readout of the fixed
    // four-squaring truncation (journeys needing >16 steps), mirroring
    // stationaryDistribution's tv_delta convergence convention.
    // Barrier cadence is MEASURED, twice: squarings SELF-join (m ⋈ m),
    // so a lazy level doubles the plan — full-lazy read 4.7 s vs 2.2 s
    // checkpointed (r13), and the r15 half-lazy variant (two squarings
    // per barrier) kept the SAME 35-job count while re-running the
    // duplicated post-exchange variant aggregation 4× (walls 4.8–7.6 s
    // — the q277 HITS negative result reproduced on this operator).
    // Keep the per-squaring barriers.
    val p16 = squareV(squareV(squareV(squareV(closeV(allM)))))
    val reaches = p16.filter(col("src") === "START" &&
        (col("dst") === conversion || col("dst") === "END"))
      .groupBy(col("v"))
      .agg(coalesce(max(when(col("dst") === conversion, col("p"))),
          lit(0.0)).as("reach"),
        coalesce(sum(col("p")), lit(0.0)).as("absorbed"))
    // global agg → always one row, even in the degenerate all-mass-
    // transient case the per-variant global aggs used to absorb
    val full = reaches.filter(col("v") === FULL)
      .agg(coalesce(max(col("reach")), lit(0.0)).as("reach"))
    val rows = rem.join(reaches, Seq("v"), "left")
      .select(col("v").as("state"),
        coalesce(col("reach"), lit(0.0)).as("reach_removed"),
        round(lit(1.0) - coalesce(col("absorbed"), lit(0.0)), 6)
          .as("unabsorbed"))
    val joined = rows.crossJoin(broadcast(full))
      .select(col("state"), round(col("reach"), 6).as("reach_full"),
        round(col("reach_removed"), 6).as("reach_removed"),
        snap6(when(col("reach") > 0.0,
          lit(1.0) - col("reach_removed") / col("reach"))
          .otherwise(lit(0.0))).as("eff"),
        col("unabsorbed"))
    val tot = joined.agg(Snap.snappedSum(col("eff"), 1e9).as("teff"))
    joined.crossJoin(broadcast(tot))
      .select(col("state"), col("reach_full"), col("reach_removed"),
        round(col("eff"), 6).as("removal_effect"),
        round(when(col("teff") > 0.0, col("eff") / col("teff")), 6)
          .as("attribution_share"),
        col("unabsorbed"))
  }

  /** Qini uplift curve + coefficient (Radcliffe 2007, "Using control
    * groups to target on predicted lift"; Gutierrez & Gérardy 2017
    * review) — does a targeting SCORE actually rank incremental
    * converters first? The A/B shelf answers "did treatment work on
    * average"; uplift evaluation answers "whom should we treat": walk
    * down the score, and at each targeting depth compare cumulative
    * treated conversions against the control baseline scaled to the
    * treated exposure, Qini(θ) = C_t(θ) − C_c(θ)·N_t(θ)/N_c(θ). The
    * coefficient is the trapezoid area between that curve and the
    * random-targeting diagonal — > 0 means the score beats spraying.
    *
    * Mechanics: scores normalize by the corpus max (ONE broadcast
    * scalar, the q78 winsorize pattern) into `bins` fixed-width bins —
    * the estimand is "Qini at each of `bins` score thresholds", stated
    * (rank-decile Qini needs a corpus-global sort; fixed bins give the
    * same curve read at a bounded plan shape). Per-bin class counts
    * are exact integers; cumulative counts run score-DESC over the
    * `bins`-row grid (unpartitioned windows bounded by `bins` — the
    * q137 discipline); Qini and the diagonal are fixed IEEE
    * compositions; area terms snap at 1e9. An empty control prefix
    * (N_c = 0) reads Qini = C_t (nothing to subtract — stated).
    * Returns per bin, highest scores first: (bin, n_t, n_c, conv_t,
    * conv_c, frac_targeted, qini, qini_random, qini_coef). */
  def qiniCurve(units: DataFrame, treated: Column, score: Column,
      converted: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"qiniCurve: bins=$bins")
    val b = units.select(treated.cast("boolean").as("t"),
      score.cast("double").as("s"),
      when(converted.cast("boolean"), 1L).otherwise(0L).as("y"))
    val smax = b.agg(max(col("s")).as("smax"))
    val binned = b.crossJoin(broadcast(smax))
      .select(qiniBin(col("s"), col("smax"), bins).as("bin"),
        col("t"), col("y"))
    qiniFromGrid(binned.groupBy(col("bin"))
      .agg(sum(when(col("t"), 1L).otherwise(0L)).as("nt"),
        sum(when(col("t"), col("y")).otherwise(0L)).as("ct"),
        sum(when(!col("t"), 1L).otherwise(0L)).as("nc"),
        sum(when(!col("t"), col("y")).otherwise(0L)).as("cc")))
  }

  /** The fixed-width score-threshold bin of [[qiniCurve]] — exposed so
    * the streaming sink bins arriving units against a TRAIN-ONCE
    * `scoreMax` (the startCusumSink offline-reference convention)
    * with the exact batch expression. A NULL score (an uncastable or
    * missing stream value — batch callers never produce one) bins at
    * 0, the BOTTOM of the curve: Spark's least/greatest skip nulls,
    * so without the explicit guard floor(null/·)=null would fall
    * through to least(null, bins−1)=bins−1 and an unscorable unit
    * would silently count as the best-scored one, distorting the
    * head of the uplift curve (ADVICE r12). */
  def qiniBin(score: Column, scoreMax: Column, bins: Int): Column =
    when(score.isNull, lit(0L))
      .when(scoreMax > 0.0,
        greatest(lit(0L),
          least(floor(score / scoreMax * lit(bins.toDouble))
            .cast("long"), lit(bins - 1L))))
      .otherwise(lit(0L))

  /** [[qiniCurve]] from its (bin, nt, ct, nc, cc) per-threshold class-
    * count grid — the counts are purely ADDITIVE, which is exactly
    * what the streaming uplift monitor needs: maintain the grid
    * incrementally against a fixed score normalizer, re-read the curve
    * per epoch ([[graft.stream.StreamCuration.startQiniSink]]) — the
    * cvmFromGrid contract applied to uplift. */
  def qiniFromGrid(grid: DataFrame): DataFrame = {
    import graft.expr.Snap
    // cumulative from the TOP of the score down: bins-row windows
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = grid.agg(sum(col("nt")).as("tnt"), sum(col("ct")).as("tct"),
      sum(col("nc")).as("tnc"), sum(col("cc")).as("tcc"))
    val cum = grid.select(col("bin"),
        sum(col("nt")).over(w).as("cnt"), sum(col("ct")).over(w).as("cct"),
        sum(col("nc")).over(w).as("cnc"), sum(col("cc")).over(w).as("ccc"))
      .crossJoin(broadcast(tot))
    val qini = when(col("cnc") > 0L,
      col("cct").cast("double") -
        col("ccc").cast("double") * col("cnt").cast("double") /
          col("cnc").cast("double"))
      .otherwise(col("cct").cast("double"))
    val qTotal = when(col("tnc") > 0L,
      col("tct").cast("double") -
        col("tcc").cast("double") * col("tnt").cast("double") /
          col("tnc").cast("double"))
      .otherwise(col("tct").cast("double"))
    val frac = (col("cnt") + col("cnc")).cast("double") /
      (col("tnt") + col("tnc")).cast("double")
    val curve = cum.select(col("bin"),
      col("cnt").as("n_t"), col("cnc").as("n_c"),
      col("cct").as("conv_t"), col("ccc").as("conv_c"),
      round(frac, 6).as("frac_targeted"),
      round(qini, 6).as("qini"),
      round(frac * qTotal, 6).as("qini_random"),
      (qini - frac * qTotal).as("__excess"),
      frac.as("__x"))
    // trapezoid area between curve and diagonal over consecutive
    // thresholds (plus the (0,0) anchor as the segment ending at the
    // smallest frac): bins-row lead window, snapped terms
    val wl = Window.orderBy(col("__x"))
    val prevX = lag(col("__x"), 1).over(wl)
    val prevE = lag(col("__excess"), 1).over(wl)
    val seg = (col("__x") - coalesce(prevX, lit(0.0))) *
      (col("__excess") + coalesce(prevE, lit(0.0))) / lit(2.0)
    val area = curve.select(seg.as("seg"))
      .agg(round(Snap.snappedSum(col("seg"), 1e9), 6).as("qini_coef"))
    curve.crossJoin(broadcast(area))
      .select(col("bin"), col("n_t"), col("n_c"), col("conv_t"),
        col("conv_c"), col("frac_targeted"), col("qini"),
        col("qini_random"), col("qini_coef"))
      .orderBy(col("bin").desc)
  }

  /** Distribution-free median confidence interval per group (the
    * order-statistic interval of Hahn & Meeker 1991 §5.2 with the
    * normal-approximation ranks; Conover 1999 §3.2): the median is
    * the value at rank ⌈n/2⌉ and its 95% CI is the pair of order
    * statistics at ranks
    *   l = ⌊(n − z√n)/2⌋,  u = ⌈(n + z√n)/2⌉ + 1 (capped at n)
    * — no variance formula, no distributional assumption, valid for
    * the skewed/heavy-tailed metrics where a mean ± 1.96·se interval
    * is fiction. The interval q173's MAD outlier gate and q247's
    * quantile shifts implicitly rely on, made explicit.
    *
    * Exactness: ranks are one fixed IEEE composition of (n, z);
    * values read off exact cumulative counts over the per-group
    * value grid (the q137 bounded-distinct discipline). n < 2 or a
    * lower rank under 1 → NULL bounds (the interval is not
    * guaranteed — stated). Returns (grp, n, median, ci_lo, ci_hi). */
  def medianCI(df: DataFrame, grp: Column, x: Column,
      z: Double = 1.959964): DataFrame = {
    val b = df.select(grp.as("grp"), x.cast("double").as("x"))
    val cnt = b.groupBy(col("grp"), col("x")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = cnt.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val cum = cnt.select(col("grp"), col("x"),
        sum(col("c")).over(w).as("cum"))
      .join(broadcast(tot), "grp")
    val nD = col("n").cast("double")
    val rMed = ceil(nD / lit(2.0)).cast("long")
    val rLo = floor((nD - lit(z) * sqrt(nD)) / lit(2.0)).cast("long")
    val rHi = least(col("n"),
      (ceil((nD + lit(z) * sqrt(nD)) / lit(2.0)) + lit(1.0)).cast("long"))
    def valueAt(r: Column, out: String): DataFrame =
      cum.filter(col("cum") >= r).groupBy(col("grp"))
        .agg(min(col("x")).as(out))
    val med = valueAt(rMed, "median")
    val lo = valueAt(greatest(rLo, lit(1L)), "ci_lo")
    val hi = valueAt(rHi, "ci_hi")
    val ok = col("n") >= 2L && rLo >= 1L
    tot.join(med, "grp").join(lo, Seq("grp"), "left")
      .join(hi, Seq("grp"), "left")
      .select(col("grp"), col("n"), col("median"),
        when(ok, col("ci_lo")).as("ci_lo"),
        when(ok, col("ci_hi")).as("ci_hi"))
  }

  /** Yuen's trimmed-means test (Yuen 1974, "The two-sample trimmed t
    * for unequal population variances"; Wilcox 2012 §5.3 as the
    * modern default for heavy tails): compare 20%-interior means with
    * winsorized variances and Welch degrees of freedom — the robust
    * middle ground between q110's means t (outlier-fragile) and
    * q217's rank test (abandons the mean entirely): a few whale users
    * move a Yuen verdict by bounded amounts instead of owning it.
    *
    *   tm = mean of x_(g+1..n−g),  g = ⌊trim·n⌋,  h = n − 2g
    *   d  = SS_winsorized / (h(h−1)),  t = (tm₁−tm₂)/√(d₁+d₂)
    *
    * Exactness: order statistics and interior sums read off exact
    * cumulative counts over the per-arm value grid — each grid
    * value's interior multiplicity is an exact integer overlap
    * max(0, min(cum, n−g) − max(cum−c, g)); x·m and x²·m terms snap
    * at 1e9; winsorized tails enter as g·x_(g+1) and g·x_(n−g)
    * exactly. p is the two-sided NORMAL approximation through the
    * shared erfc primitive (stated — exact t quantiles are not
    * engine-portable; at the h this targets the gap is < 1e-3).
    * h < 2 in either arm or zero variance → NULL verdict. Returns
    * (n_a, n_b, h_a, h_b, tm_a, tm_b, diff, t, df, p_value). */
  def yuenTest(units: DataFrame, isA: Column, y: Column,
      trim: Double = 0.2): DataFrame = {
    import graft.expr.Snap
    require(trim > 0.0 && trim < 0.5, s"yuenTest: trim=$trim")
    val b = units.select(when(isA, lit("a")).otherwise(lit("b")).as("arm"),
      y.cast("double").as("x"))
    val cnt = b.groupBy(col("arm"), col("x")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("arm")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = cnt.groupBy(col("arm")).agg(sum(col("c")).as("n"))
      .select(col("arm"), col("n"),
        floor(lit(trim) * col("n").cast("double")).cast("long").as("g"))
    val cum = cnt.select(col("arm"), col("x"), col("c"),
        sum(col("c")).over(w).as("cum"))
      .join(broadcast(tot), "arm")
    // interior multiplicity of each grid value in ranks (g, n−g]
    val mid = greatest(lit(0L), least(col("cum"), col("n") - col("g")) -
      greatest(col("cum") - col("c"), col("g")))
    val lo = cum.filter(col("cum") >= col("g") + lit(1L))
      .groupBy(col("arm")).agg(min(col("x")).as("xlo"))
    val hi = cum.filter(col("cum") >= col("n") - col("g"))
      .groupBy(col("arm")).agg(min(col("x")).as("xhi"))
    val sums = cum.groupBy(col("arm"))
      .agg(Snap.snappedSum(col("x") * mid.cast("double"), 1e9).as("s1"),
        Snap.snappedSum(col("x") * col("x") * mid.cast("double"), 1e9)
          .as("s2"))
    val per = tot.join(sums, "arm").join(lo, "arm").join(hi, "arm")
    val gD = col("g").cast("double"); val nD = col("n").cast("double")
    val h = col("n") - lit(2L) * col("g")
    val hD = h.cast("double")
    val tm = col("s1") / hD
    val ws = col("s1") + gD * col("xlo") + gD * col("xhi")
    val ws2 = col("s2") + gD * (col("xlo") * col("xlo")) +
      gD * (col("xhi") * col("xhi"))
    val ssw = ws2 - ws * ws / nD
    val d = ssw / (hD * (hD - lit(1.0)))
    val side = per.select(col("arm"), col("n"), h.as("h"),
      round(when(h >= 2L, tm), 6).as("tm"),
      when(h >= 2L, d).as("d"))
    val a = side.filter(col("arm") === "a")
      .select(col("n").as("n_a"), col("h").as("h_a"),
        col("tm").as("tm_a"), col("d").as("d_a"))
    val bb = side.filter(col("arm") === "b")
      .select(col("n").as("n_b"), col("h").as("h_b"),
        col("tm").as("tm_b"), col("d").as("d_b"))
    val dSum = col("d_a") + col("d_b")
    val tStat = (col("tm_a") - col("tm_b")) / sqrt(dSum)
    val dfY = dSum * dSum / (col("d_a") * col("d_a") /
      (col("h_a").cast("double") - lit(1.0)) +
      col("d_b") * col("d_b") / (col("h_b").cast("double") - lit(1.0)))
    val ok = col("h_a") >= 2L && col("h_b") >= 2L && dSum > 0.0
    a.crossJoin(bb)
      .select(col("n_a"), col("n_b"), col("h_a"), col("h_b"),
        col("tm_a"), col("tm_b"),
        round(when(ok, col("tm_a") - col("tm_b")), 6).as("diff"),
        round(when(ok, tStat), 6).as("t"),
        round(when(ok, dfY), 6).as("df"),
        round(when(ok, normalPValue2(tStat)), 6).as("p_value"))
  }

  /** Mann–Kendall monotone-trend test (Mann 1945; Kendall 1975) over
    * a per-period series — the SIGNIFICANCE companion to q228's
    * Theil–Sen slope (that one says how steep, this says whether the
    * monotone drift is real), robust to outliers and any monotone
    * transform where a regression-t is not:
    * S = Σ_{i<j} sgn(y_j − y_i), tie-corrected normal variance,
    * continuity-corrected z, p via the shared erfc primitive.
    *
    * Exactness: S is an exact integer (signum of IEEE-identical
    * differences); the tie spectrum and variance inputs are exact
    * longs; z/p are one fixed IEEE composition; the trend label reads
    * the ROUNDED p. The pair join is O(n²) over the
    * calendar-bounded series — the q279 bounded-aggregate-input
    * contract (corpus-sized data belongs in windowed monitors, not
    * here). Zero variance or n < 2 → NULL verdict. Returns one row:
    * (n_periods, s, var_s, z, p_value, trend). */
  def mannKendall(series: DataFrame, period: Column, y: Column)
      : DataFrame = {
    val base = series.select(period.cast("long").as("p"),
      y.cast("double").as("y"))
    val pairs = base.select(col("p").as("pi"), col("y").as("yi"))
      .join(base.select(col("p").as("pj"), col("y").as("yj")),
        col("pi") < col("pj"))
    val sAgg = pairs.agg(
      coalesce(sum(signum(col("yj") - col("yi")).cast("long")), lit(0L))
        .as("s"))
    val tot = base.agg(count(lit(1)).as("n"))
    val ties = base.groupBy(col("y")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - lit(1L)) *
        (lit(2L) * col("t") + lit(5L))), lit(0L)).as("tsum"))
    val nD = col("n").cast("double")
    val varS = (nD * (nD - lit(1.0)) * (lit(2.0) * nD + lit(5.0)) -
      col("tsum").cast("double")) / lit(18.0)
    val sD = col("s").cast("double")
    val z = when(col("s") > 0L, (sD - lit(1.0)) / sqrt(varS))
      .when(col("s") < 0L, (sD + lit(1.0)) / sqrt(varS))
      .otherwise(lit(0.0))
    val ok = col("n") >= 2L && varS > 0.0
    val p6 = round(when(ok, normalPValue2(z)), 6)
    sAgg.crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .select(col("n").as("n_periods"), col("s"),
        round(when(ok, varS), 6).as("var_s"),
        round(when(ok, z), 6).as("z"), p6.as("p_value"),
        when(ok, when(p6 < 0.05 && col("s") > 0L, lit("increasing"))
          .when(p6 < 0.05 && col("s") < 0L, lit("decreasing"))
          .otherwise(lit("none"))).as("trend"))
  }

  /** Wald–Wolfowitz runs test (Wald & Wolfowitz 1940) for the
    * randomness of a per-period series around its median — are the
    * above/below-median days INDEPENDENT, or do they clump (too few
    * runs: regime persistence — the thing q289's linear ACF can miss
    * when dependence is nonlinear) or alternate (too many runs)?
    * Median-tied periods are EXCLUDED (the standard dichotomization;
    * counted, not hidden). R = 1 + sign changes along the calendar;
    * μ_R = 1 + 2n₁n₂/n, σ²_R = 2n₁n₂(2n₁n₂−n)/(n²(n−1)); z; p via
    * the shared erfc primitive.
    *
    * Exactness: the low median reads off an exact cumulative count
    * over the value grid; run counting is integer lag-compare along
    * the day grid (both windows calendar-bounded, whitelisted);
    * moments are exact-integer compositions. Either side empty or
    * σ = 0 → NULL. Returns one row: (n_above, n_below, n_tied, runs,
    * mu_runs, z, p_value, random). */
  def runsTest(series: DataFrame, period: Column, y: Column)
      : DataFrame = {
    val base = series.select(period.cast("long").as("p"),
      y.cast("double").as("y"))
    val cnt = base.groupBy(col("y")).agg(count(lit(1)).as("c"))
    val wv = Window.orderBy(col("y"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = base.agg(count(lit(1)).as("nt"))
    val med = cnt.select(col("y"), sum(col("c")).over(wv).as("cum"))
      .crossJoin(broadcast(tot))
      .filter(col("cum") >= ceil(col("nt").cast("double") / lit(2.0))
        .cast("long"))
      .agg(min(col("y")).as("med"))
    val signed = base.crossJoin(broadcast(med))
      .filter(col("y") =!= col("med"))
      .select(col("p"), (col("y") > col("med")).as("up"))
    val wp = Window.orderBy(col("p"))
    val runs = signed
      .select(col("up"), lag(col("up"), 1).over(wp).as("prev"))
      .agg(coalesce(sum(when(col("up"), 1L).otherwise(0L)), lit(0L))
          .as("n1"),
        coalesce(sum(when(!col("up"), 1L).otherwise(0L)), lit(0L))
          .as("n2"),
        (lit(1L) + sum(when(col("prev").isNotNull &&
          col("prev") =!= col("up"), 1L).otherwise(0L))).as("r"))
    val tied = base.crossJoin(broadcast(med))
      .agg(sum(when(col("y") === col("med"), 1L).otherwise(0L))
        .as("n_tied"))
    val n1D = col("n1").cast("double"); val n2D = col("n2").cast("double")
    val nD = n1D + n2D
    val mu = lit(1.0) + lit(2.0) * n1D * n2D / nD
    val v = lit(2.0) * n1D * n2D * (lit(2.0) * n1D * n2D - nD) /
      (nD * nD * (nD - lit(1.0)))
    val z = (col("r").cast("double") - mu) / sqrt(v)
    val ok = col("n1") > 0L && col("n2") > 0L && v > 0.0
    val p6 = round(when(ok, normalPValue2(z)), 6)
    runs.crossJoin(broadcast(tied))
      .select(col("n1").as("n_above"), col("n2").as("n_below"),
        col("n_tied"), col("r").as("runs"),
        round(when(ok, mu), 6).as("mu_runs"),
        round(when(ok, z), 6).as("z"), p6.as("p_value"),
        when(ok, !(p6 < 0.05)).as("random"))
  }

  /** Neyman optimal stratified-sampling allocation (Neyman 1934;
    * Cochran 1977 §5.5): given a total budget of `n` sampled rows,
    * allocate n_h ∝ N_h·σ_h — big AND noisy strata get the samples —
    * and report the variance of the stratified mean under Neyman vs
    * proportional allocation plus the relative gain. The sampling
    * planner that closes the loop the q49/q57 samplers open: THOSE
    * draw, this says how much to draw from where.
    *
    * Exactness: per-stratum moments are snapped sums (population σ_h
    * as IEEE-identical scalars); weights are exact-integer ratios;
    * allocations are REAL-valued shares of n (6 dp — integerizing is
    * the caller's rounding-rule decision, stated not hidden).
    * Single-stratum or zero-σ corpora degrade to NULL gains, never
    * divide-by-zero. Returns per stratum: (stratum, n_rows, sd,
    * alloc_neyman, alloc_prop) with (v_neyman, v_prop, gain_pct)
    * riding every row.
    *
    * Scale shape: one map-side-combined pass to the |strata|-row
    * moment table; everything after is strata-table arithmetic with
    * one-row broadcasts. */
  def neymanAllocation(df: DataFrame, stratum: Column, y: Column,
      n: Long = 10000L): DataFrame = {
    import graft.expr.Snap
    require(n > 0L, s"neymanAllocation: n=$n")
    val b = df.select(stratum.as("h"), y.cast("double").as("y"))
    val per = b.groupBy(col("h")).agg(count(lit(1)).as("nh"),
      Snap.snappedSum(col("y"), 1e9).as("sy"),
      Snap.snappedSum(col("y") * col("y"), 1e9).as("syy"))
    val nhD = col("nh").cast("double")
    val sd = sqrt((col("syy") - col("sy") * col("sy") / nhD) / nhD)
    val st = per.select(col("h"), col("nh"), sd.as("sd"))
    val tot = st.agg(sum(col("nh")).as("nt"),
      Snap.snappedSum(col("nh").cast("double") * col("sd"), 1e6)
        .as("sns"),
      Snap.snappedSum(col("nh").cast("double") * col("sd") * col("sd"),
        1e6).as("sns2"))
    val ntD = col("nt").cast("double")
    // variance of the stratified-mean estimator at total size n:
    // Neyman (ΣW_hσ_h)²/n, proportional ΣW_hσ_h²/n
    val vNey = (col("sns") / ntD) * (col("sns") / ntD) / lit(n.toDouble)
    val vProp = (col("sns2") / ntD) / lit(n.toDouble)
    val ok = col("sns") > 0.0
    val totRow = tot.select(col("nt"),
      round(when(ok, vNey), 9).as("v_neyman"),
      round(when(ok, vProp), 9).as("v_prop"),
      round(when(ok, (lit(1.0) - vNey / vProp) * lit(100.0)), 6)
        .as("gain_pct"), col("sns"))
    st.crossJoin(broadcast(totRow))
      .select(col("h").as("stratum"), col("nh").as("n_rows"),
        round(col("sd"), 6).as("sd"),
        round(when(col("sns") > 0.0,
          lit(n.toDouble) * (nhD * col("sd")) / col("sns")), 6)
          .as("alloc_neyman"),
        round(lit(n.toDouble) * nhD / col("nt").cast("double"), 6)
          .as("alloc_prop"),
        col("v_neyman"), col("v_prop"), col("gain_pct"))
  }

  /** Fisher randomization (permutation) test for an arm difference in
    * unit-level means (Fisher 1935 §II; p-value convention of Phipson
    * & Smyth 2010: p = (1+b)/(R+1), never exactly 0) — the
    * assumption-free inference layer under the A/B stack: no
    * normality, no variance formula, just "how often does a random
    * relabeling beat the observed split". Relabelings are
    * md5-DETERMINISTIC (arm_r = md5(unit|r) parity), so every engine
    * scores the identical R pseudo-assignments — Monte Carlo without
    * a random number generator, replayable forever.
    *
    * Exactness: per-replicate arm sums snap at 1e9; each diff is a
    * ratio-difference of snapped doubles; the extremeness comparison
    * |diff_r| ≥ |diff_obs| compares identical doubles. A replicate
    * that loses an arm entirely (vanishingly rare under parity
    * hashing) yields NULL diff and never counts as extreme —
    * conservative and stated.
    *
    * Scale shape: the unit table fans out ×R via the R-row replicate
    * axis and collapses map-side to R rows — the standard Monte Carlo
    * compute cost, ZERO extra shuffle width (the aggregation key is
    * r). Returns one row: (n_units, n_reps, diff_obs, n_extreme,
    * p_value, reject). */
  def randomizationTest(units: DataFrame, unit: Column, y: Column,
      isA: Column, reps: Int = 199): DataFrame = {
    import graft.expr.Snap
    require(reps >= 1, s"randomizationTest: reps=$reps")
    val b = units.select(unit.cast("string").as("u"),
      y.cast("double").as("y"), isA.as("a"))
    def diffOf(df: DataFrame, arm: Column, keys: Seq[Column]): DataFrame = {
      val g = if (keys.isEmpty) df.groupBy() else df.groupBy(keys: _*)
      g.agg(count(lit(1)).as("nu"),
          sum(when(arm, 1L).otherwise(0L)).as("na"),
          Snap.snappedSum(when(arm, col("y")).otherwise(lit(0.0)), 1e9)
            .as("sa"),
          Snap.snappedSum(when(!arm, col("y")).otherwise(lit(0.0)), 1e9)
            .as("sb"))
        .select((keys.map(_ => col("r")) :+ col("nu") :+
          when(col("na") > 0L && col("na") < col("nu"),
            col("sa") / col("na").cast("double") -
              col("sb") / (col("nu") - col("na")).cast("double"))
            .as("diff")): _*)
    }
    val obs = diffOf(b, col("a"), Seq.empty)
      .select(col("nu").as("n_units"), col("diff").as("diff_obs"))
    val repAxis = broadcast(units.sparkSession.range(reps)
      .select(col("id").as("r")))
    val ra = pmod(graft.expr.Similarity.md5PrefixLong(concat(col("u"), lit("|"),
      col("r").cast("string")), 8), lit(2L)) === 0L
    val diffs = diffOf(b.crossJoin(repAxis), ra, Seq(col("r")))
    val ext = diffs.crossJoin(broadcast(obs))
      .agg(sum(when(abs(col("diff")) >= abs(col("diff_obs")), 1L)
        .otherwise(0L)).as("b"))
    val p = (col("b") + lit(1L)).cast("double") / lit((reps + 1).toDouble)
    obs.crossJoin(broadcast(ext))
      .select(col("n_units"), lit(reps.toLong).as("n_reps"),
        round(col("diff_obs"), 6).as("diff_obs"),
        col("b").as("n_extreme"),
        round(when(col("diff_obs").isNotNull, p), 6).as("p_value"),
        when(col("diff_obs").isNotNull, round(p, 6) <= lit(0.05))
          .as("reject"))
  }

  /** Ljung–Box portmanteau autocorrelation test (Ljung & Box 1978)
    * over a per-period series — "is yesterday informative about
    * today": per lag k ≤ `maxLag`, the autocorrelation r_k of the
    * standardized series and the cumulative
    * Q_m = n(n+2)·Σ_{k≤m} r_k²/(n−k) against the χ²(m) 5% critical
    * (the published constants — no CDF approximation). The
    * decide-before-you-model companion to q275's seasonal skill: a
    * flat ACF says the daily series is noise and a forecast layer is
    * wasted work.
    *
    * Exactness: standardize first (the [[jarqueBera]] two-pass
    * discipline — μ/σ from snapped sums are IEEE-identical scalars),
    * then each Σ z_t·z_{t+k} snaps at 1e9; r_k = s_k/s_0 is a ratio
    * of snapped doubles; the ≤maxLag-row cumulative window adds in
    * lag order in both engines. σ = 0 → NULL everywhere; lags with
    * no pairs (k ≥ n) are absent.
    *
    * Scale shape: the input is the |periods|-row series; pairs
    * generate via a k-offset equi-join on the bounded grid; all
    * windows are calendar-bounded (whitelisted). Returns (lag, r, q,
    * crit, reject). */
  def ljungBox(series: DataFrame, period: Column, y: Column,
      maxLag: Int = 7): DataFrame = {
    import graft.expr.Snap
    require(maxLag >= 1 && maxLag <= 7, s"ljungBox: maxLag=$maxLag " +
      "(the χ² 5% critical table carries df 1..7)")
    val base = series.select(period.cast("long").as("p"),
      y.cast("double").as("y"))
    val nD = col("n").cast("double")
    val st = base.agg(count(lit(1)).as("n"),
        Snap.snappedSum(col("y"), 1e9).as("sy"),
        Snap.snappedSum(col("y") * col("y"), 1e9).as("syy"))
      .select(col("n"), (col("sy") / nD).as("mu"),
        sqrt((col("syy") - col("sy") * col("sy") / nD) / nD).as("sd"))
    val zi = base
      .withColumn("i", row_number().over(Window.orderBy(col("p"))))
      .crossJoin(broadcast(st))
      .select(col("i"), col("n"),
        when(col("sd") > 0.0, (col("y") - col("mu")) / col("sd")).as("z"))
    val s0 = zi.agg(max(col("n")).as("n"),
      Snap.snappedSum(col("z") * col("z"), 1e9).as("s0"))
    val lags = broadcast(series.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag")))
    val sk = zi.select(col("i"), col("z")).crossJoin(lags)
      .withColumn("i2", col("i") + col("lag"))
      .join(zi.select(col("i").as("i2"), col("z").as("z2")), "i2")
      .groupBy(col("lag"))
      .agg(Snap.snappedSum(col("z") * col("z2"), 1e9).as("sk"))
    val crit = element_at(array(lit(3.841), lit(5.991), lit(7.815),
      lit(9.488), lit(11.07), lit(12.592), lit(14.067)),
      col("lag").cast("int"))
    val r = col("sk") / col("s0")
    val term = when(col("n") > col("lag"), r * r /
      (nD - col("lag").cast("double")))
    val wq = Window.orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    sk.crossJoin(broadcast(s0))
      .select(col("lag"), col("n"), round(r, 6).as("r"),
        (nD * (nD + lit(2.0)) * sum(term).over(wq)).as("q0"), crit.as("crit"))
      .select(col("lag"), col("r"), round(col("q0"), 6).as("q"),
        col("crit"),
        when(col("q0").isNotNull, round(col("q0"), 6) > col("crit"))
          .as("reject"))
  }

  /** Holt linear-trend (double exponential smoothing) fit + h-step
    * forecast over a per-period series (Holt 1957; Hyndman &
    * Athanasopoulos fpp3 §8.2 init: ℓ₁ = y₁, b₁ = y₂ − y₁) — the
    * first model the q275/q289 diagnostics justify: level AND slope,
    * each step ℓ_t = α·y_t + (1−α)(ℓ+b), b_t = β(ℓ_t−ℓ) + (1−β)b.
    * Reports the fitted endpoint state, the h-step-ahead forecast
    * ℓ_n + h·b_n, and the one-step in-sample MAE (from t = 3 — the
    * t = 2 error is structurally 0 under this init).
    *
    * Exactness: the recurrence is a sequential FOLD, run as ONE
    * in-plan `aggregate` over the sorted day array with (ℓ, b)
    * snapped to the 6-dp grid at every step — the identical
    * trajectory replays as the oracle's recursive CTE (the q200
    * unrolled-recurrence discipline). The interpreted HOF is the
    * documented bounded-fold class: the array is the
    * calendar-bounded day grid, never corpus-sized. n < 2 → NULL
    * fit. Returns one row: (n_periods, level, trend, forecast,
    * mae_1step). */
  def holtForecast(series: DataFrame, period: Column, y: Column,
      alpha: Double = 0.5, beta: Double = 0.3, h: Int = 7): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0 && beta > 0.0 && beta < 1.0,
      s"holtForecast: alpha=$alpha beta=$beta")
    def s6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val steps = series.select(period.cast("long").as("p"),
        y.cast("double").as("y"))
      .agg(sort_array(collect_list(struct(col("p"), col("y"))))
        .as("steps"))
    val folded = steps.select(size(col("steps")).cast("long").as("n"),
      aggregate(col("steps"),
        struct(lit(0L).as("i"), lit(0.0).as("l"), lit(0.0).as("b"),
          lit(0.0).as("sae")),
        (acc, x) => {
          val i = acc.getField("i"); val l = acc.getField("l")
          val b = acc.getField("b"); val sae = acc.getField("sae")
          val yt = x.getField("y")
          // i = 1: ℓ₁ = y₁ held, b₁ = y₂ − y₁ set NOW, then the t = 2
          // update runs with it (its one-step error is exactly 0)
          val b1 = s6(yt - l)
          val l2a = s6(lit(alpha) * yt + lit(1.0 - alpha) * (l + b1))
          val b2a = s6(lit(beta) * (l2a - l) + lit(1.0 - beta) * b1)
          val e = abs(yt - (l + b))
          val l2 = s6(lit(alpha) * yt + lit(1.0 - alpha) * (l + b))
          val b2 = s6(lit(beta) * (l2 - l) + lit(1.0 - beta) * b)
          when(i === 0L, struct(lit(1L).as("i"), yt.as("l"),
              lit(0.0).as("b"), lit(0.0).as("sae")))
            .when(i === 1L, struct(lit(2L).as("i"), l2a.as("l"),
              b2a.as("b"), lit(0.0).as("sae")))
            .otherwise(struct((i + lit(1L)).as("i"), l2.as("l"),
              b2.as("b"), (sae + s6(e)).as("sae")))
        }).as("st"))
    val ok = col("n") >= 2L
    folded.select(col("n").as("n_periods"),
      round(when(ok, col("st").getField("l")), 6).as("level"),
      round(when(ok, col("st").getField("b")), 6).as("trend"),
      round(when(ok, col("st").getField("l") +
        lit(h.toDouble) * col("st").getField("b")), 6).as("forecast"),
      round(when(col("n") >= 3L, col("st").getField("sae") /
        (col("n") - lit(2L)).cast("double")), 6).as("mae_1step"))
  }

  /** Classical additive seasonal decomposition of a per-period series
    * (Macaulay 1931's moving-average method, the classical mode of
    * STL's lineage — Cleveland et al. 1990 §1): per day,
    * y = trend + seasonal + remainder with trend the centered
    * `season`-point moving average, the seasonal index the centered
    * per-phase mean of the detrended series, and the remainder what's
    * left — WHICH component carries the variance, where q275 only
    * scores whether the seasonal one exists.
    *
    * Exactness: the MA is a windowed snapped-decimal sum / season
    * (order-free); phase means are snapped-sum / exact-count; the
    * index centers on the snapped mean of the ≤season phase means;
    * seasonal rounds to 6 dp and the remainder is computed FROM the
    * rounded value. Edge periods (incomplete MA window) carry NULL
    * trend/remainder — stated, never extrapolated.
    *
    * Scale shape: input is the |periods|-row series; one bounded
    * window pass, one ≤season-row phase rollup broadcast back.
    * Returns (p, y, trend, phase, seasonal, remainder). */
  def seasonalDecompose(series: DataFrame, period: Column, y: Column,
      season: Int = 7): DataFrame = {
    import graft.expr.Snap
    require(season >= 3 && season % 2 == 1,
      s"seasonalDecompose: season=$season (centered MA needs odd)")
    val half = season / 2
    val base = series.select(period.cast("long").as("p"),
      y.cast("double").as("y"))
    val wT = Window.orderBy(col("p")).rowsBetween(-half, half)
    val tr = base
      .withColumn("cnt", count(lit(1)).over(wT))
      .withColumn("trend", when(col("cnt") === season.toLong,
        sum(floor(col("y") * lit(1e9) + lit(0.5)).cast("decimal(38,0)"))
          .over(wT).cast("double") / lit(1e9) / lit(season.toDouble)))
      .withColumn("detr", col("y") - col("trend"))
      .withColumn("phase", pmod(col("p"), lit(season.toLong)))
    val idx = tr.groupBy(col("phase"))
      .agg(Snap.snappedSum(col("detr"), 1e9).as("sd"),
        count(col("detr")).as("cd"))
      .select(col("phase"),
        when(col("cd") > 0L, col("sd") / col("cd").cast("double"))
          .as("raw"))
    val center = idx.agg(Snap.snappedSum(col("raw"), 1e9).as("sr"),
      count(col("raw")).as("cr"))
    val seas = idx.crossJoin(broadcast(center))
      .select(col("phase"),
        round(col("raw") - col("sr") / col("cr").cast("double"), 6)
          .as("seasonal"))
    tr.join(broadcast(seas), Seq("phase"), "left")
      .select(col("p"), col("y"), round(col("trend"), 6).as("trend"),
        col("phase"), col("seasonal"),
        round(col("y") - col("trend") - col("seasonal"), 6)
          .as("remainder"))
  }

  /** Jarque–Bera normality monitor per group (Jarque & Bera 1980):
    * JB = n/6·(S² + (K−3)²/4) from the standardized third and fourth
    * moments — the "is this metric still bell-shaped" gate whose
    * χ²(2) null has the EXACT closed-form survival p = e^(−JB/2)
    * (no approximation anywhere). A t-test downstream assumes what
    * this monitors.
    *
    * Exactness: two passes. Pass 1 snaps Σy/Σy² at 1e9 per group →
    * μ and the population σ are IEEE-identical in any engine; pass 2
    * standardizes each row with those scalars and snaps Σz³/Σz⁴
    * (written z·z·z and z·z·z·z — one association, mirrored
    * token-for-token in the oracle). σ = 0 or n < 2 → NULL
    * (NULL-for-undefined, never a fake "normal").
    *
    * Scale shape: two map-side-combined corpus passes (the scan is
    * column-pruned to (grp, y) both times), a |groups|-row broadcast
    * between them; no window, no corpus shuffle beyond the two
    * group-keyed aggregations. Returns (grp, n, skew, kurt_excess,
    * jb, p_value, reject), 6 dp. */
  def jarqueBera(df: DataFrame, grp: Column, y: Column): DataFrame = {
    import graft.expr.Snap
    val b = df.select(grp.as("grp"), y.cast("double").as("y"))
    val nD = col("n").cast("double")
    val st = b.groupBy(col("grp")).agg(count(lit(1)).as("n"),
        Snap.snappedSum(col("y"), 1e9).as("sy"),
        Snap.snappedSum(col("y") * col("y"), 1e9).as("syy"))
      .select(col("grp"), col("n"),
        (col("sy") / nD).as("mu"),
        sqrt((col("syy") - col("sy") * col("sy") / nD) / nD).as("sd"))
    val z = (col("y") - col("mu")) / col("sd")
    val m = b.join(broadcast(st), "grp")
      .select(col("grp"), col("n"), col("sd"),
        when(col("sd") > 0.0, z).as("z"))
      .groupBy(col("grp"))
      .agg(max(col("n")).as("n"), max(col("sd")).as("sd"),
        Snap.snappedSum(col("z") * col("z") * col("z"), 1e9).as("s3"),
        Snap.snappedSum(col("z") * col("z") * col("z") * col("z"), 1e9)
          .as("s4"))
    val skew = col("s3") / nD
    val kurt = col("s4") / nD
    val jb = nD / lit(6.0) *
      (skew * skew + (kurt - lit(3.0)) * (kurt - lit(3.0)) / lit(4.0))
    val pv = exp(-jb / lit(2.0))
    val ok = col("n") >= 2L && col("sd") > 0.0
    m.select(col("grp"), col("n"),
      round(when(ok, skew), 6).as("skew"),
      round(when(ok, kurt - lit(3.0)), 6).as("kurt_excess"),
      round(when(ok, jb), 6).as("jb"),
      round(when(ok, pv), 6).as("p_value"),
      when(ok, round(pv, 6) < lit(0.05)).as("reject"))
  }
  /** MAUVE-style divergence curve between two corpora over a shared
    * quantization (Pillutla et al. 2021, "MAUVE: Measuring the gap
    * between neural text and human text", simplified to a fixed cell
    * quantization instead of a fitted k-means — the cells are the
    * caller's choice, e.g. embedding sign-buckets): for each mixture
    * weight λ on the interior grid i/(grid+1), R_λ = λP + (1−λ)Q and
    * the curve point is (exp(−c·KL(Q‖R_λ)), exp(−c·KL(P‖R_λ))) — the
    * frontier traces HOW the two distributions differ (type-I vs
    * type-II mass), where a single KL collapses it to one number. The
    * summary `mauve` column is the paper's AUC: the trapezoid area
    * under the interior curve COMPLETED with the corner points (0, 1)
    * and (1, 0) (the official implementation's convention) — identical
    * corpora score exactly 1, disjoint-support corpora fall toward 0.
    *
    * Exactness: P, Q are exact integer shares; each KL is a 1e9-snapped
    * Σ p·ln(p/r) (R_λ > 0 wherever the numerator is on the OPEN grid);
    * curve coordinates round at 6 dp; the area pairs consecutive grid
    * points by index join (no window), trapezoid terms snapped.
    *
    * Scale shape: one cell histogram per corpus (map-side combined,
    * cell-bounded), the λ grid is a `grid`-row broadcast, everything
    * after is (cells × grid)-sized. Returns one row per λ:
    * (lambda, kl_p_r, kl_q_r, x, y, mauve). */
  def mauveCurve(cells: DataFrame, isP: Column, cell: Column,
      c: Double = 5.0, grid: Int = 9): DataFrame = {
    require(c > 0.0 && grid >= 2, s"mauveCurve: c=$c grid=$grid")
    import graft.expr.Snap
    val spark0 = cells.sparkSession
    val hist = cells.select(cell.as("cell"),
        when(isP, 1L).otherwise(0L).as("p"))
      .groupBy(col("cell"))
      .agg(sum(col("p")).as("np"), sum(lit(1L) - col("p")).as("nq"))
    val tot = hist.agg(sum(col("np")).as("tp"), sum(col("nq")).as("tq"))
    val lam = spark0.range(1, grid + 1).select(
      (col("id").cast("double") / lit(grid + 1.0)).as("lambda"))
    val pr = col("np").cast("double") / col("tp").cast("double")
    val qr = col("nq").cast("double") / col("tq").cast("double")
    val r = col("lambda") * pr + (lit(1.0) - col("lambda")) * qr
    val kls = hist.crossJoin(broadcast(tot)).crossJoin(broadcast(lam))
      .groupBy(col("lambda"))
      .agg(
        Snap.snappedSum(when(col("np") > 0L, pr * log(pr / r))
          .otherwise(lit(0.0)), 1e9).as("klp"),
        Snap.snappedSum(when(col("nq") > 0L, qr * log(qr / r))
          .otherwise(lit(0.0)), 1e9).as("klq"))
      .select(col("lambda"), round(col("klp"), 6).as("kl_p_r"),
        round(col("klq"), 6).as("kl_q_r"),
        round(exp(lit(-c) * col("klq")), 6).as("x"),
        round(exp(lit(-c) * col("klp")), 6).as("y"))
    // trapezoid area over x-ascending points: x = exp(−c·KL(Q‖R_λ))
    // is MONOTONE DECREASING in λ, so the x order is the λ-descending
    // order and the position index is computable from λ directly —
    // an index join, no window. Corners (0,1) and (1,0) complete the
    // curve (the paper's convention).
    val interior = kls.select(
      (lit(grid + 1L) - floor(col("lambda") * lit(grid + 1.0) + lit(0.5))
        .cast("long")).as("i"), col("x"), col("y"))
    val corners = spark0.range(1).select(lit(0L).as("i"),
        lit(0.0).as("x"), lit(1.0).as("y"))
      .unionByName(spark0.range(1).select(lit(grid + 1L).as("i"),
        lit(1.0).as("x"), lit(0.0).as("y")))
    val pts = interior.unionByName(corners)
    val a = pts.select(col("i"), col("x").as("x0"), col("y").as("y0"))
    val b = pts.select((col("i") - lit(1L)).as("i"), col("x").as("x1"),
      col("y").as("y1"))
    val area = a.join(b, "i")
      .agg(coalesce(round(Snap.snappedSum(
        (col("x1") - col("x0")) * (col("y0") + col("y1")) / lit(2.0),
        1e9), 6), lit(0.0)).as("mauve"))
    kls.crossJoin(broadcast(area))
  }

  /** Shapley-value channel attribution (Shapley 1953; Zhao, Mahboobi &
    * Bagheri 2018, "Shapley value methods for attribution modeling")
    * — the third member of the attribution triad: q107's positional
    * rules are heuristic, q319's Markov removal-effect is model-based;
    * the Shapley value is the unique allocation satisfying efficiency/
    * symmetry/dummy axioms over the observed coalition outcomes.
    * Journeys truncate at the FIRST conversion (q319's convention);
    * each user contributes their touched-channel SET (as a bitmask
    * over the caller-pinned channel list) and a converted flag;
    * v(S) = the conversion rate among users whose touched set is
    * EXACTLY S (unobserved coalitions contribute v = 0 — stated, the
    * data-driven convention of the paper's "simplified" estimator);
    * φ_i = Σ_{S ∌ i} |S|!(n−1−|S|)!/n! · (v(S∪{i}) − v(S)).
    *
    * Exactness: masks and coalition counts are exact integers; v is
    * an exact integer ratio; the factorial weights are exact small-int
    * ratios evaluated in double (identical in any engine); φ is a
    * 1e9-snapped sum over the 2^(n−1) terms, 6 dp out.
    *
    * Scale shape: ONE corpus pass to per-user (mask, converted) —
    * user-partitioned window + map-side-combined rollup; everything
    * after runs on the 2^n-row mask lattice (n = |channels|, a
    * caller-bounded constant). Returns (channel, shapley, share). */
  def shapleyAttribution(events: DataFrame, user: Column, ts: Column,
      id: Column, eventType: Column, conversion: String,
      channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.size <= 16 &&
      channels.distinct.size == channels.size &&
      !channels.contains(conversion),
      s"shapleyAttribution: channels=$channels")
    import graft.expr.Snap
    val n = channels.size
    val chSorted = channels.sorted
    val w = Window.partitionBy(col("u")).orderBy(col("t"), col("i"))
    val base = events.select(user.as("u"), ts.as("t"), id.as("i"),
        eventType.cast("string").as("e"))
      .withColumn("np", sum(when(col("e") === conversion, 1L)
        .otherwise(0L)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(coalesce(col("np"), lit(0L)) === 0L) // ≤ first conversion
    val perUser = base.groupBy(col("u"))
      .agg(chSorted.zipWithIndex.map { case (c, j) =>
          max(when(col("e") === c, lit(1L << j)).otherwise(0L))
            .as(s"b$j")
        }.head,
        (chSorted.zipWithIndex.tail.map { case (c, j) =>
          max(when(col("e") === c, lit(1L << j)).otherwise(0L))
            .as(s"b$j")
        } :+ max(when(col("e") === conversion, 1L).otherwise(0L))
          .as("conv")): _*)
      .select((0 until n).map(j => col(s"b$j")).reduce(_ + _).as("mask"),
        col("conv"))
    val byMask = perUser.groupBy(col("mask"))
      .agg(count(lit(1)).as("nu"), sum(col("conv")).as("nc"))
    val lattice = events.sparkSession.range(1L << n)
      .select(col("id").as("mask"))
      .join(byMask, Seq("mask"), "left")
      .select(col("mask"),
        when(coalesce(col("nu"), lit(0L)) > 0L,
          col("nc").cast("double") / col("nu").cast("double"))
          .otherwise(lit(0.0)).as("v"))
    def fact(k: Int): Long = (1 to k).product.toLong
    // per (channel i, coalition S ∌ i): weight(|S|) · (v(S∪i) − v(S))
    val chAxis = events.sparkSession
      .createDataFrame(chSorted.zipWithIndex.map { case (c, j) =>
        (c, 1L << j)
      }).toDF("channel", "bit")
    val wExpr = (1 until n).foldLeft(
      when(expr("bit_count(mask)") === 0,
        lit((fact(0) * fact(n - 1)).toDouble / fact(n)))) { (acc, k) =>
      acc.when(expr("bit_count(mask)") === k,
        lit((fact(k) * fact(n - 1 - k)).toDouble / fact(n)))
    }
    val terms = lattice.select(col("mask"), col("v"))
      .crossJoin(broadcast(chAxis))
      .filter((col("mask").bitwiseAND(col("bit"))) === 0L)
      .join(lattice.select(col("mask").as("mu"), col("v").as("vu")),
        col("mu") === (col("mask") + col("bit")))
      .select(col("channel"), (wExpr * (col("vu") - col("v"))).as("term"))
    val phi = terms.groupBy(col("channel"))
      .agg(round(Snap.snappedSum(col("term"), 1e9), 6).as("shapley"))
    val tot = phi.agg(Snap.snappedSum(col("shapley"), 1e9).as("tot"))
    phi.crossJoin(broadcast(tot))
      .select(col("channel"), col("shapley"),
        round(when(col("tot") > 0.0, col("shapley") / col("tot")), 6)
          .as("share"))
  }

}

