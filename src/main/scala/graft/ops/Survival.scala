package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survival analysis over right-censored durations — the time-to-event
  * layer the funnel family (q216/q240) deliberately truncates: a
  * time-to-convert percentile only sees units that DID convert, so a
  * treatment that merely delays conversion beyond the observation
  * window looks identical to one that prevents it. Kaplan–Meier reads
  * the censored units as information (at risk until last seen), and
  * the log-rank test compares two arms' whole hazard trajectories.
  *
  * Both operators take durations pre-quantized to a CALENDAR grid
  * (days, hours — the caller's choice): survival curves are reported
  * on calendar steps anyway, and it makes every window frame bounded
  * by the observation window — data-INDEPENDENT, the ewmaDrift
  * contract — rather than by distinct raw durations (≈ |units|).
  */
object Survival {

  /** Kaplan–Meier product-limit estimator (Kaplan & Meier 1958) with
    * right censoring, plus the Nelson–Aalen cumulative hazard: at each
    * event step t, n_risk = #{duration ≥ t} (censored units count
    * until they vanish), d = #events at t,
    *   S(t) = Π_{j ≤ t} (1 − d_j / n_j),
    *   H(t) = Σ_{j ≤ t} d_j / n_j.
    * The product evaluates as exp(Σ ln(1 − d/n)) with each ln term
    * 1e9-snapped (order-free — the q104 contract; a direct running
    * product would be order-sensitive in doubles); H snaps the same
    * way. d = n_risk at the last step makes S exactly 0 via a NULL-safe
    * ln guard (ln 0 → −∞ is the one case exp must map to 0, not NaN).
    *
    * Scale shape: ONE map-side-combined aggregation to per-step
    * (events, leavers) counts; n_risk derives from a reverse cumulative
    * window over the CALENDAR-bounded step grid (the only window —
    * observation-window-sized, never unit-sized). Returns one row per
    * EVENT step: (t, n_risk, d, km_surv, na_cumhaz), 6 dp. */
  def kaplanMeier(units: DataFrame, duration: Column, event: Column)
      : DataFrame =
    kaplanMeierFromCounts(units.select(duration.cast("long").as("t"),
        event.cast("boolean").as("e"))
      .groupBy(col("t"))
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave")))

  /** The counts→curve stage of [[kaplanMeier]]: input is the per-step
    * (t, d, leave) LONG count table (calendar-grid-sized). Exposed so
    * a streaming sink can maintain the counts (exact integer state —
    * additive across any batching) and re-emit the curve per epoch. */
  private[graft] def kaplanMeierFromCounts(per: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // n_risk(t) = Σ_{t' ≥ t} leavers(t'): reverse cumulative over the
    // calendar-bounded step grid
    val atRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val run = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val g = per.withColumn("n_risk", sum(col("leave")).over(atRisk))
    val frac = col("d").cast("double") / col("n_risk").cast("double")
    // snapped ln(1 − d/n); d = n (last step, everyone events) → the
    // term is −∞: carry a "hit zero" flag instead of snapping −∞
    val lnTerm = when(col("d") < col("n_risk"),
      floor(log(lit(1.0) - frac) * lit(1e9) + lit(0.5))
        .cast("decimal(38,0)")).otherwise(lit(0).cast("decimal(38,0)"))
    val zeroHit = max(when(col("d") >= col("n_risk") && col("d") > 0L,
      lit(1)).otherwise(lit(0))).over(run)
    g.withColumn("lnS",
        sum(lnTerm).over(run).cast("double") / lit(1e9))
      .withColumn("z", zeroHit)
      .withColumn("H",
        sum(floor(frac * lit(1e9) + lit(0.5)).cast("decimal(38,0)"))
          .over(run).cast("double") / lit(1e9))
      .filter(col("d") > 0L)
      .select(col("t"), col("n_risk"), col("d"),
        when(col("z") === 1, lit(0.0))
          .otherwise(round(exp(col("lnS")), 6)).as("km_surv"),
        round(col("H"), 6).as("na_cumhaz"))
  }

  /** Kaplan–Meier with Greenwood pointwise confidence bands
    * (Greenwood 1926; the variance formula every survival package
    * reports alongside the curve — a KM estimate is decision-grade
    * only with its uncertainty):
    *   Var(S(t)) = S(t)² · Σ_{j ≤ t} d_j / (n_j·(n_j − d_j)),
    *   se = √Var,  CI = [max(0, S − z·se), min(1, S + z·se)]
    * (the plain/linear band, clamped to [0, 1]). Each Greenwood term
    * snaps to the 1e12 grid (finer than the 1e9 ln grid — the terms
    * are O(1/n²) and would lose ~1% relative precision at 1e9; the
    * cumulative Σ stays order-free and engine-exact either way). At
    * a d = n step (everyone at risk dies) the term is undefined and
    * S = 0 exactly: se/ci are NULL from that step on (NULL-for-
    * undefined, never ±Inf), matching the km zero-flag discipline.
    *
    * Scale shape: identical to [[kaplanMeier]] — one map-side-combined
    * per-step aggregation, then windows only over the calendar-bounded
    * step grid. All-censored input has no event steps → zero rows,
    * like the base curve. Returns one row per EVENT step:
    * (t, n_risk, d, km_surv, se, ci_lo, ci_hi), 6 dp. */
  def kaplanMeierGreenwood(units: DataFrame, duration: Column,
      event: Column, z: Double = 1.959964): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = units.select(duration.cast("long").as("t"),
        event.cast("boolean").as("e"))
      .groupBy(col("t"))
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave"))
    val atRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val run = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val g = per.withColumn("n_risk", sum(col("leave")).over(atRisk))
    val frac = col("d").cast("double") / col("n_risk").cast("double")
    val lnTerm = when(col("d") < col("n_risk"),
      floor(log(lit(1.0) - frac) * lit(1e9) + lit(0.5))
        .cast("decimal(38,0)")).otherwise(lit(0).cast("decimal(38,0)"))
    val zeroHit = max(when(col("d") >= col("n_risk") && col("d") > 0L,
      lit(1)).otherwise(lit(0))).over(run)
    // Greenwood term d/(n·(n−d)), 1e12-snapped; 0 at the d = n step
    // (the zero flag NULLs the band there anyway)
    val gwTerm = when(col("d") < col("n_risk"),
      floor(col("d").cast("double") /
          (col("n_risk").cast("double") *
            (col("n_risk") - col("d")).cast("double")) *
          lit(1e12) + lit(0.5)).cast("decimal(38,0)"))
      .otherwise(lit(0).cast("decimal(38,0)"))
    val surv = when(col("z") === 1, lit(0.0)).otherwise(exp(col("lnS")))
    val se = when(col("z") === 1, lit(null).cast("double"))
      .otherwise(surv * sqrt(col("gw")))
    // Spark's greatest/least SKIP NULLs (greatest(0, NULL) = 0), so
    // the NULL band must short-circuit before the clamp
    val lo = when(se.isNull, lit(null).cast("double"))
      .otherwise(greatest(lit(0.0), surv - lit(z) * se))
    val hi = when(se.isNull, lit(null).cast("double"))
      .otherwise(least(lit(1.0), surv + lit(z) * se))
    g.withColumn("lnS",
        sum(lnTerm).over(run).cast("double") / lit(1e9))
      .withColumn("z", zeroHit)
      .withColumn("gw", sum(gwTerm).over(run).cast("double") / lit(1e12))
      .filter(col("d") > 0L)
      .select(col("t"), col("n_risk"), col("d"),
        when(col("z") === 1, lit(0.0))
          .otherwise(round(exp(col("lnS")), 6)).as("km_surv"),
        round(se, 6).as("se"),
        round(lo, 6).as("ci_lo"),
        round(hi, 6).as("ci_hi"))
  }

  /** Two-arm log-rank test (Mantel 1966; Peto & Peto 1972) — "do the
    * arms share one hazard trajectory", the survival-side A/B verdict
    * that q251's single-number ratio test cannot give when the effect
    * is a DELAY rather than a level shift. Per event step t with
    * pooled deaths d and at-risk n, arm A expects E = d·n_a/n with
    * hypergeometric variance V = d·(n_a/n)·(1 − n_a/n)·(n − d)/(n − 1);
    *   χ² = (Σ(d_a − E))² / ΣV,   p = 2(1 − Φ(√χ²))  (df = 1, exact
    * through the shared erfc primitive — the q246 convention).
    * Both sums are 1e9-snapped (order-free). Steps with n ≤ 1
    * contribute nothing (V undefined); ΣV = 0 → NULL χ²/p.
    *
    * Scale shape: one aggregation to per-(step, arm) counts, reverse
    * cumulative at-risk windows over the calendar-bounded step×arm
    * grid, one single-row aggregate. Units with a NULL arm are
    * EXCLUDED up front (from risk sets AND totals): a NULL arm is
    * membership-unknown, and letting it into the pooled at-risk
    * counts while appearing in neither arm would skew E = d·n_a/n.
    * Returns one row: (n_a, n_b, events_a, events_b, chi2, p_value). */
  def logRank(units0: DataFrame, duration: Column, event: Column,
      isA: Column): DataFrame = {
    import graft.expr.Snap
    import org.apache.spark.sql.expressions.Window
    val units = units0.filter(isA.isNotNull)
    val per = units.select(duration.cast("long").as("t"),
        event.cast("boolean").as("e"), isA.as("a"))
      .groupBy(col("t"))
      .agg(sum(when(col("e") && col("a"), 1L).otherwise(0L)).as("da"),
        sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        sum(when(col("a"), 1L).otherwise(0L)).as("la"),
        count(lit(1)).as("l"))
    val atRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val g = per
      .withColumn("na", sum(col("la")).over(atRisk))
      .withColumn("n", sum(col("l")).over(atRisk))
      .filter(col("d") > 0L)
    val naD = col("na").cast("double")
    val nD = col("n").cast("double")
    val dD = col("d").cast("double")
    val e = dD * naD / nD
    val v = dD * (naD / nD) * (lit(1.0) - naD / nD) *
      (nD - dD) / (nD - lit(1.0))
    val s = g.agg(
      Snap.snappedSum(when(col("n") > 1L, col("da").cast("double") - e)
        .otherwise(lit(0.0)), 1e9).as("oe"),
      Snap.snappedSum(when(col("n") > 1L, v).otherwise(lit(0.0)), 1e9)
        .as("vv"))
    val tot = units.select(event.cast("boolean").as("e"), isA.as("a"))
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("e") && col("a"), 1L).otherwise(0L)).as("events_a"),
        sum(when(col("e") && !col("a"), 1L).otherwise(0L)).as("events_b"))
    val chi2 = col("oe") * col("oe") / col("vv")
    tot.crossJoin(broadcast(s))
      .select(col("n_a"), col("n_b"), col("events_a"), col("events_b"),
        round(when(col("vv") > 0.0, chi2), 6).as("chi2"),
        round(when(col("vv") > 0.0,
          Analytics.normalPValue2(sqrt(chi2))), 6).as("p_value"))
  }

  /** Weibull probability-plot fit over the Kaplan–Meier curve (Weibull
    * 1951; Nelson 1972's hazard-plotting convention): regress
    *   y = ln(−ln S(t))  on  x = ln t
    * by closed-form OLS; the slope IS the Weibull shape k and the
    * intercept −k·ln η recovers the scale η = exp(−b/k). One number
    * pair answers "is the conversion hazard rising or fading?"
    * (k > 1 vs k < 1) — the parametric summary the nonparametric
    * curve can't give, and the standard graphical-estimation recipe.
    *
    * Plot conventions (documented, both engines): t ≤ 0 steps are
    * excluded (ln t undefined — a same-day conversion step carries no
    * plot point) and so is the S = 0 zero-hit step (ln(−ln 0) = ∞).
    * All five OLS Σs snap to the 1e9 grid (order-free); fewer than 2
    * points, a degenerate x variance, or k = 0 → NULL fit
    * (NULL-for-undefined). The OLS runs over the CALENDAR-bounded
    * step grid — single-row output, no corpus-sized state. Returns
    * one row: (n_points, shape, scale, r2), 6 dp. */
  def weibullFit(units: DataFrame, duration: Column, event: Column)
      : DataFrame = {
    import graft.expr.Snap
    val km = kaplanMeierSteps(units, duration, event)
      .filter(col("d") > 0L && col("z") =!= 1 && col("t") > 0L)
      .select(log(col("t").cast("double")).as("x"),
        log(-col("lnS")).as("y"))
    def s9(c: Column): Column = Snap.snappedSum(c, 1e9)
    val m = km.agg(count(lit(1)).as("n"), s9(col("x")).as("sx"),
      s9(col("y")).as("sy"), s9(col("x") * col("x")).as("sxx"),
      s9(col("x") * col("y")).as("sxy"),
      s9(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val vx = nD * col("sxx") - col("sx") * col("sx")
    val vy = nD * col("syy") - col("sy") * col("sy")
    val cov = nD * col("sxy") - col("sx") * col("sy")
    val k = cov / vx
    val b = (col("sy") - k * col("sx")) / nD
    val fit = when(col("n") >= 2L && vx > 0.0, k)
    m.select(col("n").as("n_points"),
      round(fit, 6).as("shape"),
      round(when(fit.isNotNull && fit =!= 0.0, exp(-b / k)), 6)
        .as("scale"),
      round(when(fit.isNotNull && vy > 0.0, cov * cov / (vx * vy)), 6)
        .as("r2"))
  }

  /** Aalen–Johansen cumulative incidence for COMPETING risks
    * (Kalbfleisch & Prentice 1980 §8; Aalen & Johansen 1978): when a
    * unit can exit to one of several mutually exclusive causes, the
    * naive "1 − KM of cause k, censoring the others" OVERSTATES every
    * cause (it redistributes competitors' mass); the correct estimand
    * is
    *   CIF_k(t) = Σ_{j ≤ t} S(t_{j−1}) · d_kj / n_j
    * with S the ALL-CAUSE Kaplan–Meier. `cause` is a string column,
    * NULL = censored. Identity Σ_k CIF_k(t) + S(t) = 1 (spec-pinned).
    * S(t_{j−1}) evaluates as exp of the snapped Σ of PRIOR steps' ln
    * terms (an unboundedPreceding..−1 frame — empty = S(0) = 1);
    * per-cause CIF terms snap to the 1e9 grid and cumulate over a
    * cause-PARTITIONED window on the step grid.
    *
    * Scale shape: one aggregation to the all-cause step table, one to
    * the (step, cause) event counts; every window runs on the
    * calendar-bounded step grid ([[kaplanMeier]]'s contract), the
    * cause-cumulative one partitioned by cause. Returns one row per
    * (event step, cause) with d_k > 0: (t, cause, n_risk, d, cif). */
  def cumulativeIncidence(units: DataFrame, duration: Column,
      cause: Column): DataFrame = {
    val u = units.select(duration.cast("long").as("t"),
      cause.cast("string").as("k"))
    val per = u.groupBy(col("t"))
      .agg(sum(when(col("k").isNotNull, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave"))
    val dk = u.filter(col("k").isNotNull)
      .groupBy(col("t"), col("k")).agg(count(lit(1)).as("dk"))
    cumulativeIncidenceFromCounts(per, dk)
  }

  /** The counts→curves stage of [[cumulativeIncidence]]: `per` is the
    * all-cause (t, d, leave) LONG count table, `dk` the per-(t, cause)
    * event counts — both exact integers, additive across any batching,
    * so a streaming sink can maintain them and re-emit the CIF curves
    * per epoch bit-identically to batch. */
  private[graft] def cumulativeIncidenceFromCounts(per: DataFrame,
      dk: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val atRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val prior = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val g = per.withColumn("n_risk", sum(col("leave")).over(atRisk))
    val frac = col("d").cast("double") / col("n_risk").cast("double")
    val lnTerm = when(col("d") < col("n_risk") && col("d") > 0L,
      floor(log(lit(1.0) - frac) * lit(1e9) + lit(0.5))
        .cast("decimal(38,0)")).otherwise(lit(0).cast("decimal(38,0)"))
    // S(t_{j−1}): prior-steps-only frame; the d = n step poisons only
    // LATER frames, and no later step exists once everyone is gone
    val zeroPrior = max(when(col("d") >= col("n_risk") && col("d") > 0L,
      lit(1)).otherwise(lit(0))).over(prior)
    val steps = g
      .withColumn("sPrev", when(coalesce(zeroPrior, lit(0)) === 1, lit(0.0))
        .otherwise(exp(coalesce(sum(lnTerm).over(prior)
          .cast("double"), lit(0.0)) / lit(1e9))))
    val term = floor(col("sPrev") * col("dk").cast("double") /
      col("n_risk").cast("double") * lit(1e9) + lit(0.5))
      .cast("decimal(38,0)")
    val byCause = Window.partitionBy(col("k")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dk.join(steps, "t")
      .withColumn("cif",
        sum(term).over(byCause).cast("double") / lit(1e9))
      .select(col("t"), col("k").as("cause"), col("n_risk"),
        col("dk").as("d"), round(col("cif"), 6).as("cif"))
  }

  /** Stratified two-arm log-rank test (Mantel 1966; Klein &
    * Moeschberger 2003 §7.5): the q255 verdict made confounder-safe —
    * each stratum contributes its own per-step hypergeometric O − E
    * and V (so a stratum-level imbalance in arm mix cannot fake a
    * hazard difference), and the strata pool by plain summation:
    *   χ² = (Σ_s Σ_j (O − E))² / Σ_s Σ_j V,  df = 1.
    * NULL-arm and NULL-stratum units are excluded up front (same
    * rationale as [[logRank]]). Both Σs 1e9-snapped; ΣV = 0 → NULL.
    *
    * Scale shape: one aggregation to the (stratum, step) grid; the
    * at-risk windows PARTITION BY stratum (parallel across strata,
    * each frame calendar-bounded); one single-row aggregate. Returns
    * one row: (n_strata, n_a, n_b, events_a, events_b, chi2,
    * p_value). */
  def logRankStratified(units0: DataFrame, duration: Column,
      event: Column, isA: Column, stratum: Column): DataFrame = {
    import graft.expr.Snap
    import org.apache.spark.sql.expressions.Window
    val units = units0.filter(isA.isNotNull && stratum.isNotNull)
    val per = units.select(stratum.cast("string").as("s"),
        duration.cast("long").as("t"),
        event.cast("boolean").as("e"), isA.as("a"))
      .groupBy(col("s"), col("t"))
      .agg(sum(when(col("e") && col("a"), 1L).otherwise(0L)).as("da"),
        sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        sum(when(col("a"), 1L).otherwise(0L)).as("la"),
        count(lit(1)).as("l"))
    val atRisk = Window.partitionBy(col("s")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val g = per
      .withColumn("na", sum(col("la")).over(atRisk))
      .withColumn("n", sum(col("l")).over(atRisk))
      .filter(col("d") > 0L)
    val naD = col("na").cast("double")
    val nD = col("n").cast("double")
    val dD = col("d").cast("double")
    val e = dD * naD / nD
    val v = dD * (naD / nD) * (lit(1.0) - naD / nD) *
      (nD - dD) / (nD - lit(1.0))
    val sAgg = g.agg(
      Snap.snappedSum(when(col("n") > 1L, col("da").cast("double") - e)
        .otherwise(lit(0.0)), 1e9).as("oe"),
      Snap.snappedSum(when(col("n") > 1L, v).otherwise(lit(0.0)), 1e9)
        .as("vv"))
    val tot = units.select(event.cast("boolean").as("e"), isA.as("a"),
        stratum.cast("string").as("s"))
      .agg(countDistinct(col("s")).as("n_strata"),
        sum(when(col("a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("a"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("e") && col("a"), 1L).otherwise(0L)).as("events_a"),
        sum(when(col("e") && !col("a"), 1L).otherwise(0L)).as("events_b"))
    val chi2 = col("oe") * col("oe") / col("vv")
    tot.crossJoin(broadcast(sAgg))
      .select(col("n_strata"), col("n_a"), col("n_b"),
        col("events_a"), col("events_b"),
        round(when(col("vv") > 0.0, chi2), 6).as("chi2"),
        round(when(col("vv") > 0.0,
          Analytics.normalPValue2(sqrt(chi2))), 6).as("p_value"))
  }

  /** Shared per-step scaffold: (t, d, leave, n_risk, lnS, z) — the
    * kaplanMeier internals exposed for derived fits ([[weibullFit]]).
    * lnS = the snapped cumulative ln-survival INCLUDING step t; z = 1
    * from the first d = n step on. */
  private[graft] def kaplanMeierSteps(units: DataFrame, duration: Column,
      event: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = units.select(duration.cast("long").as("t"),
        event.cast("boolean").as("e"))
      .groupBy(col("t"))
      .agg(sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave"))
    val atRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val run = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val g = per.withColumn("n_risk", sum(col("leave")).over(atRisk))
    val frac = col("d").cast("double") / col("n_risk").cast("double")
    val lnTerm = when(col("d") < col("n_risk"),
      floor(log(lit(1.0) - frac) * lit(1e9) + lit(0.5))
        .cast("decimal(38,0)")).otherwise(lit(0).cast("decimal(38,0)"))
    val zeroHit = max(when(col("d") >= col("n_risk") && col("d") > 0L,
      lit(1)).otherwise(lit(0))).over(run)
    g.withColumn("lnS",
        sum(lnTerm).over(run).cast("double") / lit(1e9))
      .withColumn("z", zeroHit)
  }

  /** Restricted mean survival time at horizon `tau` (Royston & Parmar
    * 2013's recommended reporting scalar; Uno et al. 2014) — the area
    * under the Kaplan–Meier curve on [0, τ]: the expected number of
    * event-free DAYS within the horizon, the "days gained" number a
    * hazard ratio can't give when proportional hazards is in doubt
    * (and the only honest scalar when curves CROSS). Integrates the
    * right-continuous KM step function exactly: S = 1 before the
    * first event step,
    *   RMST = Σ_j S_{j−1}·(min(t_j, τ) − min(t_{j−1}, τ))
    *          + S_k·(τ − min(t_k, τ)),
    * segment terms 1e9-snapped (order-free); no events at all → S ≡ 1
    * → RMST = τ exactly. All windows run on the calendar-bounded
    * event-step grid ([[kaplanMeier]]'s contract). Returns one row:
    * (tau, n_units, n_events, rmst), 6 dp. */
  def rmst(units: DataFrame, duration: Column, event: Column, tau: Long)
      : DataFrame = {
    require(tau > 0L, s"rmst: tau=$tau")
    import org.apache.spark.sql.expressions.Window
    val km = kaplanMeier(units, duration, event)
    val w = Window.orderBy(col("t"))
    val clamped = least(col("t"), lit(tau))
    val prevT = coalesce(lag(least(col("t"), lit(tau)), 1).over(w),
      lit(0L))
    val prevS = coalesce(lag(col("km_surv"), 1).over(w), lit(1.0))
    val seg = km.select(col("t"), col("km_surv"),
      (prevS * (clamped - prevT).cast("double")).as("seg"))
    val a = seg.agg(
      (sum(floor(col("seg") * lit(1e9) + lit(0.5)).cast("decimal(38,0)"))
        .cast("double") / lit(1e9)).as("area"),
      max(struct(col("t"), col("km_surv"))).as("last"))
    val tot = units.select(event.cast("boolean").as("e"))
      .agg(count(lit(1)).as("n_units"),
        sum(when(col("e"), 1L).otherwise(0L)).as("n_events"))
    val lastT = col("last").getField("t")
    val lastS = col("last").getField("km_surv")
    // least() IGNORES NULLs (least(NULL, τ) = τ), so an empty curve
    // needs an explicit isNull branch to clamp to 0, not τ
    val tail = coalesce(lastS, lit(1.0)) *
      (lit(tau) - when(lastT.isNull, lit(0L))
        .otherwise(least(lastT, lit(tau)))).cast("double")
    tot.crossJoin(broadcast(a))
      .select(lit(tau).as("tau"), col("n_units"), col("n_events"),
        round(coalesce(col("area"), lit(0.0)) + tail, 6).as("rmst"))
  }

  /** Cox proportional-hazards fit for ONE binary covariate (the arm),
    * Breslow tie handling, TWO Newton–Raphson steps from β = 0 (Cox
    * 1972; the fixed-step unrolled trajectory is the q201 contract —
    * and step 1 from zero IS the log-rank score test, so the pair
    * q255/q256 share scaffolding by mathematics, not convenience).
    * Per event step with d deaths (s1 of them in arm A), n1/n0 at
    * risk per arm, and r = e^β:
    *   U(β) = Σ s1 − d·(n1·r)/(n0 + n1·r),
    *   I(β) = Σ d·(n0·n1·r)/(n0 + n1·r)²,
    *   β ← β + U(β)/I(β).
    * The data-dependent β re-enters each refinement pass as a
    * BROADCAST SCALAR COLUMN (cross join of a one-row frame — exp(β)
    * evaluates in-plan), never a driver collect; every Σ is
    * 1e9-snapped, so both steps replay exactly in any engine.
    *
    * Scale shape: the per-step table materializes ONCE (three
    * consumers: β₁ pass, β₂ pass, the final information pass);
    * everything after the one corpus aggregation is
    * calendar-grid-sized. I(0) = 0 (single arm, no events) → NULL
    * everything — including the no-event-step case (empty/all-censored
    * input), which still emits EXACTLY one row (counts + NULL fit):
    * the refinement passes aggregate globally, never via a groupBy
    * that would vanish on empty input. Units with a NULL arm are
    * excluded up front (same rationale as [[logRank]]). Returns one
    * row: (n_a, n_b, events_a, events_b, beta, hazard_ratio, se, z,
    * p_value) — hazard_ratio = e^β, se = 1/√I(β₂), 6 dp. */
  def coxHazard(units0: DataFrame, duration: Column, event: Column,
      isA: Column,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val units = units0.filter(isA.isNotNull)
    val per = units.select(duration.cast("long").as("t"),
        event.cast("boolean").as("e"), isA.as("a"))
      .groupBy(col("t"))
      .agg(sum(when(col("e") && col("a"), 1L).otherwise(0L)).as("s1"),
        sum(when(col("e"), 1L).otherwise(0L)).as("d"),
        sum(when(col("a"), 1L).otherwise(0L)).as("la"),
        count(lit(1)).as("l"))
    val atRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val st = materialize(per
      .withColumn("n1", sum(col("la")).over(atRisk))
      .withColumn("n", sum(col("l")).over(atRisk))
      .withColumn("n0", col("n") - col("n1"))
      .filter(col("d") > 0L)
      .select(col("s1").cast("double").as("s1"),
        col("d").cast("double").as("d"),
        col("n0").cast("double").as("n0"),
        col("n1").cast("double").as("n1")))
    def snap9(c: Column): Column =
      sum(floor(c * lit(1e9) + lit(0.5)).cast("decimal(38,0)"))
        .cast("double") / lit(1e9)
    def uTerm(r: Column): Column =
      col("s1") - col("d") * (col("n1") * r) / (col("n0") + col("n1") * r)
    def iTerm(r: Column): Column =
      col("d") * (col("n0") * col("n1") * r) /
        ((col("n0") + col("n1") * r) * (col("n0") + col("n1") * r))
    // Newton step 1 from β = 0 (r = 1)
    val a0 = st.agg(snap9(uTerm(lit(1.0))).as("u"),
      snap9(iTerm(lit(1.0))).as("i"))
    val b1 = a0.select(
      when(col("i") > 0.0, col("u") / col("i")).as("beta"))
    // Newton step 2 at β₁ (r = e^β₁ evaluates in-plan). GLOBAL agg
    // (β recovered by max — it is a broadcast constant per row), NOT
    // groupBy(beta): a groupBy over an empty step table yields ZERO
    // rows and the final cross join would drop the totals row,
    // breaking the one-row contract for all-censored inputs.
    val a1 = st.crossJoin(broadcast(b1))
      .agg(max(col("beta")).as("beta"),
        snap9(uTerm(exp(col("beta")))).as("u"),
        snap9(iTerm(exp(col("beta")))).as("i"))
    val b2 = a1.select(
      when(col("i") > 0.0, col("beta") + col("u") / col("i")).as("beta"))
    // final observed information at β₂ for the Wald se
    val a2 = st.crossJoin(broadcast(b2))
      .agg(max(col("beta")).as("beta"),
        snap9(iTerm(exp(col("beta")))).as("i2"))
    // counts coalesce to 0 (a global sum over EMPTY input is NULL —
    // the one-row contract reports zero units, not unknown units)
    val tot = units.select(event.cast("boolean").as("e"), isA.as("a"))
      .agg(coalesce(sum(when(col("a"), 1L).otherwise(0L)), lit(0L)).as("n_a"),
        coalesce(sum(when(!col("a"), 1L).otherwise(0L)), lit(0L)).as("n_b"),
        coalesce(sum(when(col("e") && col("a"), 1L).otherwise(0L)),
          lit(0L)).as("events_a"),
        coalesce(sum(when(col("e") && !col("a"), 1L).otherwise(0L)),
          lit(0L)).as("events_b"))
    val se = lit(1.0) / sqrt(col("i2"))
    val z = col("beta") * sqrt(col("i2"))
    tot.crossJoin(broadcast(a2))
      .select(col("n_a"), col("n_b"), col("events_a"), col("events_b"),
        round(col("beta"), 6).as("beta"),
        round(exp(col("beta")), 6).as("hazard_ratio"),
        round(when(col("i2") > 0.0, se), 6).as("se"),
        round(when(col("i2") > 0.0, z), 6).as("z"),
        round(when(col("i2") > 0.0,
          Analytics.normalPValue2(z)), 6).as("p_value"))
  }
}
