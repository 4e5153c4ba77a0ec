package graft

import org.apache.spark.sql.functions._

/** Hand-derived pins for the survival pair ([[graft.ops.Survival]]):
  * Kaplan–Meier with right censoring and the two-arm log-rank test. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Survival

  test("kaplanMeier: hand product-limit with censoring; exact zero at " +
    "a full-death last step; censored-only steps emit no row") {
    // durations (days, event?): events at t=1 (×2) and t=3; censored
    // at t=2 and t=4. S(1) = 1 − 2/5 = 0.6; at t=3 only {3, 4} remain
    // → S(3) = 0.6·(1 − 1/2) = 0.3; H = 0.4 then 0.9
    val u = Seq((1L, true), (1L, true), (2L, false), (3L, true),
      (4L, false)).toDF("t", "e")
    val r = Survival.kaplanMeier(u, col("t"), col("e"))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))))
      .toMap
    assert(r == Map(1L -> ((5L, 2L, 0.6, 0.4)),
      3L -> ((2L, 1L, 0.3, 0.9))))
    // everyone events at the same step: S hits EXACTLY zero (the ln 0
    // guard), H = 1
    val z = Survival.kaplanMeier(Seq((1L, true), (1L, true)).toDF("t", "e"),
      col("t"), col("e")).collect().head
    assert(z.getLong(1) == 2L && z.getLong(2) == 2L)
    assert(z.getDouble(3) == 0.0 && z.getDouble(4) == 1.0)
    // censoring ≠ event: a censored-at-t unit keeps others' n_risk up
    // but never creates an output row of its own
    assert(!r.contains(2L) && !r.contains(4L))
  }

  test("kaplanMeierGreenwood: hand-derived se and clamped linear CI; " +
    "the d = n zero step NULLs the band; all-censored gives zero rows") {
    val u = Seq((1L, true), (1L, true), (2L, false), (3L, true),
      (4L, false)).toDF("t", "e")
    val r = Survival.kaplanMeierGreenwood(u, col("t"), col("e"))
      .collect().map(x => x.getLong(0) -> x).toMap
    // replicate the snapped arithmetic: lnS on the 1e9 grid, Greenwood
    // terms on the 1e12 grid, se = exp(lnS)·sqrt(Σ), CI clamped
    def s9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def s12(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val ln1 = s9(math.log(1.0 - 2.0 / 5.0))
    val gw1 = s12(2.0 / (5.0 * 3.0))
    val se1 = math.exp(ln1) * math.sqrt(gw1)
    assert(r(1L).getDouble(4) == r6(se1))
    assert(r(1L).getDouble(5) ==
      r6(math.max(0.0, math.exp(ln1) - 1.959964 * se1)))
    assert(r(1L).getDouble(6) ==
      r6(math.min(1.0, math.exp(ln1) + 1.959964 * se1)))
    val ln3 = ln1 + s9(math.log(1.0 - 1.0 / 2.0))
    val gw3 = gw1 + s12(1.0 / (2.0 * 1.0))
    val se3 = math.exp(ln3) * math.sqrt(gw3)
    assert(r(3L).getDouble(3) == 0.3 && r(3L).getDouble(4) == r6(se3))
    // everyone dies at one step: S = 0 exactly, band NULL (the
    // Greenwood term is undefined at d = n — NULL-for-undefined)
    val z = Survival.kaplanMeierGreenwood(
      Seq((1L, true), (1L, true)).toDF("t", "e"), col("t"), col("e"))
      .collect().head
    assert(z.getDouble(3) == 0.0)
    assert(z.isNullAt(4) && z.isNullAt(5) && z.isNullAt(6))
    // all censored: no event steps -> zero rows (the base-curve
    // contract; the caller reads "no curve", not a fake flat band)
    assert(Survival.kaplanMeierGreenwood(
      Seq((2L, false), (5L, false)).toDF("t", "e"),
      col("t"), col("e")).count() == 0L)
  }

  test("coxHazard: plain-Scala replay of the two snapped Newton steps " +
    "matches exactly; identical arms fit beta = 0; single arm is NULL") {
    import graft.ops.Survival
    // A events at t = 1, 2; B at t = 3, 4 (no censoring) — A's hazard
    // is clearly higher, so beta > 0 and hr > 1
    val u = Seq((1L, true, true), (2L, true, true),
      (3L, true, false), (4L, true, false)).toDF("t", "e", "a")
    val r = Survival.coxHazard(u, col("t"), col("e"), col("a"))
      .collect().head
    // replicate the operator's arithmetic: per-step (s1, d, n0, n1),
    // terms snapped to the 1e9 grid, exact integer sums
    val steps = Seq((1.0, 1.0, 2.0, 2.0), (1.0, 1.0, 2.0, 1.0),
      (0.0, 1.0, 2.0, 0.0), (0.0, 1.0, 1.0, 0.0))
    def s9(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * 1e9 + 0.5)).sum / 1e9
    def uu(rr: Double): Double = s9(steps.map { case (s1, d, n0, n1) =>
      s1 - d * (n1 * rr) / (n0 + n1 * rr) })
    def ii(rr: Double): Double = s9(steps.map { case (s1, d, n0, n1) =>
      d * (n0 * n1 * rr) / ((n0 + n1 * rr) * (n0 + n1 * rr)) })
    val b1 = uu(1.0) / ii(1.0)
    val b2 = b1 + uu(math.exp(b1)) / ii(math.exp(b1))
    val i2 = ii(math.exp(b2))
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getDouble(4) == r6(b2), s"beta ${r.getDouble(4)} vs $b2")
    assert(r.getDouble(5) == r6(math.exp(b2)))
    assert(r.getDouble(6) == r6(1.0 / math.sqrt(i2)))
    assert(r.getDouble(7) == r6(b2 * math.sqrt(i2)))
    assert(b2 > 0 && r.getDouble(5) > 1.0) // direction: A dies faster
    // identical arms: U(0) snaps to exactly 0 -> beta stays 0, hr = 1
    val same = Seq((1L, true, true), (3L, true, true),
      (1L, true, false), (3L, true, false)).toDF("t", "e", "a")
    val rs = Survival.coxHazard(same, col("t"), col("e"), col("a"))
      .collect().head
    assert(rs.getDouble(4) == 0.0 && rs.getDouble(5) == 1.0)
    assert(rs.getDouble(8) == 1.0) // p
    // single arm: information is 0 at every step -> NULL fit
    val one = Survival.coxHazard(
      Seq((1L, true, true), (2L, true, true)).toDF("t", "e", "a"),
      col("t"), col("e"), col("a")).collect().head
    assert(one.isNullAt(4) && one.isNullAt(8))
  }

  test("rmst: exact step-function integral with censoring and the " +
    "post-last-step tail; no events at all gives RMST = tau") {
    import graft.ops.Survival
    // events at t=2 (S -> 0.666667) and t=4 (S -> 0.333333), censored
    // at t=6: area = 1*2 + 0.666667*2 = 3.333334, tail =
    // 0.333333*(10-4) = 1.999998 -> RMST = 5.333332
    val u = Seq((2L, true), (4L, true), (6L, false)).toDF("t", "e")
    val r = Survival.rmst(u, col("t"), col("e"), 10L).collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 5.333332)
    // all censored: S stays 1 on the whole horizon
    val none = Survival.rmst(Seq((3L, false), (7L, false)).toDF("t", "e"),
      col("t"), col("e"), 10L).collect().head
    assert(none.getLong(2) == 0L && none.getDouble(3) == 10.0)
    // events beyond the horizon contribute nothing past tau
    val late = Survival.rmst(Seq((20L, true)).toDF("t", "e"),
      col("t"), col("e"), 10L).collect().head
    assert(late.getDouble(3) == 10.0)
  }

  test("logRank: identical arms score chi2 = 0, p = 1; a single-arm " +
    "input has zero variance -> NULL (not a fake verdict)") {
    // two identical arms: O − E = 0 at every step exactly
    val u = Seq((1L, true, true), (3L, true, true), (5L, false, true),
      (1L, true, false), (3L, true, false), (5L, false, false))
      .toDF("t", "e", "a")
    val r = Survival.logRank(u, col("t"), col("e"), col("a"))
      .collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 1.0)
    // all units in one arm: hypergeometric variance is 0 at every
    // step -> chi2/p NULL
    val one = Survival.logRank(
      Seq((1L, true, true), (2L, true, true)).toDF("t", "e", "a"),
      col("t"), col("e"), col("a")).collect().head
    assert(one.isNullAt(4) && one.isNullAt(5))
    // a real separation (arm A events early, arm B late) scores > 0
    val sep = Survival.logRank(
      Seq((1L, true, true), (1L, true, true), (9L, true, false),
        (9L, true, false)).toDF("t", "e", "a"),
      col("t"), col("e"), col("a")).collect().head
    assert(sep.getDouble(4) > 0.0 && sep.getDouble(5) < 1.0)
  }

  test("weibullFit: exact recovery on a true-Weibull plot (two-point " +
    "line); degenerate inputs give NULL (n<2, flat x, k=0)") {
    // two event steps, no censoring: n=4 at t=2 (1 death), n=3 at t=4
    // (1 death) — recompute the snapped plot + OLS in plain Scala and
    // pin bit-equality at the 6-dp grid
    val u = Seq((2L, true), (4L, true), (5L, false), (6L, false))
      .toDF("t", "e")
    val r = Survival.weibullFit(u, col("t"), col("e")).collect().head
    def s9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val ln1 = s9(math.log(1.0 - 1.0 / 4.0))
    val ln2 = ln1 + s9(math.log(1.0 - 1.0 / 3.0))
    val pts = Seq((math.log(2.0), math.log(-ln1)),
      (math.log(4.0), math.log(-ln2)))
    val n = pts.size.toDouble
    // replicate the operator's per-term snapping exactly: Σ of
    // floor(x·1e9+0.5) terms
    def snapSum(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * 1e9 + 0.5)).sum / 1e9
    val sx2 = snapSum(pts.map(_._1)); val sy2 = snapSum(pts.map(_._2))
    val sxx = snapSum(pts.map(p => p._1 * p._1))
    val sxy = snapSum(pts.map(p => p._1 * p._2))
    val syy = snapSum(pts.map(p => p._2 * p._2))
    val vx = n * sxx - sx2 * sx2; val vy = n * syy - sy2 * sy2
    val cov = n * sxy - sx2 * sy2
    val k = cov / vx; val b = (sy2 - k * sx2) / n
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == r6(k))
    assert(r.getDouble(2) == r6(math.exp(-b / k)))
    assert(r.getDouble(3) == r6(cov * cov / (vx * vy)))
    // one plot point -> NULL fit (n < 2)
    val one = Survival.weibullFit(Seq((3L, true), (5L, false))
      .toDF("t", "e"), col("t"), col("e")).collect().head
    assert(one.getLong(0) == 1L && one.isNullAt(1) && one.isNullAt(2))
    // t = 0 steps carry no plot point (ln 0 undefined)
    val zt = Survival.weibullFit(Seq((0L, true), (5L, false))
      .toDF("t", "e"), col("t"), col("e")).collect().head
    assert(zt.getLong(0) == 0L && zt.isNullAt(1))
  }

  test("cumulativeIncidence: hand Aalen–Johansen; sum of CIFs + " +
    "all-cause S = 1; naive per-cause KM would overstate") {
    // 4 units: cause X at t=1, cause Y at t=2, censored at t=3,
    // cause X at t=4.
    // S(0)=1: CIF_X(1) = 1·1/4 = 0.25; S(1) = 3/4.
    // CIF_Y(2) = 0.75·1/3 = 0.25; S(2) = 0.75·2/3 = 0.5.
    // t=3 censored (no CIF row). t=4: n=1, d=1 -> CIF_X(4) = 0.25 +
    // S(3)=0.5 · 1/1 = 0.75.
    val u = Seq((1L, Some("x")), (2L, Some("y")),
      (3L, Option.empty[String]), (4L, Some("x"))).toDF("t", "k")
    val r = Survival.cumulativeIncidence(u, col("t"), col("k"))
      .collect().map(x => (x.getLong(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r == Map((1L, "x") -> ((4L, 1L, 0.25)),
      (2L, "y") -> ((3L, 1L, 0.25)),
      (4L, "x") -> ((1L, 1L, 0.75))))
    // identity: final Σ_k CIF_k = 1 − S(final) — here everyone is
    // gone by t=4 (the last at-risk unit events), so ΣCIF = 1
    assert(r((4L, "x"))._3 + r((2L, "y"))._3 == 1.0)
  }

  test("logRankStratified: a single stratum reproduces plain logRank; " +
    "identical arms inside each stratum score 0 even when the " +
    "stratum MIX differs by arm (the Simpson guard)") {
    val u1 = Seq((1L, true, true, "s"), (3L, true, true, "s"),
      (5L, false, true, "s"), (1L, true, false, "s"),
      (3L, true, false, "s"), (5L, false, false, "s"))
      .toDF("t", "e", "a", "s")
    val rs = Survival.logRankStratified(u1, col("t"), col("e"),
      col("a"), col("s")).collect().head
    val rp = Survival.logRank(u1, col("t"), col("e"), col("a"))
      .collect().head
    assert(rs.getLong(0) == 1L)
    assert(rs.getDouble(5) == rp.getDouble(4)) // chi2 equal
    assert(rs.getDouble(6) == rp.getDouble(5)) // p equal
    // two strata with very different hazards; per-stratum the arms
    // carry IDENTICAL duration profiles (arm A = 2 copies in fast,
    // 1 in slow; B the reverse) — the arm mix differs by stratum but
    // O = E inside every stratum, so the stratified verdict is 0
    val prof = (arm: Boolean, s: String, copies: Int,
        p: Seq[(Long, Boolean)]) =>
      Seq.fill(copies)(p).flatten.map { case (t, e) => (t, e, arm, s) }
    val fast = Seq((1L, true), (2L, true))
    val slow = Seq((9L, true), (10L, false))
    val mix = (prof(true, "fast", 2, fast) ++ prof(false, "fast", 1, fast)
      ++ prof(true, "slow", 1, slow) ++ prof(false, "slow", 2, slow))
      .toDF("t", "e", "a", "s")
    val strat = Survival.logRankStratified(mix, col("t"), col("e"),
      col("a"), col("s")).collect().head
    assert(strat.getLong(0) == 2L)
    assert(strat.getDouble(5) == 0.0) // O = E inside every stratum
    assert(strat.getDouble(6) == 1.0)
  }

  test("logRank/coxHazard: NULL-arm units are excluded from risk sets " +
    "AND totals (not half-counted into the pooled n)") {
    // two identical arms plus a NULL-arm unit that events first: if
    // the NULL unit leaked into the pooled at-risk counts (the old
    // behavior), E = d*na/n would shift and chi2 would leave 0
    val u = Seq((1L, true, Some(true)), (3L, true, Some(true)),
      (1L, true, Some(false)), (3L, true, Some(false)),
      (0L, true, Option.empty[Boolean])).toDF("t", "e", "a")
    val r = Survival.logRank(u, col("t"), col("e"), col("a"))
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L) // NULL not counted
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 1.0)
    val c = Survival.coxHazard(u, col("t"), col("e"), col("a"))
      .collect().head
    assert(c.getLong(0) == 2L && c.getLong(1) == 2L)
    assert(c.getDouble(4) == 0.0) // identical arms stay beta = 0
  }

  test("startKmSink: final emission ≡ batch kaplanMeier over all " +
    "units, under shuffled batch splits (exact long-count state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val all = Seq((1L, true), (1L, true), (2L, false), (3L, true),
      (4L, false), (3L, true), (7L, true), (5L, false))
    def run(batches: Seq[Seq[(Long, Boolean)]]): Seq[String] = {
      val ms = MemoryStream[(Long, Boolean)]
      val out = scala.collection.mutable.Map[Long, Seq[String]]()
      val q = graft.stream.StreamSurvival.startKmSink(
        ms.toDF().toDF("dur", "ev"), "dur", "ev",
        java.nio.file.Files.createTempDirectory("km-ckpt").toString,
        (df, epoch) => out.synchronized {
          out(epoch) = df.collect().map(_.toString).sorted.toSeq
        })
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      out.synchronized(out(out.keys.max))
    }
    val want = Survival.kaplanMeier(all.toDF("t", "e"), col("t"),
      col("e")).collect().map(_.toString).sorted.toSeq
    val a = run(Seq(all.take(3), all.slice(3, 6), all.drop(6)))
    val b = run(Seq(Seq(all(7), all(0)), Seq(all(5), all(2), all(4)),
      Seq(all(1), all(6), all(3))))
    assert(a == want, s"split A diverged:\n$a\nvs\n$want")
    assert(b == want, s"split B diverged:\n$b\nvs\n$want")
  }

  test("startCifSink: final emission ≡ batch cumulativeIncidence over " +
    "all units, under shuffled batch splits (two long-count tables)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val all = Seq((1L, Some("x")), (2L, Some("y")),
      (3L, Option.empty[String]), (4L, Some("x")), (2L, Some("x")),
      (5L, Option.empty[String]), (1L, Some("y")), (7L, Some("x")))
    def run(batches: Seq[Seq[(Long, Option[String])]]): Seq[String] = {
      val ms = MemoryStream[(Long, Option[String])]
      val out = scala.collection.mutable.Map[Long, Seq[String]]()
      val q = graft.stream.StreamSurvival.startCifSink(
        ms.toDF().toDF("dur", "cause"), "dur", "cause",
        java.nio.file.Files.createTempDirectory("cif-ckpt").toString,
        (df, epoch) => out.synchronized {
          out(epoch) = df.collect().map(_.toString).sorted.toSeq
        })
      try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      finally q.stop()
      out.synchronized(out(out.keys.max))
    }
    val want = Survival.cumulativeIncidence(all.toDF("t", "k"),
      col("t"), col("k")).collect().map(_.toString).sorted.toSeq
    val a = run(Seq(all.take(3), all.slice(3, 6), all.drop(6)))
    val b = run(Seq(Seq(all(7), all(0)), Seq(all(5), all(2), all(4)),
      Seq(all(1), all(6), all(3))))
    assert(a == want, s"split A diverged:\n$a\nvs\n$want")
    assert(b == want, s"split B diverged:\n$b\nvs\n$want")
  }

  test("coxHazard: all-censored / empty inputs still emit EXACTLY one " +
    "row (counts + NULL fit), per the one-row contract") {
    // all censored: no event steps at all -> the step table is empty;
    // the global-agg refinement passes must still carry one row through
    val cen = Survival.coxHazard(
      Seq((1L, false, true), (2L, false, false)).toDF("t", "e", "a"),
      col("t"), col("e"), col("a")).collect()
    assert(cen.length == 1)
    assert(cen.head.getLong(0) == 1L && cen.head.getLong(1) == 1L)
    assert(cen.head.getLong(2) == 0L && cen.head.getLong(3) == 0L)
    (4 to 8).foreach(i => assert(cen.head.isNullAt(i), s"col $i"))
    // fully empty input: one row of zero counts + NULL fit
    val emp = Survival.coxHazard(
      Seq.empty[(Long, Boolean, Boolean)].toDF("t", "e", "a"),
      col("t"), col("e"), col("a")).collect()
    assert(emp.length == 1)
    assert(emp.head.getLong(0) == 0L && emp.head.getLong(2) == 0L)
    (4 to 8).foreach(i => assert(emp.head.isNullAt(i), s"col $i"))
  }
}
