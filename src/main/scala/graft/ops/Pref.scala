package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation — the relational core of preference-
  * data curation (RLHF comparison sets, arena-style evals, reranker
  * training data): turn a table of duels into per-item strengths.
  *
  * Reference scope note: the reference pipeline has no preference
  * surface; this extends the engine for LLM-training data work the way
  * q121–q167 do (SURVEY §2 extension family).
  */
object Pref {

  /** Bradley–Terry strengths via Hunter (2004)'s MM iteration
    * ("MM algorithms for generalized Bradley–Terry models", Ann.
    * Statist. 32(1) §1, eq. 2), unrolled `iters` times from the
    * uniform start:
    *
    *   w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j),  then normalize Σ w = 1
    *
    * where W_i is i's total wins and n_ij the number of i-vs-j duels.
    * `duels` carries one row per duel (`win`, `lose`) with optional
    * multiplicity `weight` — FRACTIONAL weights are honored (the
    * common draw convention credits each side a 0.5-weight win), so
    * counts flow as doubles end-to-end. Returns
    * (item, strength, n_wins, n_duels) with double counts.
    *
    * Deterministic: both Σs use the [[graft.expr.Snap]] 1e9 snapped sum
    * (order-independent) and each iteration's normalized strengths snap
    * to the 6-dp grid (the q76 k-means trajectory contract), so the
    * whole MM trajectory is bit-identical across engines/partitionings
    * and an oracle can replay it as unrolled SQL. Winless items get
    * strength 0 (the MM fixed point for W_i = 0), not a dropped row.
    *
    * Scale shape: the duel table aggregates ONCE to the (item, item)
    * win matrix (map-side combine, then materialized — iterations must
    * not re-scan the duel source); every MM step joins the matrix
    * against the BROADCAST strength vector (|items| rows) and reduces
    * back to |items| rows. Cost per iteration: one broadcast join over
    * |item-pairs| ≤ |items|² rows + one |items|-row exchange — at
    * corpus scale items are sources/domains/policies, so the matrix is
    * dim-sized while the duel table can be arbitrarily large. */
  def bradleyTerry(duels: DataFrame, win: Column, lose: Column,
      weight: Column = lit(1L), iters: Int = 3,
      materialize: DataFrame => DataFrame = _.localCheckpoint(true))
      : DataFrame = {
    require(iters >= 1, s"bradleyTerry: iters=$iters")
    import graft.expr.Snap
    // one pass over the duel table → ordered-pair win counts; weights
    // stay double (snapped Σ, order-free) so fractional multiplicities
    // — e.g. 0.5-weight draws — are not truncated away
    val pw = materialize(duels
      .select(win.as("i"), lose.as("j"), weight.cast("double").as("nw"))
      .groupBy(col("i"), col("j"))
      .agg(Snap.snappedSum(col("nw"), 1e9).as("wij")))
    // symmetric duel counts n_ij and per-item totals — materialized:
    // nij feeds every MM round's denominator join AND the totals
    // build (4 consumers at iters=3), so lazy would re-run its
    // union+aggregation per round
    val nij = materialize(pw.select(col("i"), col("j"), col("wij").as("n"))
      .unionByName(pw.select(col("j").as("i"), col("i").as("j"),
        col("wij").as("n")))
      .groupBy(col("i"), col("j"))
      .agg(Snap.snappedSum(col("n"), 1e9).as("nij")))
    val wins = pw.groupBy(col("i"))
      .agg(Snap.snappedSum(col("wij"), 1e9).as("wi"))
    // the per-item totals are |items|-sized — the SAME driver-bounded
    // class as the strength vector the loop broadcasts every round —
    // so they live as one collected LOCAL relation: every loop join
    // against them broadcasts without a build job, and the initial
    // uniform vector is local too (round 1 pays no distributed
    // broadcast builds)
    val spark0 = duels.sparkSession
    val totalsDist = nij.groupBy(col("i"))
      .agg(Snap.snappedSum(col("nij"), 1e9).as("ni"))
      .join(wins, Seq("i"), "left")
      .select(col("i"), col("ni"), coalesce(col("wi"), lit(0.0)).as("wi"))
    val totals = spark0.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        totalsDist.collect().toSeq).asJava, totalsDist.schema)
    val iField = totals.select(col("i")).schema.fields(0)
    val wSchema = org.apache.spark.sql.types.StructType(Seq(iField,
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.DoubleType)))
    var w = totals.select(col("i"), lit(1.0).as("w"))
    for (_ <- 1 to iters) {
      val wb = broadcast(w)
      val denom = nij
        .join(wb.select(col("i"), col("w").as("wa")), "i")
        .join(wb.select(col("i").as("j"), col("w").as("wb")), "j")
        .groupBy(col("i"))
        .agg(Snap.snappedSum(
          col("nij").cast("double") / (col("wa") + col("wb")), 1e9).as("d"))
      val upd = totals.join(denom, "i")
        .select(col("i"), (col("wi").cast("double") / col("d")).as("w0"))
      // ONE action per MM round: collect the |items|-row vector — it
      // is BROADCAST next round anyway, so it already ships through
      // the driver and its size class is unchanged — and normalize on
      // the driver with the exact column twins (snappedSumDriver ≡
      // snappedSum, round6 ≡ round(·,6), both property-tested). The
      // former per-round localCheckpoint barrier cost ~13 sequential
      // jobs/round (r14 probe: 45 jobs, and the lazy-chain variant
      // still 33 at a WORSE wall — w feeds wa AND wb, so lineage
      // doubles); this shape is one job per round.
      val rows = upd.collect()
      val z = Snap.snappedSumDriver(rows.iterator.map(_.getDouble(1)), 1e9)
      val norm: Seq[org.apache.spark.sql.Row] = rows.toSeq.map(r =>
        org.apache.spark.sql.Row(r.get(0),
          graft.expr.catalyst.MmrSelect.round6(r.getDouble(1) / z)))
      w = spark0.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(norm).asJava, wSchema)
    }
    w.join(totals, "i")
      .select(col("i").as("item"), col("w").as("strength"),
        col("wi").as("n_wins"), col("ni").as("n_duels"))
  }

  /** Bradley–Terry FIT calibration — predicted vs observed win rate per
    * unordered pair: the model says p(a beats b) = w_a/(w_a + w_b);
    * the duel table says wins_a/n — their gap per pair is the
    * goodness-of-fit a preference aggregate needs before its strengths
    * mean anything (a pair with a large |err| is evidence of
    * intransitivity or context-dependence the scalar model cannot
    * express). One duel-table aggregation to the unordered-pair win
    * matrix, two broadcast joins against the |items|-row strength
    * vector; all error arithmetic on the 6-dp rounded rates. Returns
    * (src_a, src_b, n_duels, wins_a, observed, predicted, abs_err). */
  def btCalibration(duels: DataFrame, win: Column, lose: Column,
      strengths: DataFrame, weight: Column = lit(1L)): DataFrame = {
    import graft.expr.Snap
    val pw = duels.select(win.as("i"), lose.as("j"),
        weight.cast("double").as("nw"))
      .groupBy(col("i"), col("j"))
      .agg(Snap.snappedSum(col("nw"), 1e9).as("wij"))
    val sym = pw.select(least(col("i"), col("j")).as("a"),
        greatest(col("i"), col("j")).as("b"),
        when(col("i") < col("j"), col("wij")).otherwise(lit(0.0)).as("wa"),
        col("wij").as("n"))
      .groupBy(col("a"), col("b"))
      .agg(Snap.snappedSum(col("wa"), 1e9).as("wins_a"),
        Snap.snappedSum(col("n"), 1e9).as("n_duels"))
    sym
      .join(broadcast(strengths.select(col("item").as("a"),
        col("strength").as("sa"))), "a")
      .join(broadcast(strengths.select(col("item").as("b"),
        col("strength").as("sb"))), "b")
      .select(col("a").as("src_a"), col("b").as("src_b"),
        col("n_duels"), col("wins_a"),
        round(col("wins_a").cast("double") /
          col("n_duels").cast("double"), 6).as("observed"),
        round(col("sa") / (col("sa") + col("sb")), 6).as("predicted"))
      .select(col("src_a"), col("src_b"), col("n_duels"), col("wins_a"),
        col("observed"), col("predicted"),
        round(abs(col("observed") - col("predicted")), 6).as("abs_err"))
  }
}
