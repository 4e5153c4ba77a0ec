package graft

import org.apache.spark.sql.execution.window.WindowExec

/** The unpartitioned-window contract (round-9 verdict item): a
  * `Window.orderBy` with no partitionBy funnels its whole input to ONE
  * task, which is fine for a constant- or dimension-bounded frame
  * (funnel stage counts, decile axes, checkpoint grids, per-test
  * tables) and a cluster incident for anything corpus-sized. This spec
  * sweeps EVERY served query, finds each unpartitioned WindowExec in
  * the physical plan (subqueries included), and
  *  1. requires the query to be on the bounded-by-construction
  *     whitelist below — a future operator that inherits a
  *     single-partition sort on corpus-shaped data fails here before
  *     it ships;
  *  2. EXECUTES each such window's child and asserts the actual row
  *     count sits under the bound — the whitelist is audited, not
  *     trusted.
  *
  * The row bound is calibrated to sf0.001, where corpus tables are
  * 500–6000 rows: a bounded frame (stages, deciles, sources, grids,
  * vocab quantiles) stays well under 200 rows, while an accidental
  * corpus-sized sort blows straight past it.
  */
class WindowContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val rowBound = 200

  test("every unpartitioned WindowExec sits on a bounded frame, " +
    "and every site is whitelisted by construction") {
    // Each entry names WHY the frame is bounded — additions must state
    // their bound, not just silence the test.
    val whitelist: Map[String, String] = Map.empty ++ WindowContractSpec.bounded
    // AQE wraps the plan in an opaque leaf; disable it for the sweep so
    // collect sees the real operator tree
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = scala.collection.mutable.ListBuffer[String]()
      val oversized = scala.collection.mutable.ListBuffer[String]()
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        val plan = fn(spark, dir).queryExecution.executedPlan
        val wins = plan.collectWithSubqueries {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (wins.nonEmpty) {
          val sizes = wins.map(_.child.executeTake(rowBound + 1).length)
          if (!whitelist.contains(name))
            offenders += s"$name: ${wins.size} unpartitioned WindowExec " +
              s"(frame rows at sf0.001: ${sizes.map(s =>
                if (s > rowBound) s">$rowBound" else s.toString)
                .mkString(", ")})"
          else sizes.filter(_ > rowBound).foreach { _ =>
            oversized += s"$name: unpartitioned window over >$rowBound rows"
          }
        }
      }
      assert(offenders.isEmpty,
        "unwhitelisted single-partition window(s):\n" +
          offenders.mkString("\n") +
          "\n— partition the window, or add the query to the whitelist " +
          "WITH its boundedness argument")
      assert(oversized.isEmpty,
        "whitelisted window(s) whose frame is NOT actually bounded:\n" +
          oversized.mkString("\n"))
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}

object WindowContractSpec {
  /** query → why its unpartitioned window frame is bounded. */
  val bounded: Map[String, String] = Map(
    "q105_skew_gini" -> "|sources|-row weight rollup (dimension-sized)",
    "q338_qini" -> ("bins-row score-threshold grid (fixed-width bins, " +
      "data-independent ≤ 10 rows; both the cumulative and the " +
      "trapezoid window ride it)"),
    "q124_rrf_fusion" -> "two top-k candidate lists (k-bounded)",
    "q130_token_apportion" -> "|sources|-row budget table",
    "q161_curriculum" -> "|difficulty buckets| curriculum axis",
    "q168_score_auc" -> ("bucket-offset table: score range / bucketWidth " +
      "rows (two-level distributed ranking; data-independent)"),
    "q182_curation_funnel" -> "|gates|-row funnel counts",
    "q209_heaps_fit" -> "ceil(log2 corpus) checkpoint grid",
    "q212_bh_fdr" -> "per-test table: one row per source slice",
    "q250_by_fdr" -> "per-test table: one row per source slice",
    "q252_kmv_intersect" -> ("post-orderBy.limit(k) frame: " +
      "TakeOrderedAndProject caps the window input at k rows"),
    "q254_kaplan_meier" -> ("calendar-bounded day-step grid (the " +
      "observation window, data-independent)"),
    "q255_logrank" -> ("calendar-bounded day-step grid (the " +
      "observation window, data-independent)"),
    "q256_cox_hazard" -> ("calendar-bounded day-step grid (the " +
      "observation window, data-independent)"),
    "q258_rmst_diff" -> ("calendar-bounded day-step grid (the " +
      "observation window, data-independent)"),
    "q259_km_greenwood" -> ("calendar-bounded day-step grid (the " +
      "observation window, data-independent)"),
    "q260_weibull_fit" -> ("calendar-bounded day-step grid (the " +
      "observation window, data-independent)"),
    "q265_good_turing" -> ("count spectrum capped at rCap+1 = 51 rows " +
      "by construction (data-independent)"),
    "q275_seasonal_mase" -> ("calendar-bounded daily-series grid (the " +
      "observation window, data-independent)"),
    "q276_changepoint" -> ("calendar-bounded daily-series grid (the " +
      "observation window, data-independent)"),
    "q285_pettitt" -> ("calendar-bounded daily-series grid (the rank " +
      "table is its value grid — both data-independent in length)"),
    "q288_isotonic" -> ("≤bins-row (n, k) table (bins = 10, " +
      "data-independent)"),
    "q289_ljung_box" -> ("calendar-bounded daily-series grid (day " +
      "index) and the 7-row lag axis — both data-independent"),
    "q291_seasonal_decomp" -> ("calendar-bounded daily-series grid " +
      "(the centered-MA window and its count run over days)"),
    "q296_youden" -> ("distinct 6-dp confidence grid: hard-capped at " +
      "10^6+1 rows by rounding (scores live in [0,1])"),
    "q297_delong_auc" -> ("distinct 6-dp confidence grid: hard-capped " +
      "at 10^6+1 rows by rounding (scores live in [0,1])"),
    "q306_family_tail" -> ("post-orderBy.limit(k+1) frame: " +
      "TakeOrderedAndProject caps the window input at 21 rows"),
    "q308_seasonal_cp" -> ("calendar-bounded daily-series grid (the " +
      "q291 decomposition and q276 binseg windows, composed)"),
    "q310_rbp" -> ("post-orderBy.limit(20) frame: " +
      "TakeOrderedAndProject caps the rank window input at 20 rows"),
    "q313_runs_test" -> ("calendar-bounded daily-series grid (the " +
      "median cum runs on its value grid, the lag on the day grid)"),
    "q261_cif_competing" -> ("calendar-bounded day-step grid (the " +
      "observation window, data-independent; the per-cause cumulative " +
      "window partitions by cause)"),
    "q213_concentration" -> "|groups|-row share rollup",
    "q216_event_funnel" -> "|stages|-row stage counts",
    "q230_temperature_scan" -> "|T|-row temperature grid",
    "q240_funnel_times" -> "|stages| x quantile-grid rows",
    "q241_risk_coverage" -> ("distinct 6-dp confidence grid: hard-capped " +
      "at 10^6+1 rows by rounding (scores live in [0,1])"),
    "q242_avg_precision" -> ("distinct 6-dp score grid: hard-capped at " +
      "10^6+1 rows by rounding (scores live in [0,1])"),
    "q50_vocab" -> "post-limit(maxSize) token-id stamping",
    "q59_seq_pack" -> "|bins|-row packing offsets",
    "q60_vocab_encode" -> "post-limit(maxSize) token-id stamping",
    "q84_temperature" -> "|sources|-row mixture rates"
  )
}
