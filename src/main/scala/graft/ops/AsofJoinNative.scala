package graft.ops

import org.apache.spark.sql.{DataFrame, GraftBridge}
import graft.plans.AsofJoinPlan

/** DataFrame API over the native as-of join operator
  * ([[graft.plans.AsofJoinPlan]] → [[graft.plans.AsofJoinExec]]).
  *
  * Requires [[graft.GraftExtensions]] on the session (the planner
  * strategy). Compared to the composed [[AsofJoin]] (which any session
  * can run): same one-shuffle-per-side layout, but the per-partition
  * merge is a single forward pass with O(1) state instead of a window
  * sort over the unioned sides — and the right columns come back under
  * their own names (no prefix). Null timestamps never match (ASOF
  * comparisons are null-rejecting).
  */
object AsofJoinNative {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String): DataFrame = {
    val lPlan = GraftBridge.analyzed(left)
    // re-alias every right column (fresh exprIds): a self-join would
    // otherwise carry duplicate attribute ids through our custom node
    // (the analyzer's dedupRight never sees a post-analysis plan), and
    // right-side references would silently bind to left columns
    val rPlan = GraftBridge.analyzed(
      right.select(right.columns.map(c =>
        org.apache.spark.sql.functions.col(c).as(c)): _*))
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$name' in ${p.output.map(_.name).mkString(", ")}"))
    val lTs = attr(lPlan, tsCol)
    val rTs = attr(rPlan, tsCol)
    // the exec derives its ordering from rightTs alone and merges raw
    // values — a type mismatch must fail here, not as a mid-task CCE
    require(org.apache.spark.sql.types.DataType.equalsStructurally(
        lTs.dataType, rTs.dataType, ignoreNullability = true),
      s"asofJoin: ts column '$tsCol' has type ${lTs.dataType.sql} on the " +
        s"left but ${rTs.dataType.sql} on the right — both sides must match")
    GraftBridge.ofRows(left.sparkSession,
      AsofJoinPlan(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)), lTs, rTs))
  }
}
