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
    val rPlan = GraftBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asofJoin: no column '$name' in ${p.output.map(_.name).mkString(", ")}"))
    GraftBridge.ofRows(left.sparkSession,
      AsofJoinPlan(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
        attr(lPlan, tsCol), attr(rPlan, tsCol)))
  }
}
