package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `right.ts <= left.ts` on the same key (inclusive, latest-wins) — the
  * standard point-in-time lookup Spark has no built-in operator for.
  *
  * Scale design — union + carry-forward, NOT join-then-filter-then-argmax:
  * both sides are unioned with a side tag and processed in ONE shuffle on
  * the key; a running `last(payload, ignoreNulls)` over
  * (ts, tag) order carries the latest right payload forward to each left
  * row. Cost is O(|L|+|R|) rows through one exchange + one sort — a
  * naive non-equi join would be a BroadcastNestedLoopJoin (O(|L|·|R|))
  * and an equi-join + window would shuffle every candidate pair. The
  * right payload travels as ONE struct column so all its fields come
  * from the same right row, atomically.
  *
  * Requirement: `right` must be unique per (keys, ts) — pre-aggregate
  * otherwise (ties would make "the" latest row nondeterministic).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPrefix: String = "r_"): DataFrame = {
    val leftCols = left.columns.filterNot(keys.contains).toSeq
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val rStructType = right.select(
      struct(rightPayload.map(col): _*).as("__r")).schema.head.dataType

    // null-ts right rows never match (ASOF comparison is null-rejecting,
    // matching AsofJoinExec and DuckDB); they would otherwise sort NULLS
    // FIRST and be carried forward as spurious matches
    val rUnion = right.filter(col(tsCol).isNotNull).select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__tag"),
        struct(rightPayload.map(col): _*).as("__r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lUnion = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__tag"),
        lit(null).cast(rStructType).as("__r")) ++ leftCols.map(col): _*)

    // right (tag 0) sorts before left (tag 1) at equal ts → inclusive <=
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rUnion.unionByName(lUnion)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(keys.map(col) ++ leftCols.map(col) ++
        rightPayload.map(c => col(s"__carried.$c").as(rightPrefix + c)): _*)
  }
}
