package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical sort-merge as-of join.
  *
  * Required layout: both children hash-clustered on the keys and sorted
  * by (keys, ts) — Spark's EnsureRequirements inserts the exchanges and
  * sorts, exactly like SortMergeJoin. Per partition, one forward merge
  * pass: right rows for the current key are consumed while their ts ≤
  * the left row's ts, remembering only the latest — O(|L|+|R|) time,
  * O(1) state beyond the two iterators (vs the union-form's window
  * carry-forward which materializes the combined sort). Latest-wins,
  * inclusive ties, NULLs when no right row qualifies.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTsEval = BindReferences.bindReference(leftTs, left.output)
      val rTsEval = BindReferences.bindReference(rightTs, right.output)
      val tsOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(rightTs.dataType)
      val nullRight = new GenericInternalRow(right.output.size)
      val joined = new JoinedRow
      // bind against the NULLABLE output attrs — binding against the raw
      // right.output would inherit nullable=false and skip null checks
      // for the no-match null row
      val result = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // one-row lookahead into the right side (copied: rows are reused)
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next().copy()
            rHeadKey = rKeyProj(rHead).copy()
          } else { rHead = null; rHeadKey = null }
        advanceRight()

        // latest right row whose (key, ts) qualified, with its key
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTsV = lTsEval.eval(l)
          // drop right rows for earlier keys
          while (rHead != null && keyOrd.compare(rHeadKey, lKey) < 0)
            advanceRight()
          // consume same-key right rows with ts <= left ts (inclusive);
          // later rows overwrite earlier → latest wins
          // null ts on either side never matches (ASOF comparison is
          // null-rejecting, like DuckDB's). Null-ts right rows sort
          // NULLS FIRST — they must be SKIPPED, not treated as a stop
          // condition, or they would hide every valid row behind them.
          var scanning = true
          while (scanning && rHead != null &&
              keyOrd.compare(rHeadKey, lKey) == 0) {
            val rTsV = rTsEval.eval(rHead)
            if (rTsV == null) advanceRight()
            else if (lTsV != null && tsOrd.compare(rTsV, lTsV) <= 0) {
              lastMatch = rHead
              lastMatchKey = rHeadKey
              advanceRight()
            } else scanning = false
          }
          val matched = lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0
          result(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
