package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical node for the native as-of join (same semantics as the
  * composed [[graft.ops.AsofJoin]], SURVEY §2-beyond): for each left row,
  * the latest right row with equal keys and `rightTs <= leftTs`; right
  * side nullable (left-outer flavor).
  *
  * Built only through [[graft.ops.AsofJoinNative]] from already-analyzed
  * children, so all expressions arrive resolved.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}
