package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made `classic.ExpressionUtils`
  * private[sql]; extension libraries conventionally expose the two
  * conversions from inside the package (public Spark jars only, no
  * behavior added). Used by graft's native expressions
  * (e.g. [[graft.expr.catalyst.NormalizeTs]]).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Deep-convert a Column to a catalyst Expression tree. Unlike
    * [[expression]] — which wraps the column node in an opaque
    * `ColumnNodeExpression` leaf that only Dataset-API analysis unwraps —
    * this runs the converter immediately, yielding ordinary (possibly
    * unresolved) catalyst nodes the analyzer resolves wherever they are
    * spliced. Needed by `injectFunction` builders that return composed
    * built-in trees. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Wrap a (resolved) logical plan as a DataFrame — the construction
    * path for graft's custom logical operators (e.g.
    * [[graft.plans.AsofJoinPlan]]). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (for resolving attributes by
    * name when building custom plan nodes). */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
