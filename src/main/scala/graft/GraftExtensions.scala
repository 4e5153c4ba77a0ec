package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.catalyst.{BitsetDistinct, NormalizeTs, VectorCosine}

/** SQL-surface registration for the engine's native expressions:
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` makes
  * `graft_normalize_ts(col)` available to plain SQL users. The Scala API
  * ([[graft.expr.Timestamps.normalizeTs]]) does not require the extension
  * — it builds the expression directly — so library queries work on any
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_normalize_ts"),
      new ExpressionInfo(classOf[NormalizeTs].getName, "graft_normalize_ts"),
      (children: Seq[Expression]) => NormalizeTs(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[VectorCosine].getName, "graft_cosine"),
      (children: Seq[Expression]) => VectorCosine(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_bitset_distinct"),
      new ExpressionInfo(classOf[BitsetDistinct].getName, "graft_bitset_distinct"),
      (children: Seq[Expression]) => {
        val maxId = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_bitset_distinct(col, maxId): maxId must be an int literal, got $other")
        }
        BitsetDistinct(children.head, maxId)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(
        classOf[graft.expr.catalyst.MinhashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "graft_minhash(text, n, numHashes): " +
          s"expected 3 arguments, got ${children.length}")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash(text, n, numHashes): $what must be an int literal, got $other")
        }
        graft.expr.catalyst.MinhashSig(children.head,
          intLit(children(1), "n"), intLit(children(2), "numHashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(
        classOf[graft.expr.catalyst.ShingleGen].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_shingles(text, n): expected 2 arguments, got ${children.length}")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles(text, n): n must be an int literal, got $other")
        }
        graft.expr.catalyst.ShingleGen(children.head, n)
      }))
    // composed-expression functions: built from the same Column => Column
    // definitions the Scala API uses (one definition, two surfaces)
    composed1(ext, "graft_rolling_hash", graft.expr.TextStats.rollingHash)
    composed1(ext, "graft_quality", graft.expr.TextStats.qualityScore)
    composed1(ext, "graft_lang_id", graft.expr.TextStats.langIdHeuristic(_))
    composed1(ext, "graft_fingerprint", graft.expr.TextStats.fingerprint)
    composed1(ext, "graft_pii_scrub", graft.expr.Pii.scrub)
    composed1(ext, "graft_pii_count", graft.expr.Pii.countPii)
    ext.injectFunction((
      new FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[graft.ops.Layout.type].getName, "graft_zorder"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_zorder(x, y): expected 2 arguments, got ${children.length}")
        org.apache.spark.sql.GraftBridge.catalystExpression(
          graft.ops.Layout.zOrderKey(
            org.apache.spark.sql.GraftBridge.column(children(0)),
            org.apache.spark.sql.GraftBridge.column(children(1))))
      }))
    // whole-operator surface: the native as-of join physical strategy
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    // logical rewrite: disjunctive alternate-key joins → union of
    // equi-joins (kills the BroadcastNestedLoopJoin the OR shape plans as)
    ext.injectOptimizerRule(_ => graft.plans.DisjunctiveJoinRewrite)
  }

  /** Register a unary Column=>Column as a SQL function: the builder wraps
    * the child expression in a Column, applies the library definition,
    * and unwraps — the analyzer resolves the produced built-in tree. */
  private def composed1(ext: SparkSessionExtensions, name: String,
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"$name(col): expected 1 argument, got ${children.length}")
        org.apache.spark.sql.GraftBridge.catalystExpression(
          f(org.apache.spark.sql.GraftBridge.column(children.head)))
      }))
}
