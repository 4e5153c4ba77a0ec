package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity over `array<float>` embedding columns.
  *
  * All math is expressed with higher-order array functions (`zip_with` +
  * `aggregate`) so it stays codegen'd and distributed; accumulation is in
  * double, summed in ARRAY ORDER (deterministic — oracle-comparable, and
  * independent of partitioning).
  */
object Similarity {

  /** Dot product with double accumulation, left-to-right over the array. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, HOF form — the property-test twin of the native
    * expression; NULL on zero-norm inputs (nullif guard, not NaN/Inf). */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Cosine similarity — native fused-loop expression
    * ([[graft.expr.catalyst.VectorCosine]]); bit-identical to
    * [[cosineHof]] (same accumulation order, property-tested) with no
    * per-pair array materialization. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.catalyst.VectorCosine(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x))

  /** MinHash value for one hash-family member `i` over a string set
    * element: lexicographic min of `md5(i|element)` per group emulates a
    * random permutation. Shared vocabulary with DuckDB (both have md5),
    * deterministic, and mergeable map-side (min is a semilattice).
    * Single definition — [[graft.ops.TextDedup.minhashSignatures]] and
    * the q21/q22 oracle SQL must stay in lockstep with it. */
  def minhashTerm(i: Column, element: Column): Column =
    md5(concat_ws("|", i, element))
}
