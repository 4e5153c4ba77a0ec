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

  /** MinHash family: ONE digest per set element, then affine mixing —
    * `h_i(x) = (a_i · base(x) + c_i) mod P` with `base(x)` = the first
    * 32 bits of md5(x) and P = 2^31 − 1 (prime). The classic universal-
    * family construction: 8 members cost ONE md5 per shingle instead of
    * 8 (the digest dominates signature CPU over a 100 TB corpus), and
    * the arithmetic replays in any engine — `a_i` is itself computed
    * from the literal Knuth multiplier, so the oracle SQL derives the
    * member from `h` without a constant table. Numeric min per group
    * emulates the random permutation; mergeable map-side (semilattice).
    * All products stay under 2^63: a < P, base < 2^32.
    * Single definition — [[graft.ops.TextDedup.minhashSignatures]],
    * the native [[graft.expr.catalyst.MinhashSig]], and the q21/q22/
    * q63/q114 oracle CTE must stay in lockstep with it. */
  val MinhashP = 2147483647L
  val MinhashKnuth = 2654435761L
  def minhashA(i: Int): Long = (MinhashKnuth * (i + 1)) % MinhashP
  def minhashC(i: Int): Long = 40503L * i

  /** base(x): first 8 md5 hex chars as an unsigned 32-bit long. */
  def minhashBase(element: Column): Column =
    conv(substring(md5(element), 1, 8), 16, 10).cast("long")

  def minhashTerm(i: Int, element: Column): Column =
    pmod(lit(minhashA(i)) * minhashBase(element) + lit(minhashC(i)),
      lit(MinhashP))
}
