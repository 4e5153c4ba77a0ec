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
    * `h_i(x) = (a_i·hi(x) + b_i·lo(x) + c_i) mod P` where hi/lo are the
    * first 28 + next 32 bits of md5(x) (60 digest bits total) and
    * P = 2^31 − 1 (prime). The classic universal-family construction:
    * 8 members cost ONE md5 per shingle instead of 8 (the digest
    * dominates signature CPU over a 100 TB corpus). Two-limb mixing
    * keeps every product under 2^63 in plain long arithmetic
    * (a_i < 2^31 · hi < 2^28; b_i < 2^30 · lo < 2^32) while the base
    * keeps 60 bits — aliasing two shingles needs a 60-bit digest-prefix
    * collision, the same regime as standard 64-bit hashed shingling
    * (a 32-bit base would birthday-collide within ~10^5 shingles).
    * The coefficients derive from literal Knuth-style multipliers, so
    * the oracle SQL computes each member from `h` without a constant
    * table. Numeric min per group emulates the random permutation;
    * mergeable map-side (semilattice).
    * Single definition — [[graft.ops.TextDedup.minhashSignatures]],
    * the native [[graft.expr.catalyst.MinhashSig]], and the q21/q22/
    * q63/q114 oracle CTE must stay in lockstep with it. */
  val MinhashP = 2147483647L        // 2^31 − 1, prime
  val MinhashQ = 1073741789L       // largest prime < 2^30
  val MinhashKnuthA = 2654435761L  // golden-ratio multiplier
  val MinhashKnuthB = 2246822519L  // xxhash prime-2
  def minhashA(i: Int): Long = (MinhashKnuthA * (i + 1)) % MinhashP
  def minhashB(i: Int): Long = (MinhashKnuthB * (i + 1)) % MinhashQ
  def minhashC(i: Int): Long = 40503L * i

  def minhashTerm(i: Int, element: Column): Column = {
    val d = md5(element)
    pmod(lit(minhashA(i)) * conv(substring(d, 1, 7), 16, 10).cast("long") +
      lit(minhashB(i)) * conv(substring(d, 8, 8), 16, 10).cast("long") +
      lit(minhashC(i)), lit(MinhashP))
  }
}
