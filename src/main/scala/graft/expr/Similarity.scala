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
    // both limbs off ONE native digest ([[md5PrefixLong]]): hi = hex
    // chars 1–7 = top 28 of the 60 prefix bits, lo = chars 8–15 = the
    // low 32 — bit-identical to the conv(substring(md5…)) chain
    // (property-tested) with zero per-row string allocation
    val p = md5PrefixLong(element, 15)
    pmod(lit(minhashA(i)) * shiftright(p, 32) +
      lit(minhashB(i)) * p.bitwiseAND(lit(0xffffffffL)) +
      lit(minhashC(i)), lit(MinhashP))
  }

  /** First `hexLen` hex digits of md5(x) as a long — the native
    * ([[graft.expr.catalyst.Md5Prefix]]) form of the engine's portable
    * hash idiom `conv(substring(md5(x), 1, hexLen), 16, 10)`,
    * bit-identical by construction (≡-property-tested) with no per-row
    * string allocation. hexLen ≤ 15 keeps the value positive-long. */
  def md5PrefixLong(element: Column, hexLen: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expr.catalyst.Md5Prefix(
        org.apache.spark.sql.GraftBridge.expression(element), hexLen))
}
