package graft.expr.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: text → the full `numHashes`-wide signature
  * in ONE per-row pass — tokenize, shingle, dedupe, and take each hash
  * family member's min, all inside whole-stage codegen. Signature
  * generation over a 100 TB corpus becomes a narrow scan-speed
  * projection with ZERO shuffle; only LSH banding afterwards exchanges
  * (bounded-width band keys).
  *
  * Bit-identical by construction to the composable pipeline
  * ([[graft.ops.TextDedup.shingleSet]] → `minhashSignatures`:
  * explode → distinct → min of the affine family), property-tested ≡:
  * - tokens = split on single space, trailing empties kept (Spark
  *   `split(text, " ")` semantics, limit -1);
  * - shingles = space-joined n-gram windows; docs shorter than n have
  *   no shingles → NULL signature (the grouped form simply has no rows);
  * - member h's value = numeric min over distinct shingles of
  *   `(a_h·hi + b_h·lo + c_h) mod P` with (hi, lo) = the first 28 +
  *   next 32 bits of md5(shingle) — ONE digest per shingle for the
  *   whole family ([[graft.expr.Similarity.minhashTerm]] is the single
  *   source of the constants).
  */
case class MinhashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinhashOps.signature(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cGen = child.genCode(ctx)
    val arr = ctx.freshName("sig")
    ev.copy(code =
      code"""
        ${cGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${cGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr =
            graft.expr.catalyst.MinhashOps.signature(
              ${cGen.value}, $n, $numHashes);
          if ($arr != null) {
            ${ev.isNull} = false;
            ${ev.value} = $arr;
          }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashOps {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** (hi, lo) base limbs of md5(s): hex chars 1-7 (28 bits) and 8-15
    * (32 bits) — ≡ `conv(substring(md5(s), 1, 7), 16, 10)` /
    * `conv(substring(md5(s), 8, 8), 16, 10)`. Hex char k is nibble
    * k−1: high nibble of byte j at position 2j, low at 2j+1. */
  private def md5Limbs(s: String): (Long, Long) = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hi = ((b(0) & 0xffL) << 20) | ((b(1) & 0xffL) << 12) |
      ((b(2) & 0xffL) << 4) | ((b(3) & 0xffL) >> 4)
    val lo = ((b(3) & 0x0fL) << 28) | ((b(4) & 0xffL) << 20) |
      ((b(5) & 0xffL) << 12) | ((b(6) & 0xffL) << 4) |
      ((b(7) & 0xffL) >> 4)
    (hi, lo)
  }

  /** NULL (no signature) when the doc has fewer than `n` tokens —
    * mirroring the grouped form, where such docs contribute no rows. */
  def signature(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    // limit -1: trailing empty tokens kept, matching Spark split()
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return null
    import graft.expr.Similarity.{minhashA, minhashB, minhashC, MinhashP}
    val as = Array.tabulate(numHashes)(minhashA)
    val bs = Array.tabulate(numHashes)(minhashB)
    val cs = Array.tabulate(numHashes)(minhashC)
    val seen = new java.util.HashSet[String]()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val shingle = sb.toString
      if (seen.add(shingle)) {
        // one digest for the whole family; a·hi + b·lo + c < 2^63
        // (a < 2^31 · hi < 2^28, b < 2^30 · lo < 2^32), exact in longs
        val (hi, lo) = md5Limbs(shingle)
        var h = 0
        while (h < numHashes) {
          val v = (as(h) * hi + bs(h) * lo + cs(h)) % MinhashP
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
