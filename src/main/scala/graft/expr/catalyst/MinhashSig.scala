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
  * explode → distinct → min(md5(h|shingle))), property-tested ≡:
  * - tokens = split on single space, trailing empties kept (Spark
  *   `split(text, " ")` semantics, limit -1);
  * - shingles = space-joined n-gram windows; docs shorter than n have
  *   no shingles → NULL signature (the grouped form simply has no rows);
  * - member h's value = lexicographic min over distinct shingles of
  *   lowercase-hex `md5("h|shingle")` — ASCII hex, so Java String
  *   ordering ≡ UTF8String binary ordering ≡ DuckDB VARCHAR min.
  */
case class MinhashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
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

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** NULL (no signature) when the doc has fewer than `n` tokens —
    * mirroring the grouped form, where such docs contribute no rows. */
  def signature(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    // limit -1: trailing empty tokens kept, matching Spark split()
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return null
    val seen = new java.util.HashSet[String]()
    val mins = new Array[String](numHashes)
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
        var h = 0
        while (h < numHashes) {
          val v = md5Hex(h.toString + "|" + shingle)
          if (mins(h) == null || v.compareTo(mins(h)) < 0) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(UTF8String.fromString(_)))
  }
}
