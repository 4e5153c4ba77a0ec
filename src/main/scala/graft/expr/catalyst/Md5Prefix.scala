package graft.expr.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix hash: the first `hexLen` hex digits of
  * md5(utf8(s)) as a long — the engine's ubiquitous portable-hash
  * idiom `conv(substring(md5(x), 1, hexLen), 16, 10)` (≈50 call
  * sites: term keys, minhash limbs, winnowing gram hashes, md5 A/B
  * arms, sketch buckets) computed straight off the digest bytes.
  *
  * The composable chain allocates three strings per row (the 32-char
  * hex rendering, the substring, conv's base-10 rendering) and parses
  * two of them; on gram-fanout paths (q282's 3-gram term keys: ~50
  * hashes per document) that chain IS the dominant scan-stage cost.
  * Here: one ThreadLocal digest, big-endian fold of the first
  * ⌈hexLen/2⌉ bytes, drop the low nibble when hexLen is odd — no
  * allocation beyond the digest's own 16-byte output.
  *
  * Bit-identical to the chain by construction (the hex prefix IS the
  * top 4·hexLen bits of the digest; hexLen ≤ 15 keeps the value in a
  * long's positive range, exactly where `cast(conv(...) as bigint)`
  * is lossless) — ≡-property-tested in both interpreted and codegen
  * paths, hostile inputs included (empty string, unicode, every
  * hexLen). NULL child → NULL, like the chain.
  */
case class Md5Prefix(child: Expression, hexLen: Int)
    extends UnaryExpression {

  require(hexLen >= 1 && hexLen <= 15,
    s"graft_md5_prefix: hexLen must be in [1, 15], got $hexLen")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_md5_prefix requires a string input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_md5_prefix"

  override def nullSafeEval(input: Any): Any =
    Md5Ops.prefixLong(input.asInstanceOf[UTF8String], hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${cGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${cGen.isNull}) {
          ${ev.isNull} = false;
          ${ev.value} = graft.expr.catalyst.Md5Ops.prefixLong(
            ${cGen.value}, $hexLen);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix =
    copy(child = newChild)
}

object Md5Ops {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 4·hexLen bits of md5(utf8 bytes of s), as a long. */
  def prefixLong(s: UTF8String, hexLen: Int): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val nBytes = (hexLen + 1) / 2
    var v = 0L
    var i = 0
    while (i < nBytes) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    if ((hexLen & 1) == 1) v >>>= 4
    v
  }
}
