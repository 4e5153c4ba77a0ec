package graft.expr.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle generator (the UDTF-shaped third of the engine's
  * custom-expression surface, next to the scalar NormalizeTs /
  * VectorCosine / MinhashSig and the aggregate BitsetDistinct): emits a
  * document's word n-gram shingles as rows DIRECTLY — no intermediate
  * array value is ever materialized, unlike
  * `explode(TextStats.shingles(...))`, which builds the full shingle
  * array per row before the explode copies it out again. For a 100k-token
  * document that array is ~100k strings of n words each; the generator
  * streams them.
  *
  * Row-for-row identical to `explode(shingles(text, n))` (same split
  * semantics, same window join, same short-doc emptiness) — ≡-tested by
  * PropertySpec. Generators evaluate via CodegenFallback, exactly like
  * most built-in generators other than explode itself.
  */
case class ShingleGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a string input, got ${child.dataType.sql}")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return Iterator.empty
    val sb = new java.lang.StringBuilder
    (0 to toks.length - n).iterator.map { i =>
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      InternalRow(UTF8String.fromString(sb.toString))
    }
  }

  override def prettyName: String = "graft_shingles"

  override protected def withNewChildInternal(newChild: Expression): ShingleGen =
    copy(child = newChild)
}
