package graft.expr.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two `array<float|double>` embedding
  * columns — the hot inner loop of ANN scoring and embedding near-dup
  * ([[graft.ops.Ann]]).
  *
  * Numerically IDENTICAL to the composable form
  * ([[graft.expr.Similarity.cosine]] = `aggregate(zip_with(...))`):
  * same left-to-right double accumulation for the three dot products,
  * same NULL-on-zero-norm guard — property-tested bit-equal. The HOF
  * form materializes an intermediate array per pair and boxes every
  * element; this is one fused primitive loop (no allocation), emitted
  * into whole-stage codegen via a single static call.
  *
  * NULL when: either input NULL, lengths differ, any element NULL, or a
  * zero norm (mirrors zip_with's null padding → null sum, and the
  * nullif(norm, 0) guard).
  */
case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<float|double> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val boxed = ctx.freshName("cos")
    ev.copy(code =
      code"""
        ${lGen.code}
        ${rGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${lGen.isNull} && !${rGen.isNull}) {
          java.lang.Double $boxed = graft.expr.catalyst.VectorOps.cosine(
            ${lGen.value}, ${isFloat(left)}, ${rGen.value}, ${isFloat(right)});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.doubleValue();
          }
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorCosine = copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), all three sums
    * accumulated left-to-right exactly like `aggregate(zip_with(...))`. */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }
}
