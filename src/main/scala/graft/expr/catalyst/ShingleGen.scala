package graft.expr.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native shingle generator (the UDTF-shaped third of the engine's
  * custom-expression surface, next to the scalar NormalizeTs /
  * VectorCosine / MinhashSig and the aggregate BitsetDistinct): emits a
  * document's word n-gram shingles as rows without ever materializing
  * the full shingle collection, unlike `explode(TextStats.shingles(…))`
  * which builds an array of ~token-count strings of n words each per
  * document before the explode copies it out again.
  *
  * Codegen: implemented as a [[CollectionGenerator]], so GenerateExec
  * keeps the whole stage in generated code (a plain `Generator` is a
  * CodegenFallback wall that kicks the entire shingle pipeline —
  * q21/q22/q52/q54's hottest path — out of WholeStageCodegen). The
  * "collection" handed to the generated loop is a [[ShingleArrayData]]:
  * a virtual ArrayData over the split token array that assembles
  * shingle `i` on access. Only the tokens are stored; each shingle
  * string is built exactly once, when the loop reads it — the same
  * streaming property as the interpreted iterator.
  *
  * Row-for-row identical to `explode(shingles(text, n))` (same split
  * semantics, same window join, same short-doc emptiness) — ≡-tested by
  * PropertySpec in both interpreted and codegen paths.
  */
case class ShingleGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CollectionGenerator {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a string input, got ${child.dataType.sql}")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(StringType, containsNull = false)

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

  /** The collection for GenerateExec's codegen loop: never null (a null
    * or too-short document yields an empty virtual array). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.expr.catalyst.ShingleArrayData.build(
            ${childGen.isNull} ? null : ${childGen.value}, $n);
        boolean ${ev.isNull} = false;""")
  }

  override def prettyName: String = "graft_shingles"

  override protected def withNewChildInternal(newChild: Expression): ShingleGen =
    copy(child = newChild)
}

/** Virtual ArrayData over a document's token array: element `i` is the
  * n-token shingle starting at token `i`, assembled on access. Backs
  * [[ShingleGen]]'s codegen path, where the generated loop reads each
  * element exactly once — so nothing beyond the token split is ever
  * materialized. Mutation and non-string getters are unsupported by
  * construction (the element type is a non-null string).
  */
final class ShingleArrayData(toks: Array[String], n: Int) extends ArrayData {

  override val numElements: Int = math.max(0, toks.length - n + 1)

  override def getUTF8String(i: Int): UTF8String = {
    val sb = new java.lang.StringBuilder
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks(i + j))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def isNullAt(i: Int): Boolean = false

  override def get(i: Int, dt: DataType): AnyRef = getUTF8String(i)

  override def array: Array[Any] =
    Array.tabulate[Any](numElements)(getUTF8String)

  override def copy(): ArrayData = new GenericArrayData(array)

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"ShingleArrayData: $what on a virtual string array")

  override def setNullAt(i: Int): Unit = unsupported("setNullAt")
  override def update(i: Int, v: Any): Unit = unsupported("update")
  override def getBoolean(i: Int): Boolean = unsupported("getBoolean")
  override def getByte(i: Int): Byte = unsupported("getByte")
  override def getShort(i: Int): Short = unsupported("getShort")
  override def getInt(i: Int): Int = unsupported("getInt")
  override def getLong(i: Int): Long = unsupported("getLong")
  override def getFloat(i: Int): Float = unsupported("getFloat")
  override def getDouble(i: Int): Double = unsupported("getDouble")
  override def getDecimal(i: Int, p: Int, s: Int) = unsupported("getDecimal")
  override def getBinary(i: Int): Array[Byte] = unsupported("getBinary")
  override def getGeography(i: Int) = unsupported("getGeography")
  override def getGeometry(i: Int) = unsupported("getGeometry")
  override def getInterval(i: Int) = unsupported("getInterval")
  override def getVariant(i: Int) = unsupported("getVariant")
  override def getStruct(i: Int, numFields: Int) = unsupported("getStruct")
  override def getArray(i: Int): ArrayData = unsupported("getArray")
  override def getMap(i: Int) = unsupported("getMap")
}

object ShingleArrayData {
  private val EMPTY = new ShingleArrayData(Array.empty, 1)

  /** Static forwarder for generated code: null or too-short input → an
    * empty array (zero generated rows), mirroring the interpreted path. */
  def build(text: UTF8String, n: Int): ShingleArrayData =
    if (text == null) EMPTY
    else {
      val toks = text.toString.split(" ", -1)
      if (toks.length < n) EMPTY else new ShingleArrayData(toks, n)
    }
}
