package graft.expr.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise max over fixed-width register arrays — the mergeable
  * combine step of a PACKED HyperLogLog/HyperBall state
  * ([[graft.ops.Graph.neighborhoodFunction]]).
  *
  * Why it matters at scale: the row-form register state carries one
  * (node, bucket, reg) row per register, so a HyperBall round's
  * edge × state join fans every edge out ×m (m = 64 at b = 6) BEFORE
  * the shuffle — the shuffle volume is edges · m rows. Packed, the
  * state is ONE m-byte array per node: the join moves edges · 1 rows
  * and this aggregate folds them map-side into a single m-byte buffer
  * per (node, map task) — a 64× shuffle-volume cut with bit-identical
  * register values (max is associative/commutative elementwise; the
  * register VALUES are untouched).
  *
  * Input: array<tinyint> of length `m` (absent register = 0). NULL
  * arrays are ignored; a wrong-length array or a NULL ELEMENT throws
  * (the packing is a fixed-width contract, not a suggestion — a null
  * slot silently read as an arbitrary byte would corrupt the register
  * it lands on, so it is rejected at the first update that sees it;
  * ADVICE r12).
  */
case class RegisterMaxAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_register_max"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_register_max requires array<tinyint>, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == m,
        s"graft_register_max: expected $m registers, got ${arr.numElements()}")
      var i = 0
      while (i < m) {
        // reject null ELEMENTS explicitly: the analysis-time check
        // accepts containsNull=true arrays (the seed's `transform`
        // lambda is conservatively marked nullable even though it
        // never produces nulls), and getByte on a null slot would
        // silently read an arbitrary value into the register
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"graft_register_max: null register element at $i")
        val r = arr.getByte(i)
        if (r > buf(i)) buf(i) = r
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(b => b: Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(off: Int): RegisterMaxAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): RegisterMaxAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegisterMaxAgg =
    copy(child = newChildren.head)
}

object RegisterMaxAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftBridge

  /** Column API: elementwise max of `m`-register arrays. */
  def registerMax(c: Column, m: Int): Column =
    GraftBridge.column(
      RegisterMaxAgg(GraftBridge.expression(c), m)
        .toAggregateExpression())
}
