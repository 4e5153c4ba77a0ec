package graft.expr.catalyst

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact-distinct count over a bounded non-negative integer domain as a
  * mergeable bitset sketch — `TypedImperativeAggregate` surface of the
  * engine (Expression and LogicalPlan/Strategy/Exec are NormalizeTs /
  * VectorCosine / AsofJoin*).
  *
  * Why it matters at scale: `count(DISTINCT x)` plans as an Expand +
  * two-phase aggregation — the shuffle carries one row per distinct
  * (group, x). This sketch carries ONE fixed-size buffer per group per
  * map task, merged by bitwise OR: shuffle volume is groups ×
  * domain/8 bytes regardless of row count, and the result is exact and
  * order/partitioning-independent (unlike HLL, which trades exactness;
  * unlike count-distinct, whose cost scales with cardinality). The
  * domain bound (ids in [0, maxId]) is the contract — dictionary-encoded
  * ids in a training corpus fit naturally; out-of-range values throw.
  */
case class BitsetDistinct(
    child: Expression,
    maxId: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitset_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bitset_distinct requires an integral input, got ${other.sql}")
  }

  private val words = (maxId >> 6) + 1

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
      }
      require(id >= 0 && id <= maxId,
        s"graft_bitset_distinct: id $id outside [0, $maxId]")
      buf((id >> 6).toInt) |= 1L << (id & 63)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](words)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(off: Int): BitsetDistinct =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BitsetDistinct =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitsetDistinct =
    copy(child = newChildren.head)
}

object BitsetDistinct {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftBridge

  /** Column API: exact distinct of `c` (ids in [0, maxId]). */
  def bitsetDistinct(c: Column, maxId: Int): Column =
    GraftBridge.column(
      BitsetDistinct(GraftBridge.expression(c), maxId)
        .toAggregateExpression())
}
