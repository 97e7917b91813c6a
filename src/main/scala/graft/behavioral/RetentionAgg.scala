package graft.behavioral

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `retention(cond1, ..., condN) -> ARRAY<BOOLEAN>` — cohort retention flags.
  *
  * Semantics (reference: `src/retention.rs:4-11,90-106`):
  *   - `r[0]`  = cond1 was ever true in the group;
  *   - `r[i]`  = cond1 ever true AND cond(i+1) ever true (not necessarily on
  *     the same row) — the anchor gates every slot;
  *   - anchor never true → all false;
  *   - empty group → empty array (`test/sql/retention.test:55-59`);
  *   - NULL condition values are treated as false (`src/ffi/retention.rs:84-86`).
  *
  * State is a single bitmask OR-ed per row, so partial aggregation and merge
  * are O(1) — ideal for Spark's map-side combine: the shuffle carries 8 bytes
  * per group regardless of group size. N is capped at 32 conditions.
  *
  * Buffer layout: Long with bit 62 = "saw at least one row", bits 0..31 =
  * per-condition ever-true mask.
  */
case class RetentionAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // (1..32 boolean conditions; validated lazily — constructor bodies must stay
  // empty because Java deserialization re-runs superclass init with null fields)
  private final val SeenBit = 1L << 62

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    // reference FFI enforces 2..32 conditions (ffi/retention.rs:21-24)
    if (children.size < 2 || children.size > 32)
      TypeCheckFailure(s"retention takes 2..32 boolean conditions, got ${children.size}")
    else if (children.exists(_.dataType != BooleanType))
      TypeCheckFailure("retention conditions must be BOOLEAN")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] = Array(0L)

  // codegen'd input projection — see WindowFunnelAgg.inputProj
  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(children.toIndexedSeq)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val row = inputProj(input)
    var mask = 0L
    var i = 0
    while (i < children.size) {
      if (!row.isNullAt(i) && row.getBoolean(i)) mask |= 1L << i
      i += 1
    }
    buf(0) |= mask | SeenBit
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    buf(0) |= other(0)
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val bits = buf(0)
    if ((bits & SeenBit) == 0) return new GenericArrayData(Array.empty[Any])
    val anchor = (bits & 1L) != 0
    val out = new Array[Any](children.size)
    out(0) = anchor
    var i = 1
    while (i < children.size) {
      out(i) = anchor && ((bits >>> i) & 1L) != 0
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8)
    bb.putLong(buf(0))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Array(java.nio.ByteBuffer.wrap(bytes).getLong)

  override def dataType: DataType = ArrayType(BooleanType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "retention"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
