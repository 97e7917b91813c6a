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

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    RetentionBits.checkConds(children, prettyName)

  override def createAggregationBuffer(): Array[Long] = Array(0L)

  // codegen'd input projection — see WindowFunnelAgg.inputProj
  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(children.toIndexedSeq)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    buf(0) |= RetentionBits.maskOf(inputProj(input), children.size)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    buf(0) |= other(0)
    buf
  }

  override def eval(buf: Array[Long]): Any =
    RetentionBits.evalBits(buf(0), children.size)

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

/** Shared bitmask encoding for [[RetentionAgg]] and its rollup twins.
  * Layout: bit 62 = "saw at least one row", bits 0..31 = per-condition
  * ever-true mask. The encoding IS the mergeable partial: OR is
  * associative, so any regrouping of rows — map-side combine, a per-day
  * rollup table, a multi-level cube — produces the same final bits. */
private[behavioral] object RetentionBits {
  final val SeenBit = 1L << 62

  def checkConds(children: Seq[Expression],
      name: String): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    // reference FFI enforces 2..32 conditions (ffi/retention.rs:21-24)
    if (children.size < 2 || children.size > 32)
      TypeCheckFailure(s"$name takes 2..32 boolean conditions, got ${children.size}")
    else if (children.exists(_.dataType != BooleanType))
      TypeCheckFailure(s"$name conditions must be BOOLEAN")
    else TypeCheckSuccess
  }

  /** Per-row contribution: NULL condition values count as false
    * (`src/ffi/retention.rs:84-86`). */
  def maskOf(row: InternalRow, n: Int): Long = {
    var mask = SeenBit
    var i = 0
    while (i < n) {
      if (!row.isNullAt(i) && row.getBoolean(i)) mask |= 1L << i
      i += 1
    }
    mask
  }

  /** Final answer from merged bits: empty group → empty array; the anchor
    * (condition 1) gates every slot (`src/retention.rs:4-11,90-106`). */
  def evalBits(bits: Long, n: Int): GenericArrayData = {
    if ((bits & SeenBit) == 0) return new GenericArrayData(Array.empty[Any])
    val anchor = (bits & 1L) != 0
    val out = new Array[Any](n)
    out(0) = anchor
    var i = 1
    while (i < n) {
      out(i) = anchor && ((bits >>> i) & 1L) != 0
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `retention_state(cond1, ..., condN) -> BIGINT` — the MERGEABLE HALF of
  * `retention`, for pre-aggregated rollups.
  *
  * At 100 TB nobody re-scans the raw event log for every retention
  * dashboard query: the log is folded ONCE into a per-(user, day) rollup
  * of these 8-byte states, and every subsequent query OR-merges states
  * with [[RetentionMergeAgg]] — same answer (OR is associative), input
  * shrunk from O(events) to O(users x days). The split is exact, not
  * approximate: q105 pins the rollup path against `retention`'s own
  * oracle. No reference analogue (the reference always scans raw rows);
  * this is the Spark-native scale complement, same category as the
  * bucketed layouts. */
case class RetentionStateAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    RetentionBits.checkConds(children, prettyName)

  override def createAggregationBuffer(): Array[Long] = Array(0L)

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(children.toIndexedSeq)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    buf(0) |= RetentionBits.maskOf(inputProj(input), children.size)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    buf(0) |= other(0)
    buf
  }

  override def eval(buf: Array[Long]): Any = buf(0)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8)
    bb.putLong(buf(0))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Array(java.nio.ByteBuffer.wrap(bytes).getLong)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "retention_state"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `retention_merge(state BIGINT, n INT) -> ARRAY<BOOLEAN>` — folds
  * [[RetentionStateAgg]] partials back into `retention`'s answer. `n` must
  * be a literal: it is the condition count the states were built with (the
  * output array's length — a state value cannot carry it). NULL states
  * (e.g. from an outer join against the rollup) contribute nothing, like
  * rows contribute nothing to an aggregate they're absent from. */
case class RetentionMergeAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size != 2)
      TypeCheckFailure(s"retention_merge takes (state BIGINT, nConds INT), got ${children.size} args")
    else if (children(0).dataType != LongType)
      TypeCheckFailure(s"retention_merge state must be BIGINT, got ${children(0).dataType}")
    else if (!children(1).foldable || nConds < 2 || nConds > 32)
      TypeCheckFailure("retention_merge nConds must be a literal in 2..32")
    else TypeCheckSuccess
  }

  private lazy val nConds: Int = children(1).eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case _ => -1
  }

  override def createAggregationBuffer(): Array[Long] = Array(0L)

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(children(0)))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val row = inputProj(input)
    if (!row.isNullAt(0)) buf(0) |= row.getLong(0)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    buf(0) |= other(0)
    buf
  }

  override def eval(buf: Array[Long]): Any =
    RetentionBits.evalBits(buf(0), nConds)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8)
    bb.putLong(buf(0))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Array(java.nio.ByteBuffer.wrap(bytes).getLong)

  override def dataType: DataType = ArrayType(BooleanType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "retention_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `retention_state_combine(state) -> BIGINT` — state-to-state fold for
  * the retention family, completing the combine algebra
  * ([[FunnelStateCombineAgg]] / `next_node_state_combine` are the
  * funnel/next-node twins): folds [[RetentionStateAgg]] partials into
  * one partial of the same encoding, for re-graining a rollup
  * (day → week / user) or compacting a [[graft.ops.RollupStore]] state
  * table without rescanning the raw log. Exact by associativity — the
  * state IS an OR-able bitmask, so the fold is the same `|` the family
  * uses everywhere. NULL states contribute nothing; a group with none
  * yields NULL (matching the other combines; every real state carries
  * the seen-bit, and `retention_merge` skips NULLs). */
case class RetentionStateCombineAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size != 1)
      TypeCheckFailure("retention_state_combine needs (state)")
    else if (children.head.dataType != LongType)
      TypeCheckFailure(s"retention_state_combine state must be BIGINT (from retention_state), got ${children.head.dataType}")
    else TypeCheckSuccess
  }

  // buf = (bits, seen-any-state flag): the flag distinguishes an all-NULL
  // group (eval NULL) from real states, without trusting bit patterns
  override def createAggregationBuffer(): Array[Long] = Array(0L, 0L)

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(children.head))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val row = inputProj(input)
    if (!row.isNullAt(0)) { buf(0) |= row.getLong(0); buf(1) = 1L }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    buf(0) |= other(0)
    buf(1) |= other(1)
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(1) == 0L) null else java.lang.Long.valueOf(buf(0))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(buf(0)); bb.putLong(buf(1))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array(bb.getLong, bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "retention_state_combine"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
