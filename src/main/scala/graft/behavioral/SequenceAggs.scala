package graft.behavioral

import graft.behavioral.pattern.{PStep, PatternExecutor, PatternParser}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared base for the sequence family:
  * `sequence_match(pattern, ts, cond1..condN)`, `sequence_count(...)`,
  * `sequence_match_events(...)` (reference: `src/sequence.rs:35-171`).
  *
  * All three share one state shape (a growable event buffer) and the pattern
  * engine; they differ only in what `eval` extracts. Update-time rules
  * (reference: `src/sequence.rs:72-76`, `src/ffi/sequence.rs:181-183`):
  *   - rows with NULL ts are skipped;
  *   - NULL conditions are false;
  *   - events with no true conditions are dropped — `.`/`.*` semantics are
  *     relative to condition-bearing events only.
  *
  * The pattern argument must be foldable; it is parsed once per aggregate
  * instance (not per group). An invalid pattern yields NULL (match/count) or
  * an empty list (match_events) rather than an error, matching the reference
  * FFI (`src/ffi/sequence.rs:108-112,138-142`).
  */
abstract class SequenceAggBase extends TypedImperativeAggregate[EventBuf] {
  def children: Seq[Expression]

  @transient protected lazy val compiledPattern: Array[PStep] =
    PatternParser.parse(IntervalArg.string(children.head, s"$prettyName pattern")) match {
      case Right(steps) => steps
      case Left(_) => null // invalid pattern → NULL/empty result at eval
    }
  @transient private lazy val tsExpr = children(1)
  @transient private lazy val condExprs: Array[Expression] = children.drop(2).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size < 3)
      TypeCheckFailure(s"$prettyName needs (pattern, ts, cond1, ...)")
    else if (children.size - 2 > 32)
      TypeCheckFailure(s"$prettyName supports at most 32 conditions, got ${children.size - 2}")
    else if (children.drop(2).exists(_.dataType != BooleanType))
      TypeCheckFailure(s"$prettyName conditions must be BOOLEAN")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): EventBuf = EventBuf.empty()

  // codegen'd input projection — see WindowFunnelAgg.inputProj
  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(tsExpr +: condExprs.toIndexedSeq)

  override def update(buf: EventBuf, input: InternalRow): EventBuf = {
    val row = inputProj(input)
    if (row.isNullAt(0)) return buf
    var mask = 0
    var i = 0
    while (i < condExprs.length) {
      if (!row.isNullAt(i + 1) && row.getBoolean(i + 1)) mask |= 1 << i
      i += 1
    }
    if (mask != 0) buf.append(row.getLong(0), mask)
    buf
  }

  override def merge(buf: EventBuf, other: EventBuf): EventBuf = {
    buf.appendAll(other)
    buf
  }

  override def serialize(buf: EventBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): EventBuf = EventBuf.deserialize(bytes)
}

/** `sequence_match(pattern, ts, cond1..condN) -> BOOLEAN` */
case class SequenceMatchAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {

  override def eval(buf: EventBuf): Any = {
    if (compiledPattern == null) return null
    buf.sortByTs()
    java.lang.Boolean.valueOf(PatternExecutor.execute(compiledPattern, buf, countAll = false) > 0)
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "sequence_match"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `sequence_count(pattern, ts, cond1..condN) -> BIGINT` — non-overlapping
  * match count; after a match the search resumes at match_end + 1
  * (reference: `src/pattern/executor.rs:217-231`). */
case class SequenceCountAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {

  override def eval(buf: EventBuf): Any = {
    if (compiledPattern == null) return null
    buf.sortByTs()
    java.lang.Long.valueOf(PatternExecutor.execute(compiledPattern, buf, countAll = true))
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sequence_count"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Shared base for the sequence family's MERGE TWINS: consume
  * `funnel_state` partials — the behavioral family's ONE mergeable state,
  * since [[SequenceAggBase.update]] and the funnel's update apply
  * identical rules — with the pattern supplied at merge time. A single
  * per-(user, day) state table therefore answers `window_funnel` AND all
  * three sequence functions, for any pattern, without rescanning events.
  * Exact for the same reason as the funnel twin: the merged buffer is the
  * identical event multiset the raw aggregate would build (condition
  * ORDER must match between state build and pattern `(?N)` indices — the
  * embedded condition count guards the arity, the order is the caller's
  * contract, exactly as it is between a raw call's cond list and its
  * pattern). */
abstract class SequenceMergeBase extends TypedImperativeAggregate[FunnelMergeBuf] {
  def children: Seq[Expression]

  @transient protected lazy val compiledPattern: Array[PStep] =
    PatternParser.parse(IntervalArg.string(children.head, s"$prettyName pattern")) match {
      case Right(steps) => steps
      case Left(_) => null // invalid pattern → NULL/empty result at eval
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size != 2)
      TypeCheckFailure(s"$prettyName needs (pattern, state)")
    else if (children(1).dataType != BinaryType)
      TypeCheckFailure(s"$prettyName state must be BINARY (from funnel_state), got ${children(1).dataType}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): FunnelMergeBuf =
    new FunnelMergeBuf(-1, EventBuf.empty())

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(children(1)))

  override def update(buf: FunnelMergeBuf, input: InternalRow): FunnelMergeBuf = {
    val row = inputProj(input)
    if (!row.isNullAt(0))
      FunnelPartial.updateInto(buf, row.getBinary(0), prettyName)
    buf
  }

  override def merge(buf: FunnelMergeBuf, other: FunnelMergeBuf): FunnelMergeBuf = {
    FunnelPartial.mergeInto(buf, other, prettyName)
    buf
  }

  override def serialize(buf: FunnelMergeBuf): Array[Byte] =
    FunnelPartial.encode(buf.nConds, buf.buf)
  override def deserialize(bytes: Array[Byte]): FunnelMergeBuf = {
    val (n, events) = FunnelPartial.decode(bytes)
    new FunnelMergeBuf(n, events)
  }
}

/** `sequence_match_merge(pattern, state) -> BOOLEAN` — `sequence_match`
  * over merged `funnel_state` partials. */
case class SequenceMatchMergeAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceMergeBase {

  override def eval(buf: FunnelMergeBuf): Any = {
    if (compiledPattern == null) return null
    buf.buf.sortByTs()
    java.lang.Boolean.valueOf(
      PatternExecutor.execute(compiledPattern, buf.buf, countAll = false) > 0)
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "sequence_match_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `sequence_count_merge(pattern, state) -> BIGINT` — `sequence_count`
  * over merged `funnel_state` partials. */
case class SequenceCountMergeAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceMergeBase {

  override def eval(buf: FunnelMergeBuf): Any = {
    if (compiledPattern == null) return null
    buf.buf.sortByTs()
    java.lang.Long.valueOf(
      PatternExecutor.execute(compiledPattern, buf.buf, countAll = true))
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sequence_count_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `sequence_match_events_merge(pattern, state) -> ARRAY<TIMESTAMP>` —
  * `sequence_match_events` over merged `funnel_state` partials. The
  * element type is fixed TIMESTAMP (the state stores epoch micros and
  * cannot carry the original column's TIMESTAMP vs TIMESTAMP_NTZ
  * distinction the raw aggregate mirrors). */
case class SequenceMatchEventsMergeAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceMergeBase {

  override def eval(buf: FunnelMergeBuf): Any = {
    if (compiledPattern == null) return new GenericArrayData(Array.empty[Any])
    buf.buf.sortByTs()
    val got = PatternExecutor.executeCollect(compiledPattern, buf.buf)
    if (got == null) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(got.map(java.lang.Long.valueOf(_): Any))
  }

  override def dataType: DataType = ArrayType(TimestampType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sequence_match_events_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `sequence_match_events(pattern, ts, cond1..condN) -> ARRAY<TIMESTAMP>` —
  * the first match's per-`(?N)`-step timestamps in pattern order; `.`/`.*`
  * and time constraints contribute nothing; no match → empty list
  * (reference: `src/sequence.rs:158-171`). Extension beyond ClickHouse. */
case class SequenceMatchEventsAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggBase {

  override def eval(buf: EventBuf): Any = {
    if (compiledPattern == null) return new GenericArrayData(Array.empty[Any])
    buf.sortByTs()
    val got = PatternExecutor.executeCollect(compiledPattern, buf)
    if (got == null) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(got.map(java.lang.Long.valueOf(_): Any))
  }

  // element type mirrors the ts argument (TIMESTAMP or TIMESTAMP_NTZ)
  override def dataType: DataType = ArrayType(children(1).dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "sequence_match_events"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
