package graft.behavioral

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.types._

/** Funnel strictness modes as a combinable bitmask (reference:
  * `src/window_funnel.rs:51-182`). SQL strings are comma-separable
  * (`'strict_increase, strict_once'`); `'strict'` and `'strict_deduplication'`
  * are ClickHouse aliases for the same bit, while `'timestamp_dedup'` is the
  * extension-only timestamp-dedup mode. An unparseable mode string silently
  * keeps the default (matching the reference FFI,
  * `src/ffi/window_funnel.rs:168-172`).
  */
object FunnelMode {
  val Default = 0
  val Strict = 0x01
  val StrictOrder = 0x02
  val TimestampDedup = 0x04
  val StrictIncrease = 0x08
  val StrictOnce = 0x10
  val AllowReentry = 0x20

  def parse(s: String): Int = {
    if (s == null) return Default
    var result = Default
    for (tok <- s.split(',')) {
      tok.trim match {
        case "" => ()
        case "strict" | "strict_deduplication" => result |= Strict
        case "strict_order" => result |= StrictOrder
        case "timestamp_dedup" => result |= TimestampDedup
        case "strict_increase" => result |= StrictIncrease
        case "strict_once" => result |= StrictOnce
        case "allow_reentry" => result |= AllowReentry
        case _ => return Default // unknown mode: keep default, like the reference FFI
      }
    }
    result
  }
}

/** The funnel state machine itself, shared by the batch aggregate and the
  * Structured Streaming `flatMapGroupsWithState` operator. */
object FunnelScan {

  /** Max funnel step over the (sorted-on-demand) event buffer. */
  def maxStep(buf: EventBuf, windowMicros: Long, mode: Int, numConds: Int): Int = {
    if (buf.isEmpty || numConds == 0) return 0
    buf.sortByTs()
    var best = 0
    var i = 0
    while (i < buf.n && best < numConds) {
      if ((buf.conds(i) & 1) != 0) { // entry condition
        val s = scanFunnel(buf, i, buf.ts(i), windowMicros, mode, numConds)
        if (s > best) best = s
      }
      i += 1
    }
    best
  }

  @inline private def condAt(buf: EventBuf, i: Int, idx: Int): Boolean =
    ((buf.conds(i) >>> idx) & 1) != 0

  /** Greedy forward scan from an entry event; each active mode adds an
    * independent constraint, evaluated in the reference's order. */
  private def scanFunnel(buf: EventBuf, startIdx: Int, entryTs: Long,
      windowMicros: Long, mode: Int, numConds: Int): Int = {
    var currentStep = 1 // step 0 matched at startIdx
    var prevMatchedTs = entryTs
    var j = startIdx + 1
    while (j < buf.n) {
      val evTs = buf.ts(j)
      // window measured from the chain's FIRST event; strictly-greater breaks
      if (evTs - entryTs > windowMicros) return currentStep

      var skip = false
      if ((mode & FunnelMode.AllowReentry) != 0 && currentStep > 1 && condAt(buf, j, 0)) {
        // entry fired mid-chain: reset to step 1 at this event
        currentStep = 1
        prevMatchedTs = evTs
        skip = true
      }
      if (!skip && (mode & FunnelMode.Strict) != 0 && currentStep > 0 &&
          condAt(buf, j, currentStep - 1) && !condAt(buf, j, currentStep)) {
        return currentStep // previously-matched condition re-fired: chain breaks
      }
      if (!skip && (mode & FunnelMode.StrictOrder) != 0) {
        var k = 0
        while (k < currentStep) {
          if (condAt(buf, j, k)) return currentStep // earlier condition fired
          k += 1
        }
      }
      if (!skip && (mode & FunnelMode.TimestampDedup) != 0 &&
          evTs == prevMatchedTs && condAt(buf, j, currentStep)) {
        skip = true // same-ts event can't advance
      }
      if (!skip && (mode & FunnelMode.StrictIncrease) != 0 &&
          condAt(buf, j, currentStep) && evTs <= prevMatchedTs) {
        skip = true // next step needs strictly larger ts
      }
      if (!skip) {
        // default mode: one event may advance multiple consecutive steps
        var advancing = true
        while (advancing && condAt(buf, j, currentStep)) {
          currentStep += 1
          prevMatchedTs = evTs
          if (currentStep >= numConds) return numConds
          if ((mode & FunnelMode.StrictOnce) != 0) advancing = false
        }
      }
      j += 1
    }
    currentStep
  }
}

/** `window_funnel(window, [mode,] ts, cond1, ..., condN) -> INT` — max funnel
  * step reached.
  *
  * Searches for the longest chain cond1 → cond2 → ... → condN where every
  * matched event is within `window` of the chain's FIRST event
  * (reference: `src/window_funnel.rs:305-434`; ClickHouse `windowFunnel`).
  *
  *   - rows with NULL ts are skipped; NULL conditions are false;
  *   - events with no true conditions are pre-filtered at update time
  *     (10-100x memory saver, reference `src/window_funnel.rs:249-254`);
  *   - in default mode one event can advance multiple consecutive steps;
  *   - empty group → 0.
  *
  * Scale shape: the buffer is O(events-per-group) packed 12-byte records;
  * update/merge never sort (deferred to eval). Spark plans this as
  * ObjectHashAggregate with map-side partial aggregation, so each group's
  * events serialize once across the shuffle boundary.
  */
case class WindowFunnelAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EventBuf] {

  // children: window, [mode,] ts, cond1..condN
  private lazy val hasMode = children.length > 1 && children(1).dataType == StringType
  private lazy val windowMicros = IntervalArg.micros(children.head, "window_funnel window")
  private lazy val mode: Int =
    if (hasMode) FunnelMode.parse(IntervalArg.string(children(1), "window_funnel mode"))
    else FunnelMode.Default
  private lazy val tsExpr = children(if (hasMode) 2 else 1)
  private lazy val condExprs: Array[Expression] =
    children.drop(if (hasMode) 3 else 2).toArray
  private def numConds: Int = condExprs.length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size < (if (hasMode) 4 else 3))
      TypeCheckFailure("window_funnel needs (window, [mode,] ts, cond1, ...)")
    // reference FFI enforces 2..32 conditions (ffi/window_funnel.rs:18-21)
    else if (numConds < 2 || numConds > 32)
      TypeCheckFailure(s"window_funnel takes 2..32 boolean conditions, got $numConds")
    else if (condExprs.exists(_.dataType != BooleanType))
      TypeCheckFailure("window_funnel conditions must be BOOLEAN")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): EventBuf = EventBuf.empty()

  // ObjectHashAggregate calls update() with interpreted children otherwise;
  // one generated UnsafeProjection turns the per-row work into a single
  // codegen'd evaluation + primitive reads (~5x at 10M rows)
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

  override def eval(buf: EventBuf): Any =
    Integer.valueOf(FunnelScan.maxStep(buf, windowMicros, mode, numConds))

  override def serialize(buf: EventBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): EventBuf = EventBuf.deserialize(bytes)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "window_funnel"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Wire format shared by [[FunnelStateAgg]] (producer) and
  * [[FunnelMergeAgg]] (consumer): 4-byte condition count + the
  * [[EventBuf]] bytes. The count rides IN the partial because a merge
  * over states built with a different condition list is meaningless —
  * the consumer fails loudly on a mismatch instead of scanning garbage
  * bitmasks. */
private[behavioral] object FunnelPartial {
  def encode(nConds: Int, buf: EventBuf): Array[Byte] = {
    val body = buf.serialize()
    val bb = java.nio.ByteBuffer.allocate(4 + body.length)
    bb.putInt(nConds)
    bb.put(body)
    bb.array()
  }

  /** (nConds, events). */
  def decode(bytes: Array[Byte]): (Int, EventBuf) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val rest = new Array[Byte](bytes.length - 4)
    bb.get(rest)
    (n, EventBuf.deserialize(rest))
  }

  /** Fold one encoded state row into a consumer buffer, enforcing one
    * consistent condition count across everything merged. Shared by every
    * state consumer (funnel_merge + the sequence merge twins). */
  def updateInto(buf: FunnelMergeBuf, bytes: Array[Byte], name: String): Unit = {
    val (n, events) = decode(bytes)
    require(buf.nConds < 0 || buf.nConds == n,
      s"$name saw states built with different condition counts " +
        s"(${buf.nConds} vs $n); merge only states from one funnel_state call site")
    buf.nConds = n
    buf.buf.appendAll(events)
  }

  def mergeInto(buf: FunnelMergeBuf, other: FunnelMergeBuf, name: String): Unit = {
    if (other.nConds >= 0) {
      require(buf.nConds < 0 || buf.nConds == other.nConds,
        s"$name saw states built with different condition counts " +
          s"(${buf.nConds} vs ${other.nConds})")
      buf.nConds = other.nConds
    }
    buf.buf.appendAll(other.buf)
  }
}

/** `funnel_state(ts, cond1, ..., condN) -> BINARY` — the MERGEABLE HALF of
  * `window_funnel`, for pre-aggregated rollups (q105's retention pattern
  * applied to the funnel family): the raw log folds ONCE into per-(user,
  * day) partials, and dashboard queries re-merge partials with
  * [[FunnelMergeAgg]] instead of rescanning events.
  *
  * The partial is the serialized condition-filtered event buffer — the
  * same state `window_funnel` itself shuffles between partial and final
  * aggregation, and the same in-place extend the reference uses for its
  * combine (`src/window_funnel.rs:285-303`) — so the split is exact for
  * EVERY window length and mode: those live on the merge side, which sees
  * the identical event multiset a raw scan would. One rollup table
  * therefore serves all funnel windows/modes over its grain — and the
  * whole SEQUENCE family too: `SequenceAggBase.update` applies the same
  * rules (NULL-ts skip, NULL conds false, no-condition events dropped,
  * bitmask append), so the `sequence_*_merge` twins consume these same
  * partials with the pattern supplied at merge time.
  *
  * The size trade vs retention's rollup: a retention partial is 8 bytes;
  * a funnel partial is O(events with at least one true condition) at 12
  * bytes each (no-condition events are dropped at state time, the
  * reference's own pre-filter, `src/window_funnel.rs:249-254`). Roll up
  * on a grain where that count is dashboard-sized (user x day of
  * CONDITION events, not raw traffic). */
case class FunnelStateAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[EventBuf] {

  // children: ts, cond1..condN — window and mode are merge-side
  private lazy val tsExpr = children.head
  private lazy val condExprs: Array[Expression] = children.drop(1).toArray
  private def numConds: Int = condExprs.length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size < 2)
      TypeCheckFailure("funnel_state needs (ts, cond1, ...)")
    // 1..32: the SEQUENCE consumers accept a single condition (their FFI
    // bound, ffi/sequence.rs) — window_funnel's own 2-condition minimum
    // (ffi/window_funnel.rs:18-21) is enforced by funnel_merge at decode
    else if (numConds < 1 || numConds > 32)
      TypeCheckFailure(s"funnel_state takes 1..32 boolean conditions, got $numConds")
    else if (condExprs.exists(_.dataType != BooleanType))
      TypeCheckFailure("funnel_state conditions must be BOOLEAN")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): EventBuf = EventBuf.empty()

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

  override def eval(buf: EventBuf): Any = FunnelPartial.encode(numConds, buf)

  override def serialize(buf: EventBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): EventBuf = EventBuf.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "funnel_state"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** [[FunnelMergeAgg]]'s buffer: the unioned events plus the condition
  * count learned from the first non-NULL state (-1 until then). */
private[behavioral] final class FunnelMergeBuf(var nConds: Int, val buf: EventBuf)

/** `funnel_merge(window, [mode,] state) -> INT` — folds [[FunnelStateAgg]]
  * partials back into `window_funnel`'s answer. Window and mode are
  * supplied HERE, so one state table serves every funnel variant. NULL
  * states (e.g. an outer join against the rollup) contribute nothing;
  * a group with no states at all answers 0, like `window_funnel` over an
  * empty group. States built with different condition counts cannot be
  * merged meaningfully and fail loudly. */
case class FunnelMergeAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FunnelMergeBuf] {

  // children: window, [mode,] state
  private lazy val hasMode = children.length > 2
  private lazy val windowMicros = IntervalArg.micros(children.head, "funnel_merge window")
  private lazy val mode: Int =
    if (hasMode) FunnelMode.parse(IntervalArg.string(children(1), "funnel_merge mode"))
    else FunnelMode.Default
  private lazy val stateExpr = children.last

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size < 2 || children.size > 3)
      TypeCheckFailure("funnel_merge needs (window, [mode,] state)")
    else if (hasMode && children(1).dataType != StringType)
      TypeCheckFailure("funnel_merge mode must be STRING")
    else if (stateExpr.dataType != BinaryType)
      TypeCheckFailure(s"funnel_merge state must be BINARY (from funnel_state), got ${stateExpr.dataType}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): FunnelMergeBuf =
    new FunnelMergeBuf(-1, EventBuf.empty())

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(stateExpr))

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

  override def eval(buf: FunnelMergeBuf): Any =
    if (buf.nConds < 0) Integer.valueOf(0) // no states: empty group -> 0
    else {
      // window_funnel's own arity contract (ffi/window_funnel.rs:18-21),
      // enforced here because the shared state producer accepts 1
      require(buf.nConds >= 2,
        s"funnel_merge needs states with 2..32 conditions, got ${buf.nConds}")
      Integer.valueOf(FunnelScan.maxStep(buf.buf, windowMicros, mode, buf.nConds))
    }

  override def serialize(buf: FunnelMergeBuf): Array[Byte] =
    FunnelPartial.encode(buf.nConds, buf.buf)
  override def deserialize(bytes: Array[Byte]): FunnelMergeBuf = {
    val (n, events) = FunnelPartial.decode(bytes)
    new FunnelMergeBuf(n, events)
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "funnel_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `funnel_state_combine(state) -> BINARY` — STATE-TO-STATE fold: merges
  * `funnel_state` partials into one partial of the SAME wire format,
  * closing the rollup algebra. Two uses the finalizing `funnel_merge`
  * cannot serve:
  *
  *   - **Re-grain without rescan**: a per-(user, day) rollup collapses
  *     to per-(user, week) / per-user by re-aggregating states — the raw
  *     log is never touched (the partials ARE the events that matter).
  *   - **Rollup-store compaction**: an incrementally-ingested state
  *     table accretes multiple partial rows per (group, grain); folding
  *     them back to one row per grain is this aggregate over the same
  *     grouping ([[graft.ops.RollupStore]]).
  *
  * Associativity is the exactness proof: the partial is an event
  * multiset and combine is multiset union (`EventBuf.appendAll` — the
  * reference's own combine, `src/window_funnel.rs:285-303`), so ANY
  * combine tree yields the multiset a raw scan would build, and every
  * merge-side consumer (funnel/sequence, any window/mode/pattern) is
  * unaffected. NULL states contribute nothing; a group with none yields
  * NULL (which every downstream consumer already skips — a zero-cond
  * placeholder state would instead trip their count-mismatch guard). */
case class FunnelStateCombineAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FunnelMergeBuf] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size != 1)
      TypeCheckFailure("funnel_state_combine needs (state)")
    else if (children.head.dataType != BinaryType)
      TypeCheckFailure(s"funnel_state_combine state must be BINARY (from funnel_state), got ${children.head.dataType}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): FunnelMergeBuf =
    new FunnelMergeBuf(-1, EventBuf.empty())

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(children.head))

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

  override def eval(buf: FunnelMergeBuf): Any =
    if (buf.nConds < 0) null else FunnelPartial.encode(buf.nConds, buf.buf)

  override def serialize(buf: FunnelMergeBuf): Array[Byte] =
    FunnelPartial.encode(buf.nConds, buf.buf)
  override def deserialize(bytes: Array[Byte]): FunnelMergeBuf = {
    val (n, events) = FunnelPartial.decode(bytes)
    new FunnelMergeBuf(n, events)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "funnel_state_combine"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
