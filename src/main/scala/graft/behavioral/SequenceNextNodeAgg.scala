package graft.behavioral

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Buffer for `sequence_next_node`: every row is stored (any event can be the
  * answer, reference `src/sequence_next_node.rs:186-192`). `flags` packs the
  * step-condition bitmask in bits 0..31 and the base-condition in bit 32.
  *
  * Values are DICTIONARY-ENCODED: each event stores a 4-byte index into a
  * per-buffer string pool (`-1` = NULL), and a value string is cloned out of
  * Spark's reused row buffer only on its FIRST occurrence. Behavioral value
  * columns are low-cardinality (event types, page names), so this bounds the
  * dominant cost — per-event string allocation and shuffle bytes — by the
  * distinct-value count instead of the event count. The same idea as the
  * reference's `Arc<str>` sharing (its `sequence_next_node_realistic` bench,
  * PERF.md), expressed as a pool because JVM strings have no cheap refcount.
  */
final class NNBuf(
    var ts: Array[Long],
    var flags: Array[Long],
    var values: Array[Int],
    var n: Int,
    var pool: Array[UTF8String],
    var poolN: Int) {

  def this(capacity: Int) =
    this(new Array[Long](capacity), new Array[Long](capacity),
      new Array[Int](capacity), 0, new Array[UTF8String](4), 0)

  // lazily-built lookup over pool[0, poolN) — rebuilt after deserialize
  @transient private var poolMap: java.util.HashMap[UTF8String, Integer] = _

  private def ensure(extra: Int): Unit = {
    val need = n + extra
    if (need > ts.length) {
      var cap = math.max(ts.length * 2, 16)
      while (cap < need) cap *= 2
      ts = java.util.Arrays.copyOf(ts, cap)
      flags = java.util.Arrays.copyOf(flags, cap)
      values = java.util.Arrays.copyOf(values, cap)
    }
  }

  /** Pool index of `v`, interning (and CLONING — the caller's bytes may be a
    * reused row buffer) on first sight. */
  def intern(v: UTF8String): Int = internImpl(v, owned = false)

  /** Like intern, but `v` is already heap-owned (a deserialized or
    * previously-interned pool entry) — adopted by reference, no copy. Used
    * by the merge path so a distinct value is allocated once per partition,
    * not once per merge hop. */
  private def internOwned(v: UTF8String): Int = internImpl(v, owned = true)

  private def internImpl(v: UTF8String, owned: Boolean): Int = {
    if (v == null) return -1
    if (poolMap == null) {
      poolMap = new java.util.HashMap[UTF8String, Integer](math.max(poolN * 2, 8))
      var i = 0
      while (i < poolN) { poolMap.putIfAbsent(pool(i), Integer.valueOf(i)); i += 1 }
    }
    val got = poolMap.get(v)
    if (got != null) return got.intValue()
    if (poolN == pool.length) pool = java.util.Arrays.copyOf(pool, poolN * 2)
    val kept = if (owned) v else v.clone()
    pool(poolN) = kept
    poolMap.put(kept, Integer.valueOf(poolN))
    poolN += 1
    poolN - 1
  }

  def valueAt(i: Int): UTF8String = {
    val idx = values(i)
    if (idx < 0) null else pool(idx)
  }

  def append(t: Long, f: Long, valueIdx: Int): Unit = {
    ensure(1)
    ts(n) = t; flags(n) = f; values(n) = valueIdx
    n += 1
  }

  def appendAll(o: NNBuf): Unit = {
    ensure(o.n)
    // remap the other buffer's pool indices into this pool; the source pool
    // entries are already owned heap strings, adopt them without re-cloning
    val remap = new Array[Int](o.poolN)
    var i = 0
    while (i < o.poolN) { remap(i) = internOwned(o.pool(i)); i += 1 }
    System.arraycopy(o.ts, 0, ts, n, o.n)
    System.arraycopy(o.flags, 0, flags, n, o.n)
    i = 0
    while (i < o.n) {
      val idx = o.values(i)
      values(n + i) = if (idx < 0) -1 else remap(idx)
      i += 1
    }
    n += o.n
  }

  def sortByTs(): Unit = {
    var sorted = true
    var i = 1
    while (sorted && i < n) { if (ts(i - 1) > ts(i)) sorted = false; i += 1 }
    if (!sorted) {
      // stable primitive-index merge sort, then permute the three arrays —
      // stability keeps same-timestamp input order (the scan semantics depend
      // on it) and avoids boxing on the hot path
      val idx = new Array[Int](n)
      i = 0
      while (i < n) { idx(i) = i; i += 1 }
      mergeSortIdx(idx, new Array[Int](n), 0, n)
      val t2 = new Array[Long](n); val f2 = new Array[Long](n)
      val v2 = new Array[Int](n)
      i = 0
      while (i < n) { t2(i) = ts(idx(i)); f2(i) = flags(idx(i)); v2(i) = values(idx(i)); i += 1 }
      ts = t2; flags = f2; values = v2
    }
  }

  // sorts idx[lo,hi) by ts(idx(_)) ascending, stable; aux is scratch
  private def mergeSortIdx(idx: Array[Int], aux: Array[Int], lo: Int, hi: Int): Unit = {
    if (hi - lo < 2) return
    val mid = (lo + hi) >>> 1
    mergeSortIdx(idx, aux, lo, mid)
    mergeSortIdx(idx, aux, mid, hi)
    if (ts(idx(mid - 1)) <= ts(idx(mid))) return // already ordered
    System.arraycopy(idx, lo, aux, lo, hi - lo)
    var i = lo; var j = mid; var k = lo
    while (k < hi) {
      if (i >= mid) { idx(k) = aux(j); j += 1 }
      else if (j >= hi) { idx(k) = aux(i); i += 1 }
      else if (ts(aux(j)) < ts(aux(i))) { idx(k) = aux(j); j += 1 }
      else { idx(k) = aux(i); i += 1 }
      k += 1
    }
  }

  /** 20 bytes per event + each distinct value once — the shuffle payload is
    * bounded by cardinality, not event count. */
  def serialize(): Array[Byte] = {
    var bytes = 8 + n * 20
    var i = 0
    while (i < poolN) { bytes += 4 + pool(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(n)
    i = 0
    while (i < n) { bb.putLong(ts(i)); i += 1 }
    i = 0
    while (i < n) { bb.putLong(flags(i)); i += 1 }
    i = 0
    while (i < n) { bb.putInt(values(i)); i += 1 }
    bb.putInt(poolN)
    i = 0
    while (i < poolN) {
      val b = pool(i).getBytes
      bb.putInt(b.length); bb.put(b)
      i += 1
    }
    bb.array()
  }
}

object NNBuf {
  def deserialize(bytes: Array[Byte]): NNBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val cap = math.max(n, 16)
    val ts = new Array[Long](cap)
    val flags = new Array[Long](cap)
    val values = new Array[Int](cap)
    var i = 0
    while (i < n) { ts(i) = bb.getLong; i += 1 }
    i = 0
    while (i < n) { flags(i) = bb.getLong; i += 1 }
    i = 0
    while (i < n) { values(i) = bb.getInt; i += 1 }
    val poolN = bb.getInt
    val pool = new Array[UTF8String](math.max(poolN, 4))
    i = 0
    while (i < poolN) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      pool(i) = UTF8String.fromBytes(b)
      i += 1
    }
    new NNBuf(ts, flags, values, n, pool, poolN)
  }
}

/** `sequence_next_node(direction, base, ts, value, base_cond, ev1..evN) ->
  * STRING` — the value of the event adjacent to a matched chain
  * (ClickHouse `sequenceNextNode`; reference `src/sequence_next_node.rs`).
  *
  *   - `direction` = `'forward'` (answer = value immediately AFTER the last
  *     matched event) or `'backward'` (value immediately BEFORE the earliest
  *     matched event); case-insensitive.
  *   - `base` = `'head'` (first row with base_cond true) | `'tail'` (last) |
  *     `'first_match'` | `'last_match'`.
  *   - NULL ts rows are skipped; NULL value rows are stored and returned as
  *     NULL if selected; no match / no adjacent event → NULL.
  *
  * Unlike the other aggregates, ALL rows are buffered (no condition
  * pre-filter): the adjacent "next node" can be any event. At scale this
  * means O(group-size) state carrying the value strings — the dominant cost
  * is the shuffle of the value column itself, same as the reference's
  * 32-byte-event memory ceiling (`PERF.md:1000-1005`).
  */
case class SequenceNextNodeAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NNBuf] {

  // direction: true = forward. Unknown strings default to forward, matching
  // the reference's finalize() `unwrap_or(Direction::Forward)`
  // (src/sequence_next_node.rs finalize).
  @transient private lazy val forward: Boolean =
    Option(IntervalArg.string(children(0), "sequence_next_node direction"))
      .map(_.trim.toLowerCase) match {
      case Some("backward") => false
      case _ => true
    }
  // base: 0=head, 1=tail, 2=first_match, 3=last_match. Unknown strings
  // default to first_match (reference `unwrap_or(Base::FirstMatch)`).
  @transient private lazy val base: Int =
    Option(IntervalArg.string(children(1), "sequence_next_node base"))
      .map(_.trim.toLowerCase) match {
      case Some("head") => 0
      case Some("tail") => 1
      case Some("last_match") => 3
      case _ => 2
    }
  @transient private lazy val tsExpr = children(2)
  @transient private lazy val valueExpr = children(3)
  @transient private lazy val baseCondExpr = children(4)
  @transient private lazy val stepExprs: Array[Expression] = children.drop(5).toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size < 6)
      TypeCheckFailure("sequence_next_node needs (direction, base, ts, value, baseCond, ev1, ...)")
    else if (children.size - 5 > 32)
      TypeCheckFailure(s"sequence_next_node supports at most 32 step conditions, got ${children.size - 5}")
    else if (children(3).dataType != StringType)
      TypeCheckFailure(s"sequence_next_node value must be STRING, got ${children(3).dataType}")
    else if (children.drop(4).exists(_.dataType != BooleanType))
      TypeCheckFailure("sequence_next_node base/step conditions must be BOOLEAN")
    else TypeCheckSuccess
  }
  private def numSteps: Int = stepExprs.length

  override def createAggregationBuffer(): NNBuf = new NNBuf(16)

  // codegen'd input projection: (ts, value, baseCond, step1..stepN) — one
  // generated evaluation per row instead of N interpreted eval() calls
  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      (tsExpr +: valueExpr +: baseCondExpr +: stepExprs.toIndexedSeq))

  override def update(buf: NNBuf, input: InternalRow): NNBuf = {
    val row = inputProj(input)
    if (row.isNullAt(0)) return buf
    var f = 0L
    var i = 0
    while (i < stepExprs.length) {
      if (!row.isNullAt(i + 3) && row.getBoolean(i + 3)) f |= 1L << i
      i += 1
    }
    if (!row.isNullAt(2) && row.getBoolean(2)) f |= 1L << 32
    // intern clones the bytes on first sight only (the projection's backing
    // buffer is reused across rows); repeats cost one hash lookup
    val valueIdx = if (row.isNullAt(1)) -1 else buf.intern(row.getUTF8String(1))
    buf.append(row.getLong(0), f, valueIdx)
    buf
  }

  override def merge(buf: NNBuf, other: NNBuf): NNBuf = {
    buf.appendAll(other)
    buf
  }

  override def eval(buf: NNBuf): Any = {
    if (buf.n == 0 || numSteps == 0) return null
    buf.sortByTs()
    NextNodeScan.scan(buf, forward, base, numSteps)
  }

  override def serialize(buf: NNBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): NNBuf = NNBuf.deserialize(bytes)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "sequence_next_node"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Wire format shared by [[NextNodeStateAgg]] (producer) and
  * [[NextNodeMergeAgg]] (consumer): 4-byte step-condition count + the
  * [[NNBuf]] bytes. Mirrors [[FunnelPartial]]: the count rides IN the
  * partial so a merge over states built with different step lists fails
  * loudly instead of scanning garbage bitmasks. */
private[behavioral] object NextNodePartial {
  def encode(nSteps: Int, buf: NNBuf): Array[Byte] = {
    val body = buf.serialize()
    val bb = ByteBuffer.allocate(4 + body.length)
    bb.putInt(nSteps)
    bb.put(body)
    bb.array()
  }

  /** (nSteps, events). */
  def decode(bytes: Array[Byte]): (Int, NNBuf) = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val rest = new Array[Byte](bytes.length - 4)
    bb.get(rest)
    (n, NNBuf.deserialize(rest))
  }

  def updateInto(buf: NNMergeBuf, bytes: Array[Byte], name: String): Unit = {
    val (n, events) = decode(bytes)
    require(buf.nSteps < 0 || buf.nSteps == n,
      s"$name saw states built with different step-condition counts " +
        s"(${buf.nSteps} vs $n); merge only states from one next_node_state call site")
    buf.nSteps = n
    buf.buf.appendAll(events)
  }

  def mergeInto(buf: NNMergeBuf, other: NNMergeBuf, name: String): Unit = {
    if (other.nSteps >= 0) {
      require(buf.nSteps < 0 || buf.nSteps == other.nSteps,
        s"$name saw states built with different step-condition counts " +
          s"(${buf.nSteps} vs ${other.nSteps})")
      buf.nSteps = other.nSteps
    }
    buf.buf.appendAll(other.buf)
  }
}

/** [[NextNodeMergeAgg]]'s buffer: the unioned events plus the step count
  * learned from the first non-NULL state (-1 until then). */
private[behavioral] final class NNMergeBuf(var nSteps: Int, val buf: NNBuf)

/** `next_node_state(ts, value, base_cond, ev1..evN) -> BINARY` — the
  * MERGEABLE HALF of `sequence_next_node`, completing the behavioral
  * family's rollup story (retention q105, funnel/sequence q108–q112):
  * the raw log folds ONCE into per-(user, day) partials and dashboard
  * queries re-merge them with [[NextNodeMergeAgg]], where DIRECTION and
  * BASE are supplied — so one state table serves all 8 direction × base
  * variants without rescanning events.
  *
  * The partial is the serialized [[NNBuf]] — the exact state the raw
  * aggregate shuffles between partial and final aggregation — so the
  * split is exact: the merge sees the identical (ts, flags, value)
  * multiset a raw scan would, and the single ts-sort happens at merge
  * eval in both paths.
  *
  * Size trade (the family's heaviest partial): unlike `funnel_state`,
  * which drops condition-less events, the next-node state keeps EVERY
  * row — any event's value can be the answer — at 20 bytes/event plus
  * each DISTINCT value once (the dictionary pool bounds string payload
  * by cardinality, not event count). Roll up on a grain where total
  * event count is dashboard-sized. */
case class NextNodeStateAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NNBuf] {

  // children: ts, value, baseCond, ev1..evN — direction and base are
  // merge-side (NextNodeScan runs only at merge eval)
  @transient private lazy val tsExpr = children(0)
  @transient private lazy val valueExpr = children(1)
  @transient private lazy val baseCondExpr = children(2)
  @transient private lazy val stepExprs: Array[Expression] = children.drop(3).toArray
  private def numSteps: Int = children.size - 3

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size < 4)
      TypeCheckFailure("next_node_state needs (ts, value, baseCond, ev1, ...)")
    else if (numSteps > 32)
      TypeCheckFailure(s"next_node_state supports at most 32 step conditions, got $numSteps")
    else if (children(1).dataType != StringType)
      TypeCheckFailure(s"next_node_state value must be STRING, got ${children(1).dataType}")
    else if (children.drop(2).exists(_.dataType != BooleanType))
      TypeCheckFailure("next_node_state base/step conditions must be BOOLEAN")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): NNBuf = new NNBuf(16)

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(
      (tsExpr +: valueExpr +: baseCondExpr +: stepExprs.toIndexedSeq))

  // identical row rules to SequenceNextNodeAgg.update: NULL ts skipped,
  // EVERY other row kept (the adjacent node can be any event), NULL value
  // stored as pool index -1
  override def update(buf: NNBuf, input: InternalRow): NNBuf = {
    val row = inputProj(input)
    if (row.isNullAt(0)) return buf
    var f = 0L
    var i = 0
    while (i < stepExprs.length) {
      if (!row.isNullAt(i + 3) && row.getBoolean(i + 3)) f |= 1L << i
      i += 1
    }
    if (!row.isNullAt(2) && row.getBoolean(2)) f |= 1L << 32
    val valueIdx = if (row.isNullAt(1)) -1 else buf.intern(row.getUTF8String(1))
    buf.append(row.getLong(0), f, valueIdx)
    buf
  }

  override def merge(buf: NNBuf, other: NNBuf): NNBuf = {
    buf.appendAll(other)
    buf
  }

  override def eval(buf: NNBuf): Any = NextNodePartial.encode(numSteps, buf)

  override def serialize(buf: NNBuf): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): NNBuf = NNBuf.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "next_node_state"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `next_node_merge(direction, base, state) -> STRING` — folds
  * [[NextNodeStateAgg]] partials back into `sequence_next_node`'s
  * answer. Direction and base are supplied HERE (same defaults as the
  * raw aggregate: unknown direction → forward, unknown base →
  * first_match), so one state table serves all 8 combinations. NULL
  * states contribute nothing; a group with no states (or only empty
  * states) answers NULL, like `sequence_next_node` over an empty group.
  * States built with different step-condition counts fail loudly. */
case class NextNodeMergeAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NNMergeBuf] {

  // children: direction, base, state
  @transient private lazy val forward: Boolean =
    Option(IntervalArg.string(children(0), "next_node_merge direction"))
      .map(_.trim.toLowerCase) match {
      case Some("backward") => false
      case _ => true
    }
  @transient private lazy val base: Int =
    Option(IntervalArg.string(children(1), "next_node_merge base"))
      .map(_.trim.toLowerCase) match {
      case Some("head") => 0
      case Some("tail") => 1
      case Some("last_match") => 3
      case _ => 2
    }
  @transient private lazy val stateExpr = children(2)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size != 3)
      TypeCheckFailure("next_node_merge needs (direction, base, state)")
    else if (stateExpr.dataType != BinaryType)
      TypeCheckFailure(s"next_node_merge state must be BINARY (from next_node_state), got ${stateExpr.dataType}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): NNMergeBuf =
    new NNMergeBuf(-1, new NNBuf(16))

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(stateExpr))

  override def update(buf: NNMergeBuf, input: InternalRow): NNMergeBuf = {
    val row = inputProj(input)
    if (!row.isNullAt(0))
      NextNodePartial.updateInto(buf, row.getBinary(0), prettyName)
    buf
  }

  override def merge(buf: NNMergeBuf, other: NNMergeBuf): NNMergeBuf = {
    NextNodePartial.mergeInto(buf, other, prettyName)
    buf
  }

  override def eval(buf: NNMergeBuf): Any = {
    if (buf.nSteps <= 0 || buf.buf.n == 0) return null
    buf.buf.sortByTs()
    NextNodeScan.scan(buf.buf, forward, base, buf.nSteps)
  }

  override def serialize(buf: NNMergeBuf): Array[Byte] =
    NextNodePartial.encode(buf.nSteps, buf.buf)
  override def deserialize(bytes: Array[Byte]): NNMergeBuf = {
    val (n, events) = NextNodePartial.decode(bytes)
    new NNMergeBuf(n, events)
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "next_node_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** `next_node_state_combine(state) -> BINARY` — state-to-state fold for
  * the next-node family, mirroring `funnel_state_combine`: merges
  * [[NextNodeStateAgg]] partials into one partial of the same wire
  * format (dictionary pools re-interned, so a value's bytes appear once
  * per combined partial). Serves re-graining a rollup (day → week /
  * user) and [[graft.ops.RollupStore]] compaction without touching the
  * raw log. NULL states contribute nothing; a group with none yields
  * NULL (a placeholder state would trip the consumers' step-count
  * guard). Exact by associativity: combine is multiset union, the same
  * `NNBuf.appendAll` the raw aggregate's own partial merge uses. */
case class NextNodeStateCombineAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NNMergeBuf] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (children.size != 1)
      TypeCheckFailure("next_node_state_combine needs (state)")
    else if (children.head.dataType != BinaryType)
      TypeCheckFailure(s"next_node_state_combine state must be BINARY (from next_node_state), got ${children.head.dataType}")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): NNMergeBuf =
    new NNMergeBuf(-1, new NNBuf(16))

  @transient private lazy val inputProj =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(Seq(children.head))

  override def update(buf: NNMergeBuf, input: InternalRow): NNMergeBuf = {
    val row = inputProj(input)
    if (!row.isNullAt(0))
      NextNodePartial.updateInto(buf, row.getBinary(0), prettyName)
    buf
  }

  override def merge(buf: NNMergeBuf, other: NNMergeBuf): NNMergeBuf = {
    NextNodePartial.mergeInto(buf, other, prettyName)
    buf
  }

  override def eval(buf: NNMergeBuf): Any =
    if (buf.nSteps < 0) null else NextNodePartial.encode(buf.nSteps, buf.buf)

  override def serialize(buf: NNMergeBuf): Array[Byte] =
    NextNodePartial.encode(buf.nSteps, buf.buf)
  override def deserialize(bytes: Array[Byte]): NNMergeBuf = {
    val (n, events) = NextNodePartial.decode(bytes)
    new NNMergeBuf(n, events)
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "next_node_state_combine"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** The direction × base scan over a ts-sorted `NNBuf`, shared by the batch
  * aggregate and `StreamingBehavioral.streamingSequenceNextNode` so the two
  * surfaces cannot drift (reference `src/sequence_next_node.rs:300-420`). */
object NextNodeScan {

  @inline private def baseCond(buf: NNBuf, i: Int): Boolean = ((buf.flags(i) >>> 32) & 1L) != 0
  @inline private def stepCond(buf: NNBuf, i: Int, step: Int): Boolean =
    ((buf.flags(i) >>> step) & 1L) != 0

  /** `base`: 0=head, 1=tail, 2=first_match, 3=last_match. Returns the
    * adjacent value as `UTF8String`, or null. `buf` must be ts-sorted. */
  def scan(buf: NNBuf, forward: Boolean, base: Int, numSteps: Int): Any =
    if (forward) matchForward(buf, base, numSteps)
    else matchBackward(buf, base, numSteps)

  private def matchForward(buf: NNBuf, b: Int, numSteps: Int): Any = {
    val n = buf.n
    b match {
      case 0 => // head: first row with base_cond
        var s = 0
        while (s < n && !baseCond(buf, s)) s += 1
        if (s == n) null else tryForwardFrom(buf, s, numSteps)
      case 1 => // tail: last row with base_cond
        var s = n - 1
        while (s >= 0 && !baseCond(buf, s)) s -= 1
        if (s < 0) null else tryForwardFrom(buf, s, numSteps)
      case 2 => // first_match
        var s = 0
        while (s < n) {
          if (baseCond(buf, s)) {
            val v = tryForwardFrom(buf, s, numSteps)
            if (v != null) return v
          }
          s += 1
        }
        null
      case _ => // last_match
        var result: Any = null
        var s = 0
        while (s < n) {
          if (baseCond(buf, s)) {
            val v = tryForwardFrom(buf, s, numSteps)
            if (v != null) result = v
          }
          s += 1
        }
        result
    }
  }

  /** Matches ev1 at `start`, then ev2.. at later events; returns the value of
    * the event immediately after the last matched one (NULL value → NULL —
    * the reference's `null`-valued next node is a NULL result). */
  private def tryForwardFrom(buf: NNBuf, start: Int, numSteps: Int): Any = {
    if (!stepCond(buf, start, 0)) return null
    var lastMatched = start
    var step = 1
    var pos = start + 1
    while (pos < buf.n && step < numSteps) {
      if (stepCond(buf, pos, step)) { lastMatched = pos; step += 1 }
      pos += 1
    }
    if (step != numSteps) return null
    val nextIdx = lastMatched + 1
    if (nextIdx >= buf.n) null else buf.valueAt(nextIdx)
  }

  private def matchBackward(buf: NNBuf, b: Int, numSteps: Int): Any = {
    val n = buf.n
    b match {
      case 1 => // tail
        var s = n - 1
        while (s >= 0 && !baseCond(buf, s)) s -= 1
        if (s < 0) null else tryBackwardFrom(buf, s, numSteps)
      case 0 => // head
        var s = 0
        while (s < n && !baseCond(buf, s)) s += 1
        if (s == n) null else tryBackwardFrom(buf, s, numSteps)
      case 2 => // first_match scans right-to-left (reference :352-363)
        var s = n - 1
        while (s >= 0) {
          if (baseCond(buf, s)) {
            val v = tryBackwardFrom(buf, s, numSteps)
            if (v != null) return v
          }
          s -= 1
        }
        null
      case _ => // last_match: last complete match in right-to-left scan order
        var result: Any = null
        var s = n - 1
        while (s >= 0) {
          if (baseCond(buf, s)) {
            val v = tryBackwardFrom(buf, s, numSteps)
            if (v != null) result = v
          }
          s -= 1
        }
        result
    }
  }

  /** Matches ev1 at `start`, ev2.. at progressively earlier events; returns
    * the value immediately before the earliest matched event. */
  private def tryBackwardFrom(buf: NNBuf, start: Int, numSteps: Int): Any = {
    if (!stepCond(buf, start, 0)) return null
    var earliest = start
    var step = 1
    var pos = start - 1
    while (pos >= 0 && step < numSteps) {
      if (stepCond(buf, pos, step)) { earliest = pos; step += 1 }
      pos -= 1
    }
    if (step != numSteps) return null
    if (earliest == 0) null else buf.valueAt(earliest - 1)
  }
}
