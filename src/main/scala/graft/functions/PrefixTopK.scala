package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k heap for (df, h) pairs: keeps the k SMALLEST pairs in
  * (df, h) order. Backing arrays double geometrically up to k; the heap is
  * a classic array binary max-heap so inserts beyond k evict the current
  * maximum in O(log k). */
final class PrefixHeap(var k: Int) {
  var dfs: Array[Long] = new Array[Long](math.min(k, 16).max(1))
  var hs: Array[Long] = new Array[Long](dfs.length)
  var size: Int = 0

  @inline private def less(d1: Long, h1: Long, d2: Long, h2: Long): Boolean =
    d1 < d2 || (d1 == d2 && h1 < h2)

  def insert(df: Long, h: Long): Unit = {
    if (size < k) {
      if (size == dfs.length) {
        val cap = math.min(k.toLong, dfs.length * 2L).toInt
        dfs = java.util.Arrays.copyOf(dfs, cap)
        hs = java.util.Arrays.copyOf(hs, cap)
      }
      dfs(size) = df; hs(size) = h
      // sift up
      var i = size
      size += 1
      while (i > 0 && less(dfs((i - 1) / 2), hs((i - 1) / 2), dfs(i), hs(i))) {
        val p = (i - 1) / 2
        val td = dfs(i); val th = hs(i)
        dfs(i) = dfs(p); hs(i) = hs(p); dfs(p) = td; hs(p) = th
        i = p
      }
    } else if (k > 0 && less(df, h, dfs(0), hs(0))) {
      // replace the max, sift down
      dfs(0) = df; hs(0) = h
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && less(dfs(m), hs(m), dfs(l), hs(l))) m = l
        if (r < size && less(dfs(m), hs(m), dfs(r), hs(r))) m = r
        if (m == i) done = true
        else {
          val td = dfs(i); val th = hs(i)
          dfs(i) = dfs(m); hs(i) = hs(m); dfs(m) = td; hs(m) = th
          i = m
        }
      }
    }
  }
}

/** `prefix_topk(k, df, h) -> array<struct<df: long, h: long>>` — the k
  * SMALLEST (df, h) pairs of the group, ascending. `k` must be constant
  * within each group (it is derived from the group's own size in the
  * jaccard prefix use).
  *
  * This is the prefix-ranking aggregate of the AllPairs join: each doc
  * keeps only its `prefixLen` globally-rarest shingles. A
  * `sort_array(collect_list(...))` + `slice` buffers and shuffles the
  * doc's ENTIRE posting list to keep a prefix of it; this aggregate's
  * buffer is a bounded binary max-heap of k entries, so
  *   - per-group memory is O(prefixLen), never O(n_sh) — a mega-document
  *     cannot concentrate an unbounded aggregation row;
  *   - map-side partial aggregation ships at most k entries per group per
  *     partition instead of every posting (≈2× fewer shuffle bytes at
  *     t = 0.5, 5× at t = 0.8);
  *   - merge is heap-merge, eval is one O(k log k) sort of the survivors.
  */
case class PrefixTopK(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PrefixHeap] {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 3)
      TypeCheckResult.TypeCheckFailure("prefix_topk takes (k, df, h)")
    else if (children.exists(c => c.dataType != LongType && c.dataType != IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"prefix_topk arguments must be integral, got " +
          children.map(_.dataType.catalogString).mkString(", "))
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): PrefixHeap = new PrefixHeap(0)

  @transient private lazy val inputProj =
    UnsafeProjection.create(children.map(c =>
      if (c.dataType == IntegerType)
        org.apache.spark.sql.catalyst.expressions.Cast(c, LongType)
      else c).toIndexedSeq)

  override def update(buf: PrefixHeap, input: InternalRow): PrefixHeap = {
    val row = inputProj(input)
    if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2)) return buf
    val k = row.getLong(0).toInt
    if (buf.k == 0 && k > 0) buf.k = k
    buf.insert(row.getLong(1), row.getLong(2))
    buf
  }

  override def merge(buf: PrefixHeap, other: PrefixHeap): PrefixHeap = {
    if (buf.k == 0) buf.k = other.k
    var i = 0
    while (i < other.size) {
      buf.insert(other.dfs(i), other.hs(i))
      i += 1
    }
    buf
  }

  override def eval(buf: PrefixHeap): Any = {
    val idx = (0 until buf.size).sortBy(i => (buf.dfs(i), buf.hs(i)))
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](buf.dfs(i), buf.hs(i)))
    }.toArray[Any])
  }

  override def serialize(buf: PrefixHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.dfs(i)).putLong(buf.hs(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PrefixHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val h = new PrefixHeap(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      h.insert(bb.getLong, bb.getLong)
      i += 1
    }
    h
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("df", LongType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "prefix_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
