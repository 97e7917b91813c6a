package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded heap keeping the k BEST (score desc, id asc) entries. The root
  * is the current WORST kept entry, so an insert beyond k evicts in
  * O(log k). */
final class ScoreHeap(var k: Int) {
  var scores: Array[Double] = new Array[Double](math.min(k, 16).max(1))
  var ids: Array[Long] = new Array[Long](scores.length)
  var size: Int = 0

  // "worse" = smaller score, ties broken by LARGER id (so the kept set is
  // the k largest scores with smallest-id tie preference)
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      if (size == scores.length) {
        val cap = math.min(k.toLong, scores.length * 2L).toInt
        scores = java.util.Arrays.copyOf(scores, cap)
        ids = java.util.Arrays.copyOf(ids, cap)
      }
      scores(size) = score; ids(size) = id
      var i = size
      size += 1
      // sift up: parent must be WORSE than children (min-heap on quality)
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(p); ids(i) = ids(p); scores(p) = ts; ids(p) = ti
        i = p
      }
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true
        else {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(m); ids(i) = ids(m); scores(m) = ts; ids(m) = ti
          i = m
        }
      }
    }
  }
}

/** `score_topk(k, score, id) -> array<struct<score: double, id: long>>` —
  * the group's k best entries by (score DESC, id ASC), in that order.
  *
  * The per-group top-k of a batched similarity search: a row_number
  * window would shuffle every (query, candidate, score) row into the
  * query's partition and SORT it; this aggregate's map-side partial
  * buffers keep at most k entries per (query, partition), so the shuffle
  * carries Q×k×partitions rows regardless of corpus size, and no
  * partition-wide sort ever runs. NULL scores/ids are skipped; `k` must
  * be constant within each group. */
case class ScoreTopK(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ScoreHeap] {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size != 3)
      TypeCheckResult.TypeCheckFailure("score_topk takes (k, score, id)")
    else if (children(0).dataType != LongType && children(0).dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("score_topk k must be integral")
    else if (children(1).dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("score_topk score must be DOUBLE")
    else if (children(2).dataType != LongType && children(2).dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("score_topk id must be integral")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): ScoreHeap = new ScoreHeap(0)

  @transient private lazy val inputProj =
    UnsafeProjection.create(children.zipWithIndex.map { case (c, i) =>
      if (i != 1 && c.dataType == IntegerType)
        org.apache.spark.sql.catalyst.expressions.Cast(c, LongType)
      else c
    }.toIndexedSeq)

  override def update(buf: ScoreHeap, input: InternalRow): ScoreHeap = {
    val row = inputProj(input)
    if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2)) return buf
    val k = row.getLong(0).toInt
    if (buf.k == 0 && k > 0) buf.k = k
    val score = row.getDouble(1)
    // NaN never outranks a real score (SQL ordering would put it last, and
    // every `worse` comparison against NaN is false) — but a NaN inserted
    // while the heap is under-full would permanently occupy a top-k slot,
    // since eviction only ever replaces the root. Skip it, so zero-norm
    // cosine scores (0/0) can't displace genuine neighbors.
    if (java.lang.Double.isNaN(score)) return buf
    buf.insert(score, row.getLong(2))
    buf
  }

  override def merge(buf: ScoreHeap, other: ScoreHeap): ScoreHeap = {
    if (buf.k == 0) buf.k = other.k
    var i = 0
    while (i < other.size) {
      buf.insert(other.scores(i), other.ids(i))
      i += 1
    }
    buf
  }

  override def eval(buf: ScoreHeap): Any = {
    val idx = (0 until buf.size).sortBy(i => (-buf.scores(i), buf.ids(i)))
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
    }.toArray[Any])
  }

  override def serialize(buf: ScoreHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buf.size)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)).putLong(buf.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ScoreHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val h = new ScoreHeap(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      h.insert(bb.getDouble, bb.getLong)
      i += 1
    }
    h
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "score_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
