package graft.behavioral

import java.nio.ByteBuffer

/** Growable buffer of (timestampMicros, conditionBitmask) events.
  *
  * The aggregation-buffer equivalent of the reference's
  * `Vec<Event { timestamp_us: i64, conditions: u32 }>`
  * (reference: `src/common/event.rs:23,35-41`). Stored as two primitive
  * parallel arrays so serialization (which runs on every shuffle spill of a
  * `TypedImperativeAggregate`) is a straight memcpy with zero boxing.
  *
  * Conditions are a bitmask: bit `i` set means condition `i` was true at that
  * timestamp; at most 32 conditions (reference `MAX_EVENT_CONDITIONS = 32`).
  */
final class EventBuf(
    var ts: Array[Long],
    var conds: Array[Int],
    var n: Int) {

  def this(capacity: Int) = this(new Array[Long](capacity), new Array[Int](capacity), 0)

  private def ensure(extra: Int): Unit = {
    val need = n + extra
    if (need > ts.length) {
      var cap = math.max(ts.length * 2, 16)
      while (cap < need) cap *= 2
      ts = java.util.Arrays.copyOf(ts, cap)
      conds = java.util.Arrays.copyOf(conds, cap)
    }
  }

  def append(t: Long, c: Int): Unit = {
    ensure(1)
    ts(n) = t
    conds(n) = c
    n += 1
  }

  /** In-place combine: appends `other`'s events (reference keeps combine
    * O(amortized-N) by extending in place, `src/window_funnel.rs:285-303`). */
  def appendAll(other: EventBuf): Unit = {
    ensure(other.n)
    System.arraycopy(other.ts, 0, ts, n, other.n)
    System.arraycopy(other.conds, 0, conds, n, other.n)
    n += other.n
  }

  def isEmpty: Boolean = n == 0

  /** True if already sorted by timestamp ascending (O(n) presorted check,
    * reference `src/common/event.rs:95-122`). */
  def isSorted: Boolean = {
    var i = 1
    while (i < n) {
      if (ts(i - 1) > ts(i)) return false
      i += 1
    }
    true
  }

  /** Sorts events by timestamp ascending. Unstable (same-timestamp order is
    * undefined, matching the reference's `sort_unstable`,
    * `src/common/event.rs:103-107`). Deferred to finalize-time — never called
    * per merge. */
  def sortByTs(): Unit = if (!isSorted) quicksort(0, n - 1)

  private def quicksort(lo: Int, hi: Int): Unit = {
    var l = lo
    var h = hi
    while (l < h) {
      if (h - l < 16) { insertion(l, h); return }
      // median-of-three pivot
      val mid = l + (h - l) / 2
      if (ts(mid) < ts(l)) swap(mid, l)
      if (ts(h) < ts(l)) swap(h, l)
      if (ts(h) < ts(mid)) swap(h, mid)
      val pivot = ts(mid)
      var i = l
      var j = h
      while (i <= j) {
        while (ts(i) < pivot) i += 1
        while (ts(j) > pivot) j -= 1
        if (i <= j) { swap(i, j); i += 1; j -= 1 }
      }
      // recurse into smaller half, loop over larger (bounded stack)
      if (j - l < h - i) { quicksort(l, j); l = i }
      else { quicksort(i, h); h = j }
    }
  }

  private def insertion(lo: Int, hi: Int): Unit = {
    var i = lo + 1
    while (i <= hi) {
      val t = ts(i)
      val c = conds(i)
      var j = i - 1
      while (j >= lo && ts(j) > t) {
        ts(j + 1) = ts(j)
        conds(j + 1) = conds(j)
        j -= 1
      }
      ts(j + 1) = t
      conds(j + 1) = c
      i += 1
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val t = ts(i); ts(i) = ts(j); ts(j) = t
    val c = conds(i); conds(i) = conds(j); conds(j) = c
  }

  /** 12 bytes per event + 4-byte count. */
  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 12)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(ts(i)); i += 1 }
    i = 0
    while (i < n) { bb.putInt(conds(i)); i += 1 }
    bb.array()
  }
}

object EventBuf {
  def empty(): EventBuf = new EventBuf(16)

  def deserialize(bytes: Array[Byte]): EventBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val ts = new Array[Long](math.max(n, 16))
    val conds = new Array[Int](math.max(n, 16))
    var i = 0
    while (i < n) { ts(i) = bb.getLong; i += 1 }
    i = 0
    while (i < n) { conds(i) = bb.getInt; i += 1 }
    new EventBuf(ts, conds, n)
  }
}
