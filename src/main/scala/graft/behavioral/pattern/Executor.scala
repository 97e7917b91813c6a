package graft.behavioral.pattern

import graft.behavioral.EventBuf

/** Pattern executor over a sorted event stream.
  *
  * Re-expresses the reference's three-tier execution strategy
  * (`src/pattern/executor.rs:28-124`):
  *
  *   1. all-`(?N)` patterns → O(n) sliding-window **adjacent** scan;
  *   2. `(?N)`/`.*` mixes   → O(n) single-pass **subsequence** scan
  *      (note: the reference classifies ANY mix of conditions and `.*` this
  *      way, so `(?1)(?2).*` also gets subsequence semantics — replicated);
  *   3. anything with `.` or time constraints → backtracking NFA with lazy
  *      `.*` (advance-pattern state popped first) and a 10,000-iteration
  *      abort guard (`MAX_NFA_STATES`) — an aborted start position counts as
  *      no match (semantics-affecting, kept verbatim).
  *
  * Events must be sorted by timestamp ascending before calling.
  */
object PatternExecutor {
  final val MaxNfaStates = 10000
  private final val MicrosPerSecond = 1000000L

  /** `sequence_match` / `sequence_count`: returns the number of
    * non-overlapping matches (for match semantics, stops at the first). */
  def execute(steps: Array[PStep], buf: EventBuf, countAll: Boolean): Long =
    executeWithConsumed(steps, buf, countAll)._1

  /** Non-overlapping count PLUS the resume position of the pass that
    * produced it: the index just past the last event the final counted
    * match consumed (0 when count is 0). Streaming `sequence_count` drops
    * this prefix between micro-batches.
    *
    * The boundary comes from the SAME pass as the count, so the two agree
    * by construction — including under the `MaxNfaStates` abort guard,
    * where a start position's outcome depends on how much buffer follows
    * it. That dependency makes the count NON-monotone in prefix length
    * (a longer buffer can abort a start that matched in a shorter one),
    * so recovering the boundary by re-running the executor on prefixes
    * (the previous binary search) could disagree with the counting pass
    * and silently re-expose consumed events or drop unconsumed ones. */
  def executeWithConsumed(steps: Array[PStep], buf: EventBuf,
      countAll: Boolean = true): (Long, Int) = {
    if (buf.n == 0 || steps.isEmpty) return (0L, 0)
    classify(steps) match {
      case Adjacent(conds) => fastAdjacent(buf, conds, countAll)
      case Wildcard(conds) => fastWildcard(buf, conds, countAll)
      case Complex => nfaExecute(steps, buf, countAll)
    }
  }

  /** `sequence_match_events`: per-`(?N)`-step timestamps of the first match
    * (pattern order), or null if no match. */
  def executeCollect(steps: Array[PStep], buf: EventBuf): Array[Long] = {
    if (buf.n == 0 || steps.isEmpty) return null
    var start = 0
    while (start < buf.n) {
      val got = nfaCollect(steps, buf, start)
      if (got != null) return got
      start += 1
    }
    null
  }

  // ---- classification -------------------------------------------------

  private sealed trait Shape
  private final case class Adjacent(conds: Array[Int]) extends Shape
  private final case class Wildcard(conds: Array[Int]) extends Shape
  private case object Complex extends Shape

  private def classify(steps: Array[PStep]): Shape = {
    val conds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var hasAny = false
    var i = 0
    while (i < steps.length) {
      steps(i) match {
        case PCond(idx) => conds += idx
        case PAny => hasAny = true
        case POne | _: PTime => return Complex
      }
      i += 1
    }
    if (conds.isEmpty) Complex
    else if (!hasAny) Adjacent(conds.toArray)
    else Wildcard(conds.toArray)
  }

  @inline private def cond(buf: EventBuf, i: Int, idx: Int): Boolean =
    idx < 32 && ((buf.conds(i) >>> idx) & 1) != 0

  // ---- fast paths ------------------------------------------------------

  /** Sliding-window scan for `(?1)(?2)...(?k)`: consecutive events must match
    * all conditions in order. Non-overlapping counting advances past the
    * match. O(n) time, O(1) space. */
  private def fastAdjacent(buf: EventBuf, conds: Array[Int], countAll: Boolean): (Long, Int) = {
    val k = conds.length
    if (buf.n < k) return (0L, 0)
    var total = 0L
    var lastEnd = 0
    var i = 0
    while (i + k <= buf.n) {
      var matched = true
      var j = 0
      while (matched && j < k) {
        if (!cond(buf, i + j, conds(j))) { matched = false; i += 1 }
        j += 1
      }
      if (matched) {
        total += 1
        i += k // non-overlapping
        lastEnd = i
        if (!countAll) return (1L, lastEnd)
      }
    }
    (total, lastEnd)
  }

  /** Single-pass subsequence scan for wildcard-separated conditions: a step
    * counter advances on each matching event; completing resets for the next
    * non-overlapping match. O(n) time, O(1) space. */
  private def fastWildcard(buf: EventBuf, conds: Array[Int], countAll: Boolean): (Long, Int) = {
    val k = conds.length
    var total = 0L
    var lastEnd = 0
    var step = 0
    var i = 0
    while (i < buf.n) {
      if (cond(buf, i, conds(step))) {
        step += 1
        if (step >= k) {
          total += 1
          lastEnd = i + 1
          if (!countAll) return (1L, lastEnd)
          step = 0
        }
      }
      i += 1
    }
    (total, lastEnd)
  }

  // ---- NFA -------------------------------------------------------------

  /** One NFA thread: position in events, position in pattern, last-match ts.
    * Packed into three parallel growable arrays (the reference reuses one
    * stack allocation across start positions; we do the same). `lastTs` uses
    * `hasLast` rather than a sentinel so extreme i64 timestamps stay valid. */
  private final class StateStack {
    var eventIdx = new Array[Int](32)
    var stepIdx = new Array[Int](32)
    var lastTs = new Array[Long](32)
    var hasLast = new Array[Boolean](32)
    var size = 0

    def clear(): Unit = size = 0

    def push(e: Int, s: Int, lt: Long, hl: Boolean): Unit = {
      if (size == eventIdx.length) {
        val cap = size * 2
        eventIdx = java.util.Arrays.copyOf(eventIdx, cap)
        stepIdx = java.util.Arrays.copyOf(stepIdx, cap)
        lastTs = java.util.Arrays.copyOf(lastTs, cap)
        hasLast = java.util.Arrays.copyOf(hasLast, cap)
      }
      eventIdx(size) = e; stepIdx(size) = s; lastTs(size) = lt; hasLast(size) = hl
      size += 1
    }
  }

  private def nfaExecute(steps: Array[PStep], buf: EventBuf, countAll: Boolean): (Long, Int) = {
    var total = 0L
    var lastEnd = 0
    var searchStart = 0
    val stack = new StateStack
    while (searchStart < buf.n) {
      val matchEnd = tryMatchFrom(steps, buf, searchStart, stack)
      if (matchEnd >= 0) {
        total += 1
        // Non-overlapping: resume after the match. A zero-consumption match
        // (pattern of only zero-width steps, e.g. '.*') reports
        // matchEnd = searchStart - 1; advance monotonically so counting
        // terminates instead of looping forever. (The reference has the same
        // unguarded resume and hangs on this input — deliberate deviation.)
        searchStart = math.max(matchEnd + 1, searchStart + 1)
        lastEnd = searchStart
        if (!countAll) return (1L, lastEnd)
      } else {
        searchStart += 1
      }
    }
    (total, lastEnd)
  }

  /** Tries a full match from `start`. Returns the index of the last matched
    * event, or -1. LIFO stack with lazy `.*`: the advance-pattern state is
    * pushed last so it pops first. */
  private def tryMatchFrom(steps: Array[PStep], buf: EventBuf, start: Int,
      stack: StateStack): Int = {
    stack.clear()
    stack.push(start, 0, 0L, false)
    var iterations = 0
    while (stack.size > 0) {
      iterations += 1
      if (iterations > MaxNfaStates) return -1 // runaway guard: treated as no match
      stack.size -= 1
      val top = stack.size
      val eIdx = stack.eventIdx(top)
      val sIdx = stack.stepIdx(top)
      val lts = stack.lastTs(top)
      val hl = stack.hasLast(top)

      if (sIdx >= steps.length) {
        return if (eIdx > 0) eIdx - 1 else 0
      } else if (eIdx >= buf.n) {
        // only `.*` can still succeed with no events left
        steps(sIdx) match {
          case PAny => stack.push(eIdx, sIdx + 1, lts, hl)
          case _ => ()
        }
      } else {
        steps(sIdx) match {
          case PCond(idx) =>
            if (cond(buf, eIdx, idx)) {
              stack.push(eIdx + 1, sIdx + 1, buf.ts(eIdx), true)
            }
          case PAny =>
            // consume-one (stays in step) pushed first = lower priority
            stack.push(eIdx + 1, sIdx, lts, hl)
            // zero-width advance pushed last = popped first (lazy `.*`)
            stack.push(eIdx, sIdx + 1, lts, hl)
          case POne =>
            stack.push(eIdx + 1, sIdx + 1, buf.ts(eIdx), true)
          case PTime(op, threshold) =>
            if (!hl) {
              stack.push(eIdx, sIdx + 1, lts, hl) // vacuously true: no prior match
            } else {
              val elapsedSeconds = (buf.ts(eIdx) - lts) / MicrosPerSecond
              if (op.eval(elapsedSeconds, threshold)) {
                stack.push(eIdx, sIdx + 1, lts, hl)
              }
            }
        }
      }
    }
    -1
  }

  /** Timestamp-collecting NFA (for `sequence_match_events`): same transition
    * rules, but each state carries the `(?N)` timestamps collected so far
    * (clone-on-branch, reference `src/pattern/executor.rs:388-486`). */
  private def nfaCollect(steps: Array[PStep], buf: EventBuf, start: Int): Array[Long] = {
    final case class St(eventIdx: Int, stepIdx: Int, lastTs: Long, hasLast: Boolean,
        collected: List[Long])
    var stack: List[St] = St(start, 0, 0L, false, Nil) :: Nil
    var iterations = 0
    while (stack.nonEmpty) {
      iterations += 1
      if (iterations > MaxNfaStates) return null
      val st = stack.head
      stack = stack.tail
      if (st.stepIdx >= steps.length) {
        return st.collected.reverse.toArray
      } else if (st.eventIdx >= buf.n) {
        steps(st.stepIdx) match {
          case PAny => stack = st.copy(stepIdx = st.stepIdx + 1) :: stack
          case _ => ()
        }
      } else {
        steps(st.stepIdx) match {
          case PCond(idx) =>
            if (cond(buf, st.eventIdx, idx)) {
              val t = buf.ts(st.eventIdx)
              stack = St(st.eventIdx + 1, st.stepIdx + 1, t, true, t :: st.collected) :: stack
            }
          case PAny =>
            // lazy: advance-step state goes on top
            stack = st.copy(stepIdx = st.stepIdx + 1) ::
              st.copy(eventIdx = st.eventIdx + 1) :: stack
          case POne =>
            stack = St(st.eventIdx + 1, st.stepIdx + 1, buf.ts(st.eventIdx), true,
              st.collected) :: stack
          case PTime(op, threshold) =>
            if (!st.hasLast) {
              stack = st.copy(stepIdx = st.stepIdx + 1) :: stack
            } else {
              val elapsed = (buf.ts(st.eventIdx) - st.lastTs) / MicrosPerSecond
              if (op.eval(elapsed, threshold)) {
                stack = st.copy(stepIdx = st.stepIdx + 1) :: stack
              }
            }
        }
      }
    }
    null
  }
}
