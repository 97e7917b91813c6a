package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingBehavioral
import graft.streaming.StreamingBehavioral.SeqEvent

/** Pins `streamingSequenceCount` against the batch `sequence_count`
  * aggregate, plus its own contracts: the consumed prefix drops at every
  * counted match (state holds only the unconsumed suffix), counts are
  * cumulative across micro-batches however the events split, and the
  * horizon forgetting contract. */
class StreamingSeqCountSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def runStream(events: Seq[SeqEvent], pattern: String,
      batchSize: Int, name: String,
      watermark: String = "10 minutes",
      horizonMicros: Long = 30L * 86400 * 1000000): Map[Long, (Long, Int)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeqEvent]
    val q = StreamingBehavioral
      .streamingSequenceCount(input.toDS(), pattern, watermark, horizonMicros)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      events.grouped(batchSize).foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(_._1)
        .map { case (u, rows) => u -> ((rows.map(_._2).max, rows.last._3)) }
    } finally q.stop()
  }

  private def batchCount(events: Seq[SeqEvent], pattern: String,
      numConds: Int): Map[Long, Long] = {
    import spark.implicits._
    events.toDF()
      .groupBy(col("user_id"))
      .agg(graft.behavioral.BehavioralFunctions.sequence_count(pattern, col("ts"),
        (0 until numConds).map(i =>
          (col("conds").bitwiseAND(lit(1 << i))) =!= 0): _*).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random events: cumulative count == batch sequence_count, any batch split") {
    val rnd = new scala.util.Random(68)
    val events = (0 until 600).map { i =>
      SeqEvent(rnd.nextInt(20).toLong,
        ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        rnd.nextInt(1 << 3))
    }
    for (pattern <- Seq("(?1).*(?2)", "(?1)(?2)", "(?1)(?t<=120)(?2)");
         batchSize <- Seq(50, 217)) {
      val got = runStream(events, pattern, batchSize,
        name = s"sc_${pattern.hashCode.abs}_$batchSize")
        .map { case (u, (c, _)) => u -> c }
      val want = batchCount(events, pattern, numConds = 3)
      assert(got.keySet === want.keySet, s"$pattern/$batchSize")
      for ((u, c) <- want)
        assert(got(u) === c, s"$pattern/$batchSize user $u: stream ${got(u)} vs batch $c")
    }
  }

  test("consumed events leave the buffer at each match; skipped events may remain") {
    // (?1)(?2) adjacent: e1(?1) e2(?2) count at batch 1 consumes through e2;
    // e3(?1) stays buffered until its (?2) arrives in batch 2
    val events = Seq(
      SeqEvent(1L, ts("2024-01-01 00:00:00"), 1),
      SeqEvent(1L, ts("2024-01-01 00:01:00"), 2),
      SeqEvent(1L, ts("2024-01-01 00:02:00"), 1),
      SeqEvent(1L, ts("2024-01-01 00:03:00"), 2)
    )
    val got = runStream(events, "(?1)(?2)", batchSize = 3, name = "sc_consume")
    assert(got(1L) === ((2L, 0)), s"two matches, empty buffer, got $got")
  }

  // --- MaxNfaStates guard vs consumed-prefix recovery ----------------------
  // Crafted so the abort guard makes the non-overlapping count NON-monotone
  // in prefix length: section 1's match is found on a short buffer but
  // aborts once a long tail follows (every failed (?2) binding sweeps the
  // remaining buffer through the (?t<2) gate, so the per-start iteration
  // cost grows with buffer length), while section 2 matches cheaply at the
  // very end. The leading "." forces the NFA tier (PCond/PAny mixes take
  // the fast subsequence path).
  // Constants pinned empirically: with 12 (?2) bindings the per-start sweep
  // cost crosses the 10,000-iteration guard between buffer lengths 400 and
  // 500, so every binary-search midpoint probe (<= 350 of 700) still finds
  // section 1's match while the full 700-event pass aborts it.
  private val guardPattern = ".(?1).*(?2).*(?t<2)(?3)"
  private def guardEvents(user: Long = 1L): Seq[SeqEvent] = {
    def ev(sec: Long, conds: Int) = SeqEvent(user,
      new java.sql.Timestamp(1704067200000L + sec * 1000), conds)
    val sec1 = Seq(ev(0, 8), ev(1, 1)) ++                 // "." filler + (?1)
      (0 until 12).map(j => ev(10 + 100L * j, 2)) :+      // 12 (?2) bindings, 100s apart
      ev(10 + 100L * 11 + 1, 4)                           // (?3) 1s after the last (?2)
    val tail = (0 until 682).map(i => ev(1300L + i, 8))   // abort-cost amplifier
    val sec2 = Seq(ev(3000, 1), ev(3001, 2), ev(3002, 4)) // cheap match
    sec1 ++ tail ++ sec2
  }

  test("guard non-monotonicity: count and consumed boundary come from one pass") {
    import graft.behavioral.EventBuf
    import graft.behavioral.pattern.{PatternExecutor, PatternParser}
    val steps = PatternParser.parse(guardPattern).toOption.get
    val evs = guardEvents()
    def bufOf(es: Seq[SeqEvent]): EventBuf = {
      val b = EventBuf.empty()
      es.foreach(e => b.append(e.ts.getTime * 1000, e.conds))
      b
    }
    val full = bufOf(evs)
    // premise: non-monotone under the guard — section 1 matches on its own
    // prefix but aborts once a long tail follows
    assert(PatternExecutor.execute(steps, bufOf(evs.take(15)), countAll = true) === 1L)
    assert(PatternExecutor.execute(steps, bufOf(evs.take(600)), countAll = true) === 0L,
      "the tail must push section 1's match over the NFA guard")
    // the counting pass sees ONLY section 2's match and consumes through it
    val (n, end) = PatternExecutor.executeWithConsumed(steps, full)
    assert(n === 1L)
    assert(end === evs.length, s"consumed boundary $end must cover section 2")
    // the prefix-rerun binary search this replaced stops at section 1's
    // match end (smallest prefix with count >= 1) — re-exposing section 2's
    // already-counted events to the next micro-batch
    var lo = 0
    var hi = full.n
    while (lo < hi) {
      val mid = lo + (hi - lo) / 2
      if (PatternExecutor.execute(steps, bufOf(evs.take(mid)), countAll = true) >= n) hi = mid
      else lo = mid + 1
    }
    assert(lo < end, s"binary-search boundary $lo vs counting-pass boundary $end")
  }

  test("guard-straddling pattern streams without double-counting") {
    val evs = guardEvents()
    // one more in-watermark event: under prefix-rerun recovery the retained
    // suffix still holds section 2's counted match, and this batch would
    // re-count it (cumulative 2); the pass-reported boundary dropped it
    val extra = SeqEvent(1L, new java.sql.Timestamp(1704067200000L + 4000 * 1000), 8)
    val got = runStream(evs :+ extra, guardPattern, batchSize = evs.length,
      name = "sc_guard")
    assert(got(1L)._1 === 1L,
      s"counted suffix must not be re-counted after the guard, got $got")
  }

  test("a chain wider than the horizon is missed; counts already emitted persist") {
    val events = Seq(
      SeqEvent(1L, ts("2024-01-01 00:00:00"), 1),
      SeqEvent(1L, ts("2024-01-01 00:01:00"), 2), // match 1 counted
      SeqEvent(1L, ts("2024-01-01 00:02:00"), 1), // starts chain 2...
      SeqEvent(2L, ts("2024-01-01 04:00:00"), 1), // watermark advance prunes it
      SeqEvent(1L, ts("2024-01-01 05:00:00"), 2)  // partner arrives too late
    )
    val got = runStream(events, "(?1)(?2)", batchSize = 1, name = "sc_horizon",
      watermark = "1 minute", horizonMicros = 3600L * 1000000)
    assert(got(1L)._1 === 1L,
      s"the horizon-split second chain must not count, got $got")
  }
}
