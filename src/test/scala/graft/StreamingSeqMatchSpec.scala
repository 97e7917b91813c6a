package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingBehavioral
import graft.streaming.StreamingBehavioral.SeqEvent

/** Pins `streamingSequenceMatch` against the batch `sequence_match`
  * aggregate (same pattern engine re-evaluated per micro-batch), plus the
  * operator's own contracts: the match latch drops the buffer and is
  * monotone, late data behind the watermark is dropped, and a chain whose
  * span exceeds the horizon is missed (the documented forgetting
  * contract). */
class StreamingSeqMatchSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def runStream(events: Seq[SeqEvent], pattern: String,
      watermark: String = "10 minutes",
      horizonMicros: Long = 30L * 86400 * 1000000,
      batchSize: Int = 97,
      name: String = "seq_out"): Map[Long, (Boolean, Int)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeqEvent]
    val q = StreamingBehavioral
      .streamingSequenceMatch(input.toDS(), pattern, watermark, horizonMicros)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      events.grouped(batchSize).foreach { b => input.addData(b); q.processAllAvailable() }
      // matched is monotone within a state lifetime; keep the LAST emission
      // per user (covers horizon-expiry restarts too)
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2)))
        .groupBy(_._1)
        .map { case (u, rows) => u -> ((rows.last._2, rows.last._3)) }
    } finally q.stop()
  }

  private def batchMatch(events: Seq[SeqEvent], pattern: String,
      numConds: Int): Map[Long, Boolean] = {
    import spark.implicits._
    events.toDF()
      .groupBy(col("user_id"))
      .agg(graft.behavioral.BehavioralFunctions.sequence_match(pattern, col("ts"),
        (0 until numConds).map(i =>
          (col("conds").bitwiseAND(lit(1 << i))) =!= 0): _*).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
  }

  test("random events across micro-batches: final latch == batch sequence_match") {
    val rnd = new scala.util.Random(67)
    val events = (0 until 600).map { i =>
      SeqEvent(rnd.nextInt(30).toLong,
        ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        rnd.nextInt(1 << 3))
    }
    for (pattern <- Seq("(?1).*(?2)", "(?1)(?2)(?3)", "(?1)(?t<=120)(?2)")) {
      val got = runStream(events, pattern, name = s"seq_d${pattern.hashCode.abs}")
        .map { case (u, (m, _)) => u -> m }
      val want = batchMatch(events, pattern, numConds = 3)
      assert(got.keySet === want.keySet, s"pattern $pattern")
      for ((u, m) <- want) assert(got(u) === m, s"pattern $pattern user $u")
    }
  }

  test("match latches, drops the buffer, and survives later non-matching events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      SeqEvent(1L, ts("2024-01-01 00:00:00"), 1),
      SeqEvent(1L, ts("2024-01-01 00:01:00"), 2), // (?1)(?2) completes here
      SeqEvent(1L, ts("2024-01-01 00:02:00"), 4),
      SeqEvent(1L, ts("2024-01-01 00:03:00"), 4)
    )
    val input = MemoryStream[SeqEvent]
    val q = StreamingBehavioral
      .streamingSequenceMatch(input.toDS(), "(?1)(?2)", "10 minutes")
      .toDF().writeStream.format("memory").queryName("seq_latch")
      .outputMode("update").start()
    try {
      events.grouped(2).foreach { b => input.addData(b); q.processAllAvailable() }
      val rows = spark.table("seq_latch").collect()
        .map(r => (r.getBoolean(1), r.getInt(2)))
      // the buffer drops AT match time, not a batch later: every matched
      // emission (including the first) carries n_buffered == 0
      assert(rows.count(_._1) >= 2, s"expected >= 2 matched emissions: ${rows.toSeq}")
      rows.filter(_._1).foreach { case (_, n) =>
        assert(n === 0, s"matched emission must have an empty buffer: ${rows.toSeq}")
      }
    } finally q.stop()
  }

  test("a late event behind the watermark cannot complete the match") {
    val events = Seq(
      SeqEvent(1L, ts("2024-01-01 00:00:00"), 1),
      // watermark advances far past 00:00 + 10min via another user
      SeqEvent(2L, ts("2024-01-01 06:00:00"), 1),
      // the completing (?2) arrives 6h late — behind the watermark: dropped
      SeqEvent(1L, ts("2024-01-01 00:01:00"), 2)
    )
    val got = runStream(events, "(?1)(?2)", batchSize = 1, name = "seq_late")
    assert(got(1L)._1 === false, s"late completion must be dropped, got $got")
  }

  test("the event exactly at the horizon boundary is kept") {
    // watermark delay 1 minute; u2 at 04:00 advances the watermark to
    // 03:59, so the horizon (1h) cut sits at exactly 02:59:00 — where the
    // (?1) sits. It must survive the prune and complete with the 04:00 (?2).
    val events = Seq(
      SeqEvent(1L, ts("2024-01-01 02:59:00"), 1),
      SeqEvent(2L, ts("2024-01-01 04:00:00"), 1),
      SeqEvent(1L, ts("2024-01-01 04:00:00"), 2)
    )
    val got = runStream(events, "(?1).*(?2)", watermark = "1 minute",
      horizonMicros = 3600L * 1000000, batchSize = 1, name = "seq_boundary")
    assert(got(1L)._1 === true, s"at-horizon event must be kept, got $got")
  }

  test("a chain spanning longer than the horizon is missed (forgetting contract)") {
    // horizon = 1 hour; (?1) and (?2) are 5 hours apart, with a watermark
    // advance in between so the (?1) is pruned before (?2) arrives
    val events = Seq(
      SeqEvent(1L, ts("2024-01-01 00:00:00"), 1),
      SeqEvent(2L, ts("2024-01-01 04:00:00"), 1),
      SeqEvent(1L, ts("2024-01-01 05:00:00"), 2)
    )
    val got = runStream(events, "(?1).*(?2)", watermark = "1 minute",
      horizonMicros = 3600L * 1000000, batchSize = 1, name = "seq_horizon")
    assert(got(1L)._1 === false,
      s"chain wider than the horizon must be missed, got $got")
    // same events with a horizon that covers the span: matched
    val got2 = runStream(events, "(?1).*(?2)", watermark = "1 minute",
      horizonMicros = 6L * 3600 * 1000000, batchSize = 1, name = "seq_horizon2")
    assert(got2(1L)._1 === true, s"wide horizon must match, got $got2")
  }
}
