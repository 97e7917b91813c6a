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
