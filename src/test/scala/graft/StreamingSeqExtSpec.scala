package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingBehavioral
import graft.streaming.StreamingBehavioral.{NNEvent, SeqEvent}

/** Pins `streamingSequenceMatchEvents` against the batch
  * `sequence_match_events` aggregate: with events fed in timestamp order
  * the latched step timestamps equal the batch first match over the full
  * history, the latch is final (later events never retract it), and late
  * data behind the watermark cannot complete a match. */
class StreamingSeqMatchEventsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def runStream(events: Seq[SeqEvent], pattern: String,
      batchSize: Int, name: String,
      watermark: String = "10 minutes"): Map[Long, (Boolean, Seq[Long])] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeqEvent]
    val q = StreamingBehavioral
      .streamingSequenceMatchEvents(input.toDS(), pattern, watermark)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      events.grouped(batchSize).foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getSeq[Long](2)))
        .groupBy(_._1)
        .map { case (u, rows) => u -> ((rows.last._2, rows.last._3)) }
    } finally q.stop()
  }

  /** Batch truth: first match's step timestamps as epoch µs (empty = no
    * match, mirroring the aggregate's empty-array contract). */
  private def batchEvents(events: Seq[SeqEvent], pattern: String,
      numConds: Int): Map[Long, Seq[Long]] = {
    import spark.implicits._
    events.toDF()
      .groupBy(col("user_id"))
      .agg(graft.behavioral.BehavioralFunctions.sequence_match_events(pattern, col("ts"),
        (0 until numConds).map(i =>
          (col("conds").bitwiseAND(lit(1 << i))) =!= 0): _*).as("m"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[java.sql.Timestamp](1).map(t => t.getTime * 1000 + (t.getNanos / 1000) % 1000))
      .toMap
  }

  test("in-order events across micro-batches: latched timestamps == batch first match") {
    val rnd = new scala.util.Random(8)
    val events = (0 until 600).map { i =>
      SeqEvent(rnd.nextInt(25).toLong,
        ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"),
        rnd.nextInt(1 << 3))
    }
    for (pattern <- Seq("(?1).*(?2)", "(?1)(?2)(?3)", "(?1)(?t<=120)(?2)");
         batchSize <- Seq(600, 89)) {
      val got = runStream(events, pattern, batchSize,
        name = s"sme_${pattern.hashCode.abs}_$batchSize")
      val want = batchEvents(events, pattern, numConds = 3)
      assert(got.keySet === want.keySet, s"$pattern/$batchSize")
      for ((u, w) <- want) {
        assert(got(u)._1 === w.nonEmpty, s"$pattern/$batchSize user $u matched flag")
        assert(got(u)._2 === w, s"$pattern/$batchSize user $u: stream ${got(u)._2} vs batch $w")
      }
    }
  }

  test("the latch is final: later events never change the captured timestamps") {
    val events = Seq(
      SeqEvent(1L, ts("2024-01-01 00:00:00"), 1),
      SeqEvent(1L, ts("2024-01-01 00:01:00"), 2), // (?1)(?2) latches here
      SeqEvent(1L, ts("2024-01-01 00:02:00"), 1),
      SeqEvent(1L, ts("2024-01-01 00:03:00"), 2)  // a second would-be match
    )
    val got = runStream(events, "(?1)(?2)", batchSize = 2, name = "sme_latch")
    val base = ts("2024-01-01 00:00:00").getTime * 1000
    assert(got(1L) === ((true, Seq(base, base + 60L * 1000000))),
      s"latched first match must persist, got $got")
  }

  test("a late event behind the watermark cannot complete the match") {
    val events = Seq(
      SeqEvent(1L, ts("2024-01-01 00:00:00"), 1),
      SeqEvent(2L, ts("2024-01-01 02:00:00"), 4), // advances the watermark
      SeqEvent(1L, ts("2024-01-01 00:01:00"), 2)  // now behind it: dropped
    )
    val got = runStream(events, "(?1)(?2)", batchSize = 1, name = "sme_late")
    assert(got(1L)._1 === false, s"late event must not complete the match, got $got")
  }
}

/** Pins `streamingSequenceNextNode` against the batch `sequence_next_node`
  * aggregate for all 8 direction × base combos on random data (the answer
  * re-evaluates per micro-batch over the in-horizon buffer, so the final
  * emission must equal the batch aggregate over the same rows), plus the
  * no-pre-filter contract (a zero-condition row can BE the answer) and the
  * lateness boundary. */
class StreamingNextNodeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def runStream(events: Seq[NNEvent], direction: String, base: String,
      batchSize: Int, name: String,
      watermark: String = "10 minutes"): Map[Long, (Option[String], Int)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[NNEvent]
    val q = StreamingBehavioral
      .streamingSequenceNextNode(input.toDS(), direction, base, numSteps = 2, watermark)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      events.grouped(batchSize).foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2)))
        .groupBy(_._1)
        .map { case (u, rows) => u -> ((rows.last._2, rows.last._3)) }
    } finally q.stop()
  }

  test("all 8 combos: final streamed answer == batch aggregate, any batch split") {
    import spark.implicits._
    val rnd = new scala.util.Random(81)
    val rows = (0 until 900).map { i =>
      val v = if (rnd.nextInt(10) == 0) null else "pqrs".charAt(rnd.nextInt(4)).toString
      (rnd.nextInt(25).toLong,
        new java.sql.Timestamp(1704067200000L + i * 1000L), v)
    }
    // base: v = 'p'; steps: v = 'p' then v = 'q' — same shape as the batch
    // differential spec, so zero-condition r/s/null rows pepper the buffer
    val events = rows.map { case (u, t, v) =>
      NNEvent(u, t, v,
        base_cond = v == "p",
        conds = (if (v == "p") 1 else 0) | (if (v == "q") 2 else 0))
    }
    rows.toDF("user_id", "ts", "v").createOrReplaceTempView("snn_events")
    for (dir <- Seq("forward", "backward");
         base <- Seq("head", "tail", "first_match", "last_match");
         batchSize <- Seq(900, 123)) {
      val got = runStream(events, dir, base, batchSize,
        name = s"snn_${dir}_${base}_$batchSize")
        .map { case (u, (v, _)) => u -> v }
      val want = spark.sql(
        s"""SELECT user_id, sequence_next_node('$dir', '$base', ts, v,
           |  v = 'p', v = 'p', v = 'q') AS nn
           |FROM snn_events GROUP BY user_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got.keySet === want.keySet, s"$dir/$base/$batchSize")
      for ((u, w) <- want)
        assert(got(u) === w, s"$dir/$base/$batchSize user $u: stream ${got(u)} vs batch $w")
    }
  }

  test("a zero-condition row can be the answer (no condition pre-filter)") {
    val events = Seq(
      NNEvent(1L, ts("2024-01-01 00:00:00"), "p", base_cond = true, conds = 1),
      NNEvent(1L, ts("2024-01-01 00:01:00"), "q", base_cond = false, conds = 2),
      NNEvent(1L, ts("2024-01-01 00:02:00"), "r", base_cond = false, conds = 0)
    )
    val got = runStream(events, "forward", "head", batchSize = 1, name = "snn_zero")
    assert(got(1L)._1 === Some("r"),
      s"the answer row carries no conditions and must still be buffered, got $got")
  }

  test("the answer updates when the adjacent event arrives in a later batch") {
    val events = Seq(
      NNEvent(1L, ts("2024-01-01 00:00:00"), "p", base_cond = true, conds = 1),
      NNEvent(1L, ts("2024-01-01 00:01:00"), "q", base_cond = false, conds = 2),
      NNEvent(1L, ts("2024-01-01 00:02:00"), "s", base_cond = false, conds = 0)
    )
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[NNEvent]
    val q = StreamingBehavioral
      .streamingSequenceNextNode(input.toDS(), "forward", "head", numSteps = 2, "10 minutes")
      .toDF().writeStream.format("memory").queryName("snn_upd")
      .outputMode("update").start()
    try {
      input.addData(events.take(2)); q.processAllAvailable()
      input.addData(events.drop(2)); q.processAllAvailable()
      val answers = spark.table("snn_upd").collect().map(r => Option(r.getString(1))).toSeq
      assert(answers === Seq(None, Some("s")),
        s"match-complete-but-no-adjacent must answer null, then update: $answers")
    } finally q.stop()
  }

  test("a late event behind the watermark cannot become the answer") {
    val events = Seq(
      NNEvent(1L, ts("2024-01-01 00:00:00"), "p", base_cond = true, conds = 1),
      NNEvent(1L, ts("2024-01-01 00:01:00"), "q", base_cond = false, conds = 2),
      NNEvent(2L, ts("2024-01-01 02:00:00"), "x", base_cond = false, conds = 0), // watermark on
      NNEvent(1L, ts("2024-01-01 00:01:30"), "r", base_cond = false, conds = 0)  // late: dropped
    )
    val got = runStream(events, "forward", "head", batchSize = 1, name = "snn_late")
    assert(got(1L)._1 === None, s"late adjacent event must be dropped, got $got")
  }
}
