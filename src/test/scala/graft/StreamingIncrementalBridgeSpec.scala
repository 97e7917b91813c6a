package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingBehavioral

/** The BRIDGE between the two incremental sessionize paths: Structured
  * Streaming's `session_window` (q77) and the batch-fold
  * `IncrementalSession` store (q106/q107) consume the SAME time-sliced
  * arrival order, so their outputs must agree session for session —
  * streaming emits (user, start, end=last+gap, n_events), the store's
  * per-event ids aggregate to exactly those sessions. One exactness
  * argument then covers both: each is separately pinned to q01's
  * full-scan oracle, and this spec pins them to each other on the same
  * slices (divergence here means one path's boundary rule drifted —
  * e.g. session_window's merge-at-gap vs the store's strictly-greater
  * split).
  */
class StreamingIncrementalBridgeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val GapUs = 1800L * 1000000
  private val M = 60L * 1000000 // a minute in micros

  test("streaming session_window and the incremental store agree on the same slices") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val rnd = new scala.util.Random(1618)
    val rows = (0 until 400).map { _ =>
      (rnd.nextInt(10).toLong, rnd.nextInt(36 * 60).toLong * M / 2)
    }.distinct.sortBy(r => (r._2, r._1))
    val cuts = Seq(rows(130)._2, rows(260)._2).sorted
    val slices = Seq(
      rows.filter(_._2 <= cuts(0)),
      rows.filter(r => r._2 > cuts(0) && r._2 <= cuts(1)),
      rows.filter(_._2 > cuts(1)))
    val base = 1704067200L * 1000000 // 2024-01-01 UTC, micros
    def ts(us: Long) = new Timestamp((base + us) / 1000)

    // -- path 1: streaming session_window, one micro-batch per slice ----
    val input = MemoryStream[(Long, Timestamp)]
    val q = StreamingBehavioral.sessionStats(
        input.toDF().toDF("user_id", "ts"), "30 minutes")
      .writeStream.format("memory").queryName("bridge_sessions")
      .outputMode("complete").start()
    val streaming =
      try {
        for (s <- slices) {
          input.addData(s.map { case (u, us) => (u, ts(us)) }: _*)
          q.processAllAvailable()
        }
        spark.table("bridge_sessions")
          .select(col("user_id"), unix_micros(col("session_start")),
            unix_micros(col("session_end")), col("n_events"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3))).toSet
      } finally {
        q.stop()
        spark.catalog.dropTempView("bridge_sessions")
      }

    // -- path 2: the incremental store over the SAME slices -------------
    val dir = graft.sources.Sinks.scratchDir("bridge_spec") + "/sess"
    graft.sources.Sinks.clearDir(dir)
    for (s <- slices)
      graft.ops.IncrementalSession.appendBatch(
        s.toDF("user_id", "us")
          .select(col("user_id"), timestamp_micros(col("us") + base).as("ts")),
        dir, "user_id", "ts", GapUs)
    // fold per-event ids to sessions in streaming's vocabulary:
    // end = last event + gap (session_window's convention)
    val incremental = graft.ops.IncrementalSession.read(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(unix_micros(min(col("ts"))).as("s"),
        (unix_micros(max(col("ts"))) + GapUs).as("e"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("s"), col("e"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    assert(streaming === incremental,
      s"paths diverge: streaming-only=${streaming -- incremental}, " +
        s"store-only=${incremental -- streaming}")
    assert(streaming.nonEmpty)
  }
}
