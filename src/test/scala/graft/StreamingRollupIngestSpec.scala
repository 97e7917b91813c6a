package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions
import graft.ops.RollupStore

/** STREAMING ingest into the rollup store: `foreachBatch` folds each
  * micro-batch into per-(user, day) `funnel_state` partials and appends
  * them as one store batch — the continuous version of the nightly
  * rollup build (q118's cycle driven by a stream instead of a
  * scheduler). Exactness carries over only because the sink threads the
  * batchId through as the store's idempotence key: `foreachBatch` is
  * AT-LEAST-ONCE — a restarted query re-delivers its last micro-batch
  * with the same batchId, and an un-keyed append would land those
  * partials twice, changing every multiset family's answers
  * (funnel/sequence/next-node; only retention's OR is idempotent). With
  * the key, a replayed id is a committed no-op, so the streamed store
  * answers exactly what a raw batch scan of everything ingested would —
  * including across a mid-stream compaction (maintenance between
  * micro-batches, the production cadence) and across a restart that
  * re-delivers (pinned below by re-invoking the sink with the same
  * batchId, the exact call Spark makes on recovery). The GRAINED
  * variant routes the same sink through [[RollupStore.appendStatesByGrain]]
  * — one day-partition per grain the micro-batch touches, replay
  * exactly-once PER GRAIN, so a redelivery after a crash that committed
  * only some of a batch's days lands precisely the missing days
  * (q123 runs the flat bridge under the DuckDB oracle).
  */
class StreamingRollupIngestSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val M = 60L * 1000000
  private val base = 1704067200L * 1000000 // 2024-01-01 UTC, micros

  private val types = Array("a", "b", "c", "x")

  private def conds(df: DataFrame) = Seq("a", "b", "c").map(t => df("t") === t)
  private def states(df: DataFrame): DataFrame =
    df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))

  /** THE sink under test — exactly what a user writes in foreachBatch:
    * fold the micro-batch to partials, append them keyed by the batchId. */
  private def sink(storeDir: String)(
      batch: Dataset[org.apache.spark.sql.Row], batchId: Long): Unit = {
    RollupStore.appendStates(states(batch.toDF()), storeDir, Seq("u", "day"),
      ingestId = Some(s"rollup_ingest/$batchId"))
    ()
  }

  private def rawAnswer(df: DataFrame): Map[Long, Int] =
    df.groupBy("u")
      .agg(BehavioralFunctions.window_funnel(expr("INTERVAL '1' HOUR"),
        col("ts"), conds(df): _*).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def storeAnswer(storeDir: String): Map[Long, Int] =
    RollupStore.read(spark, storeDir).groupBy("u")
      .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
        col("state")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("foreachBatch ingest + mid-stream compaction answers like a raw batch scan") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val rnd = new scala.util.Random(2718281)
    val rows = Seq.fill(500)((rnd.nextInt(10).toLong,
      rnd.nextInt(20000).toLong * M, types(rnd.nextInt(types.length)))).distinct
    def ts(us: Long) = new Timestamp((base + us) / 1000)

    val storeDir = graft.sources.Sinks.scratchDir("stream_rollup_spec") + "/store"
    graft.sources.Sinks.clearDir(storeDir)

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = input.toDF().toDF("u", "ts", "t").writeStream
      .foreachBatch(sink(storeDir) _)
      .start()
    try {
      val slices = rows.grouped((rows.size + 2) / 3).toSeq
      for ((s, i) <- slices.zipWithIndex) {
        input.addData(s.map { case (u, us, t) => (u, ts(us), t) }: _*)
        q.processAllAvailable()
        // maintenance between micro-batches: fold the accreted batches
        if (i == 1) {
          RollupStore.compact(spark, storeDir, Seq("u", "day"),
            BehavioralFunctions.funnel_state_combine, targetPartitions = 2)
          assert(RollupStore.liveBatchCount(spark, storeDir) === 1)
        }
      }
    } finally q.stop()
    assert(RollupStore.liveBatchCount(spark, storeDir) === 2)

    val all = rows.toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us") + base).as("ts"), col("t"))
    assert(storeAnswer(storeDir) === rawAnswer(all),
      "streamed store diverges from the raw batch scan")
  }

  test("foreachBatch into a GRAINED store: per-day partitions accrete, replay is per-grain exactly-once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val rnd = new scala.util.Random(3141592)
    // ~5 days of events: enough day grains for a real range compaction
    // without paying tens of per-grain commits in a unit test
    val rows = Seq.fill(400)((rnd.nextInt(10).toLong,
      rnd.nextInt(7000).toLong * M, types(rnd.nextInt(types.length)))).distinct
    def ts(us: Long) = new Timestamp((base + us) / 1000)

    val storeDir = graft.sources.Sinks.scratchDir("stream_rollup_spec") + "/grained"
    graft.sources.Sinks.clearDir(storeDir)

    // THE grained sink: same shape as the flat one, but each micro-batch
    // lands one sub-batch per day it touches — the continuous version of
    // the day-partitioned nightly build (q121's layout fed by a stream)
    var lastBatchId = -1L
    def gsink(batch: Dataset[org.apache.spark.sql.Row], batchId: Long): Unit = {
      lastBatchId = batchId
      RollupStore.appendStatesByGrain(states(batch.toDF()), storeDir,
        Seq("u", "day"), "day", ingestId = Some(s"grained_ingest/$batchId"))
      ()
    }

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = input.toDF().toDF("u", "ts", "t").writeStream
      .foreachBatch(gsink _)
      .start()
    val slices = rows.grouped((rows.size + 1) / 2).toSeq
    try {
      for (s <- slices) {
        input.addData(s.map { case (u, us, t) => (u, ts(us), t) }: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val grains = RollupStore.grainValues(spark, storeDir)
    assert(grains.nonEmpty && grains.forall(_.matches("\\d{4}-\\d{2}-\\d{2}")),
      s"stream did not land day grains: $grains")
    val liveBefore = RollupStore.liveBatchCount(spark, storeDir)

    // restart redelivery: Spark re-invokes foreachBatch with the LAST
    // batchId and the same data — the per-grain guard makes every one of
    // its day sub-appends a committed no-op
    val last = slices.last.map { case (u, us, t) => (u, ts(us), t) }
      .toDF("u", "ts", "t")
    assert(RollupStore.appendStatesByGrain(states(last), storeDir,
      Seq("u", "day"), "day",
      ingestId = Some(s"grained_ingest/$lastBatchId")) === 0L)
    assert(RollupStore.liveBatchCount(spark, storeDir) === liveBefore,
      "a redelivered micro-batch landed new grain batches")

    // maintenance folds a grain RANGE between deliveries; the guard
    // survives the fold and the answer never moves
    val cutoff = grains(grains.size / 2)
    RollupStore.compactGrains(spark, storeDir, Seq("u", "day"),
      BehavioralFunctions.funnel_state_combine,
      grains = _ < cutoff, targetPartitions = 2)
    assert(RollupStore.appendStatesByGrain(states(last), storeDir,
      Seq("u", "day"), "day",
      ingestId = Some(s"grained_ingest/$lastBatchId")) === 0L)

    val all = rows.toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us") + base).as("ts"), col("t"))
    val got = RollupStore.readGrains(spark, storeDir).groupBy("u")
      .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
        col("state")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === rawAnswer(all),
      "grained streamed store diverges from the raw batch scan")
  }

  test("a restart's redelivery (same batchId, same data) cannot double-append — even across compaction") {
    import spark.implicits._
    val rnd = new scala.util.Random(1123581)
    val rows = Seq.fill(300)((rnd.nextInt(8).toLong,
      rnd.nextInt(15000).toLong * M, types(rnd.nextInt(types.length)))).distinct
    val all = rows.toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us") + base).as("ts"), col("t"))
    all.cache().count()
    try {
      val storeDir = graft.sources.Sinks.scratchDir("stream_rollup_spec") + "/replay"
      graft.sources.Sinks.clearDir(storeDir)
      val s = sink(storeDir) _
      def slice(i: Int) =
        all.filter(pmod(xxhash64(col("ts")), lit(3)) === i)

      // normal progress: batches 0 and 1 land
      s(slice(0), 0L); s(slice(1), 1L)
      val afterTwo = storeAnswer(storeDir)
      assert(afterTwo === rawAnswer(slice(0).union(slice(1))))
      // the query dies after the sink committed batch 1 but before the
      // checkpoint advanced; on restart Spark RE-INVOKES foreachBatch with
      // batch 1 — same id, same data (its documented recovery contract)
      s(slice(1), 1L)
      assert(RollupStore.liveBatchCount(spark, storeDir) === 2,
        "the redelivered micro-batch landed a second batch dir")
      assert(storeAnswer(storeDir) === afterTwo,
        "the redelivered micro-batch changed the answer")
      // maintenance folds the store; the guard must survive the fold
      RollupStore.compact(spark, storeDir, Seq("u", "day"),
        BehavioralFunctions.funnel_state_combine, targetPartitions = 2)
      s(slice(1), 1L)
      assert(RollupStore.liveBatchCount(spark, storeDir) === 1,
        "a redelivery after compaction landed")
      // the stream resumes: batch 2 is new and lands
      s(slice(2), 2L)
      assert(storeAnswer(storeDir) === rawAnswer(all),
        "streamed store diverges from the raw batch scan after a replayed restart")
    } finally all.unpersist()
  }
}
