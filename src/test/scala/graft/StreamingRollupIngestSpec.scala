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
  * scheduler). Exactness carries over unchanged: each append is a
  * multiset of condition events, the store's merge consumers union
  * multisets, so the streamed store answers exactly what a raw batch
  * scan of everything ingested would — including after a compaction in
  * the middle of the stream (maintenance between micro-batches, the
  * production cadence).
  */
class StreamingRollupIngestSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val M = 60L * 1000000

  test("foreachBatch ingest + mid-stream compaction answers like a raw batch scan") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val rnd = new scala.util.Random(2718281)
    val types = Array("a", "b", "c", "x")
    val rows = Seq.fill(500)((rnd.nextInt(10).toLong,
      rnd.nextInt(20000).toLong * M, types(rnd.nextInt(types.length)))).distinct
    val base = 1704067200L * 1000000 // 2024-01-01 UTC, micros
    def ts(us: Long) = new Timestamp((base + us) / 1000)

    val storeDir = graft.sources.Sinks.scratchDir("stream_rollup_spec") + "/store"
    graft.sources.Sinks.clearDir(storeDir)

    def conds(df: DataFrame) = Seq("a", "b", "c").map(t => df("t") === t)
    def states(df: DataFrame): DataFrame =
      df.groupBy(col("u"), to_date(col("ts")).as("day"))
        .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))

    val input = MemoryStream[(Long, Timestamp, String)]
    val q = input.toDF().toDF("u", "ts", "t").writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        RollupStore.appendStates(states(batch.toDF()), storeDir, Seq("u", "day"))
        ()
      }
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
    val raw = all.groupBy("u")
      .agg(BehavioralFunctions.window_funnel(expr("INTERVAL '1' HOUR"),
        col("ts"), conds(all): _*).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val streamed = RollupStore.read(spark, storeDir).groupBy("u")
      .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
        col("state")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed === raw,
      "streamed store diverges from the raw batch scan")
  }
}
