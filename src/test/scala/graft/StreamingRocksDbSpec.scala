package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The production state-store config: every contract row runs the default
  * in-memory HDFS-backed store (right at harness cardinality), but at
  * corpus scale per-executor state outgrows the heap and the config is
  * `RocksDBStateStoreProvider` (off-heap/on-disk, memory bounded by block
  * cache, incremental checkpoints). The operators must be store-agnostic:
  * this spec runs the streaming sessionize pipeline under BOTH providers
  * and pins identical emissions, and checks the RocksDB run really engaged
  * the provider (rocksdb custom metrics in the progress record).
  */
class StreamingRocksDbSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def runSessionize(provider: Option[String]): (Seq[(Long, Long, Long, Long)], String) = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    provider.foreach(spark.conf.set(key, _))
    val name = "rocks_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val input = MemoryStream[streaming.StreamingBehavioral.SeqEvent]
      val q = streaming.StreamingBehavioral
        .sessionStats(input.toDS().select(col("user_id"), col("ts")),
          gap = "30 minutes", watermark = "10 minutes")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        def ev(u: Long, minute: Long) = streaming.StreamingBehavioral.SeqEvent(
          u, new java.sql.Timestamp(1700000000000L + minute * 60000), 0)
        // two users, two sessions each (65-minute gap splits at gap=30)
        input.addData(ev(1, 0), ev(1, 10), ev(2, 5))
        q.processAllAvailable()
        input.addData(ev(1, 75), ev(2, 80), ev(2, 81))
        q.processAllAvailable()
        // far-future sentinel advances the watermark past every session end
        input.addData(ev(-1, 1000000))
        q.processAllAvailable()
        val metrics = Option(q.lastProgress)
          .map(_.stateOperators.map(_.customMetrics.toString).mkString(";"))
          .getOrElse("")
        val out = spark.table(name).filter(col("user_id") >= 0)
          .select(col("user_id"), unix_micros(col("session_start")),
            unix_micros(col("session_end")), col("n_events"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSeq.sorted
        (out, metrics)
      } finally {
        q.stop()
        spark.catalog.dropTempView(name)
      }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("sessionize emits identical sessions under RocksDB and memory state stores") {
    val (memRows, _) = runSessionize(None)
    assert(memRows.size === 4, s"expected 2 users x 2 sessions, got $memRows")
    val (rocksRows, rocksMetrics) = runSessionize(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    assert(rocksRows === memRows,
      s"state-store provider changed the answer:\nmem  =$memRows\nrocks=$rocksRows")
    assert(rocksMetrics.contains("rocksdb"),
      s"RocksDB provider did not engage (no rocksdb metrics): $rocksMetrics")
  }
}
