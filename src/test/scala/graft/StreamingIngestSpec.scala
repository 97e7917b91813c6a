package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `nearDupIngest` must emit, across all micro-batches, exactly the pairs
  * the batch incremental probe finds for the union of the streamed docs —
  * the foreachBatch wrapper adds delivery, not semantics.
  */
class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("streamed micro-batches emit exactly the batch probe's pairs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val newBatch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // suites run sequentially in the forked test JVM (fork := true without
    // testForkedParallel), so the persistent-RDD count is stable across this
    // test and the delta isolates what THIS test persists
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val idx = graft.ops.OpCaches.track(graft.ops.Dedup.minhashIndex(
      docs.filter(col("doc_id") % 10 =!= 0)).persist())

    val received = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val batchIds = scala.collection.mutable.ArrayBuffer[Long]()
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingBehavioral.nearDupIngest(
      input.toDF().toDF("doc_id", "text"), idx, threshold = 0.8) { (pairs, id) =>
      batchIds += id
      received ++= pairs.collect().map(r =>
        (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6))
    }
    try {
      newBatch.grouped(math.max(newBatch.length / 3, 1)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
    } finally q.stop()

    // no per-batch cache leak (round-9 ADVICE): each micro-batch's probe
    // persists its batch-side sketch and the wrapper must release it after
    // the sink returns — with >= 3 batches processed, only the index this
    // test persisted may remain cached
    assert(spark.sparkContext.getPersistentRDDs.size - cachedBefore <= 1,
      "nearDupIngest leaked per-micro-batch persisted sketches: " +
        s"${spark.sparkContext.getPersistentRDDs.size - cachedBefore} frames cached beyond the index")

    val expected = graft.ops.Dedup.minhashLshJoinAgainst(
        docs.filter(col("doc_id") % 10 === 0), idx, threshold = 0.8)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet
    assert(received.toSet === expected)
    assert(expected.nonEmpty, "no cross pairs — test is vacuous")
    assert(batchIds.nonEmpty && batchIds.size >= 3, s"expected >=3 micro-batches, got $batchIds")
    graft.ops.OpCaches.unpersistAll()
  }
}
