package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 pins: the bucketed token-budget pre-pass must be output-identical
  * to the exact single-window form (it is the documented skew fix for a
  * dominant language, now implemented rather than advised). */
class TokenBudgetBucketedSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("bucketed pre-pass == exact window form on real documents") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = asMap(graft.ops.Pipeline.sampleByTokenBudget(docs, 1000L))
    for (buckets <- Seq(1, 4, 32)) {
      val bucketed = asMap(
        graft.ops.Pipeline.sampleByTokenBudget(docs, 1000L, qualityBuckets = buckets))
      assert(bucketed === exact, s"buckets=$buckets diverged")
    }
    graft.ops.OpCaches.unpersistAll()
  }

  test("bucket boundaries: quality exactly 1.0 clamps into the top bucket; ties agree") {
    // quality 1.0 (long, clean, stopword-rich) would index bucket B without
    // the clamp; identical docs tie on quality and must order by doc_id in
    // both forms
    val long = ("the a of and to in is " * 12).trim
    val docs = Seq(
      (1L, long), (2L, long), (3L, long),
      (4L, "x"), (5L, "yy zz!!!")
    ).toDF("doc_id", "text")
    val exact = asMap(graft.ops.Pipeline.sampleByTokenBudget(docs, 120L))
    val bucketed = asMap(
      graft.ops.Pipeline.sampleByTokenBudget(docs, 120L, qualityBuckets = 8))
    assert(bucketed === exact)
    assert(exact.nonEmpty)
  }

  test("bucketed plan: per-bucket totals pre-combine and broadcast back; doc window partitions by (lang, bucket)") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = graft.ops.Pipeline.sampleByTokenBudget(docs, 1000L, qualityBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan.take(4000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
    // the per-doc running-sum window must key on the bucket too — that IS
    // the skew fix (B parallel partitions per language instead of one)
    assert(plan.contains("windowspecdefinition(lang_guess"), plan.take(4000))
    assert(plan.contains("__qb"), plan.take(4000))
    graft.ops.OpCaches.unpersistAll()
  }
}
