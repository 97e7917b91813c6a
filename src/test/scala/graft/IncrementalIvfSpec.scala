package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Incremental IVF maintenance (`Similarity.ivfAppend`): appending a batch
  * to an existing index without retraining. q90 gates exactness at full
  * probe; these tests pin the partial-probe property that makes the
  * append shape work at scale — append-time cell assignment agrees with
  * probe-time cell selection, so an appended vector is findable at
  * nProbe=1 via its own nearest centroid.
  */
class IncrementalIvfSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import graft.ops.Similarity

  private def df(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "v")
  }

  // two tight, well-separated clusters around (10,0) and (0,10)
  private val corpus = df(Seq(
    0L -> Seq(10.0, 0.0), 1L -> Seq(11.0, 0.5), 2L -> Seq(9.5, -0.5),
    3L -> Seq(0.0, 10.0), 4L -> Seq(0.5, 11.0), 5L -> Seq(-0.5, 9.5)))

  test("ivfAppend assigns each appended vector to its nearest centroid") {
    val (indexed, centroids) = Similarity.ivfIndex(corpus, nCells = 2, iterations = 3)
    val appended = Similarity.ivfAppend(
      df(Seq(100L -> Seq(12.0, 1.0), 101L -> Seq(1.0, 12.0))), centroids)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // whichever cell ids k-means settled on, 100 must share a cell with
    // vector 0 (the (10,0) cluster) and 101 with vector 3
    val baseCells = indexed.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(appended(100L) === baseCells(0L))
    assert(appended(101L) === baseCells(3L))
    assert(appended(100L) !== appended(101L))
  }

  test("appended vector is findable at nProbe=1 through its own centroid") {
    val (indexed, centroids) = Similarity.ivfIndex(corpus, nCells = 2, iterations = 3)
    val appended = Similarity.ivfAppend(df(Seq(100L -> Seq(12.0, 1.0))), centroids)
    val union = indexed.unionByName(appended)
    val top = Similarity.ivfTopK(union, centroids, Array(12.0, 1.0), k = 1, nProbe = 1)
      .collect()
    assert(top.length === 1 && top.head.getLong(0) === 100L,
      s"expected the appended vector as its own top-1, got ${top.toSeq}")
  }

  test("append cost shape: no touch of the stored index frame") {
    // ivfAppend's plan must reference only the batch — the corpus/index
    // must not appear (that is what makes ingest O(batch), not O(corpus))
    val (_, centroids) = Similarity.ivfIndex(corpus, nCells = 2, iterations = 1)
    val appended = Similarity.ivfAppend(df(Seq(100L -> Seq(12.0, 1.0))), centroids)
    val plan = appended.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"append plan must be join-free:\n$plan")
    assert(appended.queryExecution.optimizedPlan.collectLeaves().length === 1,
      "append plan must scan exactly one relation (the batch)")
  }
}
