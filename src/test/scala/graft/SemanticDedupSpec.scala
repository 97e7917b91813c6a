package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Similarity.semanticDedup (SemDeDup-style cluster-then-prune).
  *
  * q68 pins the nCells=1 exact regime against the DuckDB oracle; these
  * tests pin what the oracle cannot see — nCells > 1 on cluster-separated
  * data (where within-cell recall is provably 1, the cells>1 result must
  * equal the exact one), block-count invariance, and the marker-rule
  * boundaries (no-neighbor rows, min-id dup_of, threshold-exact pairs).
  */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame, t: Double, cells: Int,
      blocks: Int = 4, iterations: Int = 3) = {
    val out = graft.ops.Similarity
      .semanticDedup(df, t, cells, iterations = iterations, blocks = blocks)
      .select("id", "is_dup", "dup_of")
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    graft.ops.OpCaches.unpersistAll()
    out
  }

  // two tight clusters far apart: {1,2,3} around (1,0), {10,11} around (0,1);
  // within-cluster cosine ~1, cross-cluster ~0
  private val separated = Seq(
    (1L, Seq(1.0, 0.01)), (2L, Seq(1.0, 0.02)), (3L, Seq(0.99, 0.0)),
    (10L, Seq(0.01, 1.0)), (11L, Seq(0.0, 0.98))
  ).toDF("vec_id", "v")

  test("greedy marker rule: lowest id per cluster survives, dup_of is the min neighbor") {
    val got = run(separated, 0.9, cells = 1)
    assert(got === Map(
      1L -> (false, -1L), 2L -> (true, 1L), 3L -> (true, 1L),
      10L -> (false, -1L), 11L -> (true, 10L)))
  }

  test("nCells=2 on separated clusters == exact nCells=1 result") {
    val exact = run(separated, 0.9, cells = 1)
    assert(run(separated, 0.9, cells = 2) === exact)
  }

  test("block count does not change the result") {
    val exact = run(separated, 0.9, cells = 1, blocks = 1)
    assert(run(separated, 0.9, cells = 1, blocks = 3) === exact)
    assert(run(separated, 0.9, cells = 2, blocks = 7) === exact)
  }

  test("threshold boundary: cosine == t marks the pair, just below does not") {
    // cos((1,0),(cos a, sin a)) = cos a exactly; pick cos a = 0.6
    val docs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.6, 0.8))).toDF("vec_id", "v")
    assert(run(docs, 0.6, cells = 1) === Map(1L -> (false, -1L), 2L -> (true, 1L)))
    assert(run(docs, math.nextUp(0.6), cells = 1) ===
      Map(1L -> (false, -1L), 2L -> (false, -1L)))
  }

  test("cross-cell near-dups are NOT compared (the SemDeDup trade)") {
    // iterations = 0 pins the centroids to the first two vectors by id, so
    // each is its own cell despite cos(v1, v2) ≈ 0.954 >= t: the celled
    // regime must NOT mark the pair (the within-cell join is keyed by cell),
    // while the exact nCells=1 regime must
    val docs = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.95, 0.3))).toDF("vec_id", "v")
    assert(run(docs, 0.9, cells = 1, iterations = 0) ===
      Map(1L -> (false, -1L), 2L -> (true, 1L)))
    assert(run(docs, 0.9, cells = 2, iterations = 0) ===
      Map(1L -> (false, -1L), 2L -> (false, -1L)))
  }

  test("singleton corpus and no-neighbor rows are kept") {
    val one = Seq((5L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    assert(run(one, 0.5, cells = 1) === Map(5L -> (false, -1L)))
  }

  test("real embeddings: nCells=4 never marks a row the exact regime keeps as non-dup incorrectly") {
    // cells can only LOSE pairs (cross-cell near-dups), never invent them:
    // every (is_dup, dup_of) at nCells=4 must also hold at nCells=1
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = run(emb, 0.4, cells = 1)
    val celled = run(emb, 0.4, cells = 4)
    assert(exact.keySet === celled.keySet)
    celled.foreach { case (id, (dup, of)) =>
      if (dup) {
        assert(exact(id)._1, s"vec $id marked dup at nCells=4 but not in exact regime")
        // the exact dup_of is the global min neighbor, so it can only be <=
        assert(exact(id)._2 <= of, s"vec $id: exact dup_of ${exact(id)._2} > celled $of")
      }
    }
    assert(celled.count(_._2._1) >= 1, "sf0.001 embeddings should contain near-dups")
  }
}
