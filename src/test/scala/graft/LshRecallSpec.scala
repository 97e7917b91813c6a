package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the full-recall regime that q58 relies on: with planes=3 and
  * tables=24 at threshold 0.45, the hyperplane-LSH self-join finds EVERY
  * qualifying pair of the sf0.01 embeddings, so its output is
  * hash-identical to the exact O(n²) join (precision is always 1 — LSH
  * candidates verify against exact cosine). The planes are seeded, the
  * data is fixed, so recall here is deterministic, not probabilistic. */
class LshRecallSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("q58 params reach recall == 1 vs the exact join at sf0.01") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = graft.ops.Similarity.blockedSelfJoinPairs(emb, threshold = 0.45)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "degenerate regime: no qualifying pairs at 0.45")
    val lsh = graft.ops.Similarity.lshSelfJoin(emb, threshold = 0.45, dim = 64,
        nPlanes = 3, tables = 24)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((exact -- lsh).isEmpty, s"missed pairs: ${exact -- lsh}")
    assert((lsh -- exact).isEmpty, s"spurious pairs: ${lsh -- exact}")
  }
}
