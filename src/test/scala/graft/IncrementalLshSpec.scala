package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental (batch-vs-stored-index) MinHash LSH must agree with the
  * monolithic self-join restricted to cross-split pairs, survive a parquet
  * round trip unchanged, and keep candidate generation column-pruned on the
  * stored index.
  */
class IncrementalLshSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docs = graft.sources.Tables.load(spark, sfDir, "documents")
  private def newBatch = docs.filter(col("doc_id") % 10 === 0)
  private def existing = docs.filter(col("doc_id") % 10 =!= 0)

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col(df.columns(0)), col(df.columns(1)),
        round(col("jaccard"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental probe equals the monolithic self-join restricted to cross-split pairs") {
    val idx = graft.ops.Dedup.minhashIndex(existing)
    val incremental = pairsOf(graft.ops.Dedup.minhashLshJoinAgainst(newBatch, idx, threshold = 0.8))
    // monolithic pairs are (min, max)-oriented; reorient to (new, old)
    val monolithic = graft.ops.Dedup.minhashLshJoin(docs, threshold = 0.8)
      .filter((col("doc_a") % 10 === 0) =!= (col("doc_b") % 10 === 0))
      .select(
        when(col("doc_a") % 10 === 0, col("doc_a")).otherwise(col("doc_b")).as("new_id"),
        when(col("doc_a") % 10 === 0, col("doc_b")).otherwise(col("doc_a")).as("idx_id"),
        col("jaccard"))
    assert(incremental === pairsOf(monolithic))
    assert(incremental.nonEmpty, "no cross-split near-dup pairs — test is vacuous")
    graft.ops.OpCaches.unpersistAll()
  }

  test("index round-trips through parquet; probe of the stored index is identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_idx").toString
    graft.ops.Dedup.minhashIndex(existing).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val fromStored = pairsOf(graft.ops.Dedup.minhashLshJoinAgainst(newBatch, stored, threshold = 0.8))
    val fromLive = pairsOf(graft.ops.Dedup.minhashLshJoinAgainst(
      newBatch, graft.ops.Dedup.minhashIndex(existing), threshold = 0.8))
    assert(fromStored === fromLive)
    graft.ops.OpCaches.unpersistAll()
  }

  test("candidate generation prunes the stored index scan to (id, band_hashes)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_idx2").toString
    graft.ops.Dedup.minhashIndex(existing).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val plan = graft.ops.Dedup.minhashLshJoinAgainst(newBatch, stored, threshold = 0.8)
      .queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: ([^\\n]*)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty, plan)
    // at least one index scan must carry only the band keys (candidate
    // side); no scan may read the heavy string shingles together with
    // band_hashes (that would mean verification dragged sh through the
    // candidate join)
    assert(readSchemas.exists(s => s.contains("band_hashes") && !s.contains("shh")),
      s"no pruned candidate scan found: $readSchemas")
    graft.ops.OpCaches.unpersistAll()
  }

  test("shingle-less docs carry NULL band_hashes and never generate candidates") {
    import spark.implicits._
    // two distinct one-token docs and two empty docs: none has a 3-shingle,
    // so none may band-join — a real band key for them would bucket every
    // degenerate doc together (a skew bomb and false candidates at scale)
    val degenerate = Seq(
      (1L, "solo"), (2L, "word"), (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    val idx = graft.ops.Dedup.minhashIndex(degenerate)
    assert(idx.filter(col("band_hashes").isNotNull).isEmpty)
    val probed = graft.ops.Dedup.minhashLshJoinAgainst(
      degenerate, idx, threshold = 0.1)
    assert(probed.isEmpty)
    graft.ops.OpCaches.unpersistAll()
  }

  test("simhash probe equals the monolithic Hamming self-join restricted to cross-split pairs") {
    val incremental = graft.ops.Dedup.simhashPairsAgainstMd5(
        newBatch, graft.ops.Dedup.simhashIndexMd5(existing), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val monolithic = graft.ops.Dedup.simhashPairsMd5(docs, maxDist = 3)
      .filter((col("doc_a") % 10 === 0) =!= (col("doc_b") % 10 === 0))
      .select(
        when(col("doc_a") % 10 === 0, col("doc_a")).otherwise(col("doc_b")).as("new_id"),
        when(col("doc_a") % 10 === 0, col("doc_b")).otherwise(col("doc_a")).as("idx_id"),
        col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(incremental === monolithic)
    assert(incremental.nonEmpty, "no cross-split Hamming pairs — test is vacuous")
    graft.ops.OpCaches.unpersistAll()
  }

  test("simhash index round-trips through parquet; each pair emitted exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sh_idx").toString
    graft.ops.Dedup.simhashIndexMd5(existing).write.mode("overwrite").parquet(dir)
    val res = graft.ops.Dedup.simhashPairsAgainstMd5(
      newBatch, spark.read.parquet(dir), maxDist = 3).collect()
    assert(res.nonEmpty)
    // the first-shared-band predicate must dedup without an aggregate:
    // every (new, idx) pair appears exactly once even when several bands
    // collide (identical docs share all four bands)
    val keys = res.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.length === keys.distinct.length, "duplicate pair emissions")
    graft.ops.OpCaches.unpersistAll()
  }

  test("exact digest probe flags precisely the docs whose text exists in the index") {
    import spark.implicits._
    val idxDocs = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "alpha beta"), (11L, "epsilon zeta"), (12L, "gamma delta"))
      .toDF("doc_id", "text")
    val res = graft.ops.Dedup.exactDupAgainst(
        batch, graft.ops.Dedup.exactDigestIndex(idxDocs))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(res === Map(10L -> ((true, 1L)), 11L -> ((false, -1L)), 12L -> ((true, 2L))))
    graft.ops.OpCaches.unpersistAll()
  }

  test("re-ingested ids are not their own duplicates, but cross pairs survive") {
    // probe a batch against an index CONTAINING the same ids: self pairs
    // (exact J = 1.0 on identical text) must be excluded
    val idx = graft.ops.Dedup.minhashIndex(docs)
    val res = graft.ops.Dedup.minhashLshJoinAgainst(newBatch, idx, threshold = 0.8)
    assert(res.filter(col("new_id") === col("idx_id")).isEmpty)
    graft.ops.OpCaches.unpersistAll()
  }
}
