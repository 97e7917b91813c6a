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

  test("budget boundary is strict: a doc starting exactly AT the budget is excluded") {
    // 4 identical 5-token docs, budget 10: docs 1 and 2 start at cum 0 and
    // 5 (< 10, kept); doc 3 starts exactly at 10 (NOT < 10, excluded) —
    // the boundary-crossing-doc-stays rule admits a doc that STRADDLES the
    // budget, never one that starts at it
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"),
      (3L, "a b c d e"), (4L, "a b c d e")).toDF("doc_id", "text")
    for (buckets <- Seq(0, 4)) {
      val kept = graft.ops.Pipeline
        .sampleByTokenBudget(docs, budget = 10L, qualityBuckets = buckets)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(kept === Seq(1L, 2L), s"buckets=$buckets kept $kept")
    }
    graft.ops.OpCaches.unpersistAll()
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

/** Pins the FILTERING POWER of the jaccard join's AllPairs index-prefix
  * bound — a property the final output cannot see (a weaker bound only
  * admits candidates that exact verification rejects anyway), so it gets
  * its own stage-level test against `jaccardCandidates`. */
class JaccardCandidateStageSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def candidates(docs: org.apache.spark.sql.DataFrame, t: Double) = {
    val sh = graft.ops.Dedup.shingleFrameHashed(docs, "doc_id", "text", 1)
    graft.ops.Dedup.jaccardCandidates(sh, t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("index prefix 2t/(1+t): a pair whose ONLY shared entries sit past the bound is never a candidate") {
    // 6 distinct unigram shingles per doc; 3 shared. Shared shingles have
    // df=2, unique df=1, so every unique shingle ranks BEFORE every shared
    // one in the (df, hash) order: x's shared entries occupy positions
    // 4..6. At t=0.5 the AllPairs index prefix is nx - ceil(2t/(1+t)·nx)
    // + 1 = 3, so the earliest shared entry (x-pos 4) sits just past it —
    // while the PPJoin prefix (pos <= 4) still indexes it, and the
    // positional bound passes at (pa=4, pb=4): 3 + min(2,2) + 1 = 6 >=
    // alpha = 4. Only the index-prefix bound excludes this pair; the
    // classic `t/(1+t)` weakening (prefix 5) would admit it.
    val docs = Seq(
      (1L, "xu1 xu2 xu3 shareA shareB shareC"),
      (2L, "yu1 yu2 yu3 shareA shareB shareC")
    ).toDF("doc_id", "text")
    assert(candidates(docs, 0.5) === Set.empty,
      "J = 3/9 pair must be pruned by the index-prefix bound, not verification")
  }

  test("candidates stay a superset of true pairs (exactness side of the bound)") {
    // J(1,2) = 4/(5+5-4) = 2/3 >= 0.5 — a true pair MUST be a candidate;
    // doc 3 is unrelated
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d z"),
      (3L, "p q r s t")
    ).toDF("doc_id", "text")
    assert(candidates(docs, 0.5) === Set((1L, 2L)))
  }

  test("no self-pairs: a doc sharing every shingle with itself never joins itself") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d z")
    ).toDF("doc_id", "text")
    val cands = candidates(docs, 0.5)
    assert(cands.forall { case (a, b) => a != b }, cands)
  }
}

/** int8 quantization: round-trip fidelity and edge cases (q67's operator). */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("dequantized vectors keep cosine > 0.999 to the originals at d=64") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"),
        graft.ops.Similarity.quantScale(col("v")).as("s"))
      .select(col("vec_id"), col("v"),
        graft.ops.Similarity.dequantizeInt8(
          graft.ops.Similarity.quantizeInt8(col("v"), col("s")), col("s")).as("dq"))
      .select(graft.ops.Similarity.cosine(col("v"), col("dq")).as("fidelity"))
      .agg(min(col("fidelity"))).collect()(0).getDouble(0)
    assert(emb > 0.999, s"min round-trip cosine $emb")
  }

  test("zero vector quantizes to zeros (no division by zero); values stay in [-127, 127]") {
    val df = Seq((1L, Seq(0.0, 0.0, 0.0)), (2L, Seq(-3.0, 1.5, 3.0)))
      .toDF("id", "v")
      .select(col("id"), col("v"),
        graft.ops.Similarity.quantScale(col("v")).as("s"))
      .select(col("id"),
        graft.ops.Similarity.quantizeInt8(col("v"), col("s")).as("q"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(got(1L) === Seq[Byte](0, 0, 0))
    assert(got(2L) === Seq[Byte](-127, 64, 127))
  }

  test("quantizedBatchTopK: high top-5 overlap and tiny sim error vs exact double scoring") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val quant = corpus
      .select(col("vec_id"), col("v"),
        graft.ops.Similarity.quantScale(col("v")).as("s"))
      .select(col("vec_id"), col("s").as("scale"),
        graft.ops.Similarity.quantizeInt8(col("v"), col("s")).as("q"))
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val exact = sets(graft.ops.Similarity.batchTopK(corpus, queries, k = 5))
    val quantized = sets(graft.ops.Similarity.quantizedBatchTopK(quant, queries, k = 5))
    assert(exact.keySet === quantized.keySet)
    // int8 rounding perturbs a d=64 cosine by well under 0.01, so (a) any
    // neighbor the paths disagree on must be a near-tie, and (b) overall
    // top-5 overlap stays high on real embeddings
    val overlaps = exact.keys.toSeq.map { qid =>
      (exact(qid).keySet intersect quantized(qid).keySet).size
    }
    assert(overlaps.sum.toDouble / (overlaps.size * 5) >= 0.9,
      s"mean top-5 overlap ${overlaps.sum.toDouble / (overlaps.size * 5)}")
    for {
      qid <- exact.keys
      (id, qsim) <- quantized(qid)
      esim <- exact(qid).get(id)
    } assert(math.abs(qsim - esim) < 0.01, s"qid $qid id $id: $qsim vs $esim")
  }
}

/** boilerplateStats: span-level shared-content detection (q65's operator). */
class BoilerplateStatsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("planted shared span raises boilerplate_frac; short docs surface with n_fp = 0") {
    val legal = "Copyright 2024 Example Corp. All rights reserved worldwide."
    val docs = Seq(
      (1L, s"totally original article body text one. $legal"),
      (2L, s"different unique second document here!! $legal"),
      (3L, s"third doc again some other words appear. $legal"),
      (4L, "entirely novel content sharing no span with anything qqq zzz"),
      (5L, "tiny") // under k + w - 1 = 11 chars: no fingerprints at all
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.boilerplateStats(docs, k = 8, w = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    val (nFp5, nCommon5, frac5) = got(5L)
    assert(nFp5 === 0L && nCommon5 === 0L && frac5 === 0.0)
    // the legal line's fingerprints appear in docs 1-3 -> each has shared
    // spans; doc 4 shares nothing
    for (id <- Seq(1L, 2L, 3L)) {
      val (nFp, nCommon, frac) = got(id)
      assert(nCommon > 0 && frac > 0.0 && nCommon <= nFp, s"doc $id: $nFp/$nCommon/$frac")
    }
    val (nFp4, nCommon4, frac4) = got(4L)
    assert(nCommon4 === 0L && frac4 === 0.0, s"doc 4 must share nothing: $nFp4/$nCommon4")
    graft.ops.OpCaches.unpersistAll()
  }

  test("minDocs = 1 marks every fingerprint common (frac 1.0 for any doc with spans)") {
    val docs = Seq((1L, "some sufficiently long unique document text")).toDF("doc_id", "text")
    val r = graft.ops.Dedup.boilerplateStats(docs, minDocs = 1).collect()(0)
    assert(r.getLong(1) > 0 && r.getDouble(3) === 1.0)
    graft.ops.OpCaches.unpersistAll()
  }
}

/** Pins partial-probe IVF recall (nProbe < nCells) against the exact
  * brute-force top-k — the one approximation regime the oracle net cannot
  * hash-check (q29/q56 run full-probe, which is exact). The index init and
  * Lloyd iterations are deterministic, so recall on this data is a fixed
  * number: assert a floor under it rather than the exact value, so a
  * legitimate kmeans tweak doesn't flap the test while a broken probe
  * selection (wrong-direction argmin, off-by-one cell) still fails. */
class IvfPartialProbeRecallSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("nProbe=2 of 8 cells keeps recall@10 >= 0.5; recall grows with nProbe") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val query = emb.filter(col("vec_id") === 0).collect()(0).getSeq[Double](1).toArray
    val corpus = emb.filter(col("vec_id") =!= 0)
    val exact = corpus
      .select(col("vec_id"), graft.ops.Similarity.cosine(col("v"),
        array(query.map(lit): _*)).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val (indexed, centroids) =
      graft.ops.Similarity.ivfIndex(corpus, nCells = 8, iterations = 2)
    def recallAt(nProbe: Int): Double = {
      val got = graft.ops.Similarity
        .ivfTopK(indexed, centroids, query, k = 10, nProbe = nProbe)
        .collect().map(_.getLong(0)).toSet
      (exact & got).size.toDouble / exact.size
    }
    val r2 = recallAt(2)
    val r8 = recallAt(8)
    assert(r2 >= 0.5, s"recall@10 with nProbe=2 collapsed to $r2")
    assert(r8 === 1.0, "full probe must be exact")
    assert(r8 >= r2, "recall must be monotone in nProbe")
    graft.ops.OpCaches.unpersistAll()
  }
}

/** ScoreTopK serialization + NaN defenses: partial-aggregate buffers
  * round-trip through serialize/deserialize on every shuffle, so a broken
  * re-heapify silently corrupts top-k results only under merge pressure. */
class ScoreTopKRoundTripSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def topk(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val agg = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.ScoreTopK(
        Seq(lit(k.toLong), col("score"), col("id"))
          .map(org.apache.spark.sql.graftbridge.ColumnBridge.expression))
        .toAggregateExpression())
    scored.groupBy(col("g")).agg(agg.as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.score"), col("e.id"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq
  }

  test("buffers serialized across many partitions re-heapify losslessly") {
    // 200 rows spread over 16 partitions: every partial buffer (up to k
    // entries each) crosses the exchange through serialize/deserialize;
    // dropping or reordering any entry changes the exact top-5
    val rows = (0 until 200).map(i => (1, (i * 37 % 200).toDouble, i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(16)
    val got = topk(df, 5)
    val expect = rows.sortBy { case (_, s, id) => (-s, id) }.take(5)
      .map { case (g, s, id) => (g, s, id) }
    assert(got === expect)
  }

  test("under-full heaps round-trip: k=5 with 2 entries per group keeps both") {
    val df = Seq((1, 3.0, 10L), (1, 7.0, 20L)).toDF("g", "score", "id")
      .repartition(8)
    assert(topk(df, 5).toSet === Set((1, 7.0, 20L), (1, 3.0, 10L)))
  }

  test("k larger than any single partition's contribution still fills from merges") {
    // 12 rows over 8 partitions: every partial buffer holds 1-2 entries,
    // far under k=5 — the final heap must still assemble the true top-5
    // from merged under-full buffers (kills serialize mutants that let a
    // buffer's k collapse to its current size)
    val rows = (0 until 12).map(i => (1, i.toDouble, i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(8)
    val expect = rows.sortBy { case (_, s, id) => (-s, id) }.take(5)
    assert(topk(df, 5) === expect)
  }

  test("NaN scores never occupy a top-k slot, even while the heap is under-full") {
    val df = Seq((1, Double.NaN, 1L), (1, 0.5, 2L), (1, Double.NaN, 3L),
      (1, 0.2, 4L)).toDF("g", "score", "id")
    val got = topk(df, 3)
    assert(got === Seq((1, 0.5, 2L), (1, 0.2, 4L)),
      s"NaN must be skipped, not kept: $got")
  }
}
