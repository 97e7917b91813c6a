package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Pipeline, TextAnalysis}

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"), // contains bench 3-gram
    (2L, "one two three four five six seven"),   // clean
    (3L, "alpha beta"),                          // < n tokens -> omitted
    (4L, "x alpha beta gamma y")                 // contains bench 3-gram
  ).toDF("doc_id", "text")

  private def bench = Seq(
    (100L, "alpha beta gamma UNRELATED tail here")
  ).toDF("doc_id", "text")

  test("flags docs containing a benchmark n-gram; counts are per distinct gram") {
    val got = Pipeline.decontaminate(corpus, bench, n = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("matched_grams"),
          r.getAs[Boolean]("contaminated")))).toMap
    assert(got.keySet === Set(1L, 2L, 4L)) // doc 3 has < 3 tokens
    assert(got(1L) === ((4L, 1L, true)))   // "alpha beta gamma" matches
    assert(got(2L) === ((5L, 0L, false)))
    assert(got(4L) === ((3L, 1L, true)))
  }

  test("hashGrams variant agrees with the string-keyed join") {
    val s = Pipeline.decontaminate(corpus, bench, n = 3)
      .collect().map(_.toSeq).toSet
    val h = Pipeline.decontaminate(corpus, bench, n = 3, hashGrams = true)
      .collect().map(_.toSeq).toSet
    assert(h === s)
  }

  test("duplicate grams inside one doc count once (per-row distinct)") {
    val rep = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val emptyBench = Seq((9L, "z z z")).toDF("doc_id", "text")
    val r = Pipeline.decontaminate(rep, emptyBench, n = 3).collect().head
    // 7 gram positions but only 3 distinct 3-grams ("a b c","b c a","c a b")
    assert(r.getAs[Long]("n_grams") === 3L)
  }

  test("benchmark side joins as a broadcast (no corpus shuffle by gram)") {
    val plan = Pipeline.decontaminate(corpus, bench, n = 3)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}

class ChunkByTokensSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("size 8 / stride 4 over a 10-token doc: full, overlap, partial tail") {
    val doc = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(doc, size = 8, stride = 4)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[String]("chunk_text"),
        r.getAs[Long]("n_chunk_tokens")))
    assert(got.toSeq === Seq(
      (0L, "t1 t2 t3 t4 t5 t6 t7 t8", 8L),
      (1L, "t5 t6 t7 t8 t9 t10", 6L),
      (2L, "t9 t10", 2L)))
  }

  test("short doc yields a single partial chunk; null text yields none") {
    val docs = Seq((1L, Some("only three tokens")), (2L, None))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(docs, size = 8, stride = 4).collect()
    assert(got.length === 1)
    assert(got.head.getAs[String]("chunk_text") === "only three tokens")
    assert(got.head.getAs[Long]("n_chunk_tokens") === 3L)
  }

  test("non-overlapping stride == size tiles the doc exactly") {
    val doc = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(doc, size = 2, stride = 2)
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk_text"))
    assert(got.toSeq === Seq("a b", "c d", "e f"))
  }

  test("stride > size SAMPLES windows: tokens between windows are skipped") {
    val doc = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(doc, size = 2, stride = 4)
      .orderBy("chunk_idx").collect().map(_.getAs[String]("chunk_text"))
    // windows start at tokens 1, 5, 9 — c/d and g/h never appear
    assert(got.toSeq === Seq("a b", "e f", "i j"))
  }

  test("chunking is a pure per-row transform: no exchange in the plan") {
    val doc = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = TextAnalysis.chunkByTokens(doc, size = 2, stride = 2)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"))
  }
}

class PackSequencesSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("concatenate-and-chop: starts accumulate in doc_id order, docs straddle") {
    // one bucket so the stream order is just doc_id order
    val docs = Seq(
      (1L, "a b c"),          // 3 tokens, start 0
      (2L, "d e f g"),        // 4 tokens, start 3
      (3L, "h i")             // 2 tokens, start 7 -> seq 1 at offset 2 (seqLen 5)
    ).toDF("doc_id", "text")
    val got = Pipeline.packSequences(docs, seqLen = 5, buckets = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start"),
        r.getAs[Long]("seq_idx"), r.getAs[Long]("offset")))
    assert(got.toSeq === Seq((1L, 0L, 0L, 0L), (2L, 3L, 0L, 3L), (3L, 7L, 1L, 2L)))
  }

  test("seqLen 1 degenerates to one sequence per token; offsets always 0") {
    val docs = Seq((1L, "a b c"), (2L, "d")).toDF("doc_id", "text")
    val got = Pipeline.packSequences(docs, seqLen = 1, buckets = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start"),
        r.getAs[Long]("seq_idx"), r.getAs[Long]("offset")))
    // every token starts its own sequence: seq_idx == start, offset == 0
    assert(got.forall { case (_, start, seqIdx, off) =>
      seqIdx == start && off == 0L })
  }

  test("packing is deterministic and buckets partition the corpus") {
    val docs = (0 until 200).map(i => (i.toLong, s"tok$i " * (1 + i % 7)))
      .toDF("doc_id", "text")
    val a = Pipeline.packSequences(docs, 64, buckets = 8).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("bucket"), r.getAs[Long]("start"))).sorted
    val b = Pipeline.packSequences(docs, 64, buckets = 8).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("bucket"), r.getAs[Long]("start"))).sorted
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._2).distinct.length > 1) // really sharded
    // within a bucket, starts are the exclusive prefix sums of n_tokens
    val byBucket = Pipeline.packSequences(docs, 64, buckets = 8).collect()
      .groupBy(_.getAs[Long]("bucket"))
    for ((_, rows) <- byBucket) {
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      for (r <- sorted) {
        assert(r.getAs[Long]("start") === cum)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }
}

class LmQualitySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("in-vocab docs score higher than OOV-heavy docs; probabilities are corpus freqs") {
    // 'common' appears 6x (4 + 2), rare tokens once each; total = 12 tokens
    val docs = Seq(
      (1L, "common common common common"),           // all in-vocab
      (2L, "common common rare1 rare2"),             // half rare
      (3L, "rare3 rare4 rare5 rare6")                // all OOV under vocab 1
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.lmQuality(docs, vocabSize = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob")))).toMap
    assert(got(1L)._1 === 4L)
    // doc1: avg(ln(6/12)); doc3: avg(ln(1/12)) — OOV floor
    assert(math.abs(got(1L)._2 - math.log(6.0 / 12)) < 1e-12)
    assert(math.abs(got(3L)._2 - math.log(1.0 / 12)) < 1e-12)
    assert(got(1L)._2 > got(2L)._2 && got(2L)._2 > got(3L)._2)
  }

  test("vocab joins as a broadcast; corpus never shuffles by token") {
    val docs = Seq((1L, "a b c"), (2L, "a d")).toDF("doc_id", "text")
    val p = graft.ops.TextAnalysis.lmQuality(docs, vocabSize = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // the scalar-total frame must ride a broadcast EQUI-join, not degrade
    // into a nested-loop join via FoldablePropagation of its constant key
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("construction is fully lazy: no Spark jobs until the caller acts") {
    val docs = Seq((1L, "a b c"), (2L, "a d")).toDF("doc_id", "text")
    val sc = spark.sparkContext
    val tracker = sc.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    val df = graft.ops.TextAnalysis.lmQuality(docs, vocabSize = 2)
    val after = tracker.getJobIdsForGroup(null).length
    assert(after === before,
      s"lmQuality construction ran ${after - before} Spark job(s)")
    // and the frame still evaluates correctly afterwards
    assert(df.count() === 2)
  }

  test("empty corpus yields an empty frame (no division by zero total)") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ops.TextAnalysis.lmQuality(docs, vocabSize = 2).count() === 0)
  }
}
