package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `decontaminateBloom` must be bit-identical to the exact `decontaminate`
  * for ANY sketch parameters: the Bloom filter prunes cost, the string
  * verification join decides the answer.
  */
class DecontamBloomSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Boolean)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  private def split() = {
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    (d.filter(col("doc_id") % 20 =!= 0), d.filter(col("doc_id") % 20 === 0))
  }

  test("bloom-prefiltered decontamination equals the exact broadcast join") {
    val (corpus, bench) = split()
    val exact = asMap(graft.ops.Pipeline.decontaminate(corpus, bench, n = 5))
    val bloomed = asMap(graft.ops.Pipeline.decontaminateBloom(corpus, bench, n = 5))
    assert(bloomed === exact)
    assert(exact.values.exists(_._3), "fixture has no contaminated docs — test is vacuous")
    graft.ops.OpCaches.unpersistAll()
  }

  test("result is sketch-independent: fpp = 0.5 (massive bloom FP rate) changes nothing") {
    val (corpus, bench) = split()
    val exact = asMap(graft.ops.Pipeline.decontaminate(corpus, bench, n = 5))
    // tiny capacity + 0.5 fpp floods the prefilter with false positives;
    // every one of them must die in the string verification join
    val sloppy = asMap(graft.ops.Pipeline.decontaminateBloom(corpus, bench, n = 5,
      expectedGrams = 16, fpp = 0.5))
    assert(sloppy === exact)
    graft.ops.OpCaches.unpersistAll()
  }

  test("broadcast-variable shipping path (maxLiteralBytes = 0) is bit-identical to the literal path") {
    val (corpus, bench) = split()
    val exact = asMap(graft.ops.Pipeline.decontaminate(corpus, bench, n = 5))
    // force every filter size over the threshold: the serialized bloom
    // ships as a Broadcast[Array[Byte]] probed by BloomMightContainBroadcast
    val bc = asMap(graft.ops.Pipeline.decontaminateBloom(corpus, bench, n = 5,
      maxLiteralBytes = 0))
    assert(bc === exact)
    val plan = graft.ops.Pipeline.decontaminateBloom(corpus, bench, n = 5,
      maxLiteralBytes = 0).queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain_broadcast"), plan)
    assert(!plan.contains("might_contain("), plan)
    graft.ops.OpCaches.unpersistAll()
  }

  test("probe stream is pruned inside the scan projection (might_contain filter, no gram broadcast of the corpus)") {
    val (corpus, bench) = split()
    val plan = graft.ops.Pipeline.decontaminateBloom(corpus, bench, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    graft.ops.OpCaches.unpersistAll()
  }

  test("tokenization never lands in a pushed predicate (InferFiltersFromGenerate hazard)") {
    // an attribute-child explode or a filter on a derived gram-count column
    // lets the optimizer push a predicate containing the FULL gram
    // expression below the projections; the substituted split() inside the
    // HOF lambda then re-evaluates per element — a measured 30x regression.
    // Pin the discipline: no Filter in the plan may contain the tokenizer.
    val (corpus, bench) = split()
    val plan = graft.ops.Pipeline.decontaminateBloom(corpus, bench, n = 5)
      .queryExecution.executedPlan.toString
    val offending = plan.linesIterator.filter(l =>
      l.trim.replaceAll("^[+:\\-\\s]*", "").startsWith("Filter") &&
      l.contains("split(")).toSeq
    assert(offending.isEmpty,
      s"tokenizer pushed into a predicate:\n${offending.mkString("\n")}")
    graft.ops.OpCaches.unpersistAll()
  }
}
