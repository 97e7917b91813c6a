package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NgramRepetition
import graft.ops.{Dedup, Pipeline, TextAnalysis}

/** Round-5 regressions: the four round-4 operators (repetition stats, PII
  * redaction, chunk-dup stats, source mixing) plus the ADVICE defects found
  * in them (null tokens in NgramRepetition, phone-rule over-redaction,
  * keep_rate column collision). */
class NgramRepetitionSpec extends AnyFunSuite {
  import GraftSpark._
  private lazy val s = spark

  private def brute(toks: Seq[String], n: Int): Option[(Double, Double)] = {
    val m = toks.length - n + 1
    if (m <= 0) None
    else {
      val grams = (0 until m).map(i => toks.slice(i, i + n).mkString(" "))
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      Some((counts.values.max.toDouble / m, 1.0 - counts.size.toDouble / m))
    }
  }

  test("repetitionStats equals brute force on random token arrays (n=1,2,3)") {
    val _ = s
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "cc", "dd", "e")
    for (_ <- 1 to 200) {
      val toks = Vector.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      for (n <- 1 to 3) {
        import s.implicits._
        val got = Seq(toks).toDF("toks")
          .select(TextAnalysis.repetitionStats(col("toks"), n).as("r"))
          .select(col("r.top_share"), col("r.dup_frac"))
          .collect()
        brute(toks, n) match {
          case None =>
            // NULL struct -> null fields
            assert(got.head.isNullAt(0), s"expected null for $toks n=$n")
          case Some((ts, df)) =>
            assert(math.abs(got.head.getDouble(0) - ts) < 1e-12, s"$toks n=$n")
            assert(math.abs(got.head.getDouble(1) - df) < 1e-12, s"$toks n=$n")
        }
      }
    }
  }

  test("null token elements: no NPE, null is one distinct sentinel (ADVICE r4)") {
    val _ = s
    // grams of (a,NULL,a,NULL): (a,NULL) x2, (NULL,a) x1
    val expr = NgramRepetition(
      BoundReference(0, ArrayType(StringType, containsNull = true), nullable = true), 2)
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), null, UTF8String.fromString("a"), null))
    val row = expr.eval(InternalRow(arr)).asInstanceOf[InternalRow]
    assert(row != null)
    assert(math.abs(row.getDouble(0) - 2.0 / 3) < 1e-12) // top_share
    assert(math.abs(row.getDouble(1) - 1.0 / 3) < 1e-12) // dup_frac
    // null vs non-null token in the same slot chain must not compare equal
    val arr2 = new GenericArrayData(Array[Any](null, UTF8String.fromString("x")))
    val row2 = expr.eval(InternalRow(arr2)).asInstanceOf[InternalRow]
    assert(row2.getDouble(0) == 1.0 && row2.getDouble(1) == 0.0) // 1 gram
    // codegen'd projection path agrees (SQL arrays with NULLs)
    val got = df("SELECT array('a', CAST(NULL AS STRING), 'a', CAST(NULL AS STRING)) AS toks")
      .select(TextAnalysis.repetitionStats(col("toks"), 2).as("r"))
      .select(col("r.top_share"), col("r.dup_frac")).collect().head
    assert(math.abs(got.getDouble(0) - 2.0 / 3) < 1e-12)
    assert(math.abs(got.getDouble(1) - 1.0 / 3) < 1e-12)
  }
}

class RedactionSpec extends AnyFunSuite {
  import GraftSpark._
  private lazy val s = spark

  private def redacted(text: String): (String, Long) = {
    val _ = s
    import s.implicits._
    val r = Seq(text).toDF("text")
      .select(TextAnalysis.redact(col("text")).as("t"),
        TextAnalysis.redactCount(col("text")).cast("long").as("n"))
      .collect().head
    (r.getString(0), r.getLong(1))
  }

  test("space-separated number runs do NOT collapse into one <PHONE> (ADVICE r4)") {
    val (t, _) = redacted("figures for 1990 1991 1992 show growth")
    assert(!t.contains("<PHONE>"), t)
    assert(t == "figures for <NUM> <NUM> <NUM> show growth", t)
  }

  test("dashed/parenthesized phones still redact; space-formatted degrade to <NUM> not leaks") {
    val (t1, _) = redacted("call 555-123-4567 now")
    assert(t1 == "call <PHONE> now", t1)
    val (t2, _) = redacted("call (555)123-4567 now")
    assert(t2 == "call <PHONE> now", t2)
    val (t3, _) = redacted("intl +44 20 7946 0958 line")
    // no digit survives even when the phone rule doesn't label it
    assert(!t3.exists(_.isDigit), t3)
  }

  test("email and ipv4 run before the digit rule; counts track each span once") {
    val (t, n) = redacted("mail a.b+c@example.org from 10.0.0.1 ref 12345")
    assert(t == "mail <EMAIL> from <IP> ref <NUM>", t)
    assert(n == 3L, s"count $n")
  }
}

class ChunkDupSpec extends AnyFunSuite {
  import GraftSpark._
  private lazy val s = spark

  test("chunkDupStats: shared 5-gram chunks counted per instance, short docs omitted") {
    val _ = s
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // 9 toks -> 5 chunks
      (2L, "once the quick brown fox jumps again and again"), // shares 1 chunk w/ doc1
      (3L, "too short")).toDF("doc_id", "text")
    val got = Dedup.chunkDupStats(docs, n = 5)
      .orderBy("id").collect()
    assert(got.length == 2) // doc 3 has no 5-grams
    val d1 = got(0)
    assert(d1.getLong(1) == 5 && d1.getLong(2) == 1, d1.toString) // "the quick brown fox jumps"
    val d2 = got(1)
    assert(d2.getLong(1) == 5 && d2.getLong(2) == 1, d2.toString)
    assert(math.abs(d1.getDouble(3) - 0.2) < 1e-12)
  }
}

class JaccardMemoKeySpec extends AnyFunSuite {
  import GraftSpark._
  private lazy val s = spark

  test("memo key distinguishes two local corpora with identical schemas") {
    val _ = s
    import s.implicits._
    // Two in-memory corpora, same (doc_id, text) shape. A LocalRelation
    // canonicalizes to its schema alone, so a plan-string-only memo key
    // would serve corpus A's pair list for corpus B. No unpersistAll in
    // between — that is the point.
    graft.ops.OpCaches.unpersistAll()
    val a = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val b = Seq(
      (10L, "one two three four five"),
      (11L, "six seven eight nine ten")).toDF("doc_id", "text")
    val pa = graft.ops.Dedup.jaccardJoin(a, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pb = graft.ops.Dedup.jaccardJoin(b, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pa == Set((1L, 2L)), pa.toString)
    assert(pb == Set.empty, pb.toString) // stale hit would return (1,2)
    graft.ops.OpCaches.unpersistAll()
  }
}

class DedupBoundarySpec extends AnyFunSuite {
  import GraftSpark._
  private lazy val s = spark

  test("a pair at exactly J == threshold with minimal prefix overlap is found") {
    val _ = s
    import s.implicits._
    // x: 14 distinct tokens -> 12 shingles; y: x's first 8 tokens -> 6
    // shingles, ALL shared. Every exact filter sits on its boundary at
    // once: J = 6/12 = 0.5 == threshold (verification >=); |y| = 6 ==
    // ceil(t*|x|) (length filter >=); x's 6 unshared shingles are rarer
    // (df=1 vs df=2), so the shared ones rank LAST — the single shared
    // prefix entry of x is exactly at prefix position 7 = |x|-ceil(t|x|)+1
    // (prefix length boundary); and the PPJoin bound equals alpha = 6
    // (positional filter >=). Any off-by-one in those four filters loses
    // this pair.
    graft.ops.OpCaches.unpersistAll()
    val x = (1 to 14).map(i => s"t$i").mkString(" ")
    val y = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, x), (2L, y)).toDF("doc_id", "text")
    val got = graft.ops.Dedup.jaccardJoin(docs, threshold = 0.5).collect()
    assert(got.length == 1, got.mkString(";"))
    assert(got.head.getLong(0) == 1L && got.head.getLong(1) == 2L)
    assert(math.abs(got.head.getDouble(2) - 0.5) < 1e-12)
    graft.ops.OpCaches.unpersistAll()
  }

  test("simhash pair at exactly hamming == maxDist is kept, maxDist+1 dropped") {
    val _ = s
    import s.implicits._
    // synthetic fingerprints: h(0,7)=3 (boundary, kept), h(0,15)=4
    // (dropped), h(7,15)=1 (kept); all differing bits in band 0, so the
    // candidates surface through the equal bands 1-3
    val fp = Seq((1L, 0L), (2L, 7L), (3L, 15L)).toDF("id", "simhash")
    val got = graft.ops.Dedup.simhashPairsOf(fp, maxDist = 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 3L)), got.toString)
    graft.ops.OpCaches.unpersistAll()
  }

  test("leakage split bucket boundary: bucket 25 is test, bucket 26 is train") {
    val _ = s
    import s.implicits._
    // md5("36") starts 0x19.. = bucket 25 < 26 -> test;
    // md5("131") starts 0x1a.. = bucket 26, NOT < 26 -> train.
    // Pins the strict `<` on the default 26/256 test fraction.
    graft.ops.OpCaches.unpersistAll()
    val docs = Seq((36L, "completely unique text alpha beta gamma"),
        (131L, "another unrelated body delta epsilon zeta"))
      .toDF("doc_id", "text")
    val got = graft.ops.Pipeline.leakageSafeSplit(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(36L) == "test" && got(131L) == "train", got.toString)
    graft.ops.OpCaches.unpersistAll()
  }
}

class SourceMixSpec extends AnyFunSuite {
  import GraftSpark._
  private lazy val s = spark

  test("mixBySourceWeight: rate 0 drops the source, absent sources keep all") {
    val _ = s
    import s.implicits._
    val docs = (1 to 400).map(i => (i.toLong, s"src${i % 4}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val out = Pipeline.mixBySourceWeight(docs, Map("src0" -> 0.0, "src1" -> 0.5))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("src0"), out.toString)
    assert(out("src2") == 100 && out("src3") == 100, out.toString)
    val kept1 = out.getOrElse("src1", 0L)
    assert(kept1 > 20 && kept1 < 80, s"src1 kept $kept1 of 100 at rate 0.5")
  }

  test("a corpus column named keep_rate survives the join untouched (ADVICE r4)") {
    val _ = s
    import s.implicits._
    val docs = (1 to 50).map(i => (i.toLong, s"src${i % 2}", 0.9))
      .toDF("doc_id", "source", "keep_rate")
    val out = Pipeline.mixBySourceWeight(docs, Map("src0" -> 1.0))
    assert(out.columns.toSeq == Seq("source", "doc_id", "keep_rate") ||
      out.columns.sorted.toSeq == Seq("doc_id", "keep_rate", "source"))
    assert(out.count() == 50)
    assert(out.select("keep_rate").distinct().collect().map(_.getDouble(0)).toSeq == Seq(0.9))
  }

  test("mixBySourceWeight broadcasts the rates dimension (no corpus shuffle)") {
    val _ = s
    import s.implicits._
    val docs = (1 to 100).map(i => (i.toLong, s"src${i % 4}", s"t$i"))
      .toDF("doc_id", "source", "text")
    val plan = Pipeline.mixBySourceWeight(docs, Map("src0" -> 0.5))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
