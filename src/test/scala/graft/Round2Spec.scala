package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.behavioral.pattern.{PatternExecutor, PAny, PStep, PTime, TimeOp}
import graft.behavioral.EventBuf

/** Round-2 regressions: the zero-width-pattern hang, reference-parity arity
  * floors, next-node direction/base defaulting, month-interval rejection,
  * and the blocked exact cosine join.
  */
class ZeroWidthPatternSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("executor: all-zero-width pattern terminates and counts one match per position") {
    val buf = EventBuf.empty()
    (1 to 4).foreach(i => buf.append(i.toLong * 1000000L, 1))
    // '.*' consumes nothing: the non-overlapping counter must still advance
    // monotonically (the reference loops forever here — deliberate deviation)
    val steps: Array[PStep] = Array(PAny)
    assert(PatternExecutor.execute(steps, buf, countAll = true) === 4L)
    assert(PatternExecutor.execute(steps, buf, countAll = false) === 1L)
  }

  test("executor: pattern of only time-constraints terminates") {
    val buf = EventBuf.empty()
    (1 to 3).foreach(i => buf.append(i.toLong * 1000000L, 1))
    val steps: Array[PStep] = Array(PTime(TimeOp.Gte, 0))
    val got = PatternExecutor.execute(steps, buf, countAll = true)
    assert(got === 3L)
  }

  test("SQL: sequence_count('.*', ...) returns instead of hanging the task") {
    val got = spark.sql(
      """SELECT sequence_count('.*', ts, c) FROM VALUES
        |  (TIMESTAMP '2024-01-01 00:00:00', true),
        |  (TIMESTAMP '2024-01-01 00:01:00', true),
        |  (TIMESTAMP '2024-01-01 00:02:00', true) AS t(ts, c)""".stripMargin)
      .collect()(0).getLong(0)
    assert(got === 3L)
  }
}

class ReferenceSurfaceSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("retention with a single condition is an analysis error (ffi/retention.rs:21-24)") {
    val e = intercept[Exception] {
      spark.sql("SELECT retention(true) FROM VALUES (1) AS t(x)").collect()
    }
    assert(e.getMessage.contains("2..32"), e.getMessage)
  }

  test("window_funnel with a single condition is an analysis error (ffi/window_funnel.rs:18-21)") {
    val e = intercept[Exception] {
      spark.sql(
        """SELECT window_funnel(INTERVAL '1' HOUR, ts, c)
          |FROM VALUES (TIMESTAMP '2024-01-01 00:00:00', true) AS t(ts, c)""".stripMargin)
        .collect()
    }
    assert(e.getMessage.contains("2..32"), e.getMessage)
  }

  test("month-bearing funnel window is rejected loudly (deviation: reference silently unsets the window, src/common/timestamp.rs:40-46)") {
    val e = intercept[Exception] {
      spark.sql(
        """SELECT window_funnel(INTERVAL '1' MONTH, ts, c1, c2)
          |FROM VALUES (TIMESTAMP '2024-01-01 00:00:00', true, false) AS t(ts, c1, c2)""".stripMargin)
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("month"), e.getMessage)
  }

  test("sequence_next_node: unknown direction/base default to forward/first_match (reference finalize unwrap_or)") {
    def run(dir: String, base: String): Any = spark.sql(
      s"""SELECT sequence_next_node('$dir', '$base', ts, v, c, c) FROM VALUES
         |  (TIMESTAMP '2024-01-01 00:00:00', 'a', true),
         |  (TIMESTAMP '2024-01-01 00:01:00', 'b', false),
         |  (TIMESTAMP '2024-01-01 00:02:00', 'c', true)
         |AS t(ts, v, c)""".stripMargin).collect()(0).get(0)
    assert(run("fwd", "zzz") === run("forward", "first_match"))
    assert(run("forward", "first_match") === "b") // first base row's successor
  }
}

class BlockedJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("blockedSelfJoinPairs equals the naive exact self-join, bit for bit") {
    // deterministic pseudo-random vectors with a smooth sim distribution —
    // exactly the case where LSH recall collapses and only an exact join
    // returns the full pair set
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 60).map(i => (i.toLong, Array.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val naive = pairs(graft.ops.Similarity.selfJoinPairs(vecs, 0.3)
      .select("vec_a", "vec_b", "sim"))
    val blocked = pairs(graft.ops.Similarity.blockedSelfJoinPairs(vecs, 0.3, blocks = 4)
      .select("vec_a", "vec_b", "sim"))
    assert(naive.nonEmpty)
    assert(blocked === naive)
    val plan = graft.ops.Similarity.blockedSelfJoinPairs(vecs, 0.3, blocks = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    graft.ops.OpCaches.unpersistAll()
  }
}

class JaccardExactnessSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def shingles(text: String, k: Int = 3): Set[String] = {
    val toks = text.trim.split("\\s+")
    if (toks.length < k) Set.empty
    else toks.sliding(k).map(_.mkString(" ")).toSet
  }

  test("jaccardJoin equals local brute force on random corpora with planted near-dups") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 40).map(i => s"w$i")
      val baseDocs = (0 until 50).map { i =>
        (i.toLong, (0 until 8 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      // plant near-dups: copy a doc and perturb one token
      val dups = (0 until 10).map { j =>
        val (srcId, text) = baseDocs(rnd.nextInt(baseDocs.length))
        val toks = text.split(" ")
        toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.length))
        ((100 + j).toLong, toks.mkString(" "))
      }
      val all = baseDocs ++ dups
      val docs = all.toDF("doc_id", "text")
      val got = graft.ops.Dedup.jaccardJoin(docs, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
      val want = (for {
        (ia, ta) <- all; (ib, tb) <- all if ia < ib
        sa = shingles(ta); sb = shingles(tb)
        common = (sa & sb).size.toDouble
        if sa.nonEmpty && sb.nonEmpty
        j = common / (sa.size + sb.size - common)
        if j >= 0.5
      } yield (ia, ib, math.rint(j * 1e9) / 1e9)).toSet
      assert(got === want, s"seed=$seed")
      graft.ops.OpCaches.unpersistAll()
    }
  }

  test("a stop-shingle shared by every doc does not produce pairs or blow up") {
    // 400 docs, each with a unique body plus one identical hot sentence:
    // the hot shingles rank as the most frequent and never enter any
    // doc's prefix, so the candidate join stays tiny and the result empty
    val hot = "the quick brown fox jumps over the lazy dog"
    val docs = (0 until 400).map(i => (i.toLong, s"unique$i body$i token$i extra$i $hot"))
      .toDF("doc_id", "text")
    val pairs = graft.ops.Dedup.jaccardJoin(docs, threshold = 0.5).count()
    assert(pairs === 0L)
    graft.ops.OpCaches.unpersistAll()
  }
}

class LeakageSplitSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("no near-dup pair straddles the train/test split; all docs assigned") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val split = graft.ops.Pipeline.leakageSafeSplit(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.size === docs.count())
    assert(split.values.map(_._2).toSet.subsetOf(Set("train", "test")))
    // the invariant the operator exists for: both ends of every dup pair
    // (and transitively every member of a cluster) share one split
    val pairs = graft.ops.Dedup.jaccardJoin(docs, threshold = 0.5)
      .select("doc_a", "doc_b").collect()
    assert(pairs.nonEmpty, "fixture has no dup pairs — invariant untested")
    pairs.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(split(a)._2 === split(b)._2, s"pair ($a,$b) straddles the split")
      assert(split(a)._1 === split(b)._1, s"pair ($a,$b) in different groups")
    }
    graft.ops.OpCaches.unpersistAll()
  }

  test("token budget keeps each language's best docs and stops past the quota") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val budget = 1000L
    val got = graft.ops.Pipeline.sampleByTokenBudget(docs, budget)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // independent expected set: same per-doc features, but the ranking /
    // running-sum / boundary logic recomputed with a plain driver-side
    // fold (quality desc, doc_id tie-break; keep while the cumulative
    // BEFORE the doc is under budget — the boundary-crossing doc stays)
    val base = docs.select(col("doc_id"),
        graft.ops.TextAnalysis.langId(col("text")).as("lang"),
        round(graft.ops.TextAnalysis.qualityScore(col("text")), 6).as("q"),
        size(graft.ops.TextAnalysis.tokensWs(col("text"))).cast("long").as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val expect = base.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      var cum = 0L
      ds.toSeq.sortBy { case (id, _, q, _) => (-q, id) }
        .flatMap { case (id, _, _, n) =>
          val before = cum
          cum += n
          if (before < budget) Some(id -> ((lang, n, cum))) else None
        }
    }.toMap
    assert(got === expect)
    // the fixture must actually exercise the boundary: at least one
    // language must have dropped docs (next doc over quota)
    val dropped = base.length - expect.size
    assert(dropped > 0, s"budget $budget dropped nothing — boundary untested")
    graft.ops.OpCaches.unpersistAll()
  }
}

class CuratedSinkSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("language-partitioned curation sink prunes partitions for a language filter") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val curated = graft.ops.Pipeline.curate(docs, dupThreshold = 0.5, minQuality = 0.3)
    val dir = java.nio.file.Files.createTempDirectory("graft_curated").toString
    graft.ops.Pipeline.writeCuratedByLang(curated, dir)
    graft.ops.OpCaches.unpersistAll()
    val back = spark.read.parquet(dir)
    val en = back.filter(col("lang_guess") === "en")
    val plan = en.queryExecution.executedPlan.toString
    // the language filter must land in PartitionFilters (file-listing
    // pruning), not in a post-scan data filter
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("lang_guess"),
      plan)
    assert(en.count() > 0)
    // round trip preserves the curated row set
    assert(back.count() === curated.count())
    graft.ops.OpCaches.unpersistAll()
  }
}

class WinnowMinimaSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("deque winnow_minima equals the array_min(slice) formulation on random strings") {
    val rnd = new scala.util.Random(11)
    // adversarial shapes: runs of equal hashes, ascending, descending, random
    val docs = (0 until 200).map { i =>
      val len = rnd.nextInt(30)
      val s = i % 4 match {
        case 0 => Array.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString
        case 1 => (0 until len).map(j => ('a' + (j % 26)).toChar).mkString
        case 2 => (0 until len).map(j => ('z' - (j % 26)).toChar).mkString
        case _ => Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      }
      (i.toLong, s)
    }.toDF("id", "t")
    val w = 4
    val hashes = docs.select(org.apache.spark.sql.functions.col("id"),
      graft.ops.TextAnalysis.kgramHashes(org.apache.spark.sql.functions.col("t"), 3).as("h"))
    import org.apache.spark.sql.functions._
    val viaHof = hashes.select(col("id"),
        when(size(col("h")) >= w,
          array_distinct(transform(
            sequence(lit(1), size(col("h")) - lit(w - 1)),
            j => array_min(slice(col("h"), j, lit(w))))))
          .otherwise(array().cast("array<string>")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaDeque = hashes.select(col("id"),
        graft.ops.TextAnalysis.winnowFromHashes(col("h"), w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaDeque === viaHof)
  }

  test("fused winnow_fingerprint equals the HOF winnowFingerprints, incl. multi-byte text") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    // mix ASCII, 2-byte (é), 3-byte (中), and 4-byte (emoji) code points so
    // the fused kernel's byte-offset walk is exercised against Spark's own
    // code-point substr inside the HOF form
    val alphabet = "abcdefgh éüß中文日本語😀🚀"
    val docs = (0 until 300).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    } :+ (300L -> null.asInstanceOf[String])
    val df = docs.toDF("id", "t")
    val (k, w) = (4, 3)
    val viaHof = df.select(col("id"),
        coalesce(graft.ops.TextAnalysis.winnowFingerprints(col("t"), k, w),
          array().cast("array<string>")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaFused = df.select(col("id"),
        graft.ops.TextAnalysis.winnowFingerprintsFused(col("t"), k, w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaFused === viaHof)
  }
}

class SimhashMd5Spec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("md5 simhash: deterministic 16-char hex, identical docs identical, permutation-invariant") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "dog lazy the over jumps fox brown quick the"), // same token set
      (4L, "completely different content entirely")
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.simhashMd5(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.values.forall(_.matches("[0-9a-f]{16}")), got.toString)
    assert(got(1L) === got(2L))
    assert(got(1L) === got(3L)) // votes are an order-independent sum
    assert(got(1L) !== got(4L))
    val again = graft.ops.Dedup.simhashMd5(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === again)
  }
}
