package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

/** Differential proofs that the per-row sketch kernels are bit-identical to
  * the explode → groupBy DataFrame formulations they replaced (the
  * formulations are reconstructed inline here, as the executable spec of
  * the old semantics). Random corpora, plus the NULL/empty edges.
  */
class SketchExprsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def minhashSig(shh: Column, numHashes: Int): Column =
    ColumnBridge.column(graft.functions.MinhashSignature(
      ColumnBridge.expression(shh), numHashes))
  private def simhash64(toks: Column): Column =
    ColumnBridge.column(graft.functions.Simhash64(
      ColumnBridge.expression(toks)))
  private def simhashMd5Hex(toks: Column): Column =
    ColumnBridge.column(graft.functions.SimhashMd5Hex(
      ColumnBridge.expression(toks)))

  // deterministic random-ish corpus: 60 docs over a 40-word vocabulary,
  // lengths 0..24 words (length-0 docs exercise the single-empty-token path)
  private lazy val corpus: DataFrame = {
    val words = (0 until 40).map(i => s"w$i")
    val docs = (0 until 60).map { d =>
      val rnd = new scala.util.Random(d * 2654435761L)
      val n = rnd.nextInt(25)
      (d.toLong, (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    docs.toDF("doc_id", "text")
  }

  test("minhash_signature == explode+groupBy min formulation, all seeds") {
    val numHashes = 32
    val sh = corpus.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 3).as("sh"))
      .select(col("id"), array_sort(transform(col("sh"), s => xxhash64(s))).as("shh"))
    // OLD formulation: explode the shingle hashes, aggregate one min per seed
    val minCols = (0 until numHashes).map(seed =>
      min(ColumnBridge.xxhash64(seed.toLong, col("h"))).as(s"h$seed"))
    val oldSig = sh.select(col("id"), explode(col("shh")).as("h"))
      .groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until numHashes).map(s => col(s"h$s")): _*).as("sig"))
    val newSig = sh.select(col("id"), minhashSig(col("shh"), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
    val oldM = oldSig.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val newM = newSig.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(newM === oldM)
    assert(oldM.nonEmpty)
  }

  test("minhash_signature: null and empty arrays yield NULL") {
    val df = Seq((1L, Some(Seq(7L, 9L))), (2L, Some(Seq.empty[Long])), (3L, None))
      .toDF("id", "shh")
    val got = df.select(col("id"), minhashSig(col("shh"), 4).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isDefined)
    assert(got(2L).isEmpty)
    assert(got(3L).isEmpty)
  }

  test("simhash64 == explode+groupBy vote formulation") {
    val toks = array_distinct(TextAnalysis.tokensWs(col("text")))
    // OLD formulation: explode distinct tokens, 64 vote sums, OR the bits
    val tok = corpus.select(col("doc_id").as("id"), explode(toks).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b")
    }
    val bits = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    val oldFp = tok.groupBy(col("id")).agg(votes.head, votes.tail: _*)
      .select(col("id"), bits.reduce(_.bitwiseOR(_)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val newFp = Dedup.simhash(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(newFp === oldFp)
    assert(oldFp.nonEmpty)
  }

  test("simhash_md5_hex == the nibble/vote DataFrame formulation") {
    val toks = array_distinct(TextAnalysis.tokensWs(col("text")))
    val tok = corpus.select(col("doc_id"), explode(toks).as("t"))
      .select(col("doc_id"), md5(col("t")).as("m"))
    val nib = tok.select(col("doc_id") +:
      (1 to 16).map(j => conv(substring(col("m"), j, 1), 16, 10).cast("int").as(s"n$j")): _*)
    val votes = for { j <- 1 to 16; p <- 0 until 4 } yield
      sum(when(shiftright(col(s"n$j"), p).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
        .as(s"v${j}_$p")
    val voted = nib.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val chars = (1 to 16).map { j =>
      val nibVal = (0 until 4)
        .map(p => when(col(s"v${j}_$p") > 0, lit(1 << p)).otherwise(lit(0)))
        .reduce(_ + _)
      lit("0123456789abcdef").substr(nibVal + lit(1), lit(1))
    }
    val oldFp = voted.select(col("doc_id"), concat(chars: _*).as("simhash_hex"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val newFp = Dedup.simhashMd5(corpus)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(newFp === oldFp)
    assert(oldFp.nonEmpty)
  }

  test("simhash kernels: null text drops the row; null elements are skipped") {
    val df = Seq((1L, Some("alpha beta gamma")), (2L, None))
      .toDF("doc_id", "text")
    assert(Dedup.simhash(df).collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(Dedup.simhashMd5(df).collect().map(_.getLong(0)).toSeq === Seq(1L))
    // null elements: only the non-null token votes
    val arr = Seq((1L, Seq(Some("alpha"), None)), (2L, Seq(Some("alpha"))))
      .toDF("id", "toks")
    val fp = arr.select(col("id"), simhash64(col("toks")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    // an all-null element array casts no votes -> NULL
    val allNull = Seq((1L, Seq[Option[String]](None, None))).toDF("id", "toks")
    assert(allNull.select(simhash64(col("toks"))).collect().head.isNullAt(0))
  }

  test("minhash LSH join output is unchanged by the kernel rewrite (vs exact)") {
    // the contract the bench/oracle relies on: LSH + exact verify == exact
    // join at a high threshold on this corpus
    val exact = Dedup.jaccardJoin(corpus, 0.7).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshJoin(corpus, 0.7).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }
}
