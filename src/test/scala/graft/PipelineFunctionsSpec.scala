package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

/** The pipeline kernels through the SQL-TEXT path: FunctionRegistry name
  * resolution, literal-int parameter extraction, and agreement with the
  * Column API — the same "registration can break while unit tests stay
  * green" layer q42 pins for the behavioral family. */
class PipelineFunctionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = GraftSpark.spark
    graft.functions.PipelineFunctions.register(s)
    s
  }
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "entirely different words in this one here now")
  ).toDF("doc_id", "text")

  test("simhash64 / simhash_md5_hex via SQL text == Column API") {
    docs.createOrReplaceTempView("pf_docs")
    val sqlFp = spark.sql(
      """SELECT doc_id, simhash64(split(trim(text), '\\s+')) AS simhash,
        |       simhash_md5_hex(split(trim(text), '\\s+')) AS hexfp
        |FROM pf_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val apiFp = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val apiHex = Dedup.simhashMd5(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, (s64, hex)) <- sqlFp) {
      assert(s64 === apiFp(id))
      assert(hex === apiHex(id))
    }
  }

  test("minhash_signature via SQL text == Dedup.minhashSignature") {
    docs.createOrReplaceTempView("pf_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, minhash_signature(
        |         transform(split(trim(text), '\\s+'), t -> xxhash64(t)), 8) AS sig
        |FROM pf_docs""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = docs.select(col("doc_id"),
        Dedup.minhashSignature(TextAnalysis.tokensWs(col("text")), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql === viaApi)
  }

  test("winnow_fingerprint via SQL text == TextAnalysis fused kernel") {
    docs.createOrReplaceTempView("pf_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, winnow_fingerprint(text, 8, 4) AS fp FROM pf_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaApi = docs.select(col("doc_id"),
        TextAnalysis.winnowFingerprintsFused(col("text"), 8, 4).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaSql === viaApi)
  }

  test("dot_product and sorted_intersect_count via SQL text") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS sic,
        |  sorted_intersect_count_long(array(1L,2L,3L), array(2L,3L,9L)) AS sicl
        |""".stripMargin).collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getInt(1) === 2)
    assert(r.getInt(2) === 2)
  }

  test("score_topk and prefix_topk work as SQL-text aggregates") {
    Seq((1L, 0.9, 10L), (1L, 0.7, 3L), (1L, 0.99, 7L))
      .toDF("g", "s", "id").createOrReplaceTempView("pf_scores")
    val top = spark.sql(
      "SELECT score_topk(2L, s, id) AS t FROM pf_scores GROUP BY g")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(top === Seq((0.99, 7L), (0.9, 10L)))
    Seq((1L, 5L, 100L), (1L, 2L, 200L), (1L, 9L, 300L))
      .toDF("g", "df", "h").createOrReplaceTempView("pf_posts")
    val pre = spark.sql(
      "SELECT prefix_topk(2L, df, h) AS t FROM pf_posts GROUP BY g")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pre === Seq((2L, 200L), (5L, 100L)))
  }

  test("non-literal static parameter fails analysis with a clear message") {
    docs.createOrReplaceTempView("pf_docs")
    val e = intercept[Exception] {
      spark.sql(
        """SELECT minhash_signature(array(xxhash64(text)),
          |  CAST(doc_id AS INT)) FROM pf_docs""".stripMargin).collect()
    }
    assert(e.getMessage.contains("literal INT"))
  }

  test("GraftExtensions injects the kernel builders too") {
    val fresh = spark.newSession()
    org.apache.spark.sql.graftbridge.ColumnBridge.applyFunctionExtensions(
      fresh, new graft.behavioral.GraftExtensions()(_))
    docs.createOrReplaceTempView("pf_docs") // temp views are per-session
    fresh.sql("SELECT 1").collect() // session alive
    val got = fresh.sql(
      "SELECT simhash64(array('a', 'b')) AS fp").collect().head.getLong(0)
    val want = spark.sql(
      "SELECT simhash64(array('a', 'b')) AS fp").collect().head.getLong(0)
    assert(got === want)
  }
}
