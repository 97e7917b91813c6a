package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

class PrefixTopKSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def topk(k: org.apache.spark.sql.Column, df: org.apache.spark.sql.Column,
      h: org.apache.spark.sql.Column) =
    ColumnBridge.column(graft.functions.PrefixTopK(
      Seq(k.cast("long"), df, h).map(ColumnBridge.expression)).toAggregateExpression())

  test("prefix_topk == sort_array(collect_list)+slice on random posting lists") {
    val rnd = new scala.util.Random(7)
    // 40 groups, each with 1..60 (df, h) postings incl. duplicate dfs
    val rows = for {
      g <- 0 until 40
      _ <- 0 until (1 + rnd.nextInt(60))
    } yield (g.toLong, rnd.nextInt(20).toLong, rnd.nextLong())
    val df = rows.toDF("id", "df", "h")
    val k = 7
    val got = df.groupBy("id")
      .agg(topk(lit(k), col("df"), col("h")).as("ps"))
      .select(col("id"), col("ps"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sorted.take(k)
    }
    assert(got.keySet === want.keySet)
    for (g <- want.keys) assert(got(g) === want(g), s"group $g")
  }

  test("groups smaller than k return everything, ascending") {
    val df = Seq((1L, 5L, 10L), (1L, 3L, 99L), (1L, 5L, 2L)).toDF("id", "df", "h")
    val got = df.groupBy("id").agg(topk(lit(100), col("df"), col("h")).as("ps"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(got === Seq((3L, 99L), (5L, 2L), (5L, 10L)))
  }

  test("heap evicts the maximum: only the k smallest (df, h) survive") {
    val df = (1 to 100).map(i => (1L, i.toLong, (1000 - i).toLong))
      .toDF("id", "df", "h")
    val got = df.groupBy("id").agg(topk(lit(3), col("df"), col("h")).as("ps"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(got === Seq((1L, 999L), (2L, 998L), (3L, 997L)))
  }

  test("many partitions: partial heaps merge to the same answer") {
    val rows = (0 until 5000).map(i => (1L, (i % 97).toLong, i.toLong))
    val df = rows.toDF("id", "df", "h").repartition(32)
    val got = df.groupBy("id").agg(topk(lit(10), col("df"), col("h")).as("ps"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getLong(0), x.getLong(1)))
    val want = rows.map(r => (r._2, r._3)).sorted.take(10)
    assert(got === want)
  }
}
