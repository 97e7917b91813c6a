package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions

/** The mergeable retention split (`retention_state` + `retention_merge`):
  * folding partials over ANY regrouping — per-day rollup, re-merged
  * shards, an outer join's NULL states — must reproduce `retention`'s
  * raw-scan answer bit for bit. q105 pins the rollup path under the
  * DuckDB hash; this spec pins the algebra and the edge cases.
  */
class RetentionRollupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def ev(rows: (Long, Int)*): DataFrame = {
    import spark.implicits._
    // (user, day) event stream; conditions are day == 1 / 2 / 3
    rows.toDF("u", "d")
  }

  private def conds(df: DataFrame): Seq[org.apache.spark.sql.Column] =
    Seq(1, 2, 3).map(d => df("d") === d)

  private def direct(df: DataFrame): Map[Long, Seq[Boolean]] =
    df.groupBy("u").agg(BehavioralFunctions.retention(conds(df): _*).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap

  private def viaRollup(df: DataFrame): Map[Long, Seq[Boolean]] =
    df.groupBy(col("u"), col("d"))
      .agg(BehavioralFunctions.retention_state(conds(df): _*).as("state"))
      .groupBy("u")
      .agg(BehavioralFunctions.retention_merge(col("state"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap

  test("per-day rollup merge equals the raw-scan retention") {
    val df = ev((1L, 1), (1L, 2), (1L, 5), (2L, 2), (2L, 3), (3L, 1),
      (3L, 3), (4L, 4), (5L, 1), (5L, 1), (5L, 2), (5L, 3))
    assert(viaRollup(df) === direct(df))
    // and the values themselves are right, not just consistent
    assert(direct(df) === Map(
      1L -> Seq(true, true, false),   // anchor + day2
      2L -> Seq(false, false, false), // anchor never fires -> all false
      3L -> Seq(true, false, true),
      4L -> Seq(false, false, false),
      5L -> Seq(true, true, true)))
  }

  test("randomized: any partitioning of rows into shards merges to the raw answer") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(400)((rnd.nextInt(20).toLong, rnd.nextInt(6)))
    val df = ev(rows: _*)
    val expected = direct(df)
    // shard by an arbitrary hash, state per (user, shard), merge per user
    val sharded = df.withColumn("shard", pmod(xxhash64(col("d")), lit(4)))
      .groupBy(col("u"), col("shard"))
      .agg(BehavioralFunctions.retention_state(conds(df): _*).as("state"))
      .groupBy("u")
      .agg(BehavioralFunctions.retention_merge(col("state"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    assert(sharded === expected)
    assert(viaRollup(df) === expected)
  }

  test("NULL states (outer-join gaps) contribute nothing; all-NULL group is empty-seen") {
    import spark.implicits._
    val states = Seq[(Long, Option[Long])](
      (1L, Some((1L << 62) | 1L)), (1L, None),
      (2L, None)).toDF("u", "state")
    val out = states.groupBy("u")
      .agg(BehavioralFunctions.retention_merge(col("state"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    assert(out(1L) === Seq(true, false))
    assert(out(2L) === Seq.empty) // no real state ever seen -> empty array
  }

  test("SQL registration path: retention_state/retention_merge compose in pure SQL") {
    BehavioralFunctions.register(spark)
    ev((1L, 1), (1L, 3), (2L, 2)).createOrReplaceTempView("rr_ev")
    val rows = spark.sql(
      """SELECT u, retention_merge(state, 3) AS r FROM (
        |  SELECT u, d, retention_state(d = 1, d = 2, d = 3) AS state
        |  FROM rr_ev GROUP BY u, d)
        |GROUP BY u""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    assert(rows === Map(1L -> Seq(true, false, true),
      2L -> Seq(false, false, false)))
  }

  test("argument validation: condition arity, types, and literal nConds") {
    BehavioralFunctions.register(spark)
    ev((1L, 1)).createOrReplaceTempView("rr_bad")
    val e1 = intercept[Exception](
      spark.sql("SELECT retention_state(d = 1) FROM rr_bad").collect())
    assert(e1.getMessage.contains("2..32"))
    val e2 = intercept[Exception](
      spark.sql("SELECT retention_merge(CAST(d AS BIGINT), d) FROM rr_bad GROUP BY d").collect())
    assert(e2.getMessage.toLowerCase.contains("literal"))
    val e3 = intercept[Exception](
      spark.sql("SELECT retention_state(d, d) FROM rr_bad").collect())
    assert(e3.getMessage.contains("BOOLEAN"))
  }

  test("state survives a parquet round-trip (the rollup-table contract)") {
    val df = ev((1L, 1), (1L, 2), (2L, 3), (3L, 1), (3L, 3))
    val path = graft.sources.Sinks.scratchDir("retention_rollup_spec") + "/rt"
    graft.sources.Sinks.clearDir(path)
    df.groupBy(col("u"), col("d"))
      .agg(BehavioralFunctions.retention_state(conds(df): _*).as("state"))
      .write.mode("overwrite").parquet(path)
    val merged = spark.read.parquet(path).groupBy("u")
      .agg(BehavioralFunctions.retention_merge(col("state"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    assert(merged === direct(df))
  }
}
