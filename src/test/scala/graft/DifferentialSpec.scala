package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential testing: every custom aggregate vs an independent
  * formulation built only from Spark built-ins, over randomized fixtures.
  * The two computations share nothing but the input DataFrame, so
  * agreement across random data is strong evidence for both the state
  * machines and the update/merge/serialize plumbing.
  */
class DifferentialSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  /** Deterministic pseudo-random events: n rows, u users, distinct µs
    * timestamps, event types a/b/c/d. */
  private def mkEvents(seed: Int, n: Int = 2000, u: Int = 37): Unit = {
    val rnd = new scala.util.Random(seed)
    import spark.implicits._
    val rows = (0 until n).map { i =>
      (rnd.nextInt(u).toLong,
        new java.sql.Timestamp(1704067200000L + i * 1000L + rnd.nextInt(999)),
        "abcd".charAt(rnd.nextInt(4)).toString)
    }
    rows.toDF("user_id", "ts", "et").createOrReplaceTempView("diff_events")
  }

  test("sessionize == lag/sum built-in formulation on random data") {
    for (seed <- 1 to 5) {
      mkEvents(seed)
      val got = spark.sql(
        """SELECT user_id, ts, sessionize(ts, INTERVAL '10' MINUTE)
          |         OVER (PARTITION BY user_id ORDER BY ts) AS sid
          |FROM diff_events""".stripMargin)
      val ref = spark.sql(
        """WITH l AS (SELECT user_id, ts,
          |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          |           FROM diff_events)
          |SELECT user_id, ts,
          |  sum(CASE WHEN prev IS NULL
          |             OR unix_micros(ts) - unix_micros(prev) > 600000000
          |           THEN 1 ELSE 0 END)
          |    OVER (PARTITION BY user_id ORDER BY ts
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          |FROM l""".stripMargin)
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty, s"seed=$seed")
    }
  }

  test("retention == bool_or formulation on random data") {
    for (seed <- 6 to 10) {
      mkEvents(seed)
      val got = spark.sql(
        """SELECT user_id, retention(et = 'a', et = 'b', et = 'c') AS r
          |FROM diff_events GROUP BY user_id""".stripMargin)
        .select(col("user_id"), get(col("r"), lit(0)).as("r0"),
          get(col("r"), lit(1)).as("r1"), get(col("r"), lit(2)).as("r2"))
      val ref = spark.sql(
        """SELECT user_id, bool_or(et = 'a') AS r0,
          |  bool_or(et = 'a') AND bool_or(et = 'b') AS r1,
          |  bool_or(et = 'a') AND bool_or(et = 'c') AS r2
          |FROM diff_events GROUP BY user_id""".stripMargin)
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty, s"seed=$seed")
    }
  }

  test("sequence_match '(?1).*(?2)' == min/max subsequence formulation") {
    for (seed <- 11 to 15) {
      mkEvents(seed)
      val got = spark.sql(
        """SELECT user_id, sequence_match('(?1).*(?2)', ts, et = 'a', et = 'd') AS m
          |FROM diff_events GROUP BY user_id""".stripMargin)
      val ref = spark.sql(
        """SELECT user_id,
          |  min(CASE WHEN et = 'a' THEN ts END) IS NOT NULL
          |  AND max(CASE WHEN et = 'd' THEN ts END) IS NOT NULL
          |  AND min(CASE WHEN et = 'a' THEN ts END)
          |    < max(CASE WHEN et = 'd' THEN ts END) AS m
          |FROM diff_events GROUP BY user_id""".stripMargin)
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty, s"seed=$seed")
    }
  }

  test("sequence_count '(?1)' == conditional count on random data") {
    for (seed <- 16 to 20) {
      mkEvents(seed)
      val got = spark.sql(
        """SELECT user_id, sequence_count('(?1)', ts, et = 'b') AS n
          |FROM diff_events GROUP BY user_id""".stripMargin)
      val ref = spark.sql(
        """SELECT user_id, sum(CASE WHEN et = 'b' THEN 1L ELSE 0L END) AS n
          |FROM diff_events GROUP BY user_id""".stripMargin)
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty, s"seed=$seed")
    }
  }

  test("default-mode window_funnel == cascade-join formulation on random data") {
    for (seed <- 21 to 23) {
      mkEvents(seed, n = 1000, u = 23)
      val got = spark.sql(
        """SELECT user_id, window_funnel(INTERVAL '5' MINUTE, ts,
          |  et = 'a', et = 'b', et = 'c') AS s
          |FROM diff_events GROUP BY user_id""".stripMargin)
      val ref = spark.sql(
        """WITH e AS (SELECT user_id, unix_micros(ts) AS t, et FROM diff_events),
          |u AS (SELECT DISTINCT user_id FROM e),
          |en AS (SELECT user_id, t AS t1 FROM e WHERE et = 'a'),
          |c2 AS (SELECT en.user_id, en.t1, min(x.t) AS t2 FROM en
          |       LEFT JOIN e x ON x.user_id = en.user_id AND x.et = 'b'
          |         AND x.t > en.t1 AND x.t <= en.t1 + 300000000
          |       GROUP BY en.user_id, en.t1),
          |c3 AS (SELECT c2.user_id, c2.t1, c2.t2, min(x.t) AS t3 FROM c2
          |       LEFT JOIN e x ON x.user_id = c2.user_id AND x.et = 'c'
          |         AND c2.t2 IS NOT NULL AND x.t > c2.t2 AND x.t <= c2.t1 + 300000000
          |       GROUP BY c2.user_id, c2.t1, c2.t2),
          |s AS (SELECT user_id, max(CASE WHEN t3 IS NOT NULL THEN 3
          |                              WHEN t2 IS NOT NULL THEN 2 ELSE 1 END) AS s
          |      FROM c3 GROUP BY user_id)
          |SELECT u.user_id, CAST(coalesce(s.s, 0) AS INT) AS s
          |FROM u LEFT JOIN s ON u.user_id = s.user_id""".stripMargin)
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty, s"seed=$seed")
    }
  }
}
