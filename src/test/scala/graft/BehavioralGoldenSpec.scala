package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden-output suites ported from the reference's sqllogictests
  * (reference test/sql directory) — these validate end-to-end SQL
  * registration + merge paths, not just the state machines
  * (the reference's LESSONS.md: unit tests alone passed while the extension
  * was completely broken).
  */
class SessionizeGoldenSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def fixture(): Unit = spark.sql(
    """CREATE OR REPLACE TEMP VIEW session_events AS
      |SELECT CAST(ts AS TIMESTAMP) ts, user_id FROM VALUES
      |  ('2024-01-01 00:00:00', 1), ('2024-01-01 00:05:00', 1),
      |  ('2024-01-01 00:10:00', 1), ('2024-01-01 02:00:00', 1),
      |  ('2024-01-01 02:05:00', 1) AS t(ts, user_id)""".stripMargin)

  test("basic sessionize: 30 minute gap (test/sql/sessionize.test:20-28)") {
    fixture()
    val got = spark.sql(
      """SELECT sessionize(ts, INTERVAL '30' MINUTE) OVER (ORDER BY ts) AS session_id
        |FROM session_events ORDER BY ts""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 1L, 1L, 2L, 2L))
  }

  test("sessionize with partition (test/sql/sessionize.test:31-40)") {
    fixture()
    val got = spark.sql(
      """SELECT sessionize(ts, INTERVAL '30' MINUTE)
        |         OVER (PARTITION BY user_id ORDER BY ts) AS session_id
        |FROM session_events ORDER BY user_id, ts""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 1L, 1L, 2L, 2L))
  }

  test("single event is session 1 (test/sql/sessionize.test:43-47)") {
    val got = spark.sql(
      """SELECT sessionize(ts, INTERVAL '1' HOUR) OVER (ORDER BY ts) AS session_id
        |FROM (SELECT TIMESTAMP '2024-01-01 00:00:00' AS ts)""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("NULL ts row outputs NULL, neighbors unaffected (test/sql/sessionize.test:49-57)") {
    val got = spark.sql(
      """SELECT ts, sessionize(ts, INTERVAL '30' MINUTE) OVER (ORDER BY ts) AS session_id
        |FROM VALUES (TIMESTAMP '2024-01-01 00:00:00'), (CAST(NULL AS TIMESTAMP)),
        |            (TIMESTAMP '2024-01-01 00:05:00') AS t(ts)""".stripMargin)
      .collect().map(r => (Option(r.get(0)).map(_.toString), if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(got(Some("2024-01-01 00:00:00.0")) === 1L)
    assert(got(Some("2024-01-01 00:05:00.0")) === 1L)
    assert(got(None) === null)
  }

  test("gap exactly equal to threshold stays in session (src/sessionize.rs:188-204)") {
    val got = spark.sql(
      """SELECT sessionize(ts, INTERVAL '5' MINUTE) OVER (ORDER BY ts) AS session_id
        |FROM VALUES (TIMESTAMP '2024-01-01 00:00:00'), (TIMESTAMP '2024-01-01 00:05:00'),
        |            (TIMESTAMP '2024-01-01 00:10:01') AS t(ts)""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 1L, 2L))
  }

  test("DataFrame API parity") {
    import graft.behavioral.BehavioralFunctions._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    fixture()
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val got = spark.table("session_events")
      .withColumn("sid", sessionize(col("ts"), expr("INTERVAL '30' MINUTE")).over(w))
      .orderBy("ts").collect().map(_.getAs[Long]("sid")).toSeq
    assert(got === Seq(1L, 1L, 1L, 2L, 2L))
  }
}

class RetentionGoldenSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def fixture(): Unit = spark.sql(
    """CREATE OR REPLACE TEMP VIEW user_actions AS
      |SELECT user_id, CAST(day AS DATE) day, action FROM VALUES
      |  (1, '2024-01-01', 'signup'), (1, '2024-01-02', 'login'),
      |  (1, '2024-01-03', 'purchase'), (2, '2024-01-01', 'signup'),
      |  (2, '2024-01-03', 'login'), (3, '2024-01-01', 'signup')
      |AS t(user_id, day, action)""".stripMargin)

  private def flags(userId: Int, conds: String): Seq[Boolean] = {
    fixture()
    spark.sql(s"SELECT retention($conds) AS r FROM user_actions WHERE user_id = $userId")
      .collect()(0).getSeq[Boolean](0)
  }

  private val threeDay =
    "day = '2024-01-01', day = '2024-01-02', day = '2024-01-03'"

  test("user 1: active all three days (test/sql/retention.test:21-29)") {
    assert(flags(1, threeDay) === Seq(true, true, true))
  }
  test("user 2: missed day 2 (test/sql/retention.test:31-39)") {
    assert(flags(2, threeDay) === Seq(true, false, true))
  }
  test("user 3: day 1 only (test/sql/retention.test:41-49)") {
    assert(flags(3, threeDay) === Seq(true, false, false))
  }
  test("anchor never true -> all false (test/sql/retention.test:51-56)") {
    assert(flags(1, "day = '2024-01-05', day = '2024-01-02'") === Seq(false, false))
  }
  test("empty group -> empty array (test/sql/retention.test:58-62)") {
    fixture()
    val got = spark.sql("SELECT retention(true, false) AS r FROM user_actions WHERE 1=0")
      .collect()(0).getSeq[Boolean](0)
    assert(got === Seq.empty)
  }
  test("NULL conditions are false (src/ffi/retention.rs:84-86)") {
    val got = spark.sql(
      """SELECT retention(c1, c2) AS r FROM VALUES
        |  (true, CAST(NULL AS BOOLEAN)) AS t(c1, c2)""".stripMargin)
      .collect()(0).getSeq[Boolean](0)
    assert(got === Seq(true, false))
  }
}

class WindowFunnelGoldenSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def fixture(): Unit = spark.sql(
    """CREATE OR REPLACE TEMP VIEW funnel_events AS
      |SELECT user_id, CAST(ts AS TIMESTAMP) ts, event FROM VALUES
      |  (1, '2024-01-01 00:00:00', 'view'), (1, '2024-01-01 00:05:00', 'cart'),
      |  (1, '2024-01-01 00:10:00', 'purchase'), (2, '2024-01-01 00:00:00', 'view'),
      |  (2, '2024-01-01 00:05:00', 'cart'), (3, '2024-01-01 00:00:00', 'view'),
      |  (3, '2024-01-01 05:00:00', 'cart') AS t(user_id, ts, event)""".stripMargin)

  private def funnel(interval: String, mode: String = null): Map[Int, Int] = {
    fixture()
    val m = if (mode == null) "" else s"'$mode',"
    spark.sql(
      s"""SELECT user_id, window_funnel(INTERVAL $interval, $m ts,
         |  event = 'view', event = 'cart', event = 'purchase') AS steps
         |FROM funnel_events GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
  }

  test("basic 3-step funnel, 1 hour window (test/sql/window_funnel.test:21-35)") {
    assert(funnel("'1' HOUR") === Map(1 -> 3, 2 -> 2, 3 -> 1))
  }
  test("30 minute window (test/sql/window_funnel.test:37-50)") {
    assert(funnel("'30' MINUTE") === Map(1 -> 3, 2 -> 2, 3 -> 1))
  }
  test("no matching first step -> 0 (test/sql/window_funnel.test:52-60)") {
    fixture()
    val got = spark.sql(
      """SELECT window_funnel(INTERVAL '1' HOUR, ts, event = 'nonexistent', event = 'cart')
        |FROM funnel_events WHERE user_id = 1""".stripMargin).collect()(0).getInt(0)
    assert(got === 0)
  }
  test("empty group -> 0 (test/sql/window_funnel.test:76-84)") {
    fixture()
    val got = spark.sql(
      """SELECT window_funnel(INTERVAL '1' HOUR, ts, event = 'view', event = 'cart')
        |FROM funnel_events WHERE 1=0""".stripMargin).collect()(0).getInt(0)
    assert(got === 0)
  }
  test("all six golden mode strings (test/sql/window_funnel.test:62-175)") {
    for (mode <- Seq("strict_increase", "strict", "strict_order",
        "strict_deduplication", "strict_once", "allow_reentry")) {
      assert(funnel("'1' HOUR", mode) === Map(1 -> 3, 2 -> 2, 3 -> 1), s"mode=$mode")
    }
  }

  // -- mode-divergence cases (ported from src/window_funnel.rs unit tests) --

  private def funnelOf(mode: String, rows: String, nConds: Int = 3): Int = {
    val conds = (1 to nConds).map(i => s"c$i").mkString(", ")
    val cols = (1 to nConds).map(i => s"c$i").mkString(", ")
    val m = if (mode == null) "" else s"'$mode',"
    spark.sql(
      s"""SELECT window_funnel(INTERVAL '1' HOUR, $m CAST(ts AS TIMESTAMP), $conds)
         |FROM (SELECT * FROM VALUES $rows AS t(ts, $cols))""".stripMargin)
      .collect()(0).getInt(0)
  }

  test("default mode: one event can advance multiple consecutive steps") {
    val rows =
      "('2024-01-01 00:00:00', true, false, false), ('2024-01-01 00:01:00', false, true, true)"
    assert(funnelOf(null, rows) === 3)
    assert(funnelOf("strict_once", rows) === 2)
  }

  test("strict: re-firing the previous condition breaks the chain") {
    // view, cart, cart(re-fire), purchase: default reaches 3, strict breaks at 2
    val rows =
      """('2024-01-01 00:00:00', true, false, false),
        |('2024-01-01 00:01:00', false, true, false),
        |('2024-01-01 00:02:00', false, true, false),
        |('2024-01-01 00:03:00', false, false, true)""".stripMargin
    assert(funnelOf(null, rows) === 3)
    assert(funnelOf("strict", rows) === 2)
  }

  test("strict_order: an earlier condition firing between steps ends the scan") {
    // view, cart, view(earlier cond re-fires), purchase
    val rows =
      """('2024-01-01 00:00:00', true, false, false),
        |('2024-01-01 00:01:00', false, true, false),
        |('2024-01-01 00:02:00', true, false, false),
        |('2024-01-01 00:03:00', false, false, true)""".stripMargin
    assert(funnelOf(null, rows) === 3)
    assert(funnelOf("strict_order", rows) === 2)
  }

  test("timestamp_dedup: same-ts event cannot advance") {
    val rows =
      "('2024-01-01 00:00:00', true, false, false), ('2024-01-01 00:00:00', false, true, false)"
    assert(funnelOf(null, rows) === 2)
    assert(funnelOf("timestamp_dedup", rows) === 1)
    assert(funnelOf("strict_increase", rows) === 1)
  }

  test("allow_reentry: entry mid-chain resets to step 1") {
    val rows =
      """('2024-01-01 00:00:00', true, false, false),
        |('2024-01-01 00:01:00', false, true, false),
        |('2024-01-01 00:02:00', true, false, false),
        |('2024-01-01 00:03:00', false, false, true)""".stripMargin
    assert(funnelOf(null, rows) === 3)
    assert(funnelOf("allow_reentry", rows) === 1)
  }

  test("combined modes parse comma-separated") {
    val rows =
      "('2024-01-01 00:00:00', true, false, false), ('2024-01-01 00:01:00', false, true, true)"
    assert(funnelOf("strict_increase, strict_once", rows) === 2)
  }

  test("window measured from the chain's FIRST event") {
    // entry at 00:00, window 1h: cart at 00:50 ok, purchase at 01:10 outside
    val rows =
      """('2024-01-01 00:00:00', true, false, false),
        |('2024-01-01 00:50:00', false, true, false),
        |('2024-01-01 01:10:00', false, false, true)""".stripMargin
    assert(funnelOf(null, rows) === 2)
  }

  test("NULL ts rows skipped; NULL conditions false") {
    val rows =
      """('2024-01-01 00:00:00', true, false, false),
        |(CAST(NULL AS STRING), false, true, false),
        |('2024-01-01 00:05:00', false, CAST(NULL AS BOOLEAN), true)""".stripMargin
    assert(funnelOf(null, rows) === 1) // null-ts cart skipped; null cond false, purchase can't fire at step 1
  }
}

class SequenceGoldenSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def fixture(): Unit = spark.sql(
    """CREATE OR REPLACE TEMP VIEW click_events AS
      |SELECT user_id, CAST(ts AS TIMESTAMP) ts, is_view, is_cart, is_purchase FROM VALUES
      |  (1, '2024-01-01 00:00:00', true, false, false),
      |  (1, '2024-01-01 00:05:00', false, true, false),
      |  (1, '2024-01-01 00:10:00', false, false, true),
      |  (2, '2024-01-01 00:00:00', true, false, false),
      |  (2, '2024-01-01 00:05:00', true, false, false),
      |  (3, '2024-01-01 00:00:00', true, false, false),
      |  (3, '2024-01-01 00:05:00', false, false, true)
      |AS t(user_id, ts, is_view, is_cart, is_purchase)""".stripMargin)

  private def seqFn(fn: String, pattern: String): Map[Int, Any] = {
    fixture()
    spark.sql(
      s"""SELECT user_id, $fn('$pattern', ts, is_view, is_cart, is_purchase) AS r
         |FROM click_events GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
  }

  test("sequence_match adjacent (test/sql/sequence_match.test:22-35)") {
    assert(seqFn("sequence_match", "(?1)(?2)(?3)") === Map(1 -> true, 2 -> false, 3 -> false))
  }
  test("sequence_match wildcard (test/sql/sequence_match.test:37-50)") {
    assert(seqFn("sequence_match", "(?1).*(?3)") === Map(1 -> true, 2 -> false, 3 -> true))
  }
  test("sequence_count (test/sql/sequence_match.test:52-65)") {
    assert(seqFn("sequence_count", "(?1).*(?3)") === Map(1 -> 1L, 2 -> 0L, 3 -> 1L))
  }
  test("five one-hot conditions (test/sql/sequence_match.test:67-85)") {
    val got = spark.sql(
      """SELECT sequence_match('(?1)(?2)(?3)(?4)(?5)', CAST(ts AS TIMESTAMP), c1, c2, c3, c4, c5)
        |FROM VALUES
        |  ('2024-01-01 00:00:00', true, false, false, false, false),
        |  ('2024-01-01 00:01:00', false, true, false, false, false),
        |  ('2024-01-01 00:02:00', false, false, true, false, false),
        |  ('2024-01-01 00:03:00', false, false, false, true, false),
        |  ('2024-01-01 00:04:00', false, false, false, false, true)
        |AS t(ts, c1, c2, c3, c4, c5)""".stripMargin).collect()(0).getBoolean(0)
    assert(got === true)
  }
  test("invalid pattern -> NULL, not an error (src/ffi/sequence.rs:108-112)") {
    fixture()
    val rows = spark.sql(
      """SELECT sequence_match('(?0)', ts, is_view) AS m,
        |       sequence_count('garbage', ts, is_view) AS c
        |FROM click_events""".stripMargin).collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1))
  }
  test("all-false-condition events are invisible to patterns (src/sequence.rs:72-76)") {
    // the middle event carries no true conditions -> dropped, so (?1)(?2) is adjacent
    val got = spark.sql(
      """SELECT sequence_match('(?1)(?2)', CAST(ts AS TIMESTAMP), c1, c2) FROM VALUES
        |  ('2024-01-01 00:00:00', true, false),
        |  ('2024-01-01 00:01:00', false, false),
        |  ('2024-01-01 00:02:00', false, true) AS t(ts, c1, c2)""".stripMargin)
      .collect()(0).getBoolean(0)
    assert(got === true)
  }

  test("sequence_match_events golden (test/sql/sequence_match_events.test:20-32)") {
    val got = spark.sql(
      """SELECT user_id, sequence_match_events('(?1)(?2)(?3)', CAST(ts AS TIMESTAMP), c1, c2, c3) AS r
        |FROM VALUES
        |  (1, '2024-01-01 00:00:00', true, false, false),
        |  (1, '2024-01-01 00:05:00', false, true, false),
        |  (1, '2024-01-01 00:10:00', false, false, true),
        |  (2, '2024-01-01 00:00:00', true, false, false),
        |  (2, '2024-01-01 00:05:00', true, false, false)
        |AS t(user_id, ts, c1, c2, c3) GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[java.sql.Timestamp](1).map(_.toString)).toMap
    assert(got(1) === Seq("2024-01-01 00:00:00.0", "2024-01-01 00:05:00.0", "2024-01-01 00:10:00.0"))
    assert(got(2) === Seq.empty)
  }
}

class SequenceNextNodeGoldenSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def fixture(): Unit = spark.sql(
    """CREATE OR REPLACE TEMP VIEW page_events AS
      |SELECT user_id, CAST(ts AS TIMESTAMP) ts, page, is_home, is_product, is_cart FROM VALUES
      |  (1, '2024-01-01 00:00:00', 'home', true, false, false),
      |  (1, '2024-01-01 00:01:00', 'product', false, true, false),
      |  (1, '2024-01-01 00:02:00', 'cart', false, false, true),
      |  (1, '2024-01-01 00:03:00', 'checkout', false, false, false),
      |  (2, '2024-01-01 00:00:00', 'home', true, false, false),
      |  (2, '2024-01-01 00:01:00', 'search', false, false, false),
      |  (2, '2024-01-01 00:02:00', 'product', false, true, false)
      |AS t(user_id, ts, page, is_home, is_product, is_cart)""".stripMargin)

  private def nn(direction: String, base: String, conds: String): Map[Int, String] = {
    fixture()
    spark.sql(
      s"""SELECT user_id, sequence_next_node('$direction', '$base', ts, page, $conds) AS r
         |FROM page_events GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
  }

  test("forward/first_match single step (test:23-37)") {
    assert(nn("forward", "first_match", "is_home, is_home") === Map(1 -> "product", 2 -> "search"))
  }
  test("forward/first_match two steps home->product (test:39-55)") {
    assert(nn("forward", "first_match", "is_home, is_home, is_product") === Map(1 -> "cart", 2 -> null))
  }
  test("backward/first_match (test:57-71)") {
    assert(nn("backward", "first_match", "is_product, is_product") === Map(1 -> "home", 2 -> "search"))
  }
  test("forward/head (test:73-87)") {
    assert(nn("forward", "head", "is_home, is_home") === Map(1 -> "product", 2 -> "search"))
  }
  test("forward/tail (test:89-103)") {
    assert(nn("forward", "tail", "is_home, is_home") === Map(1 -> "product", 2 -> "search"))
  }
  test("forward/last_match (test:105-119)") {
    assert(nn("forward", "last_match", "is_home, is_home") === Map(1 -> "product", 2 -> "search"))
  }
  test("backward/tail (test:121-135)") {
    assert(nn("backward", "tail", "is_product, is_product") === Map(1 -> "home", 2 -> "search"))
  }
  test("backward/head (test:137-151)") {
    assert(nn("backward", "head", "is_product, is_product") === Map(1 -> "home", 2 -> "search"))
  }
  test("backward/last_match (test:153-166)") {
    assert(nn("backward", "last_match", "is_product, is_product") === Map(1 -> "home", 2 -> "search"))
  }
  test("direction and base are case-insensitive (src/sequence_next_node.rs:164-184)") {
    assert(nn("Forward", "FIRST_MATCH", "is_home, is_home") === Map(1 -> "product", 2 -> "search"))
  }
  test("no adjacent event -> NULL (chain ends at last event)") {
    // user 1: match is_cart at 00:02 -> next is checkout; full-chain-to-end case:
    fixture()
    val got = spark.sql(
      """SELECT user_id, sequence_next_node('forward', 'first_match', ts, page,
        |  page = 'checkout', page = 'checkout') AS r
        |FROM page_events WHERE user_id = 1 GROUP BY user_id""".stripMargin)
      .collect()(0)
    assert(got.isNullAt(1))
  }
}
