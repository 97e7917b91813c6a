package graft

import graft.behavioral.{EventBuf, FunnelMode, FunnelScan}
import org.scalatest.funsuite.AnyFunSuite

/** Boundary cases ported from the reference's mutation-killing unit tests:
  * 32-condition bit boundaries (reference src/common/event.rs:326-331),
  * extreme i64 timestamps (src/common/event.rs:363-371), and the arity
  * limits the FFI enforces per overload.
  */
class BoundarySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("retention accepts exactly 32 conditions; bit 31 is preserved") {
    val conds = (1 to 32).map(i => if (i == 1 || i == 32) "true" else "false")
      .mkString(", ")
    val got = spark.sql(s"SELECT retention($conds) FROM VALUES (1) AS t(x)")
      .collect()(0).getSeq[Boolean](0)
    assert(got.length === 32)
    assert(got.head === true)
    assert(got(31) === true)   // anchor && cond32 — exercises bit 31
    assert(got(1) === false)
  }

  test("33 conditions is an analysis error, not silent wraparound") {
    val conds = (1 to 33).map(_ => "true").mkString(", ")
    val e = intercept[Exception] {
      spark.sql(s"SELECT retention($conds) FROM VALUES (1) AS t(x)").collect()
    }
    assert(e.getMessage.contains("32"), e.getMessage)
  }

  test("window_funnel with 32 conditions reaches step 32") {
    val conds = (1 to 32).map(i => s"s = $i").mkString(", ")
    val rows = (1 to 32).map(i => s"(TIMESTAMP '2024-01-01 00:00:${i.formatted("%02d")}', $i)")
      .mkString(", ")
    val got = spark.sql(
      s"""SELECT window_funnel(INTERVAL '1' HOUR, ts, $conds)
         |FROM VALUES $rows AS t(ts, s)""".stripMargin).collect()(0).getInt(0)
    assert(got === 32)
  }

  test("window_funnel with 33 conditions is an analysis error") {
    val conds = (1 to 33).map(i => s"s = $i").mkString(", ")
    val e = intercept[Exception] {
      spark.sql(
        s"""SELECT window_funnel(INTERVAL '1' HOUR, ts, $conds)
           |FROM VALUES (TIMESTAMP '2024-01-01 00:00:00', 1) AS t(ts, s)""".stripMargin)
        .collect()
    }
    assert(e.getMessage.contains("32"), e.getMessage)
  }

  test("non-boolean condition is an analysis error with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT retention(x) FROM VALUES (1) AS t(x)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("boolean"), e.getMessage)
  }

  test("extreme i64 timestamps sort and scan without overflow surprises") {
    // reference sorts extreme timestamps correctly (src/common/event.rs:363-371);
    // FunnelScan's window check subtracts, so probe the extremes directly
    val b = EventBuf.empty()
    b.append(Long.MaxValue - 1, 1)
    b.append(Long.MinValue + 1, 1)
    b.append(0L, 2)
    b.sortByTs()
    assert(b.ts(0) === Long.MinValue + 1 && b.ts(2) === Long.MaxValue - 1)
    // entry at MinValue+1; window of 1h: next event is far outside → step 1
    val s = FunnelScan.maxStep(b, 3600L * 1000000, FunnelMode.Default, 2)
    assert(s === 1)
  }

  test("sequence functions: 32-condition pattern indexes parse and match") {
    val conds = (1 to 32).map(i => s"s = $i").mkString(", ")
    val got = spark.sql(
      s"""SELECT sequence_match('(?32)', ts, $conds)
         |FROM VALUES (TIMESTAMP '2024-01-01 00:00:00', 32) AS t(ts, s)""".stripMargin)
      .collect()(0).getBoolean(0)
    assert(got === true)
  }

  test("pattern referencing condition 33 never matches (out of bitmask range)") {
    val got = spark.sql(
      """SELECT sequence_match('(?33)', ts, s = 1)
        |FROM VALUES (TIMESTAMP '2024-01-01 00:00:00', 1) AS t(ts, s)""".stripMargin)
      .collect()(0)
    // (?33) parses (valid syntax) but can never match a 32-bit mask
    assert(got.getBoolean(0) === false)
  }

  test("sequence_next_node value NULL propagates (src/ffi/sequence_next_node.rs:140-144)") {
    val got = spark.sql(
      """SELECT sequence_next_node('forward', 'head', ts, v, c, c) FROM VALUES
        |  (TIMESTAMP '2024-01-01 00:00:00', 'a', true),
        |  (TIMESTAMP '2024-01-01 00:01:00', CAST(NULL AS STRING), false)
        |AS t(ts, v, c)""".stripMargin).collect()(0)
    assert(got.isNullAt(0)) // next node exists but its value is NULL → NULL
  }
}

class SkewSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("hot-key group: one user with 100k events among 100k singleton users") {
    import org.apache.spark.sql.functions._
    // hot user 0 alternates view/click/purchase every second; everyone else
    // has a single view event
    val hot = spark.range(100000).select(
      lit(0L).as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 1000000L).as("ts"),
      element_at(array(lit("view"), lit("click"), lit("purchase")),
        (col("id") % 3 + 1).cast("int")).as("event_type"))
    val cold = spark.range(1, 100001).select(
      col("id").as("user_id"),
      timestamp_micros(lit(1704067200000000L) + col("id")).as("ts"),
      lit("view").as("event_type"))
    hot.union(cold).createOrReplaceTempView("skewed")
    val got = spark.sql(
      """SELECT user_id, window_funnel(INTERVAL '1' HOUR, ts,
        |  event_type='view', event_type='click', event_type='purchase') AS s
        |FROM skewed GROUP BY user_id""".stripMargin)
    val rows = got.collect()
    assert(rows.length === 100001)
    val byUser = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byUser(0L) === 3)          // hot key completes the funnel
    assert(byUser(1L) === 1)          // singletons reach step 1 only
    assert(rows.count(_.getInt(1) == 1) === 100000)
  }
}

/** Tests written to kill the survivors of tools/mutation.py's first run
  * (MUTATION.md): each pins a boundary the rest of the net missed.
  */
class MutationKillSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("EX1: non-overlapping NFA count resumes AFTER the match end, not at it") {
    // e1 matches only (?1); e2 matches BOTH conditions; e3 matches only
    // (?2). Correct resume (end+1) lands on e3, which cannot start a new
    // match -> count 1. A resume AT the match end would re-use e2 as a new
    // (?1) and pair it with e3 -> count 2. (?t>=0) forces the NFA path.
    val got = spark.sql(
      """SELECT sequence_count('(?1)(?t>=0)(?2)', ts, c1, c2) FROM VALUES
        |  (TIMESTAMP '2024-01-01 00:00:00', true,  false),
        |  (TIMESTAMP '2024-01-01 00:00:10', true,  true),
        |  (TIMESTAMP '2024-01-01 00:00:20', false, true)
        |AS t(ts, c1, c2)""".stripMargin).collect()(0).getLong(0)
    assert(got === 1L)
  }

  test("PA3: (?t<=N) is inclusive at exactly N seconds") {
    val got = spark.sql(
      """SELECT sequence_match('(?1)(?t<=600)(?2)', ts, c1, c2) FROM VALUES
        |  (TIMESTAMP '2024-01-01 00:00:00', true,  false),
        |  (TIMESTAMP '2024-01-01 00:10:00', false, true)
        |AS t(ts, c1, c2)""".stripMargin).collect()(0).getBoolean(0)
    assert(got === true, "elapsed == threshold must satisfy <=")
  }

  test("FU1: funnel window is inclusive at exactly entry + window") {
    // second step lands exactly one hour after the entry: reference breaks
    // only on STRICTLY greater than the window, so step 2 is reached
    val got = spark.sql(
      """SELECT window_funnel(INTERVAL '1' HOUR, ts, c1, c2) FROM VALUES
        |  (TIMESTAMP '2024-01-01 00:00:00', true,  false),
        |  (TIMESTAMP '2024-01-01 01:00:00', false, true)
        |AS t(ts, c1, c2)""".stripMargin).collect()(0).getInt(0)
    assert(got === 2)
  }

  test("SE2: a NULL-ts row must not clobber the last-timestamp state") {
    // seq ordering places the NULL-ts row BETWEEN two events 10s apart
    // (well inside the 30-minute gap). Correct state update carries the
    // last REAL timestamp across the NULL row, so the third row stays in
    // session 1. A mutant that overwrites last-ts with the (null) current
    // value makes the next row look like a partition start -> session 2.
    val got = spark.sql(
      """SELECT seq, sessionize(ts, INTERVAL '30' MINUTE)
        |         OVER (ORDER BY seq) AS sess FROM VALUES
        |  (1, TIMESTAMP '2024-01-01 00:00:00'),
        |  (2, CAST(NULL AS TIMESTAMP)),
        |  (3, TIMESTAMP '2024-01-01 00:00:10')
        |AS t(seq, ts) ORDER BY seq""".stripMargin).collect()
    assert(got(0).getLong(1) === 1L)
    assert(got(1).isNullAt(1), "NULL-ts row must emit NULL")
    assert(got(2).getLong(1) === 1L,
      "row after a NULL-ts row must still compare against the last real ts")
  }

  test("FU2: strict mode advances when the re-fired condition also matches the next step") {
    // e1 matches cond1 (entry); e2 matches cond1 AGAIN and cond2. Plain
    // strict would break on the re-fire, but the reference's exception
    // advances when the same event also satisfies the next condition.
    val got = spark.sql(
      """SELECT window_funnel(INTERVAL '1' HOUR, 'strict', ts, c1, c2) FROM VALUES
        |  (TIMESTAMP '2024-01-01 00:00:00', true, false),
        |  (TIMESTAMP '2024-01-01 00:10:00', true, true)
        |AS t(ts, c1, c2)""".stripMargin).collect()(0).getInt(0)
    assert(got === 2)
  }
}
