package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scenario corpus ported from the reference's git-repository-mining suite
  * (reference test/sql/git_mining.test, 7 scenarios grounded in MSR/ICSE
  * papers) — exercises every behavioral function on realistic shapes with
  * the reference's exact golden outputs.
  */
class GitMiningSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def fixtures(): Unit = {
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW git_commits AS SELECT author,
        |  CAST(commit_time AS TIMESTAMP) commit_time, lines_changed, is_bug_fix
        |FROM VALUES
        |  ('alice', '2024-03-15 09:00:00', 45,  false),
        |  ('alice', '2024-03-15 09:45:00', 12,  false),
        |  ('alice', '2024-03-15 10:30:00', 8,   false),
        |  ('alice', '2024-03-15 16:00:00', 520, false),
        |  ('alice', '2024-03-15 16:30:00', 15,  true),
        |  ('bob',   '2024-03-15 14:00:00', 30,  false),
        |  ('bob',   '2024-03-15 14:20:00', 200, false),
        |  ('bob',   '2024-03-16 10:00:00', 600, false),
        |  ('bob',   '2024-03-16 11:00:00', 5,   true)
        |AS t(author, commit_time, lines_changed, is_bug_fix)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW pr_events AS SELECT pr_id, author,
        |  CAST(event_time AS TIMESTAMP) event_time, event_type FROM VALUES
        |  (1001, 'alice', '2024-03-15 10:00:00', 'pr_opened'),
        |  (1001, 'bob',   '2024-03-15 14:30:00', 'first_review'),
        |  (1001, 'carol', '2024-03-16 09:00:00', 'approved'),
        |  (1001, 'alice', '2024-03-16 10:00:00', 'merged'),
        |  (1002, 'bob',   '2024-03-15 11:00:00', 'pr_opened'),
        |  (1002, 'alice', '2024-03-15 11:30:00', 'first_review'),
        |  (1002, 'carol', '2024-03-15 12:00:00', 'approved'),
        |  (1002, 'bob',   '2024-03-15 12:15:00', 'merged'),
        |  (1003, 'carol', '2024-03-17 08:00:00', 'pr_opened')
        |AS t(pr_id, author, event_time, event_type)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW file_changes AS SELECT author,
        |  CAST(commit_time AS TIMESTAMP) commit_time, file_path FROM VALUES
        |  ('alice', '2024-03-15 09:00:00', 'src/parser.rs'),
        |  ('alice', '2024-03-15 09:01:00', 'src/executor.rs'),
        |  ('alice', '2024-03-15 09:02:00', 'tests/parser_test.rs'),
        |  ('bob',   '2024-03-15 14:00:00', 'src/parser.rs'),
        |  ('bob',   '2024-03-15 14:01:00', 'src/ast.rs'),
        |  ('carol', '2024-03-16 10:00:00', 'src/main.rs'),
        |  ('carol', '2024-03-16 10:01:00', 'src/config.rs')
        |AS t(author, commit_time, file_path)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW ci_events AS SELECT author,
        |  CAST(event_time AS TIMESTAMP) event_time, event_type FROM VALUES
        |  ('alice', '2024-03-15 09:00:00', 'push'),
        |  ('alice', '2024-03-15 09:05:00', 'ci_success'),
        |  ('bob',   '2024-03-15 14:00:00', 'push'),
        |  ('bob',   '2024-03-15 14:10:00', 'ci_failure'),
        |  ('bob',   '2024-03-15 14:30:00', 'push'),
        |  ('bob',   '2024-03-15 14:40:00', 'ci_success'),
        |  ('bob',   '2024-03-16 10:00:00', 'push'),
        |  ('bob',   '2024-03-16 10:15:00', 'ci_failure'),
        |  ('bob',   '2024-03-16 10:45:00', 'push'),
        |  ('bob',   '2024-03-16 10:55:00', 'ci_success')
        |AS t(author, event_time, event_type)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW developer_activity AS SELECT * FROM VALUES
        |  ('alice', 1, 1), ('alice', 1, 2), ('alice', 1, 3),
        |  ('bob',   1, 1), ('bob',   1, 2),
        |  ('carol', 2, 2), ('carol', 2, 3), ('carol', 2, 4)
        |AS t(author, first_month, active_month)""".stripMargin)
  }

  test("GIT-1 work sessions: 4h-gap sessionize (git_mining.test:85-102)") {
    fixtures()
    val got = spark.sql(
      """SELECT author, sessionize(commit_time, INTERVAL '4' HOUR)
        |         OVER (PARTITION BY author ORDER BY commit_time) AS s
        |FROM git_commits ORDER BY author, commit_time""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("alice", 1L), ("alice", 1L), ("alice", 1L), ("alice", 2L),
      ("alice", 2L), ("bob", 1L), ("bob", 1L), ("bob", 2L), ("bob", 2L)))
  }

  test("GIT-2 contributor retention cohorts (git_mining.test:106-123)") {
    fixtures()
    val got = spark.sql(
      """SELECT author, retention(active_month = first_month,
        |    active_month = first_month + 1, active_month = first_month + 2,
        |    active_month = first_month + 3) AS r
        |FROM developer_activity GROUP BY author ORDER BY author""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Boolean](1)).toMap
    assert(got("alice") === Seq(true, true, true, false))
    assert(got("bob") === Seq(true, true, false, false))
    assert(got("carol") === Seq(true, true, true, false))
  }

  test("GIT-3 large-commit-then-bugfix pattern with 7-day time bound (git_mining.test:127-147)") {
    fixtures()
    val got = spark.sql(
      """SELECT author, sequence_match('(?1)(?t<=604800)(?2)', commit_time,
        |    lines_changed > 500, is_bug_fix) AS m
        |FROM git_commits GROUP BY author ORDER BY author""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === Map("alice" -> true, "bob" -> true))
  }

  test("GIT-4 CI fail-fix cycles: push->failure->push count (git_mining.test:151-170)") {
    fixtures()
    val got = spark.sql(
      """SELECT author, sequence_count('(?1)(?2)(?3)', event_time,
        |    event_type = 'push', event_type = 'ci_failure', event_type = 'push') AS c
        |FROM ci_events GROUP BY author ORDER BY author""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("alice" -> 0L, "bob" -> 2L))
  }

  test("GIT-5 PR lifecycle funnel, 24h window (git_mining.test:174-196)") {
    fixtures()
    val got = spark.sql(
      """SELECT author, window_funnel(INTERVAL '24' HOUR, event_time,
        |    event_type = 'pr_opened', event_type = 'first_review',
        |    event_type = 'approved', event_type = 'merged') AS s
        |FROM pr_events GROUP BY author ORDER BY author""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("alice" -> 2, "bob" -> 2, "carol" -> 1))
  }

  test("GIT-6 PR review-to-merge timestamps (git_mining.test:200-219)") {
    fixtures()
    val got = spark.sql(
      """SELECT pr_id, sequence_match_events('(?1)(?2)(?3)(?4)', event_time,
        |    event_type = 'pr_opened', event_type = 'first_review',
        |    event_type = 'approved', event_type = 'merged') AS ts
        |FROM pr_events GROUP BY pr_id ORDER BY pr_id""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[java.sql.Timestamp](1).map(_.toString)).toMap
    assert(got(1001) === Seq("2024-03-15 10:00:00.0", "2024-03-15 14:30:00.0",
      "2024-03-16 09:00:00.0", "2024-03-16 10:00:00.0"))
    assert(got(1002) === Seq("2024-03-15 11:00:00.0", "2024-03-15 11:30:00.0",
      "2024-03-15 12:00:00.0", "2024-03-15 12:15:00.0"))
    assert(got(1003) === Seq.empty)
  }

  test("GIT-7 logical coupling: file changed after src/parser.rs (git_mining.test:223-241)") {
    fixtures()
    val got = spark.sql(
      """SELECT author, sequence_next_node('forward', 'first_match',
        |    commit_time, file_path,
        |    file_path = 'src/parser.rs', file_path = 'src/parser.rs') AS nxt
        |FROM file_changes GROUP BY author ORDER BY author""".stripMargin)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got === Map("alice" -> "src/executor.rs", "bob" -> "src/ast.rs",
      "carol" -> null))
  }
}
