package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions

/** The sequence family's merge twins (`sequence_match_merge` /
  * `sequence_count_merge` / `sequence_match_events_merge`) over
  * `funnel_state` partials: ONE state table must answer the raw
  * aggregates' results for any pattern and any regrouping — the
  * family-wide rollup claim q110–q112 pin under the DuckDB hash. This
  * spec pins the algebra (arbitrary shards, patterns incl. adjacency,
  * wildcards, and time constraints), the funnel/sequence state sharing,
  * and the edge cases (invalid pattern, 1-condition states, funnel's own
  * arity bound at merge).
  */
class SequenceRollupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val M = 60L * 1000000

  private def ev(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("t"))
  }

  private def conds(df: DataFrame) =
    Seq("a", "b", "c").map(t => df("t") === t)

  private def states(df: DataFrame, nConds: Int) =
    df.groupBy(col("u"), pmod(xxhash64(col("ts")), lit(4)).as("g"))
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        conds(df).take(nConds): _*).as("state"))

  test("one state table answers the whole behavioral family like the raw scans") {
    val rnd = new scala.util.Random(31415)
    val types = Array("a", "b", "c", "x")
    // timestamps UNIQUE per user: same-ts order is undefined in BOTH paths
    // (the reference's sort_unstable), so a tied fixture would compare two
    // legitimately different answers (StreamingBatchDifferentialSpec's
    // precedent; the driver fixtures have zero (user, ts) ties)
    val rows = Seq.fill(500)((rnd.nextInt(12).toLong,
        rnd.nextInt(4000).toLong * M / 4, types(rnd.nextInt(types.length))))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val df = ev(rows: _*)
    df.cache().count()
    val st = states(df, 3)
    st.cache().count()
    try {
      for (pattern <- Seq("(?1)(?2)", "(?1).*(?2)", "(?1).*(?2).*(?3)",
          "(?1)(?t>=300)(?2)", "(?1)(?t<60)(?2)", "(?2).(?3)")) {
        val rawM = df.groupBy("u").agg(BehavioralFunctions
            .sequence_match(pattern, col("ts"), conds(df): _*).as("m"))
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        val rolM = st.groupBy("u").agg(BehavioralFunctions
            .sequence_match_merge(pattern, col("state")).as("m"))
          .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        assert(rolM === rawM, s"sequence_match diverges for $pattern")
        val rawC = df.groupBy("u").agg(BehavioralFunctions
            .sequence_count(pattern, col("ts"), conds(df): _*).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val rolC = st.groupBy("u").agg(BehavioralFunctions
            .sequence_count_merge(pattern, col("state")).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(rolC === rawC, s"sequence_count diverges for $pattern")
        val rawE = df.groupBy("u").agg(BehavioralFunctions
            .sequence_match_events(pattern, col("ts"), conds(df): _*).as("e"))
          .collect().map(r => r.getLong(0) ->
            r.getSeq[java.sql.Timestamp](1)).toMap
        val rolE = st.groupBy("u").agg(BehavioralFunctions
            .sequence_match_events_merge(pattern, col("state")).as("e"))
          .collect().map(r => r.getLong(0) ->
            r.getSeq[java.sql.Timestamp](1)).toMap
        assert(rolE === rawE, s"sequence_match_events diverges for $pattern")
      }
      // ...and the funnel consumer reads the very same table
      val rawF = df.groupBy("u").agg(BehavioralFunctions
          .window_funnel(expr("INTERVAL '1' HOUR"), col("ts"),
            conds(df): _*).as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val rolF = st.groupBy("u").agg(BehavioralFunctions
          .funnel_merge(expr("INTERVAL '1' HOUR"), col("state")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(rolF === rawF, "window_funnel diverges on the shared table")
    } finally { st.unpersist(); df.unpersist() }
  }

  test("single-condition states serve the sequence family; funnel_merge refuses them") {
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "a"), (1L, 20 * M, "b"),
      (2L, 0L, "b"))
    val st = states(df, 1) // 1 condition: legal for sequence consumers
    val counts = st.groupBy("u").agg(BehavioralFunctions
        .sequence_count_merge("(?1)", col("state")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts === Map(1L -> 2L, 2L -> 0L))
    // window_funnel's own 2..32 bound holds at merge time
    val e = intercept[Exception] {
      st.groupBy("u").agg(BehavioralFunctions
          .funnel_merge(expr("INTERVAL '1' HOUR"), col("state")).as("s"))
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("2..32"),
      s"wrong error: ${e.getMessage}")
  }

  test("(?t) comparators measure across grain boundaries: the previous matched event sits in another partial") {
    val D = 24 * 60 * M
    // each user's a->b adjacency straddles the day edge; gaps bracket the
    // 3600 s threshold: u1 exactly 3600 (>= true, > false), u2 just under,
    // u3 just over. A merge path that measured time WITHIN a partial
    // instead of over the re-sorted union would answer false for all.
    val df = ev(
      (1L, D - 1800 * 1000000L, "a"), (1L, D + 1800 * 1000000L, "b"),
      (2L, D - 1800 * 1000000L, "a"), (2L, D + 1799 * 1000000L, "b"),
      (3L, D - 1800 * 1000000L, "a"), (3L, D + 1801 * 1000000L, "b"))
    val day = df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        df("t") === "a", df("t") === "b").as("state"))
    // and once more through a combine hop — the re-grain must not disturb
    // the elapsed-time arithmetic either
    val combined = day.groupBy("u")
      .agg(BehavioralFunctions.funnel_state_combine(col("state")).as("state"))
    for (st <- Seq(day, combined)) {
      def m(pattern: String): Map[Long, Boolean] = st.groupBy("u")
        .agg(BehavioralFunctions.sequence_match_merge(pattern, col("state")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(m("(?1)(?t>=3600)(?2)") === Map(1L -> true, 2L -> false, 3L -> true))
      assert(m("(?1)(?t>3600)(?2)") === Map(1L -> false, 2L -> false, 3L -> true))
      assert(m("(?1)(?t<=3600)(?2)") === Map(1L -> true, 2L -> true, 3L -> false))
      assert(m("(?1)(?t==3600)(?2)") === Map(1L -> true, 2L -> false, 3L -> false))
    }
  }

  test("invalid pattern yields NULL through the merge path, like the raw aggregate") {
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"))
    val r = states(df, 2).groupBy("u").agg(
        BehavioralFunctions.sequence_match_merge("(?0", col("state")).as("m"),
        BehavioralFunctions.sequence_count_merge("garbage", col("state")).as("n"))
      .collect().head
    assert(r.isNullAt(1) && r.isNullAt(2))
  }
}
