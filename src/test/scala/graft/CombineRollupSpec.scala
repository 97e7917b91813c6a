package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions

/** The STATE-TO-STATE combine twins (`funnel_state_combine` /
  * `next_node_state_combine`): folding fine-grain partials into
  * coarser-grain partials of the SAME wire format must leave every
  * downstream consumer's answer untouched — combine is multiset union
  * over the event buffer, so any combine tree (day → week → user,
  * arbitrary shards, repeated combines) yields the multiset a raw scan
  * would build. q115/q116 pin the re-grain path under the DuckDB hash;
  * this spec pins the algebra, the NULL-group eval (NULL, not a
  * placeholder that would trip the consumers' count guard), the
  * mismatch intercept, the dictionary-pool re-intern, and the SQL
  * registration path.
  */
class CombineRollupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val H = 3600L * 1000000
  private val M = 60L * 1000000
  private val D = 24 * 60 * M

  private def ev(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("t"))
  }

  private def conds(df: DataFrame) =
    Seq("a", "b", "c").map(t => df("t") === t)

  // ---- funnel_state_combine ---------------------------------------------

  test("re-grain day -> week: combined states merge to the raw-scan answer, every mode") {
    val rnd = new scala.util.Random(314159)
    val types = Array("a", "b", "c", "x")
    val rows = Seq.fill(600)((rnd.nextInt(12).toLong,
      rnd.nextInt(20000).toLong * M / 3, types(rnd.nextInt(types.length))))
    val df = ev(rows.distinct: _*)
    df.cache().count()
    val day = df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
    // the re-grain: day partials fold to week partials WITHOUT the raw log
    val week = day.groupBy(col("u"), weekofyear(col("day")).as("wk"))
      .agg(BehavioralFunctions.funnel_state_combine(col("state")).as("state"))
    week.cache().count()
    try {
      for (mode <- Seq(None, Some("strict"), Some("strict_order"),
          Some("strict_increase"), Some("strict_once"), Some("allow_reentry"),
          Some("timestamp_dedup"), Some("strict, strict_once"))) {
        def merge(states: DataFrame): Map[Long, Int] = states.groupBy("u")
          .agg((mode match {
            case Some(m) =>
              BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"), m, col("state"))
            case None =>
              BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"), col("state"))
          }).as("steps"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        val raw = df.groupBy("u").agg((mode match {
          case Some(m) => BehavioralFunctions.window_funnel(
            expr("INTERVAL '1' HOUR"), m, col("ts"), conds(df): _*)
          case None => BehavioralFunctions.window_funnel(
            expr("INTERVAL '1' HOUR"), col("ts"), conds(df): _*)
        }).as("steps")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(merge(week) === raw, s"week-grain combine diverges for mode $mode")
        assert(merge(day) === raw, s"day-grain control diverges for mode $mode")
      }
    } finally { df.unpersist(); week.unpersist() }
  }

  test("combine is associative: combining twice equals combining once") {
    val df = ev(
      (1L, D - 2 * M, "a"), (1L, D + M, "b"), (1L, D + 3 * M, "c"),
      (2L, 0L, "a"), (2L, 30 * M, "b"), (2L, 3 * H, "c"),
      (3L, 0L, "b"), (3L, 10 * M, "c"))
    // worst-case sharding: 8 shards cut across time
    val sharded = df.groupBy(col("u"), pmod(xxhash64(col("ts")), lit(8)).as("g"))
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
    // one hop: 8 shards -> user
    val oneHop = sharded.groupBy("u")
      .agg(BehavioralFunctions.funnel_state_combine(col("state")).as("state"))
    // two hops: 8 shards -> 2 super-shards -> user
    val twoHop = sharded
      .groupBy(col("u"), pmod(col("g"), lit(2)).as("g2"))
      .agg(BehavioralFunctions.funnel_state_combine(col("state")).as("state"))
      .groupBy("u")
      .agg(BehavioralFunctions.funnel_state_combine(col("state")).as("state"))
    def answer(states: DataFrame): Map[Long, Int] = states.groupBy("u")
      .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
        col("state")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val raw = df.groupBy("u")
      .agg(BehavioralFunctions.window_funnel(expr("INTERVAL '1' HOUR"),
        col("ts"), conds(df): _*).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(answer(oneHop) === raw)
    assert(answer(twoHop) === raw)
  }

  test("combined funnel states still serve the sequence family (one table, one algebra)") {
    val df = ev(
      (1L, 0L, "a"), (1L, D + M, "x"), (1L, 2 * D, "b"),
      (2L, 0L, "b"), (2L, M, "a"))
    val day = df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        df("t") === "a", df("t") === "b").as("state"))
    val user = day.groupBy("u")
      .agg(BehavioralFunctions.funnel_state_combine(col("state")).as("state"))
    val matched = user.groupBy("u")
      .agg(BehavioralFunctions.sequence_match_merge("(?1).*(?2)", col("state")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(matched === Map(1L -> true, 2L -> false))
    val counted = user.groupBy("u")
      .agg(BehavioralFunctions.sequence_count_merge("(?1)", col("state")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counted === Map(1L -> 1L, 2L -> 1L))
  }

  test("funnel combine: NULL states contribute nothing; an all-NULL group yields NULL, which merge treats as an empty funnel") {
    import spark.implicits._
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"))
    val states = df.groupBy(col("u"))
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
      // user 2 exists only with NULL states (an outer join's shape)
      .unionByName(Seq(2L, 2L).toDF("u")
        .withColumn("state", lit(null).cast("binary")))
    val combined = states.groupBy("u")
      .agg(BehavioralFunctions.funnel_state_combine(col("state")).as("state"))
    val rows = combined.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows === Map(1L -> false, 2L -> true),
      "all-NULL group must combine to NULL, not a placeholder state")
    // and the NULL combined state flows through funnel_merge as 0 steps
    val merged = combined.groupBy("u")
      .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
        col("state")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged === Map(1L -> 2, 2L -> 0))
  }

  test("funnel combine: states built with different condition counts fail loudly") {
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"), (1L, 20 * M, "c"))
    val two = df.groupBy("u")
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        df("t") === "a", df("t") === "b").as("state"))
    val three = df.groupBy("u")
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
    val e = intercept[Exception] {
      two.unionByName(three).groupBy("u")
        .agg(BehavioralFunctions.funnel_state_combine(col("state")).as("state"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("condition counts")
        && m.contains("funnel_state_combine")),
      s"wrong error: ${msgs(e).mkString(" | ")}")
  }

  test("funnel combine output is the exact wire format: header + unioned events, no growth") {
    // two day-partials of 2 and 3 condition events combine to 4+4+5*12
    val df = ev((1L, 0L, "a"), (1L, 5 * M, "b"),
      (1L, D, "a"), (1L, D + M, "b"), (1L, D + 2 * M, "c"),
      (1L, D + 3 * M, "x")) // noise: already dropped at state time
    val combined = df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
      .groupBy("u")
      .agg(BehavioralFunctions.funnel_state_combine(col("state")).as("state"))
      .collect().head.getAs[Array[Byte]]("state")
    assert(combined.length === 4 + 4 + 5 * 12, s"got ${combined.length}")
  }

  // ---- next_node_state_combine ------------------------------------------

  private val directions = Seq("forward", "backward")
  private val bases = Seq("head", "tail", "first_match", "last_match")

  test("next-node re-grain: combined states answer all 8 direction x base combos like the raw scan") {
    val rnd = new scala.util.Random(161803)
    val types = Array("a", "b", "c", "x")
    // tie-free per user: same-ts order is undefined in both paths
    val rows = Seq.fill(600)((rnd.nextInt(12).toLong,
        rnd.nextInt(20000).toLong * M / 4, types(rnd.nextInt(types.length))))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val df = ev(rows: _*)
    df.cache().count()
    val day = df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a", df("t") === "b").as("state"))
    val week = day.groupBy(col("u"), weekofyear(col("day")).as("wk"))
      .agg(BehavioralFunctions.next_node_state_combine(col("state")).as("state"))
    week.cache().count()
    try {
      for (dir <- directions; base <- bases) {
        val raw = df.groupBy("u")
          .agg(BehavioralFunctions.sequence_next_node(dir, base,
            col("ts"), col("t"), df("t") === "a",
            df("t") === "a", df("t") === "b").as("v"))
          .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
        val rolled = week.groupBy("u")
          .agg(BehavioralFunctions.next_node_merge(dir, base, col("state")).as("v"))
          .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
        assert(rolled === raw, s"combined next-node rollup diverges for ($dir, $base)")
      }
    } finally { df.unpersist(); week.unpersist() }
  }

  test("next-node combine re-interns the dictionary pool: a shared value's bytes appear once") {
    // two day-partials both carrying value "aaaa" (1 event each) combine to
    // 4 (step hdr) + 4 (n) + 2*20 + 4 (poolN) + (4+4) = 60 bytes — the
    // pool entry is shared after the remap, not duplicated
    val df = ev((1L, 0L, "aaaa"), (1L, D, "aaaa"))
    val combined = df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "aaaa", df("t") === "aaaa").as("state"))
      .groupBy("u")
      .agg(BehavioralFunctions.next_node_state_combine(col("state")).as("state"))
      .collect().head.getAs[Array[Byte]]("state")
    assert(combined.length === 4 + 4 + 2 * 20 + 4 + 8,
      s"pool entry duplicated across combined partials: ${combined.length} bytes")
  }

  test("next-node combine: NULL states contribute nothing; an all-NULL group yields NULL; merge answers NULL") {
    import spark.implicits._
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"), (1L, 20 * M, "c"))
    val states = df.groupBy("u")
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a", df("t") === "b").as("state"))
      .unionByName(Seq(2L, 2L).toDF("u")
        .withColumn("state", lit(null).cast("binary")))
    val combined = states.groupBy("u")
      .agg(BehavioralFunctions.next_node_state_combine(col("state")).as("state"))
    val nulls = combined.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(nulls === Map(1L -> false, 2L -> true))
    val merged = combined.groupBy("u")
      .agg(BehavioralFunctions.next_node_merge("forward", "head", col("state")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(merged === Map(1L -> Some("c"), 2L -> None))
  }

  test("next-node combine: states built with different step counts fail loudly") {
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"))
    val one = df.groupBy("u")
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a").as("state"))
    val two = df.groupBy("u")
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a", df("t") === "b").as("state"))
    val e = intercept[Exception] {
      one.unionByName(two).groupBy("u")
        .agg(BehavioralFunctions.next_node_state_combine(col("state")).as("state"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("different step-condition counts")
        && m.contains("next_node_state_combine")),
      s"wrong error: ${msgs(e).mkString(" | ")}")
  }

  // ---- retention_state_combine ------------------------------------------

  test("retention re-grain: combined day states merge to the raw-scan retention, any sharding") {
    val rnd = new scala.util.Random(662607)
    val types = Array("a", "b", "c", "x")
    val rows = Seq.fill(500)((rnd.nextInt(12).toLong,
      rnd.nextInt(20000).toLong * M, types(rnd.nextInt(types.length)))).distinct
    val df = ev(rows: _*)
    // anchor = saw 'a', then 'b', then 'c' (retention's cohort shape)
    val cs = conds(df)
    val raw = df.groupBy("u")
      .agg(BehavioralFunctions.retention(cs: _*).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    val combined = df.groupBy(col("u"), pmod(xxhash64(col("ts")), lit(5)).as("g"))
      .agg(BehavioralFunctions.retention_state(cs: _*).as("state"))
      .groupBy(col("u"), pmod(col("g"), lit(2)).as("g2")) // two combine hops
      .agg(BehavioralFunctions.retention_state_combine(col("state")).as("state"))
      .groupBy("u")
      .agg(BehavioralFunctions.retention_state_combine(col("state")).as("state"))
      .groupBy("u")
      .agg(BehavioralFunctions.retention_merge(col("state"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    assert(combined === raw)
  }

  test("retention combine: NULL states contribute nothing; an all-NULL group yields NULL") {
    import spark.implicits._
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"))
    val states = df.groupBy("u")
      .agg(BehavioralFunctions.retention_state(conds(df): _*).as("state"))
      .unionByName(Seq(2L, 2L).toDF("u")
        .withColumn("state", lit(null).cast("long")))
    val combined = states.groupBy("u")
      .agg(BehavioralFunctions.retention_state_combine(col("state")).as("state"))
    val nulls = combined.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(nulls === Map(1L -> false, 2L -> true),
      "all-NULL group must combine to NULL, not a zero-bit state")
    // the NULL combined state flows through retention_merge as an absent row
    val merged = combined.groupBy("u")
      .agg(BehavioralFunctions.retention_merge(col("state"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    assert(merged(1L) === Seq(true, true, false))
    assert(merged(2L) === Seq.empty, "empty group must answer [] like retention")
  }

  test("SQL path: both combines resolve through the registry") {
    BehavioralFunctions.register(spark)
    val df = ev((1L, D - 2 * M, "a"), (1L, D + M, "b"), (1L, D + 3 * M, "c"))
    df.createOrReplaceTempView("cmb_ev")
    val funnel = spark.sql(
      """SELECT u, funnel_merge(INTERVAL '1' HOUR, state) AS steps
        |FROM (SELECT u, funnel_state_combine(state) AS state
        |      FROM (SELECT u, funnel_state(ts, t = 'a', t = 'b', t = 'c') AS state
        |            FROM cmb_ev GROUP BY u, to_date(ts))
        |      GROUP BY u)
        |GROUP BY u""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(funnel === Map(1L -> 3))
    val nn = spark.sql(
      """SELECT u, next_node_merge('forward', 'head', state) AS v
        |FROM (SELECT u, next_node_state_combine(state) AS state
        |      FROM (SELECT u, next_node_state(ts, t, t = 'a', t = 'a', t = 'b') AS state
        |            FROM cmb_ev GROUP BY u, to_date(ts))
        |      GROUP BY u)
        |GROUP BY u""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nn === Map(1L -> "c"))
    val ret = spark.sql(
      """SELECT u, retention_merge(state, 2) AS r
        |FROM (SELECT u, retention_state_combine(state) AS state
        |      FROM (SELECT u, retention_state(t = 'a', t = 'b') AS state
        |            FROM cmb_ev GROUP BY u, to_date(ts))
        |      GROUP BY u)
        |GROUP BY u""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Boolean](1)).toMap
    assert(ret === Map(1L -> Seq(true, true)))
  }
}
