package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions

/** The mergeable funnel split (`funnel_state` + `funnel_merge`): folding
  * partials over ANY regrouping — per-day rollup, arbitrary shards, an
  * outer join's NULL states — must reproduce `window_funnel`'s raw-scan
  * answer for EVERY window and mode, because the merged buffer is the
  * identical event multiset (the reference's own combine is the same
  * in-place extend, `src/window_funnel.rs:285-303`). q108/q109 pin the
  * rollup path under the DuckDB hash; this spec pins the algebra, the
  * merge-time window/mode freedom, and the edge cases.
  */
class FunnelRollupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val H = 3600L * 1000000 // an hour in micros
  private val M = 60L * 1000000

  /** (user, tsMicros, type) event stream; conditions are type a/b/c. */
  private def ev(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("t"))
  }

  private def conds(df: DataFrame) =
    Seq("a", "b", "c").map(t => df("t") === t)

  private def direct(df: DataFrame, window: String = "INTERVAL '1' HOUR",
      mode: Option[String] = None): Map[Long, Int] =
    df.groupBy("u").agg((mode match {
      case Some(m) => BehavioralFunctions.window_funnel(expr(window), m,
        col("ts"), conds(df): _*)
      case None => BehavioralFunctions.window_funnel(expr(window),
        col("ts"), conds(df): _*)
    }).as("steps")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def viaRollup(df: DataFrame, grain: org.apache.spark.sql.Column,
      window: String = "INTERVAL '1' HOUR",
      mode: Option[String] = None): Map[Long, Int] =
    df.groupBy(col("u"), grain.as("g"))
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
      .groupBy("u")
      .agg((mode match {
        case Some(m) => BehavioralFunctions.funnel_merge(expr(window), m, col("state"))
        case None => BehavioralFunctions.funnel_merge(expr(window), col("state"))
      }).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("per-day rollup merge equals the raw-scan window_funnel, chains across the grain included") {
    val df = ev(
      // user 1: a then b then c inside an hour, but SPLIT across two days
      // (a at 23:30, b at 23:50, c at 00:10 next day) — the partials must
      // recombine or the boundary chain is lost
      (1L, 23 * H + 30 * M, "a"), (1L, 23 * H + 50 * M, "b"),
      (1L, 24 * H + 10 * M, "c"),
      // user 2: full chain, but spread over 3 h -> window stops it at 2
      (2L, 0L, "a"), (2L, 30 * M, "b"), (2L, 3 * H, "c"),
      // user 3: only the entry; user 4: b/c but never the entry -> 0
      (3L, 0L, "a"), (4L, 0L, "b"), (4L, 10 * M, "c"))
    val byDay = to_date(col("ts"))
    assert(viaRollup(df, byDay) === direct(df))
    assert(direct(df) === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("randomized: any sharding merges to the raw answer, for every mode") {
    val rnd = new scala.util.Random(271828)
    val types = Array("a", "b", "c", "x")
    val rows = Seq.fill(600)((rnd.nextInt(15).toLong,
      rnd.nextInt(5000).toLong * M / 3, types(rnd.nextInt(types.length))))
    val df = ev(rows.distinct: _*)
    df.cache().count()
    try {
      for (mode <- Seq(None, Some("strict"), Some("strict_order"),
          Some("strict_increase"), Some("strict_once"), Some("allow_reentry"),
          Some("timestamp_dedup"), Some("strict, strict_once"))) {
        // worst-case regrouping: shards cut ACROSS time (hash of ts), so
        // every chain interleaves shards
        val sharded = viaRollup(df, pmod(xxhash64(col("ts")), lit(5)),
          mode = mode)
        assert(sharded === direct(df, mode = mode),
          s"sharded rollup diverges for mode $mode")
      }
    } finally df.unpersist()
  }

  test("window and mode are merge-time choices: one state table serves them all") {
    val df = ev((1L, 0L, "a"), (1L, 40 * M, "b"), (1L, 90 * M, "c"),
      (2L, 0L, "a"), (2L, 1 * M, "a"), (2L, 2 * M, "b"), (2L, 3 * M, "c"))
    val states = df.groupBy(col("u"), to_date(col("ts")).as("g"))
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
    states.cache().count()
    try {
      for ((window, mode) <- Seq(
          ("INTERVAL '1' HOUR", None), ("INTERVAL '2' HOUR", None),
          ("INTERVAL '30' MINUTE", None), ("INTERVAL '1' HOUR", Some("strict")))) {
        val merged = states.groupBy("u")
          .agg((mode match {
            case Some(m) => BehavioralFunctions.funnel_merge(expr(window), m, col("state"))
            case None => BehavioralFunctions.funnel_merge(expr(window), col("state"))
          }).as("steps"))
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(merged === direct(df, window, mode),
          s"merge-time ($window, $mode) diverges from the raw scan")
      }
    } finally states.unpersist()
  }

  test("NULL states contribute nothing; a group with none answers 0 like an empty funnel") {
    import spark.implicits._
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"))
    val states = df.groupBy("u")
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
    // outer-join shape: user 2 exists only with a NULL state
    val withNull = states.unionByName(
      Seq(2L).toDF("u").withColumn("state", lit(null).cast("binary")))
    val merged = withNull.groupBy("u")
      .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
        col("state")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged === Map(1L -> 2, 2L -> 0))
  }

  test("states built with different condition counts fail loudly, not garbage") {
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"), (1L, 20 * M, "c"))
    val two = df.groupBy("u")
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        df("t") === "a", df("t") === "b").as("state"))
    val three = df.groupBy("u")
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
    val e = intercept[Exception] {
      two.unionByName(three).groupBy("u")
        .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
          col("state")).as("steps"))
        .collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("condition counts"),
      s"wrong error: ${e.getMessage}")
  }

  test("no-condition events are pre-filtered out of the partial (the size trade is real)") {
    // 1 condition event + many noise events: the partial's byte size must
    // reflect the FILTERED count (4-byte header + 4-byte count + 12/event)
    val noise = (1 to 100).map(i => (1L, i * M, "x"))
    val df = ev(Seq((1L, 0L, "a"), (1L, 5 * M, "b")) ++ noise: _*)
    val state = df.groupBy("u")
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))
      .collect().head.getAs[Array[Byte]]("state")
    assert(state.length === 4 + 4 + 2 * 12,
      s"partial carries noise events: ${state.length} bytes")
  }
}
