package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions

/** `sequence_next_node`'s merge twins (`next_node_state` /
  * `next_node_merge`): per-grain partials, re-merged with direction and
  * base supplied at merge time, must reproduce the raw aggregate's
  * answer for ALL 8 direction × base combinations — the state keeps
  * every event (any value can be the answer) with its dictionary-encoded
  * value, so the merged buffer is the identical (ts, flags, value)
  * multiset a raw scan would build. q113/q114 pin the rollup path under
  * the DuckDB hash; this spec pins the algebra (arbitrary shards, all
  * combos, chains straddling grain boundaries), the NULL-value and
  * NULL-state rules, the step-count guard, and the wire-size claim.
  */
class NextNodeRollupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val M = 60L * 1000000

  private def ev(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("t"))
  }

  private val directions = Seq("forward", "backward")
  private val bases = Seq("head", "tail", "first_match", "last_match")

  /** baseCond = 'a', steps = ('a', 'b') — the base event must satisfy the
    * first step, as in q08's signup/signup shape. */
  private def rawAgg(df: DataFrame, dir: String, base: String) =
    df.groupBy("u").agg(BehavioralFunctions.sequence_next_node(dir, base,
      col("ts"), col("t"), df("t") === "a",
      df("t") === "a", df("t") === "b").as("v"))

  private def states(df: DataFrame) =
    df.groupBy(col("u"), pmod(xxhash64(col("ts")), lit(4)).as("g"))
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a", df("t") === "b").as("state"))

  test("one state table answers all 8 direction x base combos like the raw scan") {
    val rnd = new scala.util.Random(27182)
    val types = Array("a", "b", "c", "x")
    // timestamps UNIQUE per user — same-ts order is undefined in both
    // paths (SequenceRollupSpec's precedent; driver fixtures are tie-free)
    val rows = Seq.fill(600)((rnd.nextInt(15).toLong,
        rnd.nextInt(5000).toLong * M / 4, types(rnd.nextInt(types.length))))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val df = ev(rows: _*)
    df.cache().count()
    val st = states(df)
    st.cache().count()
    try {
      for (dir <- directions; base <- bases) {
        val raw = rawAgg(df, dir, base)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        val rolled = st.groupBy("u")
          .agg(BehavioralFunctions.next_node_merge(dir, base, col("state")).as("v"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(rolled === raw, s"next_node rollup diverges for ($dir, $base)")
      }
    } finally { df.unpersist(); st.unpersist() }
  }

  test("chains and their adjacent answer survive a day-grain boundary") {
    val D = 24 * 60 * M
    // user 1: a(day0 23:58) -> b(day1 00:01) -> c(day1 00:03): the chain
    // spans the grain edge and the answer ('c') sits in the later shard
    val df = ev((1L, D - 2 * M, "a"), (1L, D + M, "b"), (1L, D + 3 * M, "c"))
    val st = df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a", df("t") === "b").as("state"))
    val got = st.groupBy("u")
      .agg(BehavioralFunctions.next_node_merge("forward", "head", col("state")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "c"))
    // backward/tail from the same two partials: value BEFORE the earliest
    // matched event — base 'b'-chain ... use steps built above: backward
    // tail base='a' chain (a) then predecessor is none for user 1's first
    // event; merge answers the raw aggregate's null
    val raw = rawAgg(df, "backward", "tail")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    val rolled = st.groupBy("u")
      .agg(BehavioralFunctions.next_node_merge("backward", "tail", col("state")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rolled === raw)
  }

  test("NULL values ride the rollup: a NULL-valued next node answers NULL, like raw") {
    import spark.implicits._
    // next node after the chain has a NULL value
    val df = Seq((1L, 0L, Some("a")), (1L, 10 * M, Some("b")),
        (1L, 20 * M, None: Option[String]))
      .toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("t"))
    val st = df.groupBy(col("u"))
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a", df("t") === "b").as("state"))
    val got = st.groupBy("u")
      .agg(BehavioralFunctions.next_node_merge("forward", "head", col("state")).as("v"))
      .collect()
    assert(got.length == 1 && got(0).isNullAt(1))
  }

  test("NULL-ts rows are skipped at state time, like the raw aggregate") {
    import spark.implicits._
    // a NULL-ts row kept by mistake would surface at epoch 0 — i.e. as
    // the PREDECESSOR of the earliest real event, which backward/head
    // reads; raw semantics skip it, so the answer must stay NULL
    val df = Seq((1L, Some(10 * M), "a"), (1L, Some(20 * M), "b"),
        (1L, None: Option[Long], "c"), (1L, Some(30 * M), "x"))
      .toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("t"))
    val st = df.groupBy("u")
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a").as("state"))
    def merged(dir: String, base: String) = st.groupBy("u")
      .agg(BehavioralFunctions.next_node_merge(dir, base, col("state")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(merged("forward", "head") === Map(1L -> Some("b")))
    assert(merged("backward", "head") === Map(1L -> None))
  }

  test("NULL states contribute nothing; a group with none answers NULL") {
    import spark.implicits._
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"), (1L, 20 * M, "c"))
    val st = df.groupBy("u")
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a", df("t") === "b").as("state"))
    val withNull = st.unionByName(
      Seq(2L).toDF("u").withColumn("state", lit(null).cast("binary")))
    val merged = withNull.groupBy("u")
      .agg(BehavioralFunctions.next_node_merge("forward", "head", col("state")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(merged === Map(1L -> Some("c"), 2L -> None))
  }

  test("states built with different step counts fail loudly, not garbage") {
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"))
    val one = df.groupBy("u")
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a").as("state"))
    val two = df.groupBy("u")
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "a", df("t") === "a", df("t") === "b").as("state"))
    val mixed = one.unionByName(two)
    val err = intercept[Exception] {
      mixed.groupBy("u")
        .agg(BehavioralFunctions.next_node_merge("forward", "head", col("state")).as("v"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("different step-condition counts")))
  }

  test("the wire size is 12 + 20/event + each distinct value once") {
    // 5 events over 2 distinct values ("aaaa" len 4, "bb" len 2): partial =
    // 4 (step hdr) + 4 (n) + 5*20 + 4 (poolN) + (4+4) + (4+2) = 126 bytes —
    // value bytes paid per DISTINCT value, not per event
    val df = ev((1L, 0L, "aaaa"), (1L, M, "bb"), (1L, 2 * M, "aaaa"),
      (1L, 3 * M, "bb"), (1L, 4 * M, "aaaa"))
    val bytes = df.groupBy("u")
      .agg(BehavioralFunctions.next_node_state(col("ts"), col("t"),
        df("t") === "aaaa", df("t") === "aaaa").as("state"))
      .collect()(0).getAs[Array[Byte]](1)
    assert(bytes.length === 126, s"got ${bytes.length}")
  }

  test("SQL path: the twins resolve through the registry like the rest of the family") {
    BehavioralFunctions.register(spark)
    val df = ev((1L, 0L, "a"), (1L, 10 * M, "b"), (1L, 20 * M, "c"))
    df.createOrReplaceTempView("nn_ev")
    val got = spark.sql(
      """SELECT u, next_node_merge('forward', 'head', state) AS v
        |FROM (SELECT u, next_node_state(ts, t, t = 'a', t = 'a', t = 'b') AS state
        |      FROM nn_ev GROUP BY u, to_date(ts))
        |GROUP BY u""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "c"))
  }
}
