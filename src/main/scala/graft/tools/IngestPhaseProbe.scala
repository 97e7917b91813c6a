package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions
import graft.{ops, sources}

/** Temporary measurement probe: per-onStep timing inside ONE grained
  * ingest + one flat append + one flat compact, to locate where the
  * 2.3 s of appendStatesByGrain actually goes. */
object IngestPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = sources.Tables.load(spark, sfDir, "events").cache()
    ev.count()

    def states(i: Int) = ev
      .filter(pmod(xxhash64(col("ts")), lit(2)) === i)
      .groupBy(col("user_id"),
        date_trunc("week", col("ts")).cast("date").as("week"))
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        col("event_type") === "view",
        col("event_type") === "click",
        col("event_type") === "purchase").as("state"))

    def flatStates(i: Int) = ev
      .filter(pmod(xxhash64(col("ts")), lit(2)) === i)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        col("event_type") === "view",
        col("event_type") === "click",
        col("event_type") === "purchase").as("state"))

    for (rep <- 1 to 3) {
      println(s"== rep $rep ==")
      val base = sources.Sinks.scratchDir("ingest_probe") + s"/store$rep"
      var t0 = System.nanoTime()
      def step(name: String): Unit = {
        val t1 = System.nanoTime()
        println(f"[probe] grained $name%-16s +${(t1 - t0) / 1e9}%7.3f s")
        t0 = t1
      }
      ops.RollupStore.appendStatesByGrain(states(0), base,
        Seq("user_id", "week"), "week", "state", None, step,
        graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
      step("TOTAL-END")

      val fbase = sources.Sinks.scratchDir("ingest_probe") + s"/flat$rep"
      t0 = System.nanoTime()
      def fstep(name: String): Unit = {
        val t1 = System.nanoTime()
        println(f"[probe] flat    $name%-16s +${(t1 - t0) / 1e9}%7.3f s")
        t0 = t1
      }
      ops.RollupStore.appendStates(flatStates(0), fbase,
        Seq("user_id", "day"), "state", None, fstep,
        graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
      fstep("TOTAL-END")
      t0 = System.nanoTime()
      ops.RollupStore.appendStates(flatStates(1), fbase,
        Seq("user_id", "day"), "state", None, fstep,
        graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
      fstep("TOTAL-END2")
      t0 = System.nanoTime()
      ops.RollupStore.compact(spark, fbase, Seq("user_id", "day"),
        BehavioralFunctions.funnel_state_combine, "state", 8, fstep,
        graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
      fstep("COMPACT-END")
    }
    spark.stop()
  }
}
