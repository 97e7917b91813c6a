package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions
import graft.ops.RollupStore

/** LEASE STRIPING on the grain-partitioned store: maintenance takes one
  * stripe per touched grain, so ops over DISJOINT grain ranges run
  * concurrently — the 100 TB property that a month-long backfill
  * compaction cannot stop the streaming ingest's next append — while
  * OVERLAPPING ranges collide fail-fast on their first shared stripe
  * (never a deadlock: the lease does not block, and a failed
  * acquisition rolls back every stripe already taken). Interleavings
  * are driven deterministically through the `onStep` seam, not sleeps.
  * Also pinned here: the guarded garbage sweep — a paused concurrent
  * op's live stage dir is protected by its stripes, so the other op
  * must not sweep it.
  */
class ConcurrentGrainMaintenanceSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val M = 60L * 1000000
  private val D = 24 * 60 * M
  private val Stale = graft.sources.Sinks.DefaultLeaseStaleMs

  private def ev(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("t"))
  }

  private def conds(df: DataFrame) =
    Seq("a", "b", "c").map(t => df("t") === t)

  private def dayStates(df: DataFrame): DataFrame =
    df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.funnel_state(col("ts"), conds(df): _*).as("state"))

  private def rawAnswer(df: DataFrame): Map[Long, Int] =
    df.groupBy("u")
      .agg(BehavioralFunctions.window_funnel(expr("INTERVAL '1' HOUR"),
        col("ts"), conds(df): _*).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def storeAnswer(base: String): Map[Long, Int] =
    RollupStore.readGrains(spark, base)
      .groupBy("u")
      .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
        col("state")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def fresh(name: String): String = {
    val p = graft.sources.Sinks.scratchDir("concurrent_grain_spec") + s"/$name"
    graft.sources.Sinks.clearDir(p)
    p
  }

  private def fs = new Path("/tmp").getFileSystem(
    spark.sessionState.newHadoopConf())

  /** 4 days, 2 slices per day, deterministic. */
  private def seedRows: Seq[(Long, Long, String)] = {
    val rnd = new scala.util.Random(170217)
    val types = Array("a", "b", "c", "x")
    Seq.fill(260)((rnd.nextInt(8).toLong,
      rnd.nextInt((4 * D / M).toInt).toLong * M,
      types(rnd.nextInt(types.length)))).distinct
  }

  /** Run a range compaction on another thread, paused at its "staged"
    * step until `resume` is released; returns (thread, error holder). */
  private def pausedCompactor(base: String, range: String => Boolean,
      staged: CountDownLatch, resume: CountDownLatch):
      (Thread, () => Option[Throwable]) = {
    @volatile var err: Option[Throwable] = None
    val t = new Thread(() => {
      try RollupStore.compactGrains(spark, base, Seq("u", "day"),
        BehavioralFunctions.funnel_state_combine, "state", range, 2,
        (step: String) => if (step == "staged") {
          staged.countDown()
          assert(resume.await(120, TimeUnit.SECONDS))
        },
        Stale, 0L)
      catch { case e: Throwable => err = Some(e) }
    })
    t.start()
    (t, () => err)
  }

  test("ingest into other grains proceeds while a range compaction is mid-flight") {
    val all = ev(seedRows: _*)
    all.cache().count()
    try {
      val base = fresh("ingest_during_compact")
      val old = all.filter(to_date(col("ts")) < lit("1970-01-03").cast("date"))
      val recent = all.filter(to_date(col("ts")) >= lit("1970-01-03").cast("date"))
      def slice(df: DataFrame, i: Int) =
        df.filter(pmod(xxhash64(col("ts")), lit(2)) === i)
      RollupStore.appendStatesByGrain(dayStates(slice(old, 0)), base,
        Seq("u", "day"), "day")
      RollupStore.appendStatesByGrain(dayStates(slice(old, 1)), base,
        Seq("u", "day"), "day")
      val oldGrains = RollupStore.grainValues(spark, base)

      val staged = new CountDownLatch(1)
      val resume = new CountDownLatch(1)
      val (compactor, err) =
        pausedCompactor(base, _ < "1970-01-03", staged, resume)
      try {
        assert(staged.await(120, TimeUnit.SECONDS), "compactor never staged")
        // the compactor is mid-flight, holding the old grains' stripes
        // and a live .compact- stage dir; an ingest into NEW grains must
        // not wait, fail, or sweep that stage
        assert(RollupStore.appendStatesByGrain(dayStates(recent), base,
          Seq("u", "day"), "day", ingestId = Some("live/1")) > 0,
          "a disjoint-range ingest did not land during the compaction")
        assert(RollupStore.grainValues(spark, base).size > oldGrains.size)
        assert(fs.listStatus(new Path(base)).exists(
          _.getPath.getName.startsWith(".compact-")),
          "the ingest swept the concurrent compaction's live stage dir")
      } finally {
        resume.countDown()
        compactor.join(120000)
      }
      assert(!compactor.isAlive && err().isEmpty,
        s"compactor did not finish cleanly: ${err()}")
      // both ops landed exactly: answer = raw scan over everything
      assert(storeAnswer(base) === rawAnswer(all))
      // old grains folded to one batch each; stage dirs all gone
      assert(RollupStore.liveBatchCount(spark, base) ===
        oldGrains.size + (RollupStore.grainValues(spark, base).size - oldGrains.size))
      assert(!fs.listStatus(new Path(base)).exists(st =>
        st.getPath.getName.startsWith(".compact-") ||
          st.getPath.getName.startsWith(".ingest-")))
    } finally all.unpersist()
  }

  test("two disjoint-range compactions run concurrently; overlap fails fast with stripe rollback") {
    val all = ev(seedRows: _*)
    all.cache().count()
    try {
      val base = fresh("disjoint_compactors")
      def slice(i: Int) = all.filter(pmod(xxhash64(col("ts")), lit(2)) === i)
      RollupStore.appendStatesByGrain(dayStates(slice(0)), base,
        Seq("u", "day"), "day")
      RollupStore.appendStatesByGrain(dayStates(slice(1)), base,
        Seq("u", "day"), "day")
      val grains = RollupStore.grainValues(spark, base)
      assert(grains.size === 4)
      val expected = rawAnswer(all)

      val staged = new CountDownLatch(1)
      val resume = new CountDownLatch(1)
      // A compacts the SECOND half and pauses mid-flight
      val (a, errA) =
        pausedCompactor(base, _ >= grains(2), staged, resume)
      try {
        assert(staged.await(120, TimeUnit.SECONDS), "A never staged")
        // B compacts the FIRST half CONCURRENTLY — disjoint stripes, so
        // it must complete while A is still paused
        assert(RollupStore.compactGrains(spark, base, Seq("u", "day"),
          BehavioralFunctions.funnel_state_combine,
          grains = _ < grains(2), targetPartitions = 2) > 0,
          "a disjoint-range compaction did not run during another")
        // C spans a free grain that SORTS BEFORE one of A's: sorted
        // acquisition takes the free stripe first, then fails fast on
        // A's — and must ROLL BACK the stripe it already held
        val e = intercept[IllegalStateException] {
          RollupStore.compactGrains(spark, base, Seq("u", "day"),
            BehavioralFunctions.funnel_state_combine,
            grains = g => g == grains(0) || g == grains(3))
        }
        assert(e.getMessage.contains("lease"),
          s"overlap failed with an unrelated error: $e")
        val stripes = fs.listStatus(new Path(base)).toSeq
          .map(_.getPath.getName)
          .filter(_.startsWith("_WRITER_LEASE.g-")).toSet
        val aStripes = grains.drop(2).map(g =>
          RollupStore.grainLeasePath(new Path(base), g).getName).toSet
        assert(stripes === aStripes,
          s"failed overlap left stripes beyond the live op's: $stripes")
      } finally {
        resume.countDown()
        a.join(120000)
      }
      assert(!a.isAlive && errA().isEmpty,
        s"A did not finish cleanly: ${errA()}")
      // all stripes released, both folds landed, answers exact
      assert(!fs.listStatus(new Path(base)).exists(
        _.getPath.getName.startsWith("_WRITER_LEASE")))
      assert(RollupStore.liveBatchCount(spark, base) === grains.size)
      assert(storeAnswer(base) === expected)
      // the failed overlap left the store fully retryable
      assert(RollupStore.compactGrains(spark, base, Seq("u", "day"),
        BehavioralFunctions.funnel_state_combine,
        grains = g => g == grains(0) || g == grains(3)) > 0)
      assert(storeAnswer(base) === expected)
    } finally all.unpersist()
  }

  test("a crashed op's STALE stripe does not disable the garbage sweep forever") {
    val base = fresh("stale_stripe")
    val basePath = new Path(base)
    fs.mkdirs(basePath)
    // a long-crashed run left a foreign stripe (no live holder) and a
    // YOUNG hidden stage dir from some other recent crash: with the
    // stripe counted foreign forever, the young stage would be deferred
    // to the staleMs horizon on EVERY future op of this store — the
    // stripe's own age must bound its vote
    val staleStripe = new Path(basePath, "_WRITER_LEASE.g-DEAD")
    val out = fs.create(staleStripe, true)
    try out.write("pid=1\nhost=gone\nstart_ms=0\ntoken=x\n".getBytes("UTF-8"))
    finally out.close()
    fs.setTimes(staleStripe, System.currentTimeMillis() - 2 * 3600 * 1000L, -1)
    fs.mkdirs(new Path(basePath, ".ingest-crashed-young"))
    val rows = ev((1L, 0L, "a"), (1L, 10 * M, "b"))
    assert(RollupStore.appendStatesByGrain(dayStates(rows), base,
      Seq("u", "day"), "day") > 0)
    assert(!fs.exists(new Path(basePath, ".ingest-crashed-young")),
      "a stale foreign stripe blocked the garbage sweep")
    // a FRESH foreign stripe (a live op may own the stage) still guards
    val freshStripe = new Path(basePath, "_WRITER_LEASE.g-LIVE")
    val out2 = fs.create(freshStripe, true)
    try out2.write("pid=1\nhost=live\nstart_ms=0\ntoken=y\n".getBytes("UTF-8"))
    finally out2.close()
    fs.mkdirs(new Path(basePath, ".ingest-live-young"))
    assert(RollupStore.appendStatesByGrain(dayStates(
      ev((2L, D, "a"))), base, Seq("u", "day"), "day") > 0)
    assert(fs.exists(new Path(basePath, ".ingest-live-young")),
      "a fresh foreign stripe no longer guards a possibly-live stage")
    // hygiene
    fs.delete(freshStripe, false)
    fs.delete(new Path(basePath, ".ingest-live-young"), true)
  }

  test("a drop of grains under active maintenance fails fast; a disjoint drop proceeds") {
    val all = ev(seedRows: _*)
    all.cache().count()
    try {
      val base = fresh("drop_during_compact")
      RollupStore.appendStatesByGrain(dayStates(all), base,
        Seq("u", "day"), "day")
      val grains = RollupStore.grainValues(spark, base)
      val staged = new CountDownLatch(1)
      val resume = new CountDownLatch(1)
      val (a, errA) =
        pausedCompactor(base, _ == grains.head, staged, resume)
      try {
        assert(staged.await(120, TimeUnit.SECONDS), "A never staged")
        // dropping the grain A is compacting must not proceed under it
        intercept[IllegalStateException] {
          RollupStore.dropGrainsWhere(spark, base, _ == grains.head)
        }
        // dropping a DISJOINT grain proceeds concurrently
        assert(RollupStore.dropGrainsWhere(spark, base,
          _ == grains.last) === 1)
        assert(!RollupStore.grainValues(spark, base).contains(grains.last))
      } finally {
        resume.countDown()
        a.join(120000)
      }
      assert(!a.isAlive && errA().isEmpty,
        s"A did not finish cleanly: ${errA()}")
      val kept = all.filter(to_date(col("ts")).cast("string") < grains.last)
      assert(storeAnswer(base) === rawAnswer(kept))
    } finally all.unpersist()
  }
}
