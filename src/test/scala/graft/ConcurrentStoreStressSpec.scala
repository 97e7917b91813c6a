package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions
import graft.ops.{GenerationalBatches, RollupStore}

/** RANDOMIZED CONCURRENCY STRESS over the whole grained-store protocol:
  * three real threads run interleaved ingests (including the genesis
  * race and a same-id replay), range compactions over hash-chosen grain
  * subsets, and expired sweeps against ONE store, retrying on the
  * protocol's documented fail-fast lease collisions. Unlike the latched
  * specs (which pin SPECIFIC interleavings), this pins the protocol's
  * INVARIANT: under ANY interleaving the store converges to exactly the
  * raw-scan answer — no double-serve, no loss, manifests consistent, no
  * leaked stripes or stage dirs. Seeded data; the thread schedule varies
  * run to run, which is the point (the assertions are
  * schedule-independent). */
class ConcurrentStoreStressSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val M = 60L * 1000000
  private val D = 24 * 60 * M

  private def ev(rows: Seq[(Long, Long, String)]): DataFrame = {
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

  private def fs = new Path("/tmp").getFileSystem(
    spark.sessionState.newHadoopConf())

  /** The protocol's overlap collisions are documented fail-fast — a real
    * deployment retries; so does the stress. Anything else rethrows. */
  private def retry[T](op: => T): T = {
    var attempts = 0
    while (true) {
      try return op
      catch {
        case e: IllegalStateException
            if Option(e.getMessage).exists(_.contains("lease")) &&
              attempts < 300 =>
          attempts += 1
          Thread.sleep(10 + scala.util.Random.nextInt(30))
      }
    }
    sys.error("unreachable")
  }

  test("three threads of interleaved ingest/compact/sweep converge to the raw answer") {
    val rnd = new scala.util.Random(180418)
    val types = Array("a", "b", "c", "x")
    val rows = Seq.fill(600)((rnd.nextInt(6).toLong,
      rnd.nextInt((4 * D / M).toInt).toLong * M,
      types(rnd.nextInt(types.length)))).distinct
    val all = ev(rows)
    all.cache().count()
    try {
      val base = graft.sources.Sinks.scratchDir("store_stress") + "/store"
      graft.sources.Sinks.clearDir(base)
      val expected = rawAnswer(all)
      // 12 deltas by event hash; thread t owns deltas t, t+3, t+6, t+9 —
      // every event lands exactly once if (and only if) the per-grain
      // replay guard and the commit protocol hold under contention
      def delta(i: Int) =
        all.filter(pmod(xxhash64(col("ts"), col("u"), col("t")), lit(12)) === i)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 3).map { t =>
        new Thread(() => {
          try {
            val trnd = new scala.util.Random(7000 + t)
            for (i <- t until 12 by 3) {
              retry(RollupStore.appendStatesByGrain(dayStates(delta(i)),
                base, Seq("u", "day"), "day",
                ingestId = Some(s"stress/$t/$i")))
              if (trnd.nextBoolean()) {
                // range compaction over a hash-chosen half of the grains
                val sel = trnd.nextInt(2)
                retry(RollupStore.compactGrains(spark, base,
                  Seq("u", "day"), BehavioralFunctions.funnel_state_combine,
                  grains = g => (g.hashCode & 1) == sel,
                  targetPartitions = 2))
              }
              if (trnd.nextInt(3) == 0)
                // half the janitor passes go through the cadence gate:
                // its statsRows read runs with NO lease while the other
                // threads rename/commit/delete — the dashboard must
                // tolerate any interleaving (minDeadBytes=1 sweeps when
                // anything is reclaimable, so both the read-only skip
                // and the gated sweep get stressed)
                retry(
                  if (trnd.nextBoolean())
                    RollupStore.sweepIfWorthIt(spark, base, 0L,
                      minDeadBytes = 1L)
                  else RollupStore.sweepExpired(spark, base, 0L))
            }
            // a REPLAY mid-contention: the same id must be a committed
            // no-op even while other threads mutate disjoint grains
            assert(retry(RollupStore.appendStatesByGrain(
              dayStates(delta(t)), base, Seq("u", "day"), "day",
              ingestId = Some(s"stress/$t/$t"))) === 0L,
              s"thread $t replay was not absorbed")
          } catch { case e: Throwable => errs.add(e) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(600000))
      assert(threads.forall(!_.isAlive), "a stress thread is stuck")
      import scala.jdk.CollectionConverters._
      assert(errs.isEmpty, s"stress errors: ${errs.asScala.toSeq}")

      // INVARIANT: any interleaving converges to the raw-scan answer
      assert(storeAnswer(base) === expected)
      // no leaked stripes or stage dirs
      val leftovers = fs.listStatus(new Path(base)).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("_WRITER_LEASE") ||
          n.startsWith(".ingest-") || n.startsWith(".compact-"))
      assert(leftovers.isEmpty, s"protocol leftovers: $leftovers")
      // every manifest agrees with its grain's listing
      fs.listStatus(new Path(base)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .foreach { st =>
          val live = GenerationalBatches.liveBatches(fs, st.getPath)
            .sortBy(_._1)
          GenerationalBatches.readManifest(fs, st.getPath).foreach { m =>
            assert(m._1 === live.map(_._2.getName),
              s"manifest of ${st.getPath.getName} diverged after the stress")
          }
        }
      // a final full compaction under no contention stays exact
      assert(RollupStore.compactGrains(spark, base, Seq("u", "day"),
        BehavioralFunctions.funnel_state_combine, targetPartitions = 2) > 0)
      assert(RollupStore.liveBatchCount(spark, base) ===
        RollupStore.grainValues(spark, base).size)
      assert(storeAnswer(base) === expected)
    } finally all.unpersist()
  }
}
