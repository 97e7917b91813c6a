package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions
import graft.ops.RollupStore

/** A READER holding `read(snapshot = true)` across a CONCURRENT
  * compaction — the documented contract (`RollupStore.read`): the
  * snapshot pins concrete files, so a compaction's COMMIT cannot change
  * what the plan reads (it stays exact, and never sees the compacted
  * batch), while the compaction's CLEANUP deleting those files turns
  * further actions into a loud read error — an availability failure,
  * NEVER silently wrong or double-served data. The compactor is driven
  * through its `onStep` seam from another thread, so each interleaving
  * is deterministic, not a sleep race.
  */
class StoreSnapshotInterleaveSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val M = 60L * 1000000

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

  private def merged(df: DataFrame): Map[Long, Int] =
    df.groupBy("u")
      .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
        col("state")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("a snapshot read across a concurrent compaction: exact through commit, loud error after cleanup") {
    val base = graft.sources.Sinks.scratchDir("snapshot_interleave") + "/store"
    graft.sources.Sinks.clearDir(base)
    val b0 = ev((1L, 0L, "a"), (1L, 10 * M, "b"), (2L, 0L, "a"))
    val b1 = ev((1L, 20 * M, "c"), (2L, 5 * M, "b"), (3L, 0L, "a"))
    RollupStore.appendStates(dayStates(b0), base, Seq("u", "day"))
    RollupStore.appendStates(dayStates(b1), base, Seq("u", "day"))
    val expected = merged(RollupStore.read(spark, base))

    // the reader pins its snapshot BEFORE the compaction starts
    val snap = RollupStore.read(spark, base, snapshot = true)
    val preCompactFiles = snap.inputFiles.toSet
    assert(preCompactFiles.nonEmpty)

    val committed = new CountDownLatch(1)
    val mayCleanup = new CountDownLatch(1)
    @volatile var compactError: Option[Throwable] = None
    val compactor = new Thread(() => {
      try RollupStore.compact(spark, base, Seq("u", "day"),
        BehavioralFunctions.funnel_state_combine, "state", 2,
        (step: String) => if (step == "committed") {
          committed.countDown()
          // hold the window open: commit has happened, cleanup has not
          assert(mayCleanup.await(60, TimeUnit.SECONDS))
        },
        graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
      catch { case t: Throwable => compactError = Some(t) }
    })
    compactor.start()
    try {
      assert(committed.await(120, TimeUnit.SECONDS), "compactor never committed")
      // INSIDE the commit..cleanup window: the snapshot still reads its
      // pinned files — same answer, and it has NOT picked up the
      // compacted batch (a dir-listing read here would see one batch; the
      // snapshot still scans the two pre-compaction dirs)
      assert(merged(snap) === expected,
        "snapshot answer changed across a concurrent commit")
      assert(snap.inputFiles.toSet === preCompactFiles,
        "snapshot re-listed files after the commit")
      // a FRESH read in the same window: the flat manifest has not yet
      // been rewritten (that happens right after this paused step), so
      // it serves the PREVIOUS COMMITTED SNAPSHOT — the documented
      // manifest-staleness contract: exact and consistent, over the
      // folded dirs' still-present bytes, never torn or doubled
      val freshInWindow = RollupStore.read(spark, base)
      assert(merged(freshInWindow) === expected)
      assert(freshInWindow.inputFiles.toSet === preCompactFiles,
        "a manifest-stale fresh read should serve exactly the previous " +
          "snapshot's files")
    } finally {
      mayCleanup.countDown()
      compactor.join(120000)
    }
    assert(!compactor.isAlive && compactError.isEmpty,
      s"compactor did not finish cleanly: $compactError")

    // AFTER cleanup: the pinned files are gone — the snapshot must fail
    // LOUDLY, never return partial or doubled rows
    val e = intercept[Throwable] { merged(snap) }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
        t.isInstanceOf[java.io.FileNotFoundException] ||
        Option(t.getMessage).exists(_.contains("FileNotFound")) ||
        Option(t.getMessage).exists(_.contains("does not exist"))),
      s"snapshot after cleanup failed with an unrelated error: $e")
    // and the store itself is healthy: the compactor's manifest rewrite
    // landed, so a fresh read is exact AND serves only the compacted
    // batch — none of the folded dirs' files
    val freshAfter = RollupStore.read(spark, base)
    assert(merged(freshAfter) === expected)
    assert(freshAfter.inputFiles.toSet.intersect(preCompactFiles).isEmpty,
      "a fresh read after the manifest rewrite still served folded dirs")
  }
}
