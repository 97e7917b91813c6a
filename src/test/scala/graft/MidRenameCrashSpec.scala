package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.{FileStatus, FileUtil, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions
import graft.ops.RollupStore

/** FAULT INJECTION for the S3A stage-rename caveat
  * (`RollupStore` object-store note): on S3A a dir rename is a
  * NON-ATOMIC copy+delete, so a crash mid-rename leaves a PARTIAL
  * `states` dir. The protocol's claim — pinned here — is that the
  * partial dir is an UNMARKED batch (the marker is written only after
  * the footer verify), so it is invisible to readers, the next
  * maintenance run's recovery deletes it, and the replay guard re-lands
  * the data exactly once. Driven through BOTH the grained ingest and
  * the range compaction, via a LocalFileSystem clone whose rename
  * copies one file into the destination and then dies. */
class CrashingRenameRawFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("crashfs:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (CrashingRenameFs.armed.get() && dst.getName == "states") {
      // simulate S3A's copy+delete dying mid-copy: part of the data
      // lands under dst, src survives, and the caller sees a crash
      mkdirs(dst)
      listStatus(src).toSeq.filter(_.isFile).take(1).foreach { st =>
        FileUtil.copy(this, st.getPath, this,
          new Path(dst, st.getPath.getName), false, getConf)
      }
      CrashingRenameFs.armed.set(false)
      throw new java.io.IOException(
        "injected mid-rename crash (S3A copy+delete)")
    }
    super.rename(src, dst)
  }
}

class CrashingRenameFs extends org.apache.hadoop.fs.LocalFileSystem(
    new CrashingRenameRawFs) {
  override def getScheme: String = "crashfs"
  override def getUri: java.net.URI = java.net.URI.create("crashfs:///")
}

object CrashingRenameFs {
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
}

class MidRenameCrashSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val M = 60L * 1000000
  private val D = 24 * 60 * M

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

  private def freshBase(name: String): String = {
    spark.sparkContext.hadoopConfiguration.set("fs.crashfs.impl",
      classOf[CrashingRenameFs].getName)
    val local = graft.sources.Sinks.scratchDir("mid_rename_spec") + s"/$name"
    graft.sources.Sinks.clearDir(local)
    s"crashfs://$local"
  }

  private def rows: Seq[(Long, Long, String)] = {
    val rnd = new scala.util.Random(180107)
    val types = Array("a", "b", "c", "x")
    Seq.fill(200)((rnd.nextInt(6).toLong,
      rnd.nextInt((3 * D / M).toInt).toLong * M,
      types(rnd.nextInt(types.length)))).distinct
  }

  test("ingest: a mid-rename crash leaves an invisible partial batch; the replay re-lands exactly once") {
    val all = ev(rows: _*)
    all.cache().count()
    try {
      val base = freshBase("ingest")
      val fs = new Path(base).getFileSystem(
        spark.sessionState.newHadoopConf())
      assert(fs.isInstanceOf[CrashingRenameFs], "crashfs did not take")
      CrashingRenameFs.armed.set(true)
      val e = intercept[java.io.IOException] {
        RollupStore.appendStatesByGrain(dayStates(all), base,
          Seq("u", "day"), "day", ingestId = Some("mr/1"))
      }
      assert(e.getMessage.contains("injected"), s"unrelated failure: $e")
      // the partial batch is INVISIBLE: its marker was never written, so
      // the grain (created by the crashed rename) serves nothing
      assert(RollupStore.liveBatchCount(spark, base) === 0)
      // the RERUN (same id — the redelivery) sweeps the partial dir and
      // lands everything exactly once
      assert(RollupStore.appendStatesByGrain(dayStates(all), base,
        Seq("u", "day"), "day", ingestId = Some("mr/1")) > 0)
      assert(storeAnswer(base) === rawAnswer(all))
      // and a second replay is a committed no-op
      assert(RollupStore.appendStatesByGrain(dayStates(all), base,
        Seq("u", "day"), "day", ingestId = Some("mr/1")) === 0L)
      assert(storeAnswer(base) === rawAnswer(all))
    } finally all.unpersist()
  }

  test("compaction: a mid-rename crash leaves the old batches live; the rerun folds without double-serving") {
    val all = ev(rows: _*)
    all.cache().count()
    try {
      val base = freshBase("compact")
      def slice(i: Int) = all.filter(pmod(xxhash64(col("ts")), lit(2)) === i)
      RollupStore.appendStatesByGrain(dayStates(slice(0)), base,
        Seq("u", "day"), "day")
      RollupStore.appendStatesByGrain(dayStates(slice(1)), base,
        Seq("u", "day"), "day")
      val expected = rawAnswer(all)
      val preCount = RollupStore.liveBatchCount(spark, base)
      CrashingRenameFs.armed.set(true)
      val e = intercept[java.io.IOException] {
        RollupStore.compactGrains(spark, base, Seq("u", "day"),
          BehavioralFunctions.funnel_state_combine, targetPartitions = 2)
      }
      assert(e.getMessage.contains("injected"), s"unrelated failure: $e")
      // nothing committed for the crashed grain: the old batches are all
      // still live and the answer is exact (the partial fold dir is an
      // unmarked batch — dead on arrival)
      assert(RollupStore.liveBatchCount(spark, base) === preCount)
      assert(storeAnswer(base) === expected)
      // the rerun recovers the partial dir and completes the fold
      assert(RollupStore.compactGrains(spark, base, Seq("u", "day"),
        BehavioralFunctions.funnel_state_combine, targetPartitions = 2) > 0)
      assert(RollupStore.liveBatchCount(spark, base) ===
        RollupStore.grainValues(spark, base).size)
      assert(storeAnswer(base) === expected)
    } finally all.unpersist()
  }
}
