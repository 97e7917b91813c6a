package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions
import graft.ops.RollupStore

/** The GRAIN-PARTITIONED rollup store: one [[GenerationalBatches]]
  * sub-store per grain value (`day=1970-01-02/batch_k/…`), so
  * maintenance touches only the grains it names. Pins: the grained
  * cycle answers exactly like the raw scan; a RANGE compaction folds
  * only the selected grains and leaves every other grain's files
  * byte-identical; `dropGrains` retires grains atomically (the answer
  * becomes the raw scan minus those days, tombstones are invisible);
  * pruned reads list only the selected grains' files; the per-grain
  * replay guard resumes a crashed multi-grain ingest exactly-once; and
  * grain values round-trip through the directory encoding. q121 runs
  * the grained cycle under the DuckDB oracle.
  */
class GrainedRollupStoreSpec extends AnyFunSuite {
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

  private def storeAnswer(base: String,
      grains: String => Boolean = _ => true): Map[Long, Int] =
    RollupStore.readGrains(spark, base, grains)
      .groupBy("u")
      .agg(BehavioralFunctions.funnel_merge(expr("INTERVAL '1' HOUR"),
        col("state")).as("steps"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def fresh(name: String): String = {
    val p = graft.sources.Sinks.scratchDir("grained_store_spec") + s"/$name"
    graft.sources.Sinks.clearDir(p)
    p
  }

  private def fs = new Path("/tmp").getFileSystem(
    spark.sessionState.newHadoopConf())

  /** Recursive (path, length) fingerprint of a directory tree — the
    * "untouched" pin for grains a range compaction must not visit. */
  private def fingerprint(p: Path): Set[(String, Long)] = {
    def walk(q: Path): Seq[(String, Long)] =
      fs.listStatus(q).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath.toString -> st.getLen)
      }
    walk(p).toSet
  }

  // ~8 days of events, every (u, day) recurring across slices
  private lazy val allRows: Seq[(Long, Long, String)] = {
    val rnd = new scala.util.Random(6022140)
    val types = Array("a", "b", "c", "x")
    Seq.fill(700)((rnd.nextInt(10).toLong,
      rnd.nextInt((8 * D / M).toInt).toLong * M,
      types(rnd.nextInt(types.length)))).distinct
  }

  test("the grained cycle: per-grain batches, range compaction, untouched grains byte-identical") {
    val all = ev(allRows: _*)
    all.cache().count()
    try {
      val base = fresh("cycle")
      def slice(i: Int) = all.filter(pmod(xxhash64(col("ts")), lit(3)) === i)
      RollupStore.appendStatesByGrain(dayStates(slice(0)), base,
        Seq("u", "day"), "day")
      RollupStore.appendStatesByGrain(dayStates(slice(1)), base,
        Seq("u", "day"), "day")
      val grains = RollupStore.grainValues(spark, base)
      assert(grains.size >= 7 && grains === grains.sorted)
      assert(grains.forall(_.matches("\\d{4}-\\d{2}-\\d{2}")),
        s"grain values are not ISO days: $grains")
      // every grain got its own sub-store with 2 live batches
      assert(RollupStore.liveBatchCount(spark, base) === grains.size * 2)
      assert(storeAnswer(base) === rawAnswer(slice(0).union(slice(1))))

      // RANGE compaction: fold only the first half of the grains; every
      // other grain's files must stay byte-identical (compact is
      // O(touched grains), not O(store))
      val cutoff = grains(grains.size / 2)
      val untouchedBefore = grains.filter(_ >= cutoff).map(g =>
        fingerprint(new Path(base, RollupStore.grainDirName("day", g))))
      RollupStore.compactGrains(spark, base, Seq("u", "day"),
        BehavioralFunctions.funnel_state_combine,
        grains = _ < cutoff, targetPartitions = 2)
      val untouchedAfter = grains.filter(_ >= cutoff).map(g =>
        fingerprint(new Path(base, RollupStore.grainDirName("day", g))))
      assert(untouchedAfter === untouchedBefore,
        "a range compaction touched files outside its grain range")
      val foldedCount = grains.count(_ < cutoff)
      assert(RollupStore.liveBatchCount(spark, base) ===
        foldedCount + (grains.size - foldedCount) * 2)
      assert(storeAnswer(base) === rawAnswer(slice(0).union(slice(1))),
        "range compaction changed the answer")

      // ingest continues; a full compaction then folds everything
      RollupStore.appendStatesByGrain(dayStates(slice(2)), base,
        Seq("u", "day"), "day")
      RollupStore.compactGrains(spark, base, Seq("u", "day"),
        BehavioralFunctions.funnel_state_combine, targetPartitions = 2)
      assert(RollupStore.liveBatchCount(spark, base) ===
        RollupStore.grainValues(spark, base).size)
      assert(storeAnswer(base) === rawAnswer(all))

      // pruned read: a one-grain dashboard query lists ONLY that grain's
      // files (the file-skipping story at 100 TB: years of other days are
      // never opened or scheduled)
      val g0 = grains.head
      val pruned = RollupStore.readGrains(spark, base, _ == g0)
      assert(pruned.inputFiles.nonEmpty &&
        pruned.inputFiles.forall(_.contains(s"day=$g0")),
        "a pruned read listed files outside its grain")
      val prunedDays = pruned.select(col("day").cast("string"))
        .distinct().collect().map(_.getString(0)).toSeq
      assert(prunedDays === Seq(g0))
    } finally all.unpersist()
  }

  test("dropGrains retires old grains: answer = raw scan minus those days, tombstones invisible") {
    val all = ev(allRows: _*)
    all.cache().count()
    try {
      val base = fresh("drop")
      RollupStore.appendStatesByGrain(dayStates(all), base,
        Seq("u", "day"), "day")
      val grains = RollupStore.grainValues(spark, base)
      val cutoff = grains(2)
      val dropped = RollupStore.dropGrains(spark, base, olderThan = cutoff)
      assert(dropped === 2)
      assert(RollupStore.grainValues(spark, base) === grains.drop(2))
      // retiring a grain is a DELIBERATE answer change: exactly those
      // days' events leave every merge
      val kept = all.filter(to_date(col("ts")).cast("string") >= cutoff)
      assert(storeAnswer(base) === rawAnswer(kept))
      // a leftover tombstone (crashed drop) is invisible to readers and
      // swept by the next drop
      val tomb = new Path(base, ".dropped-junk-day=9999-01-01")
      fs.mkdirs(new Path(tomb, "batch_0"))
      assert(storeAnswer(base) === rawAnswer(kept))
      assert(RollupStore.dropGrainsWhere(spark, base, _ => false) === 0)
      assert(!fs.exists(tomb), "tombstone sweep left the leftover behind")
      // dropping everything: reads then refuse loudly
      RollupStore.dropGrainsWhere(spark, base, _ => true)
      intercept[IllegalArgumentException] {
        RollupStore.readGrains(spark, base)
      }
    } finally all.unpersist()
  }

  test("per-grain replay guard: a crashed multi-grain ingest resumes exactly-once") {
    val rows = ev((1L, 0L, "a"), (1L, 10 * M, "b"),   // day 1
      (2L, D + M, "a"), (1L, D + 2 * M, "c"),         // day 2
      (3L, 2 * D, "a"))                               // day 3
    val base = fresh("replay")
    // crash after the FIRST grain's commit: later grains never land
    var commits = 0
    intercept[RuntimeException] {
      RollupStore.appendStatesByGrain(dayStates(rows), base,
        Seq("u", "day"), "day", "state", Some("q/7"),
        (step: String) => if (step == "committed") {
          commits += 1
          if (commits == 1) sys.error("injected crash after first grain")
        },
        graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
    }
    assert(RollupStore.grainValues(spark, base).size === 1,
      "crash did not stop after the first grain")
    // REDELIVERY with the same id: the committed grain is skipped, the
    // missing grains land — exactly-once per grain, no double-append
    val resumed = RollupStore.appendStatesByGrain(dayStates(rows), base,
      Seq("u", "day"), "day", ingestId = Some("q/7"))
    assert(resumed > 0)
    assert(RollupStore.grainValues(spark, base).size === 3)
    assert(RollupStore.liveBatchCount(spark, base) === 3,
      "a committed grain was re-appended on replay")
    assert(storeAnswer(base) === rawAnswer(rows))
    // a SECOND full replay is a complete no-op
    assert(RollupStore.appendStatesByGrain(dayStates(rows), base,
      Seq("u", "day"), "day", ingestId = Some("q/7")) === 0L)
    assert(RollupStore.liveBatchCount(spark, base) === 3)
    // the guard survives a grained compaction
    RollupStore.compactGrains(spark, base, Seq("u", "day"),
      BehavioralFunctions.funnel_state_combine, targetPartitions = 1)
    assert(RollupStore.appendStatesByGrain(dayStates(rows), base,
      Seq("u", "day"), "day", ingestId = Some("q/7")) === 0L)
    assert(storeAnswer(base) === rawAnswer(rows))
  }

  test("one-job staged ingest: a crash at the stage leaves nothing visible; the next ingest sweeps and lands") {
    val rows = ev((1L, 0L, "a"), (1L, 10 * M, "b"),   // day 1
      (2L, D + M, "a"), (1L, D + 2 * M, "c"),         // day 2
      (3L, 2 * D, "a"))                               // day 3
    val base = fresh("staged")
    // crash AFTER the one-job partitioned write but before any grain
    // committed: the store must look untouched (the stage dir is hidden)
    intercept[RuntimeException] {
      RollupStore.appendStatesByGrain(dayStates(rows), base,
        Seq("u", "day"), "day", "state", Some("s/1"),
        (step: String) =>
          if (step == "staged") sys.error("injected crash at the stage"),
        graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
    }
    assert(RollupStore.grainValues(spark, base).isEmpty,
      "a crashed stage left visible grains")
    assert(fs.listStatus(new Path(base)).exists(
      _.getPath.getName.startsWith(".ingest-")),
      "expected the crashed stage dir to be left behind")
    // the redelivery sweeps the stale stage and lands everything once
    assert(RollupStore.appendStatesByGrain(dayStates(rows), base,
      Seq("u", "day"), "day", ingestId = Some("s/1")) > 0)
    assert(!fs.listStatus(new Path(base)).exists(
      _.getPath.getName.startsWith(".ingest-")),
      "the resumed ingest did not sweep the stale stage dir")
    assert(RollupStore.grainValues(spark, base).size === 3)
    assert(RollupStore.liveBatchCount(spark, base) === 3)
    assert(storeAnswer(base) === rawAnswer(rows))
  }

  test("one-job range compaction: a crash mid-commit leaves folded grains folded, the rest intact; rerun finishes") {
    val base = fresh("compact_crash")
    // 3 days × 2 ingest slices → 2 live batches per day grain
    RollupStore.appendStatesByGrain(dayStates(ev(
      (1L, 0L, "a"), (2L, D + M, "a"), (3L, 2 * D, "a"))), base,
      Seq("u", "day"), "day")
    RollupStore.appendStatesByGrain(dayStates(ev(
      (1L, 10 * M, "b"), (2L, D + 20 * M, "b"),
      (3L, 2 * D + 5 * M, "c"))), base, Seq("u", "day"), "day")
    assert(RollupStore.liveBatchCount(spark, base) === 6)
    val before = storeAnswer(base)

    // crash after the FIRST grain's commit marker, before its cleanup
    var commits = 0
    intercept[RuntimeException] {
      RollupStore.compactGrains(spark, base, Seq("u", "day"),
        BehavioralFunctions.funnel_state_combine, "state", _ => true, 2,
        (step: String) => if (step == "committed") {
          commits += 1
          if (commits == 1) sys.error("injected crash after first grain's commit")
        },
        graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
    }
    // the committed grain serves its fold ONLY: its marker lists the
    // folded dirs, so the un-cleaned old batches are DEAD — the live
    // count is the teeth here, because the default funnel merge is
    // duplicate-blind and an answer check alone would miss a
    // double-serve (mutation RC351 survived exactly that way)
    assert(RollupStore.liveBatchCount(spark, base) === 1 + 2 + 2,
      "the crashed grain's folded batches are not dead — the commit " +
        "marker must list the dirs it replaced")
    assert(storeAnswer(base) === before,
      "a crashed range compaction changed the answer")
    assert(fs.listStatus(new Path(base)).exists(
      _.getPath.getName.startsWith(".compact-")),
      "expected the crashed compaction's stage dir to be left behind")
    // rerun: sweeps the stale stage, re-folds ONLY what is still unfolded
    RollupStore.compactGrains(spark, base, Seq("u", "day"),
      BehavioralFunctions.funnel_state_combine, targetPartitions = 2)
    assert(!fs.listStatus(new Path(base)).exists(
      _.getPath.getName.startsWith(".compact-")))
    assert(RollupStore.liveBatchCount(spark, base) === 3)
    assert(storeAnswer(base) === before,
      "the resumed range compaction changed the answer")
  }

  test("grained ingest guards: grain must be a key, NULL grains refused, schema gate spans grains") {
    val base = fresh("guards")
    val good = dayStates(ev((1L, 0L, "a"), (2L, D, "b")))
    val e1 = intercept[IllegalArgumentException] {
      RollupStore.appendStatesByGrain(good, base, Seq("u", "day"), "week")
    }
    assert(e1.getMessage.contains("key columns"))
    val e2 = intercept[Exception] {
      RollupStore.appendStatesByGrain(
        good.withColumn("day", lit(null).cast("date")),
        base, Seq("u", "day"), "day")
    }
    assert(e2.getMessage.contains("NULL"))
    RollupStore.appendStatesByGrain(good, base, Seq("u", "day"), "day")
    // a retention batch (BIGINT states) passes the door type gate but must
    // be refused against the existing funnel store — across grain dirs
    val retention = ev((5L, 3 * D, "a"))
      .groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.retention_state(
        col("t") === "a", col("t") === "b").as("state"))
    val e3 = intercept[IllegalArgumentException] {
      RollupStore.appendStatesByGrain(retention, base, Seq("u", "day"), "day")
    }
    assert(e3.getMessage.contains("schema"))
    // empty delta: committed no-op
    assert(RollupStore.appendStatesByGrain(good.filter(col("u") === 99),
      base, Seq("u", "day"), "day") === 0L)
    assert(RollupStore.grainValues(spark, base).size === 2)
  }

  test("regrainInto folds a day-grained store into a fresh week-grained store, resumable after a crash") {
    val all = ev(allRows: _*)
    all.cache().count()
    try {
      val src = fresh("regrain_src")
      def slice(i: Int) = all.filter(pmod(xxhash64(col("ts")), lit(2)) === i)
      RollupStore.appendStatesByGrain(dayStates(slice(0)), src,
        Seq("u", "day"), "day")
      RollupStore.appendStatesByGrain(dayStates(slice(1)), src,
        Seq("u", "day"), "day")
      val srcBefore = fingerprint(new Path(src))

      // crash after the FIRST week grain's commit: the rewrite is
      // incomplete, the destination holds exactly one week
      val dst = fresh("regrain_dst")
      def rewrite(onStep: String => Unit) =
        RollupStore.regrainInto(spark, src, dst, Seq("u", "day"), "day",
          date_trunc("week", col("day")).cast("date"), "week",
          BehavioralFunctions.funnel_state_combine, "state",
          Some("regrain-into"), 2, onStep,
          graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
      var commits = 0
      intercept[RuntimeException] {
        rewrite { step =>
          if (step == "committed") {
            commits += 1
            if (commits == 1) sys.error("injected crash after first week")
          }
        }
      }
      assert(RollupStore.grainValues(spark, dst).size === 1,
        "crash did not stop after the first week grain")

      // rerun with the same id: committed weeks are skipped, the missing
      // weeks land — the rewrite resumes exactly-once per grain
      assert(rewrite(_ => ()) > 0)
      val weeks = RollupStore.grainValues(spark, dst)
      assert(weeks.size >= 2 && weeks.forall(_.matches("\\d{4}-\\d{2}-\\d{2}")))
      assert(RollupStore.liveBatchCount(spark, dst) === weeks.size,
        "a committed week grain was re-appended on the resumed rewrite")
      // a THIRD run is a complete no-op
      assert(rewrite(_ => ()) === 0L)

      // differential: the week store answers exactly like the day store
      // (and the raw scan), and one row per (u, week)
      assert(storeAnswer(dst) === rawAnswer(all),
        "the re-grained store diverges from the raw scan")
      val weekRows = RollupStore.readGrains(spark, dst)
      assert(weekRows.columns.sorted.toSeq === Seq("state", "u", "week"))
      assert(weekRows.groupBy("u", "week").count()
        .filter(col("count") > 1).isEmpty)
      // the destination is a real grained store: a one-week read prunes
      val w0 = weeks.head
      val pruned = RollupStore.readGrains(spark, dst, _ == w0)
      assert(pruned.inputFiles.nonEmpty &&
        pruned.inputFiles.forall(_.contains(s"week=$w0")))
      // the source was only read — byte-identical after the rewrite
      assert(fingerprint(new Path(src)) === srcBefore,
        "regrainInto modified its source store")
    } finally all.unpersist()
  }

  test("a crashed default-id rewrite resumes under a differently-spelled source path") {
    // ADVICE r17: the derived default id normalizes the source path
    // (fs.makeQualified), so resuming with an equivalent spelling
    // (scheme-qualified vs bare) derives the SAME id — committed grains
    // are skipped, never re-appended (states would double-count)
    val all = ev(allRows: _*)
    all.cache().count()
    try {
      val src = fresh("regrain_spell_src")
      RollupStore.appendStatesByGrain(dayStates(all), src,
        Seq("u", "day"), "day")
      val dst = fresh("regrain_spell_dst")
      def rewrite(srcSpelling: String, onStep: String => Unit) =
        RollupStore.regrainInto(spark, srcSpelling, dst, Seq("u", "day"),
          "day", date_trunc("week", col("day")).cast("date"), "week",
          BehavioralFunctions.funnel_state_combine, "state",
          None, 2, onStep, graft.sources.Sinks.DefaultLeaseStaleMs, 0L)
      var commits = 0
      intercept[RuntimeException] {
        rewrite(src, step => if (step == "committed") {
          commits += 1
          if (commits == 1) sys.error("injected crash after first week")
        })
      }
      assert(RollupStore.grainValues(spark, dst).size === 1)
      // resume with the QUALIFIED spelling of the same source
      assert(rewrite(s"file:$src", _ => ()) > 0)
      val weeks = RollupStore.grainValues(spark, dst)
      assert(weeks.size >= 2)
      assert(RollupStore.liveBatchCount(spark, dst) === weeks.size,
        "a committed week was re-appended when the source spelling changed")
      assert(storeAnswer(dst) === rawAnswer(all),
        "the spelling-resumed rewrite double-counted states")
    } finally all.unpersist()
  }

  test("regrainInto with default ids: two sources layer into one destination without colliding") {
    // both sources hold days of the SAME WEEK, so both rewrites land in
    // the same destination grain — the exact case a shared default id
    // would silently absorb (the second source's rows dropped by the
    // replay guard with no error); ids derived from the source path
    // cannot collide
    val rows1 = Seq((1L, 0L, "a"), (1L, 10 * M, "b"))
    val rows2 = Seq((2L, D + M, "a"), (2L, D + 5 * M, "b"),
      (2L, D + 9 * M, "c"))
    val src1 = fresh("derived_src1")
    val src2 = fresh("derived_src2")
    val dst = fresh("derived_dst")
    RollupStore.appendStatesByGrain(dayStates(ev(rows1: _*)), src1,
      Seq("u", "day"), "day")
    RollupStore.appendStatesByGrain(dayStates(ev(rows2: _*)), src2,
      Seq("u", "day"), "day")
    def rewrite(src: String) =
      RollupStore.regrainInto(spark, src, dst, Seq("u", "day"), "day",
        date_trunc("week", col("day")).cast("date"), "week",
        BehavioralFunctions.funnel_state_combine)
    assert(rewrite(src1) > 0)
    assert(rewrite(src2) > 0,
      "the second source's rewrite was absorbed by the first's id")
    assert(RollupStore.grainValues(spark, dst).size === 1,
      "expected both sources to fold into one week grain")
    assert(storeAnswer(dst) === rawAnswer(ev((rows1 ++ rows2): _*)))
    // per-source resumability is intact: re-running EITHER rewrite with
    // defaults is a committed no-op
    assert(rewrite(src1) === 0L)
    assert(rewrite(src2) === 0L)
    assert(storeAnswer(dst) === rawAnswer(ev((rows1 ++ rows2): _*)))
  }

  test("grain values round-trip through the directory encoding") {
    import spark.implicits._
    val base = fresh("escape")
    // a string grain with path-hostile characters (separator, space,
    // unicode, the escape char itself) — including TWO DISTINCT
    // supplementary-plane values: per-char escaping would mangle each
    // surrogate pair to the same '?' bytes and collide them into one
    // directory, so the encoder must walk code points
    val weird = Seq("simple", "a/b", "sp ace", "per%cent", "unié",
      "🦆", "𝄞")
    val states = ev(weird.zipWithIndex.map { case (_, i) =>
      (i.toLong, i * M, "a") }: _*)
      .withColumn("g", element_at(typedlit(weird), col("u").cast("int") + 1))
      .groupBy(col("u"), col("g"))
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        col("t") === "a", col("t") === "b", col("t") === "c").as("state"))
    RollupStore.appendStatesByGrain(states, base, Seq("u", "g"), "g")
    assert(RollupStore.grainValues(spark, base).sorted === weird.sorted)
    // each weird value prunes to exactly its own rows
    for (w <- weird) {
      val got = RollupStore.readGrains(spark, base, _ == w)
        .select("g").distinct().as[String].collect().toSeq
      assert(got === Seq(w), s"grain '$w' did not round-trip")
    }
  }
}
