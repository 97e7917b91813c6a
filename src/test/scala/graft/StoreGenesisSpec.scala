package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions
import graft.ops.{GenerationalBatches, RollupStore}

/** The STORE-GENESIS marker (VERDICT r17 #4): a grained store's state
  * family + grain layout is pinned by a one-time `_STORE_GENESIS` file
  * written under its own root stripe BEFORE any grain stripe is taken.
  * This closes the double-first-ingest race striping accepted in round
  * 17 — two simultaneous first ingests with different families could
  * each pass an empty-store schema probe and create a mixed store that
  * stayed broken until manual repair. Interleavings are driven
  * deterministically through the `onStep("genesis")` seam (fires after
  * the genesis gate, before any grain stripe), in BOTH orders.
  */
class StoreGenesisSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val M = 60L * 1000000
  private val D = 24 * 60 * M
  private val Stale = graft.sources.Sinks.DefaultLeaseStaleMs

  private def ev(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("u", "us", "t")
      .select(col("u"), timestamp_micros(col("us")).as("ts"), col("t"))
  }

  private def funnelStates(df: DataFrame): DataFrame =
    df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        df("t") === "a", df("t") === "b").as("state"))

  private def retentionStates(df: DataFrame): DataFrame =
    df.groupBy(col("u"), to_date(col("ts")).as("day"))
      .agg(BehavioralFunctions.retention_state(
        df("t") === "a", df("t") === "b").as("state"))

  private def fresh(name: String): String = {
    val p = graft.sources.Sinks.scratchDir("genesis_spec") + s"/$name"
    graft.sources.Sinks.clearDir(p)
    p
  }

  private def fs = new Path("/tmp").getFileSystem(
    spark.sessionState.newHadoopConf())

  /** Run a first ingest on another thread, paused right AFTER its
    * genesis gate (marker written, no grain stripe taken yet). */
  private def pausedFirstIngest(states: DataFrame, base: String,
      atGenesis: CountDownLatch, resume: CountDownLatch):
      (Thread, () => Option[Throwable]) = {
    @volatile var err: Option[Throwable] = None
    val t = new Thread(() => {
      try RollupStore.appendStatesByGrain(states, base,
        Seq("u", "day"), "day", "state", None,
        (step: String) => if (step == "genesis") {
          atGenesis.countDown()
          assert(resume.await(120, TimeUnit.SECONDS))
        },
        Stale, 0L)
      catch { case e: Throwable => err = Some(e) }
    })
    t.start()
    (t, () => err)
  }

  /** Both orders of the two-family first-ingest race: the family that
    * reaches the genesis gate first pins the store; the other fails
    * LOUDLY at the fingerprint verify — while the winner has written
    * ONLY the genesis (no grain stripe, no batch), proving the gate, not
    * the leases or the data, is what rejects the loser. */
  private def raceBothFamilies(first: DataFrame => DataFrame,
      second: DataFrame => DataFrame, name: String): Unit = {
    val rows = ev((1L, 0L, "a"), (1L, 10 * M, "b"),
      (2L, D, "a"), (3L, 2 * D, "b"))
    val base = fresh(name)
    val atGenesis = new CountDownLatch(1)
    val resume = new CountDownLatch(1)
    val (winner, err) =
      pausedFirstIngest(first(rows), base, atGenesis, resume)
    try {
      assert(atGenesis.await(120, TimeUnit.SECONDS), "winner never reached genesis")
      // the winner is paused holding NOTHING but the written genesis:
      // no grain stripes, no batches
      assert(fs.exists(new Path(new Path(base), "_STORE_GENESIS")))
      assert(!fs.listStatus(new Path(base)).exists(
        _.getPath.getName.startsWith("_WRITER_LEASE")),
        "the paused winner still holds a stripe")
      assert(RollupStore.grainValues(spark, base).isEmpty)
      // the second family's "first" ingest must fail loudly NOW —
      // before the winner has committed a single row
      val e = intercept[IllegalArgumentException] {
        RollupStore.appendStatesByGrain(second(rows), base,
          Seq("u", "day"), "day")
      }
      assert(e.getMessage.contains("genesis"),
        s"loser failed with an unrelated error: $e")
      assert(RollupStore.grainValues(spark, base).isEmpty,
        "the rejected family left grains behind")
    } finally {
      resume.countDown()
      winner.join(120000)
    }
    assert(!winner.isAlive && err().isEmpty,
      s"winner did not finish cleanly: ${err()}")
    // the winner landed; the store holds exactly its family
    assert(RollupStore.grainValues(spark, base).size === 3)
    assert(RollupStore.readGrains(spark, base).count() > 0)
    // and the loser's RETRY with the right family is a normal ingest
    assert(RollupStore.appendStatesByGrain(first(rows), base,
      Seq("u", "day"), "day", ingestId = Some("retry/1")) > 0)
  }

  test("two-family first-ingest race, funnel first: retention fails loudly at the genesis") {
    raceBothFamilies(funnelStates, retentionStates, "race_funnel_first")
  }

  test("two-family first-ingest race, retention first: funnel fails loudly at the genesis") {
    raceBothFamilies(retentionStates, funnelStates, "race_retention_first")
  }

  test("a same-family concurrent first ingest proceeds past the winner's genesis") {
    val base = fresh("same_family")
    val a = ev((1L, 0L, "a"), (1L, 10 * M, "b"))
    val b = ev((2L, D, "a"), (2L, D + M, "b"))
    val atGenesis = new CountDownLatch(1)
    val resume = new CountDownLatch(1)
    val (t, err) = pausedFirstIngest(funnelStates(a), base, atGenesis, resume)
    try {
      assert(atGenesis.await(120, TimeUnit.SECONDS))
      // same family, disjoint grain: verifies against the genesis and
      // lands while the winner is still paused
      assert(RollupStore.appendStatesByGrain(funnelStates(b), base,
        Seq("u", "day"), "day") > 0)
    } finally {
      resume.countDown()
      t.join(120000)
    }
    assert(!t.isAlive && err().isEmpty, s"winner failed: ${err()}")
    assert(RollupStore.grainValues(spark, base).size === 2)
  }

  test("pre-genesis store upgrade: the STORE's family wins over a mismatched ingest") {
    val base = fresh("upgrade")
    val rows = ev((1L, 0L, "a"), (1L, 10 * M, "b"), (2L, D, "a"))
    RollupStore.appendStatesByGrain(funnelStates(rows), base,
      Seq("u", "day"), "day")
    // simulate a store created before the genesis existed
    fs.delete(new Path(new Path(base), "_STORE_GENESIS"), false)
    // a mismatched ingest must both FAIL and leave the genesis healed
    // from the newest committed batch (the store's true family) — it
    // must not stamp its own family onto someone else's store
    val e = intercept[IllegalArgumentException] {
      RollupStore.appendStatesByGrain(retentionStates(rows), base,
        Seq("u", "day"), "day")
    }
    assert(e.getMessage.contains("genesis"))
    assert(fs.exists(new Path(new Path(base), "_STORE_GENESIS")))
    // the true family still ingests fine against the healed genesis
    assert(RollupStore.appendStatesByGrain(funnelStates(
      ev((3L, 2 * D, "a"))), base, Seq("u", "day"), "day") > 0)
  }

  test("fingerprint escapes embedded newlines: a crafted column name cannot spoof another layout") {
    import org.apache.spark.sql.types._
    // unescaped, this single crafted column renders the same fingerprint
    // TEXT as the honest (day: date, u: bigint) layout — line-splicing
    // through the embedded newline
    val crafted = StructType(Seq(
      StructField("day:date\ncol=u", LongType)))
    val honest = StructType(Seq(
      StructField("day", DateType), StructField("u", LongType)))
    assert(RollupStore.fingerprintOf(crafted, "day") !==
      RollupStore.fingerprintOf(honest, "day"))
  }

  private def genesisPath(base: String) =
    new Path(new Path(base), "_STORE_GENESIS")

  private def readText(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeText(p: Path, text: String): Unit = {
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  test("a torn genesis on an EMPTIED store binds identity: foreign family refused, same family heals") {
    val base = fresh("torn_empty")
    val rows = ev((1L, 0L, "a"), (1L, 10 * M, "b"), (2L, D, "b"))
    RollupStore.appendStatesByGrain(funnelStates(rows), base,
      Seq("u", "day"), "day")
    RollupStore.dropGrainsWhere(spark, base, _ => true)
    assert(RollupStore.grainValues(spark, base).isEmpty)
    // tear the genesis mid-copy (the S3A partial-rename model), keeping
    // the family-distinguishing bytes (state:binary vs state:bigint)
    val whole = readText(genesisPath(base))
    val torn = whole.substring(0, whole.length - 4)
    writeText(genesisPath(base), torn)
    // with NO committed batch left to re-derive from, a DIFFERENT
    // family must fail loudly — not silently re-stamp the store
    val e = intercept[IllegalArgumentException] {
      RollupStore.appendStatesByGrain(retentionStates(rows), base,
        Seq("u", "day"), "day")
    }
    assert(e.getMessage.contains("genesis"), s"unrelated error: $e")
    assert(readText(genesisPath(base)) == torn,
      "the refused ingest must leave the torn remnant untouched")
    // the SAME family (a crash-retried first write) is prefix-consistent
    // with the remnant: it heals the file and proceeds
    assert(RollupStore.appendStatesByGrain(funnelStates(rows), base,
      Seq("u", "day"), "day") > 0)
    assert(readText(genesisPath(base)) == whole,
      "healed genesis must equal the original terminated text")
    // DELIBERATE re-stamp path: empty the store and delete the file
    RollupStore.dropGrainsWhere(spark, base, _ => true)
    fs.delete(genesisPath(base), false)
    assert(RollupStore.appendStatesByGrain(retentionStates(rows), base,
      Seq("u", "day"), "day") > 0)
  }

  test("regrainInto stamps the destination's genesis: the fresh store refuses a foreign family") {
    val src = fresh("regrain_genesis_src")
    val dst = fresh("regrain_genesis_dst")
    val rows = ev((1L, 0L, "a"), (1L, 10 * M, "b"),
      (2L, D, "a"), (3L, 8 * D, "b"))
    RollupStore.appendStatesByGrain(funnelStates(rows), src,
      Seq("u", "day"), "day")
    assert(RollupStore.regrainInto(spark, src, dst, Seq("u", "day"),
      "day", date_trunc("week", col("day")).cast("date"), "week",
      BehavioralFunctions.funnel_state_combine) > 0)
    // the destination is a store in its own right: genesis present,
    // recording the NEW layout (week grain)
    assert(fs.exists(genesisPath(dst)))
    assert(readText(genesisPath(dst)).contains("grain=week"))
    // a concurrent foreign first-ingest into the destination is refused
    // — the same race the source-side genesis closed (VERDICT r18 #5)
    val foreign = ev((9L, 0L, "a"), (9L, M, "b"))
      .groupBy(col("u"),
        date_trunc("week", to_date(col("ts"))).cast("date").as("week"))
      .agg(BehavioralFunctions.retention_state(
        col("t") === "a", col("t") === "b").as("state"))
    val e = intercept[IllegalArgumentException] {
      RollupStore.appendStatesByGrain(foreign, dst, Seq("u", "week"),
        "week")
    }
    assert(e.getMessage.contains("genesis"), s"unrelated error: $e")
    // while the destination's own family+layout ingests fine
    val same = ev((9L, 0L, "a"), (9L, M, "b"))
      .groupBy(col("u"),
        date_trunc("week", to_date(col("ts"))).cast("date").as("week"))
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        col("t") === "a", col("t") === "b").as("state"))
    assert(RollupStore.appendStatesByGrain(same, dst, Seq("u", "week"),
      "week") > 0)
  }

  test("a different grain LAYOUT is refused even with identical columns") {
    val base = fresh("layout")
    val rows = ev((1L, 0L, "a"), (2L, D, "b"))
    RollupStore.appendStatesByGrain(funnelStates(rows), base,
      Seq("u", "day"), "day")
    // same columns, same types — but grained by "u" instead of "day":
    // the old newest-batch schema probe passed this (types match); the
    // genesis records the grain column and refuses it
    val e = intercept[IllegalArgumentException] {
      RollupStore.appendStatesByGrain(funnelStates(ev((3L, 2 * D, "a"))),
        base, Seq("u", "day"), "u")
    }
    assert(e.getMessage.contains("genesis"))
    // the genesis survives dropping every grain: the family is part of
    // the store's identity, not of its contents
    RollupStore.dropGrainsWhere(spark, base, _ => true)
    assert(RollupStore.grainValues(spark, base).isEmpty)
    val e2 = intercept[IllegalArgumentException] {
      RollupStore.appendStatesByGrain(retentionStates(rows), base,
        Seq("u", "day"), "day")
    }
    assert(e2.getMessage.contains("genesis"))
  }
}
