package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.behavioral.BehavioralFunctions
import graft.ops.{GenerationalBatches, RollupStore}

/** RawLocalFileSystem that charges an object-store-class latency for
  * every metadata round-trip (list / stat / open) — the measurement
  * medium for the manifest's structural claim. On a real object store
  * each of these calls is an HTTP RPC with ~ms latency; local FS makes
  * them ~µs, which hides a large difference in CALL COUNT inside wall
  * noise. Data bytes still come from local disk, so only the metadata
  * shape is amplified. */
class SlowRawLocalFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  private def charge(): Unit = {
    val us = StoreMetaBench.opDelayUs
    if (us > 0) java.util.concurrent.TimeUnit.MICROSECONDS.sleep(us)
  }
  override def getUri: java.net.URI = java.net.URI.create("slowfs:///")
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    charge(); super.listStatus(f)
  }
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    charge(); super.getFileStatus(f)
  }
  override def open(f: Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    charge(); super.open(f, bufferSize)
  }
}

class SlowLocalFileSystem extends org.apache.hadoop.fs.LocalFileSystem(
    new SlowRawLocalFileSystem) {
  override def getScheme: String = "slowfs"
  override def getUri: java.net.URI = java.net.URI.create("slowfs:///")
}

/** Times the grained store's READ-PATH METADATA with and without
  * per-grain manifests, at a dashboard-realistic grain count (one year
  * of daily grains, several live batches each). What's measured is
  * DataFrame CONSTRUCTION — the store resolution (root listing plus
  * per-grain manifest read, or per-grain/per-batch listings and marker
  * reads) and Spark's file-index build; the data scan is identical in
  * both modes and excluded. Reported twice: on raw local FS (metadata
  * ops ~µs — the differential drowns in Spark overhead, included for
  * honesty) and through the `slowfs` wrapper charging 1 ms per
  * metadata RPC, the object-store shape where call count IS the
  * latency. Prints one JSON line. */
object StoreMetaBench {
  /** Per-metadata-op latency injected by the `slowfs` scheme, micros. */
  @volatile var opDelayUs: Long = 0L

  def main(args: Array[String]): Unit = {
    val grains = sys.env.get("SPARK_GRAFT_META_GRAINS").map(_.toInt).getOrElse(365)
    val batchesPerGrain = 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-store-meta-bench")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration.set("fs.slowfs.impl",
      classOf[SlowLocalFileSystem].getName)

    val base = graft.sources.Sinks.scratchDir("store_meta_bench") + "/store"
    graft.sources.Sinks.clearDir(base)
    val fs = new Path(base).getFileSystem(spark.sessionState.newHadoopConf())

    // one year of day grains, a few users each; ingested in
    // `batchesPerGrain` slices so every grain holds several live batches
    def states(slice: Int) = spark.range(grains.toLong * 4)
      .select((col("id") % 4).as("u"),
        date_add(lit("2024-01-01").cast("date"),
          (col("id") / 4).cast("int")).as("day"),
        col("id").as("seq"))
      .filter(col("seq") % batchesPerGrain === slice)
      .select(col("u"), col("day"),
        timestamp_seconds(unix_timestamp(col("day")) + col("seq") % 97).as("ts"))
      .groupBy(col("u"), col("day"))
      .agg(BehavioralFunctions.funnel_state(col("ts"),
        lit(true), lit(false), lit(false)).as("state"))
    for (i <- 0 until batchesPerGrain)
      RollupStore.appendStatesByGrain(states(i), base, Seq("u", "day"), "day")
    val grainVals = RollupStore.grainValues(spark, base)
    require(grainVals.size == grains, s"built ${grainVals.size} grains")
    val window = grainVals.takeRight(30).toSet // "last 30 days" dashboard

    def timeMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def sample(f: () => Unit): Double = { f(); median((0 until 5).map(_ => timeMs(f()))) }
    def resolve(root: String, pruned: Boolean): Unit = {
      RollupStore.readGrains(spark, root,
        if (pruned) window.contains else _ => true)
      ()
    }
    val slowBase = s"slowfs://$base"
    def measure(): Map[String, Double] = Map(
      "pruned30_local" -> sample(() => resolve(base, pruned = true)),
      "full_local" -> sample(() => resolve(base, pruned = false)),
      "pruned30_slowfs" -> {
        opDelayUs = 1000L
        try sample(() => resolve(slowBase, pruned = true))
        finally opDelayUs = 0L
      },
      "full_slowfs" -> {
        opDelayUs = 1000L
        try sample(() => resolve(slowBase, pruned = false))
        finally opDelayUs = 0L
      })

    val withManifest = measure()
    grainVals.foreach { g => // strip every manifest -> listing fallback
      fs.delete(new Path(new Path(base),
        s"${RollupStore.grainDirName("day", g)}/${GenerationalBatches.Manifest}"), false)
    }
    val withListing = measure()

    def row(k: String) =
      s""""${k}_manifest":${withManifest(k)},"${k}_listing":${withListing(k)}"""
    println(s"""{"metric":"store_meta_resolve_ms","grains":$grains,""" +
      s""""batches_per_grain":$batchesPerGrain,""" +
      s"""${row("pruned30_local")},${row("full_local")},""" +
      s"""${row("pruned30_slowfs")},${row("full_slowfs")}}""")
    spark.stop()
  }
}
