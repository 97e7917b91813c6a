package graft.tools

import org.apache.spark.sql.SparkSession

/** Times ONE streaming contract row — q83, the largest-state streaming
  * query (banded SimHash suppression: 4 band buckets per doc) — under the
  * default in-memory HDFS-backed state store and under
  * `RocksDBStateStoreProvider`, the production config SCALE.md's sizing
  * note prescribes for state that outgrows the heap. The spec layer
  * (StreamingRocksDbSpec) pins that the operators are store-agnostic;
  * this tool puts a NUMBER on the store swap at harness scale, so the
  * sizing note rests on a measurement rather than an assumption. Same
  * discipline as Bench: per-variant discarded warmup, min of 2 timed
  * runs, one JSON line.
  */
object RocksDbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("q83_stream_simhash_dedup")
    val key = "spark.sql.streaming.stateStore.providerClass"

    def run(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def bench(label: String): Double = {
      val warm = run() // discarded: provider class-load + codegen
      val sec = (1 to 2).map(_ => run()).min
      System.err.println(f"[rocksdb] $label%-8s $sec%.2f s (warm $warm%.2f)")
      sec
    }

    val memSec = bench("memory")
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocksSec = bench("rocksdb")
    spark.conf.unset(key)

    def jf(v: Double) = String.format(java.util.Locale.ROOT, "%.2f",
      java.lang.Double.valueOf(v))
    println(s"""{"metric":"q83_state_store","memory_sec":${jf(memSec)},"rocksdb_sec":${jf(rocksSec)},"sf":"${new java.io.File(sfDir).getName}"}""")
    spark.stop()
  }
}
