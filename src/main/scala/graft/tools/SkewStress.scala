package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew stress-run: measures `Skew.saltedEquiJoin` against the plain
  * shuffled join on a deliberately skewed fact table — `heavyFrac` of all
  * rows carry ONE key. With broadcast and AQE skew handling disabled (the
  * scenario the rewrite exists for: a non-broadcastable mid-size side and
  * no runtime stats), the plain join puts the heavy key's entire
  * population in one task; the salted join spreads it over `salts` tasks.
  * Prints one JSON line with both timings.
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val dimN = 200000L
    val heavyFrac = 0.5
    val salts = 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fact: heavyFrac of rows hit key 7; the rest spread uniformly
    val fact = spark.range(n).select(
        when(pmod(xxhash64(col("id")), lit(1000)) < lit((heavyFrac * 1000).toLong), lit(7L))
          .otherwise(pmod(xxhash64(col("id") + 1), lit(dimN))).as("k"),
        (col("id") % 1000).cast("double").as("v"))
      .cache()
    fact.count()
    val dim = spark.range(dimN).select(col("id").as("rk"),
      (col("id") % 97).cast("double").as("w")).cache()
    dim.count()

    def time(label: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[skew] $label%-12s $sec%8.2f s  ($rows rows)")
      (label, sec, rows)
    }

    // the aggregate forces full evaluation of the join output
    val (_, plainSec, plainRows) = time("plain") {
      fact.join(dim, col("k") === col("rk"))
        .agg(sum(col("v") * col("w")), count(lit(1))).collect()(0).getLong(1)
    }
    val (_, saltedSec, saltedRows) = time("salted") {
      graft.ops.Skew.saltedEquiJoin(fact, dim, "k", "rk", salts)
        .agg(sum(col("v") * col("w")), count(lit(1))).collect()(0).getLong(1)
    }
    require(plainRows == saltedRows,
      s"row mismatch: plain=$plainRows salted=$saltedRows")
    // third variant: the SAME plain join with AQE's native skew-join split
    // re-enabled — the planner-dependent alternative to the explicit salt.
    // Where AQE is available AND the join is sort-merge AND runtime stats
    // surface the skew, this is the zero-code path; the salt remains the
    // option when the probe side must stay hash-partitioned (a stored
    // bucketed layout) or AQE is off. Measured here so SCALE.md can state
    // when each applies with numbers instead of folklore.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val (_, aqeSec, aqeRows) = time("aqe_skew") {
      fact.join(dim, col("k") === col("rk"))
        .agg(sum(col("v") * col("w")), count(lit(1))).collect()(0).getLong(1)
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    require(plainRows == aqeRows,
      s"row mismatch: plain=$plainRows aqe=$aqeRows")
    // Locale.ROOT: the f-interpolator's default-locale decimals break JSON
    // under comma-decimal locales (same fix as Bench)
    def jf(v: Double) = String.format(java.util.Locale.ROOT, "%.2f",
      java.lang.Double.valueOf(v))
    println(s"""{"metric":"skew_join","rows":$n,"heavy_frac":$heavyFrac,"salts":$salts,"plain_sec":${jf(plainSec)},"salted_sec":${jf(saltedSec)},"aqe_skew_sec":${jf(aqeSec)},"joined_rows":$plainRows}""")
    spark.stop()
  }
}
