package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
  * vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it
  * under `spark.sql.legacy.parquet.nanosAsLong=true` (nanos surface as a
  * LongType column) and truncate to microseconds — the same truncation DuckDB
  * applies when it narrows TIMESTAMP_NS to its native µs TIMESTAMP, so Spark
  * results and the DuckDB oracle agree on timestamp values.
  */
object Tables {

  /** Load one testdata table by name with schema normalization. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val prev = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
