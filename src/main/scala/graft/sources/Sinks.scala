package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table sink: the storage-layout half of co-located joins.
  *
  * `writeBucketed` persists a frame hash-partitioned into `nBuckets` files
  * per partition by the bucket keys (Spark's Hive-compatible bucketing:
  * `bucketBy` + `sortBy`, registered in the session catalog with an
  * explicit external path so nothing lands in a default warehouse).
  * A join or aggregation whose keys cover the bucket keys then plans
  * WITHOUT an Exchange on the bucketed side(s) — at 100 TB that deletes
  * the single largest cost of a fact-fact join: both shuffles. Writing
  * the layout costs one shuffle-equivalent up front and amortizes over
  * every downstream join against it, which is the standard warehouse
  * trade (layout once, join forever).
  *
  * Reference scope note: the reference engine (DuckDB extension) inherits
  * DuckDB's storage and has no bucketing concept; this is Spark-native
  * scale plumbing, same category as `writeIvfPartitioned`.
  */
object Sinks {

  /** Write `df` as a bucketed external parquet table at `path`, replacing
    * any previous table of the same name. Keys order matters: joins
    * co-locate when their keys cover the bucket keys with equal bucket
    * counts on both sides. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      nBuckets: Int, key: String, moreKeys: String*): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog,
    * so this must go through the table name, not the path). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
