package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local SparkSession for all suites. */
object GraftSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.behavioral.BehavioralFunctions.register(s)
    s
  }

  /** Builds a DataFrame from SQL VALUES + casts — keeps fixtures readable. */
  def df(sql: String): DataFrame = spark.sql(sql)
}
