package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress-run: synthesizes an N-row event stream (default 10M — 100×
  * the sf0.1 bench table) IN MEMORY via spark.range and times each
  * behavioral aggregate end-to-end at local[32]. Prints one JSON line of
  * rows/sec per operator.
  *
  * This is the 100×-scale-up probe: the sf tables verify correctness; this
  * verifies the aggregation path (partial agg → shuffle of packed buffers →
  * final merge + scan) holds its throughput when groups are 100× larger.
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val users = 100000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // default 128 in-memory groups per partition forces a sort-based
      // fallback for any real group cardinality — raise it so the
      // object-hash aggregate stays hash-based
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.behavioral.BehavioralFunctions.register(spark)

    // deterministic synthetic stream: ~100 events/user, ~5-minute cadence
    // with hash jitter, 4 event types
    spark.range(n).select(
        (col("id") % users).as("user_id"),
        timestamp_micros(lit(1704067200000000L) // 2024-01-01
          + expr(s"id div $users") * 300000000L
          + pmod(xxhash64(col("id")), lit(299000000L))).as("ts"),
        element_at(array(lit("view"), lit("click"), lit("purchase"), lit("error")),
          (pmod(xxhash64(col("id"), lit(7)), lit(4)) + 1).cast("int")).as("event_type"))
      .createOrReplaceTempView("stress_events")
    spark.table("stress_events").cache().count() // materialize input off the clock

    def time(name: String, sql: String): (String, Double) = {
      val t0 = System.nanoTime()
      // noop sink: forces full evaluation — count() would let the optimizer
      // prune the aggregate/window expressions and time only the grouping
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$name%-22s $sec%8.2f s  ${n / sec / 1e6}%8.1f Melem/s")
      name -> sec
    }

    val results = Seq(
      // Spark-native floors at the same scale: the codegen'd HashAggregate
      // count(*) is the cheapest possible group-by; collect_list is Spark's
      // own event-collecting ObjectHashAggregate — the apples-to-apples
      // ceiling for what a buffer-collecting custom aggregate can cost
      time("floor_count_groupby",
        "SELECT user_id, count(*) FROM stress_events GROUP BY user_id"),
      time("floor_collect_list",
        "SELECT user_id, collect_list(ts) FROM stress_events GROUP BY user_id"),
      time("sessionize",
        """SELECT user_id, sessionize(ts, INTERVAL '30' MINUTE)
          |  OVER (PARTITION BY user_id ORDER BY ts) FROM stress_events""".stripMargin),
      time("window_funnel",
        """SELECT user_id, window_funnel(INTERVAL '1' HOUR, ts,
          |  event_type='view', event_type='click', event_type='purchase')
          |FROM stress_events GROUP BY user_id""".stripMargin),
      time("retention",
        """SELECT user_id, retention(event_type='view', event_type='click',
          |  event_type='purchase') FROM stress_events GROUP BY user_id""".stripMargin),
      time("sequence_match",
        """SELECT user_id, sequence_match('(?1).*(?2)', ts,
          |  event_type='view', event_type='purchase')
          |FROM stress_events GROUP BY user_id""".stripMargin),
      time("sequence_count",
        """SELECT user_id, sequence_count('(?1)(?2)', ts,
          |  event_type='view', event_type='click')
          |FROM stress_events GROUP BY user_id""".stripMargin),
      time("sequence_match_events",
        """SELECT user_id, sequence_match_events('(?1).*(?2)', ts,
          |  event_type='view', event_type='purchase')
          |FROM stress_events GROUP BY user_id""".stripMargin),
      time("sequence_next_node",
        """SELECT user_id, sequence_next_node('forward', 'head', ts, event_type,
          |  event_type='view', event_type='view')
          |FROM stress_events GROUP BY user_id""".stripMargin))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"stress_total","value":${results.map(_._2).sum},"unit":"sec","rows":$n,"queries":$qs}""")
    spark.stop()
  }
}
