package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement harness (guide §1.1/§1.5): runs selected SparkEntry
  * queries once warm and prints EVERY Spark job the execution submitted —
  * wall duration, stage count, and description — plus the gaps between
  * jobs (driver-side work: metadata listings, footer reads, planning).
  * This is how a multi-job protocol query (store cycles, incremental
  * session, streaming harness) is broken into its billable phases without
  * touching the query code. Bench-identical session config.
  */
object QueryJobProfile {
  private final case class JobRow(id: Int, desc: String, start: Long,
      var end: Long, stages: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filterNot(_.startsWith("q"))
      .getOrElse("/root/testdata/sf0.1")
    val names = args.filter(_.startsWith("q"))
    require(names.nonEmpty, "usage: QueryJobProfile [sfDir] q58 q107 ...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // filesystem mode resolved by the same helper as Bench/Verify, so
    // the profiler measures the regime actually being benched (the
    // stock A/B mode included — round-22 ADVICE)
    val spark = graft.sources.HarnessFs.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (t <- graft.sources.Tables.names) {
      try graft.sources.Tables.load(spark, sfDir, t).cache().count()
      catch { case _: Throwable => () }
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, JobRow(e.jobId, desc, e.time, -1L, e.stageIds.size))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
    })
    // driver-thread sampler (guide §7.3 in-process): histogram the MAIN
    // thread's deepest interesting frame while a query runs, to attribute
    // the driver/gap time between jobs
    val mainThread = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          if (st.nonEmpty) {
            val key = st.take(24).map(e => e.getClassName + "." + e.getMethodName)
              .find(f => f.startsWith("org.apache.spark") || f.startsWith("graft") ||
                f.startsWith("org.apache.hadoop") || f.startsWith("org.apache.parquet"))
              .getOrElse(st.head.getClassName + "." + st.head.getMethodName)
            hist.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.contains) }
    for ((name, fn) <- selected) {
      // one discarded warmup, like Bench
      graft.ops.OpCaches.unpersistAll()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        println(s"$name WARMUP ERROR: ${e.getMessage}"); }
      graft.ops.OpCaches.unpersistAll()
      jobs.clear(); hist.clear(); sampling = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      graft.ops.OpCaches.unpersistAll()
      val rows = {
        import scala.jdk.CollectionConverters._
        jobs.values.asScala.toSeq.sortBy(_.start)
      }
      println(f"\n==== $name wall $wall%.3f s, ${rows.size} jobs ====")
      var prevEnd = -1L
      for (r <- rows) {
        val gap = if (prevEnd < 0) 0.0 else (r.start - prevEnd) / 1e3
        val dur = if (r.end < 0) Double.NaN else (r.end - r.start) / 1e3
        println(f"job ${r.id}%3d  dur $dur%7.3f s  gap-before $gap%7.3f s  " +
          f"stages ${r.stages}%2d  ${r.desc.take(90)}")
        prevEnd = math.max(prevEnd, if (r.end < 0) r.start else r.end)
      }
      val jobSum = rows.collect { case r if r.end > 0 => (r.end - r.start) / 1e3 }.sum
      println(f"jobs-sum $jobSum%.3f s, driver/gaps ${wall - jobSum}%.3f s")
      locally {
        import scala.jdk.CollectionConverters._
        val top = hist.asScala.toSeq.sortBy(-_._2).take(18)
        val n = hist.asScala.values.map(_.intValue).sum.max(1)
        println(s"main-thread samples $n (~20ms each):")
        top.foreach { case (k, c) =>
          println(f"  ${c.intValue * 100.0 / n}%5.1f%% ($c%4d) $k") }
      }
    }
    spark.stop()
  }
}
