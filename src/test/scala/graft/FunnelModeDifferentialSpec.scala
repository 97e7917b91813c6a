package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential testing of every funnel MODE: the distributed aggregate
  * (update/merge/serialize across shuffles) vs an independent local walk of
  * the documented semantics over each user's sorted events.
  *
  * The generator emits OVERLAPPING conditions (multi-advance is reachable)
  * and exact-duplicate events (same ts AND type — exercising
  * timestamp_dedup / strict_increase without ambiguous tie order: the
  * buffer's sort is unstable like the reference's, so only ties between
  * identical events are order-insensitive).
  */
class FunnelModeDifferentialSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private val WindowUs = 300L * 1000000 // 5 minutes

  // cond masks over event types a..d: c1 = {a,b}, c2 = {b,c}, c3 = {c,d}
  private def maskOf(et: String): Int = et match {
    case "a" => 1
    case "b" => 1 | 2
    case "c" => 2 | 4
    case "d" => 4
  }

  /** Independent local truth for one user's ts-sorted events. */
  private def localFunnel(evs: IndexedSeq[(Long, Int)], mode: String, n: Int): Int = {
    val m = mode.split(",").map(_.trim).filter(_.nonEmpty).toSet
    def scan(entry: Int): Int = {
      val entryTs = evs(entry)._1
      var step = 1
      var prevTs = entryTs
      var i = entry + 1
      while (i < evs.length) {
        val (t, cm) = evs(i)
        if (t - entryTs > WindowUs) return step
        var skip = false
        if (m.contains("allow_reentry") && step > 1 && (cm & 1) != 0) {
          step = 1; prevTs = t; skip = true
        }
        if (!skip && (m.contains("strict") || m.contains("strict_deduplication")) &&
            (cm & (1 << (step - 1))) != 0 && (cm & (1 << step)) == 0) return step
        if (!skip && m.contains("strict_order") &&
            (0 until step).exists(k => (cm & (1 << k)) != 0)) return step
        if (!skip && m.contains("timestamp_dedup") && t == prevTs &&
            (cm & (1 << step)) != 0) skip = true
        if (!skip && m.contains("strict_increase") &&
            (cm & (1 << step)) != 0 && t <= prevTs) skip = true
        if (!skip) {
          var adv = true
          while (adv && (cm & (1 << step)) != 0) {
            step += 1; prevTs = t
            if (step >= n) return n
            if (m.contains("strict_once")) adv = false
          }
        }
        i += 1
      }
      step
    }
    val entries = evs.indices.filter(i => (evs(i)._2 & 1) != 0)
    if (entries.isEmpty) 0 else entries.map(scan).max
  }

  private def mkEvents(seed: Int, n: Int, u: Int): Seq[(Long, Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    var i = 0
    while (i < n) {
      val user = rnd.nextInt(u).toLong
      val ts = 1704067200000000L + rnd.nextInt(600) * 1000000L + i // unique µs
      val et = "abcd".charAt(rnd.nextInt(4)).toString
      out += ((user, ts, et))
      if (rnd.nextInt(10) < 3) out += ((user, ts, et)) // exact duplicate
      i += 1
    }
    out.toSeq
  }

  private val Modes = Seq("", "strict", "strict_order", "timestamp_dedup",
    "strict_increase", "strict_once", "allow_reentry",
    "strict_increase, strict_once", "strict_order, timestamp_dedup")

  test("every funnel mode matches the independent local walk on random overlapping-cond data") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rows = mkEvents(seed, n = 1500, u = 29)
      rows.map { case (uid, ts, et) => (uid, new java.sql.Timestamp(ts / 1000), (ts % 1000).toInt, et) }
        .toDF("user_id", "ts_ms", "us", "et")
        .selectExpr("user_id", "timestamp_micros(unix_micros(ts_ms) + us) AS ts", "et")
        .createOrReplaceTempView("mode_events")
      val local: Map[Long, Map[String, Int]] = rows
        .groupBy(_._1)
        .map { case (uid, es) =>
          val sorted = es.map(e => (e._2, maskOf(e._3))).sortBy(_._1).toIndexedSeq
          uid -> Modes.map(m => m -> localFunnel(sorted, m, 3)).toMap
        }
      for (mode <- Modes) {
        val modeArg = if (mode.isEmpty) "" else s"'$mode', "
        val got = spark.sql(
          s"""SELECT user_id, window_funnel(INTERVAL '5' MINUTE, $modeArg ts,
             |  et IN ('a','b'), et IN ('b','c'), et IN ('c','d')) AS s
             |FROM mode_events GROUP BY user_id""".stripMargin)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got.keySet === local.keySet, s"seed=$seed mode='$mode'")
        for ((uid, s) <- got) {
          assert(s === local(uid)(mode),
            s"seed=$seed mode='$mode' user=$uid: aggregate=$s local=${local(uid)(mode)}")
        }
      }
    }
  }
}
