package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential testing of all 8 sequence_next_node direction × base
  * combinations: the distributed aggregate vs an independent local walk
  * over each user's ts-sorted events, on random data including NULL values
  * and multi-step chains. (The driver oracle covers 6 of 8 combos on the
  * fixed testdata; this covers all 8 on randomized streams.)
  */
class NextNodeDifferentialSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  /** (value, baseCond, step1Cond, step2Cond) per event, ts-sorted. */
  private case class Ev(value: String, base: Boolean, s1: Boolean, s2: Boolean)

  /** Local truth, written from the reference's documented semantics:
    * forward matches steps left-to-right from the base and answers the value
    * AFTER the last matched event; backward matches right-to-left and
    * answers the value BEFORE the earliest matched event. first_match scans
    * bases in direction order and keeps the FIRST non-null answer;
    * last_match keeps the LAST. */
  private def localNextNode(evs: IndexedSeq[Ev], forward: Boolean, base: String): Option[String] = {
    val n = evs.length
    def stepCond(i: Int, s: Int): Boolean = if (s == 0) evs(i).s1 else evs(i).s2
    def tryForward(start: Int): Option[Option[String]] = {
      if (!stepCond(start, 0)) return None
      var last = start
      var step = 1
      var pos = start + 1
      while (pos < n && step < 2) {
        if (stepCond(pos, step)) { last = pos; step += 1 }
        pos += 1
      }
      if (step != 2) None
      else if (last + 1 >= n) None
      else Some(Option(evs(last + 1).value))
    }
    def tryBackward(start: Int): Option[Option[String]] = {
      if (!stepCond(start, 0)) return None
      var earliest = start
      var step = 1
      var pos = start - 1
      while (pos >= 0 && step < 2) {
        if (stepCond(pos, step)) { earliest = pos; step += 1 }
        pos -= 1
      }
      if (step != 2) None
      else if (earliest == 0) None
      else Some(Option(evs(earliest - 1).value))
    }
    val tryFrom: Int => Option[Option[String]] = if (forward) tryForward else tryBackward
    val bases = evs.indices.filter(i => evs(i).base)
    val result: Option[Option[String]] = base match {
      case "head" => bases.headOption.flatMap(tryFrom)
      case "tail" => bases.lastOption.flatMap(tryFrom)
      case "first_match" =>
        // scan order follows direction; a NULL-valued answer does NOT stop
        // the search (matches the aggregate: null results keep scanning)
        val order = if (forward) bases else bases.reverse
        order.iterator.map(tryFrom).collectFirst { case Some(v) if v.isDefined => v }
      case "last_match" =>
        val order = if (forward) bases else bases.reverse
        order.foldLeft(Option.empty[Option[String]]) { (acc, i) =>
          tryFrom(i) match { case Some(v) if v.isDefined => Some(v); case _ => acc }
        }
    }
    result.flatten
  }

  test("all 8 direction x base combos match the local walk on random data with NULL values") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 1200).map { i =>
        val uid = rnd.nextInt(31).toLong
        val ts = new java.sql.Timestamp(1704067200000L + i * 1000L)
        val v = if (rnd.nextInt(10) == 0) null else "pqrs".charAt(rnd.nextInt(4)).toString
        (uid, ts, v)
      }
      rows.toDF("user_id", "ts", "v").createOrReplaceTempView("nn_events")
      // base: v = 'p'; steps: v = 'p' then v = 'q'
      val local: Map[Long, IndexedSeq[Ev]] = rows.groupBy(_._1).map { case (uid, es) =>
        uid -> es.sortBy(_._2.getTime)
          .map(e => Ev(e._3, e._3 == "p", e._3 == "p", e._3 == "q")).toIndexedSeq
      }
      for (dir <- Seq("forward", "backward"); base <- Seq("head", "tail", "first_match", "last_match")) {
        val got = spark.sql(
          s"""SELECT user_id, sequence_next_node('$dir', '$base', ts, v,
             |  v = 'p', v = 'p', v = 'q') AS nn
             |FROM nn_events GROUP BY user_id""".stripMargin)
          .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
        for ((uid, g) <- got) {
          val want = localNextNode(local(uid), dir == "forward", base)
          assert(g === want, s"seed=$seed $dir/$base user=$uid: aggregate=$g local=$want")
        }
      }
    }
  }
}
