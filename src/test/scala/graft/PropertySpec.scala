package graft

import graft.behavioral.{EventBuf, FunnelMode, FunnelScan}
import graft.behavioral.pattern.{PatternExecutor, PatternParser}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants ported from the reference's proptest modules
  * (reference src/{window_funnel,sequence,sessionize,retention}.rs
  * `proptests`): funnel result bounds, combine-preserves-events, and
  * match ⟺ count>0.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genEvent: Gen[(Long, Int)] = for {
    ts <- Gen.chooseNum(0L, 1000000L)
    conds <- Gen.chooseNum(0, 15) // 4 condition bits
  } yield (ts * 1000000L, conds)

  // same-timestamp order is UNDEFINED (unstable sort, reference parity), so
  // properties like merge-commutativity only hold for distinct timestamps —
  // deduplicate the generated instants
  private val genEvents: Gen[List[(Long, Int)]] =
    Gen.listOfN(40, genEvent).map(_.distinctBy(_._1))

  private def buf(events: Seq[(Long, Int)]): EventBuf = {
    val b = EventBuf.empty()
    events.foreach { case (t, c) => if (c != 0) b.append(t, c) }
    b
  }

  test("funnel result is always in [0, numConds] in every mode") {
    val modes = Seq(FunnelMode.Default, FunnelMode.Strict, FunnelMode.StrictOrder,
      FunnelMode.StrictIncrease, FunnelMode.StrictOnce, FunnelMode.AllowReentry,
      FunnelMode.TimestampDedup, FunnelMode.Strict | FunnelMode.StrictOnce)
    check(Prop.forAll(genEvents) { evs =>
      modes.forall { m =>
        val s = FunnelScan.maxStep(buf(evs), 3600L * 1000000, m, 4)
        s >= 0 && s <= 4
      }
    })
  }

  test("empty buffer gives funnel step 0") {
    check(Prop.forAll(Gen.chooseNum(1, 8)) { n =>
      FunnelScan.maxStep(EventBuf.empty(), 1000000L, FunnelMode.Default, n) == 0
    })
  }

  test("merge order does not change the funnel result (combine commutes)") {
    check(Prop.forAll(genEvents, genEvents) { (a, b0) =>
      // offset partition b by 1µs so no cross-partition ts collision (ties
      // have undefined order by design)
      val b = b0.map { case (t, c) => (t + 1L, c) }
      val m1 = buf(a); m1.appendAll(buf(b))
      val m2 = buf(b); m2.appendAll(buf(a))
      FunnelScan.maxStep(m1, 3600L * 1000000, FunnelMode.Default, 4) ==
        FunnelScan.maxStep(m2, 3600L * 1000000, FunnelMode.Default, 4)
    })
  }

  test("restricting the window never increases the funnel step") {
    check(Prop.forAll(genEvents) { evs =>
      val wide = FunnelScan.maxStep(buf(evs), 3600L * 1000000, FunnelMode.Default, 4)
      val narrow = FunnelScan.maxStep(buf(evs), 60L * 1000000, FunnelMode.Default, 4)
      narrow <= wide
    })
  }

  test("sequence: match is true iff count > 0 (reference src/ffi/sequence.rs:269-291)") {
    val patterns = Seq("(?1)(?2)", "(?1).*(?2)", "(?1).(?2)", "(?1)(?t<=100)(?2)",
      "(?1).*(?3)", "(?2)(?1)")
    check(Prop.forAll(genEvents) { evs =>
      patterns.forall { p =>
        val steps = PatternParser.parse(p).toOption.get
        val b1 = buf(evs); b1.sortByTs()
        val matched = PatternExecutor.execute(steps, b1, countAll = false) > 0
        val b2 = buf(evs); b2.sortByTs()
        val count = PatternExecutor.execute(steps, b2, countAll = true)
        matched == (count > 0)
      }
    })
  }

  test("sequence_count of (?1) equals the number of events with condition 1") {
    check(Prop.forAll(genEvents) { evs =>
      val steps = PatternParser.parse("(?1)").toOption.get
      val b = buf(evs); b.sortByTs()
      val expected = evs.count { case (_, c) => c != 0 && (c & 1) != 0 }
      PatternExecutor.execute(steps, b, countAll = true) == expected
    })
  }

  test("match_events returns one timestamp per (?N) step, in order, or null") {
    check(Prop.forAll(genEvents) { evs =>
      val steps = PatternParser.parse("(?1).*(?2)").toOption.get
      val b = buf(evs); b.sortByTs()
      val got = PatternExecutor.executeCollect(steps, b)
      got == null || (got.length == 2 && got(0) <= got(1))
    })
  }

  test("sorting is stable under presorted input and sorts arbitrary input") {
    check(Prop.forAll(genEvents) { evs =>
      val b = buf(evs)
      b.sortByTs()
      (1 until b.n).forall(i => b.ts(i - 1) <= b.ts(i))
    })
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    check(Prop.forAll(genEvents) { evs =>
      val b = buf(evs)
      val r = EventBuf.deserialize(b.serialize())
      r.n == b.n &&
        (0 until b.n).forall(i => r.ts(i) == b.ts(i) && r.conds(i) == b.conds(i))
    })
  }
}
