package graft

import graft.behavioral.EventBuf
import graft.behavioral.pattern._
import org.scalatest.funsuite.AnyFunSuite

/** Pure pattern-engine tests (no Spark). Mirrors the reference's parser and
  * executor unit tests (`src/pattern/parser.rs`, `src/pattern/executor.rs`). */
class PatternParserSpec extends AnyFunSuite {

  private def ok(p: String): Array[PStep] = PatternParser.parse(p).toOption.get
  private def bad(p: String): PatternError = PatternParser.parse(p).swap.toOption.get

  test("simple conditions are 1-indexed -> 0-indexed") {
    assert(ok("(?1)(?2)(?3)").toSeq === Seq(PCond(0), PCond(1), PCond(2)))
  }

  test("wildcards and dots") {
    assert(ok("(?1).*(?2)").toSeq === Seq(PCond(0), PAny, PCond(1)))
    assert(ok("(?1).(?2)").toSeq === Seq(PCond(0), POne, PCond(1)))
    assert(ok(".*").toSeq === Seq(PAny))
    assert(ok(".").toSeq === Seq(POne))
  }

  test("time constraints, all six operators") {
    assert(ok("(?1)(?t>=3600)(?2)").toSeq === Seq(PCond(0), PTime(TimeOp.Gte, 3600), PCond(1)))
    assert(ok("(?t<=10)").toSeq === Seq(PTime(TimeOp.Lte, 10)))
    assert(ok("(?t>5)").toSeq === Seq(PTime(TimeOp.Gt, 5)))
    assert(ok("(?t<5)").toSeq === Seq(PTime(TimeOp.Lt, 5)))
    assert(ok("(?t==5)").toSeq === Seq(PTime(TimeOp.Eq, 5)))
    assert(ok("(?t!=5)").toSeq === Seq(PTime(TimeOp.Ne, 5))) // extension beyond ClickHouse
  }

  test("whitespace between steps is skipped") {
    assert(ok("(?1) .* (?2)").toSeq === Seq(PCond(0), PAny, PCond(1)))
  }

  test("errors: empty, (?0), trailing garbage, malformed") {
    assert(bad("").message === "empty pattern")
    assert(bad("   ").message === "empty pattern")
    assert(bad("(?0)").message.contains("1-indexed"))
    assert(bad("(?1)x").message.contains("unexpected character"))
    assert(bad("(?t~5)").message.contains("comparison operator"))
    assert(bad("(?1").message.contains("expected ')'"))
    assert(bad("(?)").message.contains("digit or 't'"))
  }
}

class PatternExecutorSpec extends AnyFunSuite {

  /** events as (tsSeconds, mask) pairs */
  private def buf(events: (Long, Int)*): EventBuf = {
    val b = EventBuf.empty()
    events.foreach { case (t, m) => b.append(t * 1000000L, m) }
    b
  }
  private def steps(p: String): Array[PStep] = PatternParser.parse(p).toOption.get
  private def matches(p: String, b: EventBuf): Boolean =
    PatternExecutor.execute(steps(p), b, countAll = false) > 0
  private def count(p: String, b: EventBuf): Long =
    PatternExecutor.execute(steps(p), b, countAll = true)

  // masks: bit0 = cond1, bit1 = cond2, bit2 = cond3
  test("adjacent fast path") {
    assert(matches("(?1)(?2)(?3)", buf((0, 1), (300, 2), (600, 4))))
    assert(!matches("(?1)(?2)(?3)", buf((0, 1), (300, 4), (600, 2))))
    // non-adjacent conditions don't match the adjacent pattern
    assert(!matches("(?1)(?3)", buf((0, 1), (300, 2), (600, 4))))
  }

  test("wildcard fast path is subsequence matching") {
    assert(matches("(?1).*(?3)", buf((0, 1), (300, 2), (600, 4))))
    assert(matches("(?1).*(?3)", buf((0, 1), (600, 4))))
    assert(!matches("(?1).*(?3)", buf((600, 4), (700, 1))))
  }

  test("non-overlapping count resumes after match end") {
    assert(count("(?1).*(?2)", buf((0, 1), (1, 2), (2, 1), (3, 2))) === 2L)
    assert(count("(?1).*(?2)", buf((0, 1), (1, 1), (2, 2), (3, 2))) === 1L)
    assert(count("(?1)(?2)", buf((0, 1), (1, 2), (2, 1), (3, 2))) === 2L)
    // overlapping occurrences counted non-overlapping: 1,2,1 with (?1)(?2) -> 1
    assert(count("(?1)(?2)", buf((0, 1), (1, 3), (2, 2))) === 1L)
  }

  test("dot consumes exactly one event") {
    assert(matches("(?1).(?3)", buf((0, 1), (300, 2), (600, 4))))
    assert(!matches("(?1).(?3)", buf((0, 1), (600, 4))))
    assert(!matches("(?1).(?3)", buf((0, 1), (1, 2), (2, 2), (600, 4))))
  }

  test("time constraints use whole-second integer division vs previous matched event") {
    // elapsed 3599.9s -> floor 3599 seconds
    val b = EventBuf.empty()
    b.append(0L, 1)
    b.append(3599900000L, 2)
    assert(matches("(?1)(?t<3600)(?2)", b))
    assert(!matches("(?1)(?t>=3600)(?2)", b))
    assert(matches("(?1)(?t==3599)(?2)", b))
    assert(matches("(?1)(?t!=3600)(?2)", b))
  }

  test("time constraint is vacuously true with no previous match") {
    assert(matches("(?t>=100)(?1)", buf((0, 1))))
  }

  test("time constraint does not consume an event") {
    assert(matches("(?1)(?t>=300)(?2)", buf((0, 1), (300, 2))))
    assert(!matches("(?1)(?t>300)(?2)", buf((0, 1), (300, 2))))
  }

  test("lazy .* with backtracking via NFA (complex shape)") {
    // (?1).*(?t>=600)(?2): first cond2 at 300 fails the constraint, the later
    // one at 900 needs .* to consume events — requires backtracking
    assert(matches("(?1).*(?t>=600)(?2)", buf((0, 1), (300, 2), (900, 2))))
    assert(!matches("(?1).*(?t>=600)(?2)", buf((0, 1), (300, 2), (400, 2))))
  }

  test("runaway guard: pathological pattern aborts as no-match") {
    val big = EventBuf.empty()
    (0 until 5000).foreach(i => big.append(i.toLong * 1000000L, 1))
    // .*.*.*.* explosion hits MAX_NFA_STATES and yields no match per start
    assert(!matches(".*.*.*.*(?2)", big))
  }

  test("empty events never match") {
    assert(!matches("(?1)", EventBuf.empty()))
    assert(count("(?1)", EventBuf.empty()) === 0L)
  }

  test("collect returns per-condition timestamps of first match in pattern order") {
    val got = PatternExecutor.executeCollect(steps("(?1)(?2)(?3)"),
      buf((0, 1), (300, 2), (600, 4)))
    assert(got.toSeq === Seq(0L, 300000000L, 600000000L))
    // wildcards contribute nothing
    val got2 = PatternExecutor.executeCollect(steps("(?1).*(?3)"),
      buf((0, 1), (300, 2), (600, 4)))
    assert(got2.toSeq === Seq(0L, 600000000L))
    assert(PatternExecutor.executeCollect(steps("(?1)(?3)"),
      buf((0, 1), (300, 2), (600, 4))) === null)
  }

  test("mask bit 31/32 boundary: conditions above 32 never match") {
    val b = EventBuf.empty()
    b.append(0L, Int.MinValue) // only bit 31 set
    assert(matches("(?32)", b))
    assert(!matches("(?31)", b))
  }

  test("sort: unsorted events are ordered before matching") {
    val b = buf((600, 4), (0, 1), (300, 2))
    b.sortByTs()
    assert(matches("(?1)(?2)(?3)", b))
  }
}
