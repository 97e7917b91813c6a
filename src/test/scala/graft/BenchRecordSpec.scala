package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact pipeline's pure logic, pinned (round 19): the
  * record parsing that failed two rounds running (r17: escaped-quote
  * tail unparsed; r18: compact line clipped, `parsed: null`), the
  * sf-guard that keeps a different-scale record from becoming a
  * baseline, and the floor-relative arithmetic the probe trigger and
  * the `floor_rel` block share. These run no Spark — they are exactly
  * the code a contended host cannot be allowed to confuse.
  */
class BenchRecordSpec extends AnyFunSuite {

  test("parseQueriesAndFloor takes the LAST queries block and floor (a clipped tail loses its head)") {
    // detail-line block first (would be clipped in a real tail), then
    // the compact line's — the survivor. Floors likewise.
    val text =
      """{"metric":"total","queries":{"q01_sessionize":9.99,"q02_retention":9.99},"floor_sec":9.9999,"runs":{}}""" +
        "\n" +
        """{"metric":"total","value":1.23,"queries":{"q01":0.52,"q02":0.31,"q12":0.19},"floor_sec":0.1916,"sf":"sf0.1"}"""
    val (qs, floor) = Bench.parseQueriesAndFloor(text)
    assert(qs == Map("q01" -> 0.52, "q02" -> 0.31, "q12" -> 0.19))
    assert(floor == 0.1916)
  }

  test("parseQueriesAndFloor keys by SHORT name, so detail (full-name) and tail (short-name) records interoperate") {
    val detail =
      """{"queries":{"q01_sessionize":0.45,"q12_text_stats":0.15},"floor_sec":0.1485}"""
    val (qs, floor) = Bench.parseQueriesAndFloor(detail)
    assert(qs == Map("q01" -> 0.45, "q12" -> 0.15) && floor == 0.1485)
  }

  test("parseQueriesAndFloor on a clipped/queries-less text degrades to empty, never throws") {
    assert(Bench.parseQueriesAndFloor("")._1.isEmpty)
    assert(Bench.parseQueriesAndFloor("{\"metric\":\"total\"}")._1.isEmpty)
    assert(Bench.parseQueriesAndFloor("no floor here")._2.isNaN)
  }

  test("parseQueriesAndFloor handles a driver tail after unescaping (the r17 lesson)") {
    // as stored in BENCH_r*.json: a JSON-escaped blob; the caller
    // unescapes \" before parsing — simulate that exact path
    val stored =
      """{"tail": "\"queries\":{\"q05\":0.25,\"q12\":0.15},\"floor_sec\":0.1485,\"sf\":\"sf0.1\"}"}"""
    val unescaped = stored.replace("\\\"", "\"")
    val (qs, floor) = Bench.parseQueriesAndFloor(unescaped)
    assert(qs == Map("q05" -> 0.25, "q12" -> 0.15) && floor == 0.1485)
  }

  test("sfMatches accepts full path, basename, and the driver's bare number — and refuses other scales") {
    val run = "/root/testdata/sf0.1"
    assert(Bench.sfMatches("/root/testdata/sf0.1", run))
    assert(Bench.sfMatches("sf0.1", run))
    assert(Bench.sfMatches("0.1", run)) // driver header: "sf": 0.1
    assert(!Bench.sfMatches("/root/testdata/sf0.01", run))
    assert(!Bench.sfMatches("sf1", run))
    assert(!Bench.sfMatches("0.01", run))
    // and a non-standard local dir only matches itself
    assert(Bench.sfMatches("/tmp/sf3", "/tmp/sf3"))
    assert(!Bench.sfMatches("/tmp/sf3", run))
  }

  test("floorRelOf cancels the host term when both floors are present") {
    // query moved 2x absolute, but the floor also moved 2x -> 1.0
    assert(Bench.floorRelOf(2.0, 1.0, 0.3, 0.15) === 1.0)
    // floor flat, query doubled -> 2.0 (a genuine mover)
    assert(Bench.floorRelOf(2.0, 1.0, 0.15, 0.15) === 2.0)
    // query flat, host halved its floor -> 2.0 floor-relative is
    // CORRECT (the query failed to speed up with the machine)
    assert(Bench.floorRelOf(1.0, 1.0, 0.075, 0.15) === 2.0)
  }

  test("floorRelOf degrades to the absolute ratio without floors, NaN without a usable prev") {
    assert(Bench.floorRelOf(2.0, 1.0, Double.NaN, 0.15) === 2.0)
    assert(Bench.floorRelOf(2.0, 1.0, 0.15, Double.NaN) === 2.0)
    assert(Bench.floorRelOf(2.0, Double.NaN, 0.15, 0.15).isNaN)
    // prev at/below the 0.05 s noise floor adjudicates nothing
    assert(Bench.floorRelOf(2.0, 0.05, 0.15, 0.15).isNaN)
    assert(Bench.floorRelOf(-1.0, 1.0, 0.15, 0.15).isNaN)
  }

  test("short truncates at the first underscore and leaves bare keys alone") {
    assert(Bench.short("q12_text_stats") == "q12")
    assert(Bench.short("q127_rollup_store_snapshot_reader") == "q127")
    assert(Bench.short("q12") == "q12")
  }

  test("the committed BENCH_DETAIL.json parses as a usable baseline") {
    // the artifact the next round's probe trigger reads — a broken
    // commit of it would silently disable round-over-round adjudication
    val f = new java.io.File("BENCH_DETAIL.json")
    assume(f.isFile, "no committed detail record in this checkout")
    val text = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val (qs, floor) = Bench.parseQueriesAndFloor(text)
    assert(qs.size >= 100,
      s"committed detail has only ${qs.size} queries — clobbered by a filtered run?")
    assert(!floor.isNaN && floor > 0 && floor < 10,
      s"committed detail floor_sec is unusable: $floor")
    assert(qs.contains(Bench.short(Bench.FloorQuery)),
      "the floor query itself is missing from the committed record")
  }
}
