package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact pipeline's pure logic, pinned (rounds 19/20): the
  * record parsing that failed two rounds running (r17: escaped-quote
  * tail unparsed; r18: compact line clipped), the sf-guard that keeps a
  * different-scale record from becoming a baseline, the floor-relative
  * arithmetic the probe trigger and the `floor_rel` block share, and —
  * round 20 — the COMPOSITE per-query-min baseline that makes one
  * contended capture unable to mask a genuine regression (VERDICT r19
  * #1), the per-family anchor selection (r19 #2), and the compact
  * line's guaranteed-fit degrade ladder (ADVICE r19). These run no
  * Spark — they are exactly the code a contended host cannot be allowed
  * to confuse.
  */
class BenchRecordSpec extends AnyFunSuite {

  test("parseQueriesAndFloor takes the LAST queries block and floors (a clipped tail loses its head)") {
    // detail-line block first (would be clipped in a real tail), then
    // the compact line's — the survivor. Floors likewise.
    val text =
      """{"metric":"total","queries":{"q01_sessionize":9.99,"q02_retention":9.99},"floor_sec":9.9999,"floor2_sec":9.9999,"runs":{}}""" +
        "\n" +
        """{"metric":"total","value":1.23,"queries":{"q01":0.52,"q02":0.31,"q12":0.19},"floor_sec":0.1916,"floor2_sec":0.2842,"sf":"sf0.1"}"""
    val rec = Bench.parseQueriesAndFloor(text)
    assert(rec.queries == Map("q01" -> 0.52, "q02" -> 0.31, "q12" -> 0.19))
    assert(rec.floor == 0.1916)
    assert(rec.floor2 == 0.2842)
  }

  test("parseQueriesAndFloor keys by SHORT name, so detail (full-name) and tail (short-name) records interoperate") {
    val detail =
      """{"queries":{"q01_sessionize":0.45,"q12_text_stats":0.15},"floor_sec":0.1485}"""
    val rec = Bench.parseQueriesAndFloor(detail)
    assert(rec.queries == Map("q01" -> 0.45, "q12" -> 0.15) &&
      rec.floor == 0.1485)
    // a pre-round-20 record has no floor2 — NaN, never a phantom number
    assert(rec.floor2.isNaN)
  }

  test("parseQueriesAndFloor on a clipped/queries-less text degrades to empty, never throws") {
    assert(Bench.parseQueriesAndFloor("").queries.isEmpty)
    assert(Bench.parseQueriesAndFloor("{\"metric\":\"total\"}").queries.isEmpty)
    assert(Bench.parseQueriesAndFloor("no floor here").floor.isNaN)
    assert(Bench.parseQueriesAndFloor("no floor here").floor2.isNaN)
  }

  test("parseQueriesAndFloor handles a driver tail after unescaping (the r17 lesson)") {
    // as stored in BENCH_r*.json: a JSON-escaped blob; the caller
    // unescapes \" before parsing — simulate that exact path
    val stored =
      """{"tail": "\"queries\":{\"q05\":0.25,\"q12\":0.15},\"floor_sec\":0.1485,\"sf\":\"sf0.1\"}"}"""
    val unescaped = stored.replace("\\\"", "\"")
    val rec = Bench.parseQueriesAndFloor(unescaped)
    assert(rec.queries == Map("q05" -> 0.25, "q12" -> 0.15) &&
      rec.floor == 0.1485)
  }

  test("floor2_sec never matches the floor_sec regex (and vice versa)") {
    val rec = Bench.parseQueriesAndFloor(
      """{"queries":{"q01":1.0},"floor_sec":0.10,"floor2_sec":0.50}""")
    assert(rec.floor == 0.10 && rec.floor2 == 0.50)
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

  test("sfMatches refuses a SAME-BASENAME record from a different directory (ADVICE r19)") {
    // a stray /tmp/sf0.1 test fixture must not become the
    // /root/testdata/sf0.1 run's baseline just because the basenames —
    // the scale identity for bare-name records — coincide
    assert(!Bench.sfMatches("/tmp/sf0.1", "/root/testdata/sf0.1"))
    // bare-name records (driver header, compact line) still match by
    // scale identity: they carry no directory to compare
    assert(Bench.sfMatches("sf0.1", "/root/testdata/sf0.1"))
    assert(Bench.sfMatches("0.1", "/root/testdata/sf0.1"))
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

  // ---- round 20: per-family anchors ------------------------------------

  test("anchorOf routes the parallel-shaped families to floor2 and everything else to the scan floor") {
    // streaming, store-protocol, and incremental queries track floor2
    assert(Bench.anchorOf("q71_stream_seq_count", 0.1, 0.5) === 0.5)
    assert(Bench.anchorOf("q121_rollup_store_grained", 0.1, 0.5) === 0.5)
    assert(Bench.anchorOf("q107_incr_session_compact", 0.1, 0.5) === 0.5)
    // a scan/agg query tracks the scan floor
    assert(Bench.anchorOf("q01_sessionize", 0.1, 0.5) === 0.1)
    assert(Bench.anchorOf("q12_text_stats", 0.1, 0.5) === 0.1)
    // both anchors self-normalize: each floor query tracks itself
    assert(Bench.anchorOf(Bench.FloorQuery, 0.1, 0.5) === 0.1)
    assert(Bench.anchorOf(Bench.FloorQuery2, 0.1, 0.5) === 0.5)
  }

  test("anchorOf degrades to the scan floor when the record carries no floor2 (pre-round-20 baselines stay usable)") {
    assert(Bench.anchorOf("q71_stream_seq_count", 0.1, Double.NaN) === 0.1)
    assert(Bench.anchorOf("q71_stream_seq_count", 0.1, -1.0) === 0.1)
  }

  test("coherentAnchors never mixes kinds across the two sides of a comparison") {
    val q = "q71_stream_seq_count"
    // both sides have floor2 and the query tracks it -> floor2/floor2
    assert(Bench.coherentAnchors(q, 0.15, 0.20, 0.10, 0.30) === ((0.20, 0.30)))
    // the baseline predates floor2 -> BOTH sides degrade to the scan
    // floor (this run's floor2 must not ratio against the prev floor1 —
    // that biases every floor2-family ratio by floor2now/floor1now and
    // can mask a regression during the transition rounds)
    assert(Bench.coherentAnchors(q, 0.15, 0.20, 0.10, Double.NaN) ===
      ((0.15, 0.10)))
    // this run's floor2 leg failed -> same degradation, other direction
    assert(Bench.coherentAnchors(q, 0.15, Double.NaN, 0.10, 0.30) ===
      ((0.15, 0.10)))
    // a scan-floor query never touches floor2 even when both sides have it
    assert(Bench.coherentAnchors("q01_sessionize", 0.15, 0.20, 0.10, 0.30) ===
      ((0.15, 0.10)))
  }

  // ---- round 20: composite per-query-min baseline ----------------------

  test("compositeBaseline: a contended capture does not move the baseline (VERDICT r19 #1)") {
    // the r19 shape, literally: a quiet committed record (q71 2.0 s at
    // floor 0.17) and a contended driver capture whose q71 reads 10.07
    // on a FASTER scan floor (non-uniform contention). The composite
    // must keep the quiet entry — floor2 is what normalizes q71, and
    // the contended record's floor2 is inflated right along with q71.
    val quiet = Bench.BenchRec(
      Map("q71" -> 2.0, "q01" -> 0.45), floor = 0.17, floor2 = 0.30)
    val contended = Bench.BenchRec(
      Map("q71" -> 10.07, "q01" -> 0.46), floor = 0.138, floor2 = 1.10)
    val base = Bench.compositeBaseline(Seq(contended, quiet))
    assert(base("q71") == ((2.0, 0.17, 0.30)))
    // q01 (scan-floor family): 0.45/0.17 = 2.65 vs 0.46/0.138 = 3.33 —
    // the quiet record's ratio wins there too
    assert(base("q01") == ((0.45, 0.17, 0.30)))
  }

  test("compositeBaseline: a genuine regression still fires against the composite") {
    val quiet = Bench.BenchRec(
      Map("q71" -> 2.0), floor = 0.17, floor2 = 0.30)
    val contended = Bench.BenchRec(
      Map("q71" -> 10.07), floor = 0.138, floor2 = 1.10)
    val (prev, pf, pf2) = Bench.compositeBaseline(
      Seq(contended, quiet))("q71")
    // this run: same floors as the quiet record, q71 now 7.0 s — a real
    // 3.5x regression must read >2x anchor-relative (the probe trigger)
    val rel = Bench.floorRelOf(7.0, prev,
      Bench.anchorOf("q71_stream_seq_count", 0.17, 0.30),
      Bench.anchorOf("q71_stream_seq_count", pf, pf2))
    assert(rel > 2.0, s"genuine 3.5x regression read $rel")
  }

  test("compositeBaseline: a query only one record has still gets a baseline; no-anchor records fall back to min seconds") {
    val old = Bench.BenchRec(Map("q05" -> 0.30), Double.NaN, Double.NaN)
    val newer = Bench.BenchRec(Map("q05" -> 0.50, "q99" -> 1.0),
      Double.NaN, Double.NaN)
    val base = Bench.compositeBaseline(Seq(newer, old))
    assert(base("q05")._1 === 0.30) // min absolute seconds without anchors
    assert(base("q99")._1 === 1.0)
    // poisoned entries (sec <= 0, the -1 error marker) never win
    val poisoned = Bench.BenchRec(Map("q05" -> -1.0), 0.15, Double.NaN)
    assert(Bench.compositeBaseline(Seq(poisoned, old))("q05")._1 === 0.30)
  }

  test("compositeBaseline of nothing is empty") {
    assert(Bench.compositeBaseline(Seq.empty).isEmpty)
  }

  // ---- round 22: filesystem-regime stamping and the mixing refusal -----

  test("parseQueriesAndFloor reads the fs_mode stamp; unstamped records parse as unknown") {
    val stamped =
      """{"queries":{"q01":0.5},"floor_sec":0.12,"fs_mode":"fast","sf":"sf0.1"}"""
    assert(Bench.parseQueriesAndFloor(stamped).fsMode == "fast")
    val stock =
      """{"queries":{"q01":0.5},"floor_sec":0.12,"fs_mode":"stock","sf":"sf0.1"}"""
    assert(Bench.parseQueriesAndFloor(stock).fsMode == "stock")
    // pre-round-22 records carry no stamp
    val legacy = """{"queries":{"q01":0.5},"floor_sec":0.12,"sf":"sf0.1"}"""
    assert(Bench.parseQueriesAndFloor(legacy).fsMode == "unknown")
  }

  test("regimeOk refuses a mixed-FS record, accepts same-mode and unstamped, and refuses cold-scan captures (VERDICT r21 #5/#6)") {
    def rec(fs: String) = Bench.BenchRec(Map("q01" -> 0.5), 0.12,
      Double.NaN, fs)
    var warned = Seq.empty[String]
    val w = (m: String) => warned :+= m
    // a stock-mode record under a fast-mode run: REFUSED, with a warning
    assert(!Bench.regimeOk("BENCH_rX.json", "{}", rec("stock"), "fast", w))
    assert(warned.exists(_.contains("must not mix")))
    // same regime on both sides: accepted
    assert(Bench.regimeOk("BENCH_rX.json", "{}", rec("fast"), "fast", w))
    assert(Bench.regimeOk("BENCH_rX.json", "{}", rec("stock"), "stock", w))
    // transitional: an unstamped (pre-r22) record is accepted
    assert(Bench.regimeOk("BENCH_rX.json", "{}", rec("unknown"), "fast", w))
    // a cold-scans capture is never a baseline for cached-protocol runs
    assert(!Bench.regimeOk("BENCH_DETAIL_COLD.json",
      """{"queries":{},"cold_scans":true}""", rec("fast"), "fast", w))
  }

  test("compactJson stamps fs_mode (and cold_scans only when set) and the stamp round-trips through the parser") {
    val line = Bench.compactJson(2, 1.0, mkEntries(3), Seq.empty, Seq.empty,
      Some(0.1), Some(0.2), "sf0.1", dropErrors = false,
      maxUnstable = Int.MaxValue, fsMode = "fast", coldScans = false)
    assert(line.contains("\"fs_mode\":\"fast\"") &&
      !line.contains("cold_scans"))
    assert(Bench.parseQueriesAndFloor(line).fsMode == "fast")
    val cold = Bench.compactJson(2, 1.0, mkEntries(3), Seq.empty, Seq.empty,
      Some(0.1), Some(0.2), "sf0.1", dropErrors = false,
      maxUnstable = Int.MaxValue, fsMode = "stock", coldScans = true)
    assert(cold.contains("\"cold_scans\":true"))
    assert(!Bench.regimeOk("x", cold, Bench.parseQueriesAndFloor(cold),
      "stock", _ => ()))
  }

  // ---- round 20: compact line degrade ladder ---------------------------

  private def mkEntries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%02d_some_long_query_name", i * 0.77))

  test("compactJson carries both floors and parses back via parseQueriesAndFloor") {
    val line = Bench.compactJson(2, 12.34, mkEntries(5),
      unstable = Seq("q03_x"), errors = Seq.empty,
      floor = Some(0.1234), floor2 = Some(0.4567), sfName = "sf0.1",
      dropErrors = false, maxUnstable = Int.MaxValue)
    val rec = Bench.parseQueriesAndFloor(line)
    assert(rec.queries.size == 5 && rec.floor == 0.1234 &&
      rec.floor2 == 0.4567)
    assert(line.contains("\"unstable\":[\"q03\"]"))
  }

  test("fitCompact picks the first rung that fits and the ladder is monotone down to the budget") {
    // 128 queries + 12 errors + 30 unstable at precision 2 overflows the
    // budget; the ladder must land on a rung that fits WITHOUT warning
    val entries = mkEntries(128)
    val unstable = (1 to 30).map(i => f"q$i%02d_x")
    val errors = (1 to 12).map(i => (f"q$i%02d_x", "x" * 40))
    def rung(prec: Int, de: Boolean, mu: Int)(): String =
      Bench.compactJson(prec, 99.9, entries, unstable, errors,
        Some(0.1234), Some(0.4567), "sf0.1", de, mu)
    var warned = false
    val line = Bench.fitCompact(Seq(
      rung(2, de = false, mu = Int.MaxValue) _,
      rung(1, de = false, mu = Int.MaxValue) _,
      rung(1, de = true, mu = Int.MaxValue) _,
      rung(1, de = true, mu = 8) _,
      rung(0, de = true, mu = 0) _),
      warn = _ => warned = true)
    assert(line.length <= Bench.CompactBudget,
      s"ladder emitted ${line.length} chars over the ${Bench.CompactBudget} budget")
    assert(!warned, "ladder warned despite a fitting rung")
    // and whatever rung won still parses as a baseline record
    val rec = Bench.parseQueriesAndFloor(line)
    assert(rec.queries.size == 128 && rec.floor == 0.1234 &&
      rec.floor2 == 0.4567)
  }

  test("fitCompact keeps full precision when the normal line fits") {
    val entries = mkEntries(10)
    def rung(prec: Int)(): String =
      Bench.compactJson(prec, 9.9, entries, Seq.empty, Seq.empty,
        Some(0.1234), Some(0.4567), "sf0.1", dropErrors = false,
        maxUnstable = Int.MaxValue)
    val line = Bench.fitCompact(Seq(rung(2) _, rung(1) _, rung(0) _))
    assert(line.contains("\"q01\":0.77")) // two decimals survived
  }

  test("fitCompact warns (but still emits) when even the final rung overflows") {
    var warned = false
    val line = Bench.fitCompact(
      Seq(() => "x" * 5000), budget = 100, warn = _ => warned = true)
    assert(warned && line.length == 5000)
  }

  test("the committed BENCH_DETAIL.json parses as a usable baseline") {
    // the artifact the next round's probe trigger reads — a broken
    // commit of it would silently disable round-over-round adjudication
    val f = new java.io.File("BENCH_DETAIL.json")
    assume(f.isFile, "no committed detail record in this checkout")
    val text = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val rec = Bench.parseQueriesAndFloor(text)
    assert(rec.queries.size >= 100,
      s"committed detail has only ${rec.queries.size} queries — clobbered by a filtered run?")
    assert(!rec.floor.isNaN && rec.floor > 0 && rec.floor < 10,
      s"committed detail floor_sec is unusable: ${rec.floor}")
    assert(rec.queries.contains(Bench.short(Bench.FloorQuery)),
      "the floor query itself is missing from the committed record")
    // round 20+: the committed record must carry the parallel anchor
    // too, or every floor2-family comparison silently degrades to the
    // scan floor against it
    assert(!rec.floor2.isNaN && rec.floor2 > 0 && rec.floor2 < 10,
      s"committed detail floor2_sec is unusable: ${rec.floor2}")
    assert(rec.queries.contains(Bench.short(Bench.FloorQuery2)),
      "the parallel floor query is missing from the committed record")
  }
}
