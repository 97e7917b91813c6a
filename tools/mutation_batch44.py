#!/usr/bin/env python3
"""Mutation batch 44 — the bench artifact pipeline's pure logic
(record parsing, sf-guard, floor-relative arithmetic) extracted and
pinned in round 19.

Usage: python3 tools/mutation_batch44.py [ids...]
"""
import subprocess, sys
from pathlib import Path

B = "src/main/scala/graft/Bench.scala"
SPEC = "graft.BenchRecordSpec"

MUTANTS = [
    ("BP441", B, [SPEC],
     "parseQueriesAndFloor reads the FIRST queries block (a clipped tail's half-eaten detail line wins)",
     """        .findAllMatchIn(blocks.last.group(1))""",
     """        .findAllMatchIn(blocks.head.group(1))"""),
    ("BP442", B, [SPEC],
     "short() stops truncating — detail (full-name) and tail (short-name) records stop interoperating",
     """  private[graft] def short(n: String): String = n.takeWhile(_ != '_')""",
     """  private[graft] def short(n: String): String = n"""),
    ("BP443", B, [SPEC],
     "sfMatches name check always true — a different-scale record becomes the baseline",
     """    val byName =
      new java.io.File(recorded).getName == mine || ("sf" + recorded) == mine""",
     """    val byName =
      new java.io.File(recorded).getName == mine || ("sf" + recorded) == mine || true"""),
    ("BP444", B, [SPEC],
     "floorRelOf never cancels the host term (always the absolute ratio)",
     """    if (!floorNow.isNaN && floorNow > 0 && !prevFloor.isNaN && prevFloor > 0)
      (sec / floorNow) / (prev / prevFloor)
    else sec / prev""",
     """    sec / prev"""),
    ("BP445", B, [SPEC],
     "floorRelOf noise-floor guard dropped — a 0.05s prev adjudicates",
     """    if (prev.isNaN || prev <= 0.05 || sec <= 0) return Double.NaN""",
     """    if (prev.isNaN || prev <= 0 || sec <= 0) return Double.NaN"""),
]


def run(mid, fname, suites, desc, old, new):
    p = Path(fname)
    orig = p.read_text()
    if old not in orig:
        print(f"{mid}: PATTERN NOT FOUND in {fname}", flush=True)
        return "pattern-missing"
    if orig.count(old) != 1:
        print(f"{mid}: pattern not unique in {fname}", flush=True)
        return "pattern-ambiguous"
    p.write_text(orig.replace(old, new))
    try:
        r = subprocess.run(
            ["sbt", "-batch", "testOnly " + " ".join(suites)],
            capture_output=True, text=True, timeout=1800)
        out = r.stdout + r.stderr
        if "compilation failed" in out.lower() or "error found" in out.lower():
            verdict = "killed (compile)"
        elif "All tests passed" in out or ", failed 0," in out:
            verdict = "SURVIVED"
        else:
            verdict = "killed"
    finally:
        p.write_text(orig)
    print(f"{mid}: {verdict}  — {desc}", flush=True)
    return verdict


def main():
    only = set(sys.argv[1:])
    rows = []
    for mid, fname, suites, desc, old, new in MUTANTS:
        if only and mid not in only:
            continue
        rows.append((mid, fname, desc, run(mid, fname, suites, desc, old, new)))
    print("\n| id | file | mutant | verdict |")
    print("|---|---|---|---|")
    for mid, fname, desc, verdict in rows:
        print(f"| {mid} | {Path(fname).name} | {desc} | {verdict} |")
    killed = sum(1 for r in rows if r[3].startswith("killed"))
    print(f"\nBatch-44 kill rate: {killed}/{len(rows)}")


if __name__ == "__main__":
    main()
