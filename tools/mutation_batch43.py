#!/usr/bin/env python3
"""Mutation batch 43 — round-19 additions: the torn-genesis-on-empty-store
identity guard (prefix-consistency require), the stats store-level <root>
garbage row, and the sweepIfWorthIt cadence gate.

Usage: python3 tools/mutation_batch43.py [ids...]
"""
import subprocess, sys
from pathlib import Path

RS = "src/main/scala/graft/ops/RollupStore.scala"
GEN = "graft.StoreGenesisSpec"
HYG = "graft.StoreHygieneSpec"

MUTANTS = [
    ("GE431", RS, [GEN],
     "empty-store torn-genesis guard removed: a foreign family silently re-stamps the store",
     """                  readRawGenesis(fs, base).foreach { raw =>
                    require(terminatedGenesis(incoming).startsWith(raw),""",
     """                  readRawGenesis(fs, base).foreach { raw =>
                    require(true || terminatedGenesis(incoming).startsWith(raw),"""),
    ("GE432", RS, [GEN],
     "prefix check reversed (raw.startsWith(terminated)): a crash-retried SAME-family first ingest bricks",
     """                    require(terminatedGenesis(incoming).startsWith(raw),""",
     """                    require(raw.startsWith(terminatedGenesis(incoming)),"""),
    ("RT431", RS, [HYG],
     "stats root row counts no bytes: crashed stage dirs invisible to the cadence decision",
     """      val bytes = stage.map { st =>
        try fs.getContentSummary(st.getPath).getLength
        catch { case _: java.io.IOException => 0L }
      }.sum""",
     """      val bytes = 0L"""),
    ("RT432", RS, [HYG],
     "stats omits the <root> row entirely",
     """    (if (grains.isEmpty) Seq(one("", base))
     else inParallel(grains) { case (g, gdir) => one(g, gdir) }) :+
      rootRow""",
     """    (if (grains.isEmpty) Seq(one("", base))
     else inParallel(grains) { case (g, gdir) => one(g, gdir) })"""),
    ("SW431", RS, [HYG],
     "sweepIfWorthIt ignores the threshold (always sweeps — the skip path is the whole point)",
     """    if (reclaimable < minDeadBytes) 0
    else sweepExpired(spark, baseDir, cleanupDelayMs, grains, leaseStaleMs)""",
     """    if (reclaimable < 0) 0
    else sweepExpired(spark, baseDir, cleanupDelayMs, grains, leaseStaleMs)"""),
    ("SW432", RS, [HYG],
     "sweepIfWorthIt never sweeps (threshold comparison inverted)",
     """    if (reclaimable < minDeadBytes) 0
    else sweepExpired(spark, baseDir, cleanupDelayMs, grains, leaseStaleMs)""",
     """    if (reclaimable >= minDeadBytes) 0
    else sweepExpired(spark, baseDir, cleanupDelayMs, grains, leaseStaleMs)"""),
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
    print(f"\nBatch-43 kill rate: {killed}/{len(rows)}")


if __name__ == "__main__":
    main()
