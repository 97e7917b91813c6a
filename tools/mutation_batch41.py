#!/usr/bin/env python3
"""Mutation batch 41 — the round-18 review fixes: the genesis
completeness terminator (read + write sides), the absent-manifest heal,
sweepExpired's root-garbage sweep, and the orphan-stripe collector's
usurp-only discipline. Applies one mutant at a time, runs that mutant's
focused suites, restores, prints the verdict table (append to
MUTATION.md by hand).

Usage: python3 tools/mutation_batch41.py [ids...]
"""
import subprocess, sys
from pathlib import Path

RS = "src/main/scala/graft/ops/RollupStore.scala"

HYG = "graft.StoreHygieneSpec"

MUTANTS = [
    ("GN411", RS, [HYG],
     "readGenesis trusts a terminator-less (torn) genesis — a tear bricks ingest",
     "      if (lines.size < 2 || lines.last != s\"e ${lines.size - 1}\") None",
     "      if (false) None"),
    ("GN412", RS, [HYG],
     "writeGenesis writes no completeness terminator",
     "    val terminated = fp + s\"\\ne ${fp.split(\"\\n\", -1).length}\"",
     "    val terminated = fp"),
    ("HM411", RS, [HYG],
     "heal skips ABSENT manifests again (only committing ops restore them)",
     "      case None if live.nonEmpty =>\n        GenerationalBatches.writeManifest(fs, dir)",
     "      case None if false =>\n        GenerationalBatches.writeManifest(fs, dir)"),
    ("RG411", RS, [HYG],
     "sweepExpired skips the root-garbage sweep (stage dirs / tombstones / orphan stripes leak)",
     "    sweepStageDirs(fs, base, \".ingest-\", Set.empty, leaseStaleMs)\n    sweepStageDirs(fs, base, \".compact-\", Set.empty, leaseStaleMs)\n    sweepStageDirs(fs, base, \".dropped-\", Set.empty, leaseStaleMs)\n    collectOrphanStripes(fs, base, leaseStaleMs)",
     "    ()"),
    ("OS411", RS, [HYG],
     "orphan-stripe collector deletes unconditionally (a live first ingest's fresh stripe vanishes)",
     "        try {\n          val t = graft.sources.Sinks.acquireLease(fs, st.getPath, staleMs)\n          graft.sources.Sinks.releaseLease(fs, st.getPath, t)\n        } catch { case _: IllegalStateException => () }",
     "        fs.delete(st.getPath, false)"),
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
        short = Path(fname).name
        v = "killed" if verdict.startswith("killed") else verdict
        print(f"| {mid} | {short} | {desc} | {v} |")
    killed = sum(1 for r in rows if r[3].startswith("killed"))
    print(f"\nkill rate: {killed}/{len(rows)}")


if __name__ == "__main__":
    main()
