#!/usr/bin/env python3
"""Mutation batch 42 — the RollupStore.stats observability view: the
dead-dir partition and the manifest-state classification.

Usage: python3 tools/mutation_batch42.py [ids...]
"""
import subprocess, sys
from pathlib import Path

RS = "src/main/scala/graft/ops/RollupStore.scala"
HYG = "graft.StoreHygieneSpec"

MUTANTS = [
    ("ST421", RS, [HYG],
     "stats never sees folded dirs (dead_dirs/dead_bytes always 0)",
     "      val deadNames = GenerationalBatches.foldedDirs(fs, committed)\n      val (dead, live) = committed.partition { case (_, p) =>\n        deadNames.contains(p.getName) }",
     "      val deadNames = Set.empty[String]\n      val (dead, live) = committed.partition { case (_, p) =>\n        deadNames.contains(p.getName) }"),
    ("ST422", RS, [HYG],
     "stats reports every manifest as ok (stale/absent invisible)",
     "      val manifest = GenerationalBatches.readManifest(fs, dir) match {\n        case None => if (committed.isEmpty) \"none\" else \"absent\"\n        case Some((b, _, _)) =>\n          if (b.toSet == live.map(_._2.getName).toSet) \"ok\" else \"stale\"\n      }",
     "      val manifest = \"ok\""),
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
        v = "killed" if verdict.startswith("killed") else verdict
        print(f"| {mid} | {Path(fname).name} | {desc} | {v} |")
    killed = sum(1 for r in rows if r[3].startswith("killed"))
    print(f"\nkill rate: {killed}/{len(rows)}")


if __name__ == "__main__":
    main()
