#!/usr/bin/env python3
"""Mutation batch 38 — the sweepExpired janitor (round-18 watch-item
closure): the recover-time heal inside the sweep, and the horizon
passthrough. Applies one mutant at a time, runs the focused suite,
restores, prints the verdict table (append to MUTATION.md by hand).

Usage: python3 tools/mutation_batch38.py [ids...]
"""
import subprocess, sys
from pathlib import Path

RS = "src/main/scala/graft/ops/RollupStore.scala"
MAN = "graft.StoreManifestSpec"

MUTANTS = [
    ("SE381", RS, [MAN],
     "sweepExpired skips the manifest heal (readers strand on files the sweep deleted)",
     "      val live = GenerationalBatches.recover(fs, dir, cleanupDelayMs)\n      healManifestIfStale(fs, dir, live)",
     "      val live = GenerationalBatches.recover(fs, dir, cleanupDelayMs)"),
    ("SE382", RS, [MAN],
     "sweepExpired ignores the horizon (deletes folded dirs inside the grace window)",
     "      val before = GenerationalBatches.batchDirs(fs, dir).size\n      val live = GenerationalBatches.recover(fs, dir, cleanupDelayMs)",
     "      val before = GenerationalBatches.batchDirs(fs, dir).size\n      val live = GenerationalBatches.recover(fs, dir, 0L)"),
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
    results = []
    for mid, fname, suites, desc, old, new in MUTANTS:
        if only and mid not in only:
            continue
        results.append((mid, fname, desc,
                        run(mid, fname, suites, desc, old, new)))
    print("\n== batch 38 ==")
    for mid, fname, desc, v in results:
        print(f"| {mid} | {Path(fname).name} | {desc} | {v} |")


if __name__ == "__main__":
    sys.exit(main())
