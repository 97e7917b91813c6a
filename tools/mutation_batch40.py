#!/usr/bin/env python3
"""Mutation batch 40 — the auto-sized fold partitions and the parallel
per-grain manifest resolution: the byte arithmetic, the upper clamp, the
auto dispatch, the session-knob wiring, and the parallel map's coverage
of every grain. Applies one mutant at a time, runs that mutant's focused
suites, restores, prints the verdict table (append to MUTATION.md by
hand).

Usage: python3 tools/mutation_batch40.py [ids...]
"""
import subprocess, sys
from pathlib import Path

RS = "src/main/scala/graft/ops/RollupStore.scala"

FS = "graft.FoldSizingSpec"
GRS = "graft.GrainedRollupStoreSpec"

MUTANTS = [
    ("AP401", RS, [FS],
     "autoFoldPartitions ignores input bytes (always one partition)",
     "    val want = (totalBytes + bytesPerPartition - 1) / bytesPerPartition",
     "    val want = BigInt(1)"),
    ("AP402", RS, [FS],
     "upper clamp dropped (a PB fold asks for millions of partitions)",
     "    want.max(1).min(4096).toInt",
     "    want.max(1).toInt"),
    ("AP403", RS, [FS],
     "auto dispatch reverts to the fixed default (0 behaves like 32)",
     "    else autoFoldPartitions(\n      scan.queryExecution.optimizedPlan.stats.sizeInBytes,\n      spark.sessionState.conf.filesMaxPartitionBytes)",
     "    else 32"),
    ("FP401", RS, [FS],
     "auto sizing hardcodes 128 MiB instead of the session's maxPartitionBytes knob",
     "      spark.sessionState.conf.filesMaxPartitionBytes)",
     "      134217728L)"),
    ("PR401", RS, [FS, GRS],
     "parallel resolver submits only the first grain (wide reads lose grains)",
     "      val futures = xs.map { x =>",
     "      val futures = xs.take(1).map { x =>"),
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
