#!/usr/bin/env python3
"""Mutation batch 39 — the round-18 self-review fixes: the manifest
completeness terminator (write + read sides), sweepExpired's
skip-on-collision, the stale-stripe age bound in the garbage sweep, and
the non-local-return carve-out in withLeases' release path. Applies one
mutant at a time, runs that mutant's focused suites, restores, prints
the verdict table (append to MUTATION.md by hand).

Usage: python3 tools/mutation_batch39.py [ids...]
"""
import subprocess, sys
from pathlib import Path

RS = "src/main/scala/graft/ops/RollupStore.scala"
GB = "src/main/scala/graft/ops/GenerationalBatches.scala"
SK = "src/main/scala/graft/sources/Sinks.scala"

MAN = "graft.StoreManifestSpec"
CNT = "graft.CountingFsSpec"
REL = "graft.LeaseReleaseFailureSpec"
CGM = "graft.ConcurrentGrainMaintenanceSpec"

MUTANTS = [
    ("MT391", GB, [MAN],
     "readManifest trusts a terminator-less (torn) manifest",
     "      if (!complete) None",
     "      if (false) None"),
    ("MT392", GB, [MAN, CNT],
     "writeManifest writes no completeness terminator (every manifest reads as torn)",
     "    sb.append(\"e \").append(n).append('\\n')",
     "    ()"),
    ("SJ391", RS, [MAN],
     "sweepExpired aborts on a held stripe instead of skipping the grain",
     "          case e: IllegalStateException\n              if Option(e.getMessage).exists(_.contains(\"lease\")) => 0",
     "          case e: IllegalStateException\n              if Option(e.getMessage).exists(_.contains(\"lease\")) => throw e"),
    ("SS391", RS, [CGM],
     "sweepStageDirs counts a STALE foreign stripe as live (garbage deferred forever)",
     "      !held.contains(st.getPath.getName) &&\n      now - st.getModificationTime <= staleMs)",
     "      !held.contains(st.getPath.getName))"),
    ("NL391", SK, [REL],
     "withLeases suppresses release errors onto a non-local return's ControlThrowable (no-op: error vanishes)",
     "      val suppressible = primary != null &&\n        !primary.isInstanceOf[scala.util.control.ControlThrowable]",
     "      val suppressible = primary != null"),
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
    print("\n== batch 39 ==")
    for mid, fname, desc, v in results:
        print(f"| {mid} | {Path(fname).name} | {desc} | {v} |")


if __name__ == "__main__":
    sys.exit(main())
