#!/usr/bin/env python3
"""Mutation batch 36 — round-17 seams: lease striping (rollback, stripe
identity, guarded sweep), the reader manifest (trust on read, live-only
contents), the cleanup grace horizon, the derived regrainInto id, and
the code-point grain escape. Applies one mutant at a time, runs the
focused suites, restores, appends the verdict table to MUTATION.md by
hand afterwards (this script only prints verdicts).

Usage: python3 tools/mutation_batch36.py [ids...]
"""
import subprocess, sys
from pathlib import Path

RS = "src/main/scala/graft/ops/RollupStore.scala"
GB = "src/main/scala/graft/ops/GenerationalBatches.scala"
SK = "src/main/scala/graft/sources/Sinks.scala"

SUITES = [
    "graft.ConcurrentGrainMaintenanceSpec",
    "graft.StoreManifestSpec",
    "graft.GrainedRollupStoreSpec",
]

MUTANTS = [
    # ST361/ST362 patterns updated in round 18 after withLeases grew the
    # attempt-every-release hardening (the recorded batch-36 run used the
    # round-17 text; these keep the script re-runnable on the new code)
    ("ST361", SK, "withLeases: failed acquisition keeps earlier stripes (rollback dropped)",
     "      held.reverseIterator.foreach { case (p, t) =>\n        try releaseLease(fs, p, t)",
     "      if (held.size == leases.size) held.reverseIterator.foreach { case (p, t) =>\n        try releaseLease(fs, p, t)"),
    ("ST362", SK, "withLeases releases dropped entirely (held cleared before the release loop)",
     "      held.reverseIterator.foreach { case (p, t) =>\n        try releaseLease(fs, p, t)\n        catch",
     "      held.clear(); held.reverseIterator.foreach { case (p, t) =>\n        try releaseLease(fs, p, t)\n        catch"),
    ("ST363", RS, "grainLeasePath ignores the grain value (all grains share one stripe)",
     "    new Path(base, s\"$StripePrefix${hexOf(grain)}\")",
     "    new Path(base, s\"$StripePrefix\" + \"X\")"),
    ("SW361", RS, "stage sweep ignores foreign stripes (deletes a concurrent op's live stage)",
     "      .filter(st => !foreignStripe ||\n        now - st.getModificationTime > staleMs)",
     "      .filter(st => true ||\n        now - st.getModificationTime > staleMs)"),
    ("MF361", RS, "readGrains distrusts the manifest (always falls back to listing)",
     "      GenerationalBatches.readManifest(fs, gdir) match {\n        case Some((_, _, relFiles)) =>\n          Left(relFiles.map(rel => new Path(gdir, rel)))\n        case None =>",
     "      (None: Option[(Seq[String], Set[String], Seq[String])]) match {\n        case Some((_, _, relFiles)) =>\n          Left(relFiles.map(rel => new Path(gdir, rel)))\n        case None =>"),
    ("MF362", GB, "writeManifest records COMMITTED batches (folded dirs leak into the manifest)",
     "  def writeManifest(fs: FileSystem, base: Path): Unit = {\n    val live = liveBatches(fs, base).sortBy(_._1)",
     "  def writeManifest(fs: FileSystem, base: Path): Unit = {\n    val live = committedBatches(fs, base).sortBy(_._1)"),
    ("GR361", GB, "cleanup horizon flipped (folded dirs deleted INSIDE the grace window)",
     "      if (now - deadAt(p.getName) >= cleanupDelayMs) fs.delete(p, true) }",
     "      if (now - deadAt(p.getName) < cleanupDelayMs) fs.delete(p, true) }"),
    # RI361 pattern updated in round 18 for the makeQualified normalization
    ("RI361", RS, "regrainInto default id no longer derived from the source (constant again)",
     "    val id = ingestId.getOrElse(\n      s\"regrain-into:${fsOf(spark, srcDir).makeQualified(new Path(srcDir))}\")",
     "    val id = ingestId.getOrElse(\"regrain-into\")"),
    ("EG361", RS, "escapeGrain advances one CHAR per code point (surrogate pairs mangled)",
     "      else v.substring(i, i + n).getBytes(\"UTF-8\")\n        .foreach(b => sb.append(f\"%%${b & 0xff}%02X\"))\n      i += n",
     "      else v.substring(i, i + n).getBytes(\"UTF-8\")\n        .foreach(b => sb.append(f\"%%${b & 0xff}%02X\"))\n      i += 1"),
]


def run(mid, fname, desc, old, new):
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
            ["sbt", "-batch", "testOnly " + " ".join(SUITES)],
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
    for mid, fname, desc, old, new in MUTANTS:
        if only and mid not in only:
            continue
        results.append((mid, fname, desc, run(mid, fname, desc, old, new)))
    print("\n== batch 36 ==")
    for mid, fname, desc, v in results:
        print(f"| {mid} | {Path(fname).name} | {desc} | {v} |")


if __name__ == "__main__":
    sys.exit(main())
