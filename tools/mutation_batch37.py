#!/usr/bin/env python3
"""Mutation batch 37 — round-18 seams: the store-genesis gate (verify +
lazy upgrade), the recover-time manifest heal, flat-store manifest trust
and write, the writer-clock grace horizon (#ts), attempt-every-release in
withLeases, and the qualified regrainInto default id. Applies one mutant
at a time, runs that mutant's focused suites, restores, prints the
verdict table (append to MUTATION.md by hand).

Usage: python3 tools/mutation_batch37.py [ids...]
"""
import subprocess, sys
from pathlib import Path

RS = "src/main/scala/graft/ops/RollupStore.scala"
GB = "src/main/scala/graft/ops/GenerationalBatches.scala"
SK = "src/main/scala/graft/sources/Sinks.scala"

GEN = "graft.StoreGenesisSpec"
MAN = "graft.StoreManifestSpec"
CNT = "graft.CountingFsSpec"
REL = "graft.LeaseReleaseFailureSpec"
GRN = "graft.GrainedRollupStoreSpec"
SNP = "graft.StoreSnapshotInterleaveSpec"

MUTANTS = [
    ("GN371", RS, [GEN],
     "genesis verify dropped (any family passes against any genesis)",
     "      require(genesis == incoming,",
     "      require(true || genesis == incoming,"),
    ("GN372", RS, [GEN],
     "lazy upgrade stamps the INCOMING family instead of the store's",
     "              val derived = genesisFromExistingStore(spark, fs, base)\n                .getOrElse(incoming)",
     "              val derived = incoming"),
    ("HM371", RS, [MAN],
     "healManifestIfStale never rewrites (stale manifests heal only after the op's job)",
     "      case Some((bNames, _, _))\n          if bNames.toSet != live.map(_._2.getName).toSet =>",
     "      case Some((bNames, _, _))\n          if false && bNames.toSet != live.map(_._2.getName).toSet =>"),
    ("FM371", RS, [CNT, SNP],
     "flat read distrusts the manifest (always falls back to listing)",
     "    GenerationalBatches.readManifest(fs, base) match {\n      case Some((_, _, relFiles)) if relFiles.nonEmpty =>",
     "    GenerationalBatches.readManifest(fs, base) match {\n      case Some((_, _, relFiles)) if false && relFiles.nonEmpty =>"),
    ("FM372", RS, [CNT],
     "flat append skips the manifest rewrite (manifest goes stale on every ingest)",
     "      GenerationalBatches.writeManifest(fs, base)\n      n\n    } finally cached.unpersist()",
     "      n\n    } finally cached.unpersist()"),
    ("TS371", GB, [MAN],
     "commit writes no #ts writer-clock line (horizon trusts the FS clock alone)",
     "    try if (folded.nonEmpty) out.write(\n      (folded.mkString(\"\\n\") + s\"\\n#ts=${System.currentTimeMillis()}\")\n        .getBytes(\"UTF-8\"))",
     "    try if (folded.nonEmpty) out.write(\n      (folded.mkString(\"\\n\"))\n        .getBytes(\"UTF-8\"))"),
    ("TS372", GB, [MAN],
     "grace horizon ignores the embedded writer clock (modtime only)",
     "        val t = math.max(fs.getFileStatus(marker).getModificationTime,\n          writerTs.getOrElse(Long.MinValue))",
     "        val t = fs.getFileStatus(marker).getModificationTime"),
    ("RL371", SK, [REL],
     "withLeases release reverts to fail-stop (one failed release abandons the rest)",
     "        try releaseLease(fs, p, t)\n        catch { case e: Throwable =>",
     "        try releaseLease(fs, p, t)\n        catch { case e: Throwable if false =>"),
    ("RQ371", RS, [GRN],
     "regrainInto default id uses the raw source spelling again",
     "    val id = ingestId.getOrElse(\n      s\"regrain-into:${fsOf(spark, srcDir).makeQualified(new Path(srcDir))}\")",
     "    val id = ingestId.getOrElse(s\"regrain-into:${new Path(srcDir)}\")"),
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
    print("\n== batch 37 ==")
    for mid, fname, desc, v in results:
        print(f"| {mid} | {Path(fname).name} | {desc} | {v} |")


if __name__ == "__main__":
    sys.exit(main())
