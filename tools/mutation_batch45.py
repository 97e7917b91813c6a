#!/usr/bin/env python3
"""Mutation batch 45 — round 20's measurement-hardening seams: the
composite per-query-min baseline (VERDICT r19 #1), the per-family floor
anchor (r19 #2), the compact line's guaranteed-fit degrade ladder
(ADVICE r19), the sfMatches full-path guard (ADVICE r19), and the
janitor's young-stage exclusion (ADVICE r19).

Usage: python3 tools/mutation_batch45.py [ids...]
"""
import subprocess, sys
from pathlib import Path

B = "src/main/scala/graft/Bench.scala"
RS = "src/main/scala/graft/ops/RollupStore.scala"
SPEC = "graft.BenchRecordSpec"
HYG = "graft.StoreHygieneSpec"

MUTANTS = [
    ("CB451", B, [SPEC],
     "compositeBaseline keeps the WORST anchor-ratio — the contended capture becomes the baseline",
     """        if (anchored.nonEmpty) anchored.minBy(ratio)""",
     """        if (anchored.nonEmpty) anchored.maxBy(ratio)"""),
    ("CB452", B, [SPEC],
     "anchor-less fallback keeps max seconds instead of min",
     """        else if (cands.nonEmpty) cands.minBy(_._1)""",
     """        else if (cands.nonEmpty) cands.maxBy(_._1)"""),
    ("CB453", B, [SPEC],
     "poisoned (-1 error marker) entries admitted as baseline candidates",
     """      val cands = es.map(_._2).filter(_._1 > 0)""",
     """      val cands = es.map(_._2)"""),
    ("AN451", B, [SPEC],
     "anchorOf ignores the family set — every query tracks floor2",
     """    if (Floor2Queries(short(name)) && !floor2.isNaN && floor2 > 0) floor2""",
     """    if (!floor2.isNaN && floor2 > 0) floor2"""),
    ("AN452", B, [SPEC],
     "anchorOf stops degrading — a pre-round-20 record (no floor2) poisons the family's anchor with NaN",
     """    if (Floor2Queries(short(name)) && !floor2.isNaN && floor2 > 0) floor2""",
     """    if (Floor2Queries(short(name))) floor2"""),
    ("PF451", B, [SPEC],
     "floor2_sec never parsed — every baseline record loses its parallel anchor",
     """    BenchRec(qs, lastNum("floor_sec"), lastNum("floor2_sec"))""",
     """    BenchRec(qs, lastNum("floor_sec"), Double.NaN)"""),
    ("FC451", B, [SPEC],
     "fitCompact stops degrading — always the first (possibly oversized) rung",
     """    steps.view.map(_.apply()).find(_.length <= budget).getOrElse {""",
     """    steps.view.map(_.apply()).headOption.getOrElse {"""),
    ("SM451", B, [SPEC],
     "sfMatches full-path guard dropped — a same-basename fixture from another directory becomes the baseline",
     """    if (byName && recorded.contains('/') && sfDir.contains('/'))
      new java.io.File(recorded).getAbsolutePath ==
        new java.io.File(sfDir).getAbsolutePath
    else byName""",
     """    byName"""),
    ("CA451", B, [SPEC],
     "coherentAnchors mixes kinds — this run's floor2 ratios against a pre-round-20 baseline's floor1",
     """    if (Floor2Queries(short(name)) && ok(nowF2) && ok(prevF2))
      (nowF2, prevF2)
    else (nowF, prevF)""",
     """    if (Floor2Queries(short(name)) && ok(nowF2))
      (nowF2, if (ok(prevF2)) prevF2 else prevF)
    else (nowF, prevF)"""),
    ("SR451", RS, [HYG],
     "janitor's root inventory counts a live op's young stage — every busy pass escalates to a futile sweep",
     """        (minStageAgeMs <= 0 || now - st.getModificationTime > minStageAgeMs))""",
     """        true)"""),
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
        elif r.returncode != 0 and (", failed " in out or "*** FAILED ***" in out):
            # real test failures under the mutant: the intended kill signal
            verdict = "killed"
        else:
            # neither a pass marker, a compile failure, nor test failures:
            # an aborted suite, an sbt crash, or an OOM proves nothing
            # about the mutant — report it as such instead of counting it
            # toward the kill rate (ADVICE r20)
            verdict = ("INCONCLUSIVE (aborted)" if "aborted" in out.lower()
                       else f"INCONCLUSIVE (rc={r.returncode}, no test/compile failure marker)")
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
    print(f"\nBatch-45 kill rate: {killed}/{len(rows)}")


if __name__ == "__main__":
    main()
