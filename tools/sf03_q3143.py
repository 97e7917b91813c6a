#!/usr/bin/env python3
"""Intermediate-scale (sf0.3) cross-validation leg for q31/q43 (VERDICT r17 #2).

Runs the ORIGINAL quadratic oracle once per query at /tmp/sf03 (15k docs,
~112M pairs — hours of DuckDB CPU, run detached) and compares it against
BOTH the Spark dump and the inverted-index rewrite from tools/sf1_q3143.py.
This pins the rewrite at an intermediate decade with the untouched oracle
text, so the sf1 row (which uses the rewrite) is doubly grounded.

Usage: python3 tools/sf03_q3143.py <dumpDir>   # dumpDir from Verify at /tmp/sf03
"""
import glob
import json
import sys

from sf1_q3143 import connect, multiset, rewrite, run


def main():
    dump = sys.argv[1]
    oracles = json.load(open(f"{dump}/oracle_sql.json"))
    n_fail = 0
    for name in ["q31_curation", "q43_leakage_split"]:
        sql = oracles[name]
        con = connect("/tmp/sf03")
        rc, rm, rt = run(con, rewrite(sql))
        print(f"{name}: rewritten {rt:.1f}s ({sum(rm.values())} rows)",
              flush=True)
        oc, om, ot = run(con, sql)
        print(f"{name}: ORIGINAL {ot:.1f}s ({sum(om.values())} rows)",
              flush=True)
        files = glob.glob(f"{dump}/{name}/*.parquet")
        sres = con.execute(f"SELECT * FROM read_parquet({files!r})")
        sc, sm = multiset([d[0] for d in sres.description], sres.fetchall())
        ok_rw = (oc, om) == (rc, rm)
        ok_spark = (oc, om) == (sc, sm)
        print(f"{name}: original==rewritten {'MATCH' if ok_rw else 'MISMATCH'}"
              f", original==spark {'PASS' if ok_spark else 'FAIL'}", flush=True)
        if not (ok_rw and ok_spark):
            n_fail += 1
    print(f"== sf0.3 leg: {'ALL PASS' if n_fail == 0 else f'{n_fail} FAIL'}",
          flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
