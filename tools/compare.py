#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Loads each <outDir>/<name>/ parquet (Spark result), runs oracle_sql.json[name]
in DuckDB over views named after the testdata tables, and diffs the two
results as multisets of rows with columns sorted by name.
"""
import sys, json, glob, duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sres = con.execute(f"SELECT * FROM read_parquet({files!r})")
            scols = [d[0] for d in sres.description]; srows = sres.fetchall()
            ores = con.execute(oracle[name])
            ocols = [d[0] for d in ores.description]; orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        sc, sm = rows_to_multiset(scols, srows)
        oc, om = rows_to_multiset(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}"); n_fail += 1; continue
        if sm == om:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
        else:
            only_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
            only_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
            print(f"FAIL {name}: {len(srows)} spark rows vs {len(orows)} oracle rows")
            print(f"  cols {sc}")
            print(f"  spark-only sample: {only_s}")
            print(f"  oracle-only sample: {only_o}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
