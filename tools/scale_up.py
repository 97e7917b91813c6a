#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir.

Usage: python3 tools/scale_up.py [factor] [srcDir] [dstDir]
Defaults: 10 /root/testdata/sf0.1 /tmp/sf1

Used for the sf1 spot-run: the driver generates sf{0.001,0.01,0.1}; this
unions `factor` id-shifted copies so the SAME oracle SQL runs over the
SAME parquet at 10x, extending the correctness evidence one more decade
without touching the read-only testdata tree.

Shifts keep the fixtures' modular structure intact:
- events: user_id += i * 10_000_000 (group count scales, per-group event
  streams identical to sf0.1), event_id shifted likewise.
- documents: doc_id += i * 100_000_000 (a multiple of 10, so the
  %10-based corpus/batch splits land identically in every copy); texts
  of copies >= 1 get every token prefixed with the copy tag, so
  within-copy near-dup structure is preserved exactly while cross-copy
  similarity is zero — pair outputs scale linearly (10x), not
  quadratically (100x exact-dup explosion an unprefixed union causes).
- embeddings: vec_id += i * 100_000_000 (also %100-compatible); the
  vector is left identical (ANN top-k across copies is then ambiguous
  under ties, so sf1 oracle runs should stick to the behavioral rows —
  documented limitation, not a target of this fixture).
- the remaining TPC-H-ish tables are copied unchanged (the sf1 run
  targets the behavioral + dedup families, not the TPC-H rows).
"""
import shutil
import subprocess
import sys
from pathlib import Path

import duckdb


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1")
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    def copy_scaled(table, sql):
        con.execute(
            f"COPY ({sql}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    copy_scaled("events", f"""
        SELECT event_id + i * 10000000 AS event_id, ts,
               user_id + i * 10000000 AS user_id, event_type, value, props
        FROM read_parquet('{src}/events.parquet')
        CROSS JOIN (SELECT unnest(range({factor})) AS i)""")

    copy_scaled("documents", f"""
        SELECT doc_id + i * 100000000 AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', 'c' || i || '\\1', 'g')
               END AS text,
               lang, source, n_chars
        FROM read_parquet('{src}/documents.parquet')
        CROSS JOIN (SELECT unnest(range({factor})) AS i)""")

    copy_scaled("embeddings", f"""
        SELECT * REPLACE (vec_id + i * 100000000 AS vec_id)
        FROM read_parquet('{src}/embeddings.parquet')
        CROSS JOIN (SELECT unnest(range({factor})) AS i)""")

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        shutil.copyfile(f"{src}/{t}.parquet", dst / f"{t}.parquet")
        print(f"{t}: copied")


if __name__ == "__main__":
    main()
