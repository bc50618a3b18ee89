#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only, not
part of the Spark library). Runs graft.Verify at a given SF, then
replays each oracle_sql.json query in DuckDB over the same parquet
tables and compares row counts, schemas (loosely), and value hashes.

Usage: python3 scripts/selfcheck.py [sfdir] [outdir]
"""
import json, math, sys, subprocess, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.17g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows):
    return hash(tuple(sorted(tuple(norm(v) for v in r) for r in rows)))


def main():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    n_pass = n_fail = 0
    # a _FAILED marker means Verify caught an exception for that query;
    # count it as a failure even if stale output from a prior run exists
    for marker in sorted(os.listdir(OUT)):
        if marker.endswith("._FAILED"):
            print(f"FAIL {marker[:-8]}: query threw in Verify (see marker)")
            n_fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql)
            want_cols = sorted(want.columns)
            want_rows = [tuple(r[c] for c in want_cols)
                         for r in want.df().to_dict("records")]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            got = ds.dataset(f"{OUT}/{name}").to_table().to_pylist()
            got_cols = sorted(got[0].keys()) if got else want_cols
            got_rows = [tuple(r[c] for c in got_cols) for r in got]
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: cols {got_cols} != {want_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}")
            n_fail += 1
            continue
        if table_hash(got_rows) != table_hash(want_rows):
            print(f"FAIL {name}: value hash mismatch ({len(got_rows)} rows)")
            sg = sorted(tuple(norm(v) for v in r) for r in got_rows)
            sw = sorted(tuple(norm(v) for v in r) for r in want_rows)
            for a, b in zip(sg, sw):
                if a != b:
                    print(f"  spark:  {a}\n  duckdb: {b}")
                    break
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got_rows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
