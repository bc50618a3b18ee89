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
    # repr(), not "%.17g": %g drops trailing zeros, so an oracle column
    # that pandas materialized as float64 (e.g. DuckDB HUGEINT from a
    # windowed SUM) normalizes to the same string as Spark's int64 and
    # the type drift hides until the driver's hasher catches it.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def kind(t):
    """Coarse type class for the cross-engine schema audit."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{kind(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)


def type_drift(name, want_arrow, got_schema):
    """Flag columns whose coarse type class differs between the DuckDB
    oracle and the Spark parquet output — the class of bug the value
    hash only catches when a value happens to format differently."""
    drifted = []
    got = {f.name: f.type for f in got_schema}
    for f in want_arrow.schema:
        if f.name in got and kind(f.type) != kind(got[f.name]):
            drifted.append(
                f"{f.name}: oracle={f.type}({kind(f.type)}) "
                f"spark={got[f.name]}({kind(got[f.name])})")
    return drifted


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
            want_arrow = con.sql(sql).arrow()
            want_rows = [tuple(r[c] for c in want_cols)
                         for r in want.df().to_dict("records")]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            got_ds = ds.dataset(f"{OUT}/{name}")
            got = got_ds.to_table().to_pylist()
            got_cols = sorted(got[0].keys()) if got else want_cols
            got_rows = [tuple(r[c] for c in got_cols) for r in got]
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {str(e)[:200]}")
            n_fail += 1
            continue
        drifted = type_drift(name, want_arrow, got_ds.schema)
        if drifted:
            print(f"FAIL {name}: type drift: {'; '.join(drifted)}")
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
