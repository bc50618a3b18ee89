#!/usr/bin/env python3
"""SURVEY <-> SparkEntry.queries <-> CORRECTNESS 1:1:1 sync check.

The judge re-derives this mapping every round; this makes the check
re-runnable instead (VERDICT r11 item 5). Three name sets must agree
exactly:

  1. SURVEY.md S2 QUERY rows (backticked names whose oracle column is
     not "spec-only" -- spec-only rows are streaming/infra components
     with no queries entry by design);
  2. the registered queries, read from a Verify output dir
     (oracle_sql.json keys + result subdirs = SparkEntry.queries keys;
     Verify dumps both, so no Spark session is needed here);
  3. the driver's CORRECTNESS_r{N}.json keys.

Usage:
  python3 scripts/sync_check.py [SURVEY.md] [CORRECTNESS.json] [verify_outdir]

Any argument may be omitted (positional, left to right); a missing
source is skipped with a note. Exit 0 iff every present pair of
sources agrees.
"""
import json
import os
import re
import sys


def survey_queries(path):
    """Backticked first-cell names of S2 table rows that are query ops
    (oracle column != spec-only). Returns (queries, spec_only_count)."""
    with open(path, encoding="utf-8") as f:
        txt = f.read()
    m = re.search(r"^## .2.*?(?=^## )", txt, re.M | re.S)
    if not m:
        sys.exit("SURVEY.md: cannot locate section 2")
    queries, spec_only = set(), 0
    for line in m.group(0).splitlines():
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) < 3 or cells[0] in ("query", "---", "component"):
            continue
        if cells[0].startswith("---"):
            continue
        name = cells[0]
        is_spec = any("spec-only" in c for c in cells[1:])
        bt = re.fullmatch(r"`([A-Za-z0-9_]+)`", name)
        if bt and not is_spec:
            queries.add(bt.group(1))
        else:
            spec_only += 1
    return queries, spec_only


def verify_queries(outdir):
    with open(os.path.join(outdir, "oracle_sql.json"), encoding="utf-8") as f:
        oracles = set(json.load(f).keys())
    dirs = {d for d in os.listdir(outdir)
            if os.path.isdir(os.path.join(outdir, d))}
    failed = {d[: -len("._FAILED")] for d in os.listdir(outdir)
              if d.endswith("._FAILED")}
    return dirs | failed, oracles, failed


def correctness_queries(path):
    with open(path, encoding="utf-8") as f:
        return set(json.load(f).keys())


def diff(label_a, a, label_b, b):
    ok = True
    for only, lab in ((a - b, f"{label_a} only"), (b - a, f"{label_b} only")):
        if only:
            ok = False
            print(f"  DRIFT {lab}: {sorted(only)}")
    return ok


def main():
    argv = sys.argv[1:]
    survey = argv[0] if len(argv) > 0 else "SURVEY.md"
    correctness = argv[1] if len(argv) > 1 else None
    outdir = argv[2] if len(argv) > 2 else None
    if correctness is None:
        # newest CORRECTNESS_r*.json in the repo root, if any
        cands = sorted(f for f in os.listdir(".")
                       if re.fullmatch(r"CORRECTNESS_r\d+\.json", f))
        correctness = cands[-1] if cands else None

    sq, spec_rows = survey_queries(survey)
    print(f"{survey}: {len(sq)} query rows + {spec_rows} spec-only rows")
    ok = True

    if outdir and os.path.isdir(outdir):
        vq, oracles, failed = verify_queries(outdir)
        print(f"{outdir}: {len(vq)} registered queries "
              f"({len(oracles)} with oracle SQL, {len(failed)} FAILED)")
        if failed:
            ok = False
            print(f"  FAILED markers: {sorted(failed)}")
        ok &= diff("survey", sq, "queries", vq)
        # oracle leg: every registered query needs an oracleSql entry
        # EXCEPT the declared rows-only digest ops (no DuckDB twin by
        # design -- each is bound to its exact twin by an invariant
        # spec; see VERDICT r11's "no_oracle by design" rows)
        ROWS_ONLY = {"q_approx_distinct", "q_approx_percentiles",
                     "ft_quantile_bins_approx", "ev_inter_event_approx"}
        ok &= diff("queries-needing-oracle", vq - ROWS_ONLY,
                   "oracle_sql", oracles - ROWS_ONLY)
        stray = ROWS_ONLY - vq
        if stray:
            ok = False
            print(f"  DRIFT rows-only allowlist names unknown: {sorted(stray)}")
    else:
        print("verify outdir absent -- skipping registered-queries leg "
              "(pass a Verify output dir to run the oracle-coverage leg)")

    if correctness and os.path.isfile(correctness):
        cq = correctness_queries(correctness)
        print(f"{correctness}: {len(cq)} checked queries")
        ok &= diff("survey", sq, "correctness", cq)
    else:
        print("correctness json absent -- skipping driver leg")

    print("== SYNC OK ==" if ok else "== SYNC DRIFT ==")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
