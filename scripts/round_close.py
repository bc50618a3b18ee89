#!/usr/bin/env python3
"""Scripted round close (VERDICT r12 item 5: round artifacts were
sitting uncommitted at judging time in TWO consecutive rounds -- the
close must be a script, not a memory burden).

Checks, in order:

  1. sync_check.py runs WITH a verify outdir (its registered-queries
     leg is silently skipped without one), against the newest
     CORRECTNESS_r*.json in the repo;
  2. `sbt test` / verify evidence is NOT re-run here -- this script is
     the last gate, not the build;
  3. `git status --porcelain` carries no round evidence: any
     untracked/modified BENCH_*/CORRECTNESS_*/SCALE_*/LEAKCHECK/
     COPYCHECK/VERDICT/ADVICE/bench_latest artifact fails the check
     (commit them; they ARE the round's record).

Usage:
  python3 scripts/round_close.py <verify_outdir>   # check; exit != 0 on dirt
  python3 scripts/round_close.py <verify_outdir> --commit
      # same, but stages + commits the dirty round artifacts instead
      # of failing, then re-checks

A verify outdir is REQUIRED: run
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
first if one does not exist.
"""
import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACT = re.compile(
    r"^(BENCH_.*\.json|CORRECTNESS_.*\.json|SCALE_.*\.(json|md)|"
    r"LEAKCHECK\.json|COPYCHECK\.json|bench_latest\.json|"
    r"VERDICT\.md|ADVICE\.md|SCALE\.md|SURVEY\.md)$")


def newest_correctness():
    rounds = []
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            rounds.append((int(m.group(1)), p))
    return max(rounds)[1] if rounds else None


def main():
    args = [a for a in sys.argv[1:] if a != "--commit"]
    commit = "--commit" in sys.argv[1:]
    if not args:
        sys.exit(__doc__)
    outdir = args[0]
    if not os.path.isfile(os.path.join(outdir, "oracle_sql.json")):
        sys.exit(f"{outdir} is not a Verify output dir "
                 "(no oracle_sql.json) -- run graft.Verify first")

    corr = newest_correctness()
    if corr is None:
        sys.exit("round_close: no CORRECTNESS_r*.json in the repo -- the "
                 "driver's correctness artifact is missing; do not close")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "sync_check.py"),
           os.path.join(REPO, "SURVEY.md"), corr, outdir]
    print("+", " ".join(cmd))
    if subprocess.run(cmd, cwd=REPO).returncode != 0:
        sys.exit("round_close: sync_check FAILED")

    def dirty():
        out = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                             capture_output=True, text=True).stdout
        hits = []
        for line in out.splitlines():
            path = line[3:].strip()
            # rename lines read 'R  old -> new'; the artifact that must
            # be committed is the NEW path
            if " -> " in path:
                path = path.split(" -> ", 1)[1]
            if ARTIFACT.match(os.path.basename(path)):
                hits.append(line)
        return hits

    hits = dirty()
    if hits and commit:
        paths = [h[3:].strip().split(" -> ", 1)[-1] for h in hits]
        subprocess.run(["git", "add", "--"] + paths, cwd=REPO, check=True)
        subprocess.run(["git", "commit", "-m",
                        "round close: commit round evidence artifacts\n\n"
                        "No-Verification-Needed: artifact-only commit, "
                        "no runtime surface"],
                       cwd=REPO, check=True)
        hits = dirty()
    if hits:
        print("round_close: UNCOMMITTED round artifacts:", file=sys.stderr)
        for h in hits:
            print("  " + h, file=sys.stderr)
        sys.exit(1)
    print("round_close: OK -- sync green, no stray round artifacts")


if __name__ == "__main__":
    main()
