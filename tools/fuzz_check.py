#!/usr/bin/env python3
"""Seeded oracle-parity fuzzing (round-8, VERDICT r7 item 6).

Generates N adversarial fixtures (graft.tools.FuzzGen — negative values,
ties at every grain, degenerate groups, all-duplicate corpora, exact .5
edges), runs the FULL op board through graft.Verify on each, and checks
every op against its DuckDB oracle with tools/oracle_check.py. The
engine-divergence traps (integer div, CAST-vs-trunc, tie order, boundary
closure) are guarded op-by-op in CLAUDE.md; this guards the ones nobody
wrote down.

Seeds >= 600 generate LONG-SPAN fixtures (40-day event span — round-10,
VERDICT r9 item 2) and additionally assert NON-VACUITY of the day-split
paths: the stream-ood-flags serve set (rows past the min(day)+14 train
split) and agg-trend-slope's multi-day moment set (users with a defined
slope) must both be non-empty, so those ops are fuzz-exercised in their
real serving shape, not just their empty/degenerate form.

Usage: python3 tools/fuzz_check.py [--seeds 101,202,303,404,505,606]
                                   [--base /tmp/graft-fuzz]
Exit 1 if any seed has any failing op. Summary written to FUZZ.md-ready
stdout lines.
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="101,202,303,404,505,606,707")
    ap.add_argument("--base", default="/tmp/graft-fuzz")
    args = ap.parse_args()
    seeds = [s.strip() for s in args.seeds.split(",")]

    subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.tools.FuzzGen {args.base} {','.join(seeds)}"],
        cwd=REPO, timeout=900, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    print(f"[fuzz] fixtures generated for seeds {seeds}", flush=True)

    any_fail = False
    holdout_live_seeds = 0  # seeds where the OOV/backoff branches ran
    for seed in seeds:
        fix = f"{args.base}/s{seed}"
        out = f"{args.base}/out{seed}"
        # clear stale outputs: a crashed Verify must not leave a previous
        # run's parquet behind for oracle_check to bless as green
        import shutil
        shutil.rmtree(out, ignore_errors=True)
        r0 = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {fix} {out}"],
            cwd=REPO, timeout=900,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if r0.returncode != 0:
            print(f"[fuzz] seed {seed}: Verify exited {r0.returncode}", flush=True)
            any_fail = True
            continue
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "oracle_check.py"),
             fix, out],
            capture_output=True, text=True, timeout=900)
        tail = r.stdout.strip().splitlines()
        fails = [l for l in tail if l.startswith("FAIL")]
        summary = next((l for l in tail if l.startswith("==")), "== ?")
        m = re.match(r"== (\d+) ok, (\d+) fail", summary)
        print(f"[fuzz] seed {seed}: {summary}", flush=True)
        for f in fails:
            print(f"[fuzz]   {f}", flush=True)
        # a "0 ok, 0 fail" run (empty output dir, broken op resolution)
        # must NOT be blessed as green (ADVICE r8): require the ok count
        # to equal the full oracle board the Verify run emitted.
        try:
            expected = len(json.load(open(os.path.join(out, "oracle_sql.json"))))
        except Exception:
            expected = -1
        if not m or m.group(2) != "0" or expected <= 0 \
                or int(m.group(1)) != expected:
            # diagnose EVERY guard trip (ADVICE r9): an unparsable
            # summary or a missing/unreadable oracle_sql.json must say
            # so, not just silently set the exit code
            print(f"[fuzz] seed {seed}: board-size guard tripped — "
                  f"ok count {m.group(1) if m else '?'} / fail count "
                  f"{m.group(2) if m else '?'} vs expected board size "
                  f"{expected}"
                  + ("" if expected > 0 else " (oracle_sql.json missing/unreadable)")
                  + ("" if m else " (summary line unparsable)"), flush=True)
            any_fail = True
        # long-span seeds: the day-split ops must run NON-degenerately
        if int(seed) >= 600:
            import duckdb
            try:
                n_serve = duckdb.sql(
                    f"SELECT count(*) FROM '{out}/stream-ood-flags/*.parquet'"
                ).fetchone()[0]
                n_moment = duckdb.sql(
                    f"SELECT count(*) FROM '{out}/agg-trend-slope/*.parquet' "
                    "WHERE slope_micro IS NOT NULL AND n_days >= 2"
                ).fetchone()[0]
            except Exception as e:
                print(f"[fuzz] seed {seed}: non-vacuity read failed: {e}",
                      flush=True)
                n_serve, n_moment = -1, -1
            print(f"[fuzz] seed {seed}: long-span non-vacuity — "
                  f"ood serve rows {n_serve}, defined trend slopes {n_moment}",
                  flush=True)
            if n_serve <= 0 or n_moment <= 0:
                print(f"[fuzz] seed {seed}: day-split ops ran DEGENERATE "
                      "on a long-span fixture — serve/moment set empty",
                      flush=True)
                any_fail = True
        # chain seeds (>= 700, round-13 VERDICT r12 item 5): the planted
        # diameter-63 doc path and diameter-62 embedding path must come
        # out as ONE cluster each — proof the CC loop ran its multi-round
        # pointer-jumping to a true fixpoint (a clique/star-only board
        # converges in the fused init round and never exercises it).
        if int(seed) >= 700:
            import duckdb
            try:
                doc_comp = duckdb.sql(
                    f"SELECT count(DISTINCT cluster) "
                    f"FROM '{out}/dedup-cluster-rep/*.parquet' "
                    "WHERE cluster >= 120"
                ).fetchone()[0]
                doc_members = duckdb.sql(
                    f"SELECT max(n_members) "
                    f"FROM '{out}/dedup-cluster-rep/*.parquet' "
                    "WHERE cluster >= 120"
                ).fetchone()[0]
                vec_comp, vec_members = duckdb.sql(
                    f"SELECT count(DISTINCT cluster), count(*) "
                    f"FROM '{out}/dedup-cluster/*.parquet' "
                    "WHERE vec_id >= 64"
                ).fetchone()
            except Exception as e:
                print(f"[fuzz] seed {seed}: chain non-vacuity read failed: "
                      f"{e}", flush=True)
                doc_comp = doc_members = vec_comp = vec_members = -1
            print(f"[fuzz] seed {seed}: chain non-vacuity — doc path: "
                  f"{doc_comp} cluster(s), {doc_members} members; vec path: "
                  f"{vec_comp} cluster(s) over {vec_members} rows", flush=True)
            if doc_comp != 1 or (doc_members or 0) < 60 \
                    or vec_comp != 1 or vec_members != 63:
                print(f"[fuzz] seed {seed}: planted chain did NOT resolve "
                      "to one component — CC convergence broken or fixture "
                      "wrong", flush=True)
                any_fail = True
        # holdout-scorer OOV non-vacuity (VERDICT r10 item 7): the
        # OOV/backoff branches are text-perplexity-holdout's load-bearing
        # novelty; a sweep where every held-out bigram is in-model would
        # go vacuously green. Require >= 1 seed with scored held-out docs
        # AND a positive OOV share.
        try:
            import duckdb
            hd, hoov = duckdb.sql(
                f"SELECT coalesce(sum(n_docs), 0), coalesce(max(oov_bp), 0) "
                f"FROM '{out}/text-perplexity-holdout/*.parquet'"
            ).fetchone()
            if hd > 0 and hoov > 0:
                holdout_live_seeds += 1
        except Exception as e:
            print(f"[fuzz] seed {seed}: holdout non-vacuity read failed: {e}",
                  flush=True)
    print(f"[fuzz] holdout OOV non-vacuity: {holdout_live_seeds} seed(s) "
          "scored held-out docs with >0 OOV bigrams", flush=True)
    if holdout_live_seeds == 0:
        print("[fuzz] text-perplexity-holdout ran VACUOUS on every seed — "
              "no held-out doc hit an OOV bigram; the backoff branches "
              "were never exercised", flush=True)
        any_fail = True
    sys.exit(1 if any_fail else 0)


if __name__ == "__main__":
    main()
