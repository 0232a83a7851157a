#!/usr/bin/env python3
"""Atomic round close (VERDICT r11 item 1).

Asserts the round's three closing artifacts describe the SAME op board,
so an op landing after the closing bench sweep FAILS the close instead of
silently escaping the multi-pass record (this happened three rounds
running: r9->r10 dedup-semantic-sweep, r10->r11 session 1, and the r11
session-2 batch — the last with PLANS.md claiming a record that did not
exist).

Checked sets:
  board   = keys of <verify-out>/oracle_sql.json (graft.Verify writes it;
            every op has BOTH a queries and an oracleSql entry, so this
            is the registered board)
  results = <verify-out>/<op>.parquet result dumps (one per op)
  bench   = latest tools/bench_history.jsonl row's per-op minimums,
            minus 'fill:' cache-fill entries, with 'seam:<op>'
            connector-seam entries counting as <op>

Usage:
  python3 tools/close_check.py [--verify-out /tmp/vout01]
                               [--correctness CORRECTNESS_rN.json]

Exit 1 with a named diff on any mismatch.
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(REPO, "tools", "bench_history.jsonl")


def fail(msgs):
    for m in msgs:
        print(f"[close-check] MISMATCH: {m}")
    sys.exit(1)


def diff(name_a, a, name_b, b):
    msgs = []
    only_a = sorted(a - b)
    only_b = sorted(b - a)
    if only_a:
        msgs.append(f"in {name_a} but not {name_b} "
                    f"({len(only_a)}): {', '.join(only_a[:15])}"
                    + (" ..." if len(only_a) > 15 else ""))
    if only_b:
        msgs.append(f"in {name_b} but not {name_a} "
                    f"({len(only_b)}): {', '.join(only_b[:15])}"
                    + (" ..." if len(only_b) > 15 else ""))
    return msgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify-out", default="/tmp/vout01",
                    help="graft.Verify output dir (oracle_sql.json + "
                         "per-op parquet dumps)")
    ap.add_argument("--correctness", default=None,
                    help="optional CORRECTNESS_rN.json to include in the "
                         "set comparison")
    ap.add_argument("--round", type=int, default=None,
                    help="assert the latest bench-history row IS this "
                         "round (a close that forgot --append otherwise "
                         "passes on an unchanged board by re-serving the "
                         "previous round's row)")
    args = ap.parse_args()

    osql = os.path.join(args.verify_out, "oracle_sql.json")
    if not os.path.exists(osql):
        print(f"[close-check] no {osql} — run graft.Verify first")
        sys.exit(1)
    with open(osql) as f:
        board = set(json.load(f))
    osql_mtime = os.path.getmtime(osql)

    # Verify writes one parquet DIRECTORY per op, named by the bare op id.
    # Freshness: Verify writes oracle_sql.json FIRST, then the dumps, into
    # a REUSED out dir — a dump older than oracle_sql.json is a leftover
    # from a previous run (its op either failed this run, leaving a stale
    # dir that would mask the failure as a false GREEN, or was removed
    # from the board). Both must fail the close.
    # A dump also needs its _SUCCESS commit marker: mtime alone counts a
    # freshly-recreated dir whose write failed mid-overwrite (_temporary
    # leftovers, no _SUCCESS) as a result, masking the failure until the
    # oracle compare (ADVICE r12).
    results, stale, uncommitted = set(), [], []
    for d in os.listdir(args.verify_out):
        p = os.path.join(args.verify_out, d)
        if not os.path.isdir(p):
            continue
        if os.path.getmtime(p) < osql_mtime:
            stale.append(d)
        elif not os.path.exists(os.path.join(p, "_SUCCESS")):
            uncommitted.append(d)
        else:
            results.add(d)
    if stale:
        print(f"[close-check] MISMATCH: {len(stale)} stale result dump(s) "
              f"predate this Verify run (op failed this run, or was "
              f"removed without clearing the out dir): "
              f"{', '.join(sorted(stale)[:15])}"
              + (" ..." if len(stale) > 15 else ""))
        sys.exit(1)
    if uncommitted:
        print(f"[close-check] MISMATCH: {len(uncommitted)} result dump(s) "
              f"lack a _SUCCESS marker (write failed mid-overwrite?): "
              f"{', '.join(sorted(uncommitted)[:15])}"
              + (" ..." if len(uncommitted) > 15 else ""))
        sys.exit(1)

    if not os.path.exists(HIST):
        print("[close-check] no bench_history.jsonl")
        sys.exit(1)
    with open(HIST) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    rows.sort(key=lambda r: r["round"])
    latest = rows[-1]
    if args.round is not None and latest["round"] != args.round:
        print(f"[close-check] MISMATCH: latest bench-history row is round "
              f"{latest['round']}, but this close is round {args.round} — "
              f"run bench_history --append {args.round} first")
        sys.exit(1)
    bench = set()
    for k in latest["mins"]:
        if k.startswith("fill:"):
            continue
        bench.add(k[len("seam:"):] if k.startswith("seam:") else k)

    msgs = diff("board(oracle_sql.json)", board,
                "verify-results(parquet dumps)", results)
    msgs += diff("board(oracle_sql.json)", board,
                 f"bench-history r{latest['round']} (ops, fills excluded)",
                 bench)
    if args.correctness:
        with open(args.correctness) as f:
            corr = set(json.load(f))
        msgs += diff("board(oracle_sql.json)", board,
                     os.path.basename(args.correctness), corr)

    if msgs:
        fail(msgs)
    extra = f", correctness {os.path.basename(args.correctness)}" \
        if args.correctness else ""
    print(f"[close-check] OK: board == verify results == bench-history "
          f"r{latest['round']} ops ({len(board)} ops; bench row has "
          f"{latest['entries']} entries incl. fills{extra})")


if __name__ == "__main__":
    main()
