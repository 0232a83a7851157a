#!/usr/bin/env python3
"""Cross-round bench-regression harness (round-10, VERDICT r9 item 5).

tools/bench_history.jsonl holds ONE line per round: the full per-op
MINIMUM map under the bench protocol (sf0.1, local[32], per-op minimum
over >= 3 passes — PLANS.md; single-pass totals on this shared box are
±20% noise and must never be compared).

Usage:
  # record a round from its pass files (graft.Bench JSON lines; only the
  # first JSON object per file is read — Bench emits a top-25 second line)
  python3 tools/bench_history.py --append 10 /tmp/p1.json /tmp/p2.json ...

  # flag regressions: compares the two highest rounds on file; an op
  # regresses when min_new > 1.5 x min_old AND the delta exceeds the
  # 0.15 s noise floor (sub-0.15 s swings are scheduler jitter even at
  # minimum). Exit 1 on any regression.
  python3 tools/bench_history.py --check

Appending the same round again REPLACES its line (re-sweeps supersede).
"""
import argparse
import json
import os
import sys

HIST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "bench_history.jsonl")
RATIO = 1.5
FLOOR_S = 0.15


def load_history():
    rows = []
    if os.path.exists(HIST):
        with open(HIST) as f:
            rows = [json.loads(l) for l in f if l.strip()]
    # a hand-edited / merge-resolved file may be out of order; --check
    # compares the two HIGHEST rounds, so order here, not just on write
    rows.sort(key=lambda r: r["round"])
    return rows


def write_history(rows):
    rows.sort(key=lambda r: r["round"])
    with open(HIST, "w") as f:
        for r in rows:
            f.write(json.dumps(r, sort_keys=True) + "\n")


def first_json_line(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise ValueError(f"no JSON object line in {path}")


MIN_PASSES = 3


def append(round_no, files):
    passes = [first_json_line(p) for p in files]
    maps = [p["queries"] for p in passes]
    # contention context (round-12 Bench emits these; older files lack
    # them): per-pass [loadavg_start, loadavg_end, wall_s] so a recorded
    # minimum taken under heavy tenant load is self-identifying forever
    # (BENCH_r11's 1700 s driver run vs 351 s idle-box, VERDICT r11 item 2)
    env = [[p.get("loadavg_start"), p.get("loadavg_end"), p.get("wall_s"),
            p.get("spin_ms_start"), p.get("spin_ms_end"),
            p.get("handoff_us_start"), p.get("handoff_us_end")]
           for p in passes]
    have_env = any(any(x is not None for x in e) for e in env)
    if have_env:
        for i, (ls, le, w, ss, se, hs, he) in enumerate(env, 1):
            print(f"[bench-history]   pass {i}: load {ls} -> {le}, "
                  f"spin_ms {ss} -> {se}, handoff_us {hs} -> {he}, "
                  f"wall {w} s")
    keys = sorted(set().union(*[set(m) for m in maps]))
    mins = {k: min(m[k] for m in maps if k in m) for k in keys}
    # the documented protocol is a minimum over EVERY pass in the append
    # (>= MIN_PASSES of them); an op present in fewer pass files silently
    # records a weaker minimum (round-10 ADVICE: warn, don't weaken the
    # protocol quietly). Expected coverage is len(files) — each op should
    # appear in every pass — with MIN_PASSES only as the floor when fewer
    # files are given at all.
    if len(files) < MIN_PASSES:
        print(f"[bench-history] WARNING: only {len(files)} pass file(s) — "
              f"the protocol wants >= {MIN_PASSES}")
    thin = {k: n for k in keys
            if (n := sum(1 for m in maps if k in m)) < len(files)}
    if thin:
        print(f"[bench-history] WARNING: {len(thin)} op(s) appear in fewer "
              f"than {len(files)} passes — their recorded minimums are "
              "weaker than the protocol:")
        for k, n in sorted(thin.items()):
            print(f"[bench-history]   {k}: {n} pass(es)")
    rows = [r for r in load_history() if r["round"] != round_no]
    row = {
        "round": round_no,
        "passes": len(files),
        "entries": len(mins),
        "sum_min_s": round(sum(mins.values()), 1),
        "mins": mins,
    }
    if have_env:
        row["env"] = env
    rows.append(row)
    write_history(rows)
    print(f"[bench-history] round {round_no}: {len(mins)} entries, "
          f"sum of minimums {round(sum(mins.values()), 1)} s "
          f"over {len(files)} pass(es)")


def check(rounds=None):
    rows = load_history()
    if len(rows) < 2:
        print("[bench-history] need >= 2 rounds to compare")
        return 0
    if rounds:
        by_no = {r["round"]: r for r in rows}
        a, b = (int(x) for x in rounds.split(","))
        if a not in by_no or b not in by_no:
            print(f"[bench-history] rounds on file: {sorted(by_no)}")
            return 1
        prev, cur = by_no[a], by_no[b]
    else:
        prev, cur = rows[-2], rows[-1]
    print(f"[bench-history] comparing round {cur['round']} "
          f"({cur['entries']} entries, {cur['sum_min_s']} s) vs "
          f"round {prev['round']} ({prev['entries']} entries, "
          f"{prev['sum_min_s']} s)")
    for label, r in (("cur", cur), ("prev", prev)):
        if r.get("env"):
            loads = [e[0] for e in r["env"] if e and e[0] is not None]
            if loads:
                print(f"[bench-history]   {label} round {r['round']}: "
                      f"loadavg at pass starts "
                      f"{', '.join(f'{x:.1f}' for x in loads)}")
    # seam:<op> counts as <op> (the close_check.py convention): the r11->r12
    # src-grpc -> seam:src-grpc rename otherwise silently skips the
    # comparison — the op looks simultaneously 'new' and 'gone' (ADVICE r12)
    def norm(mins):
        return {(k[len("seam:"):] if k.startswith("seam:") else k): v
                for k, v in mins.items()}
    cur_mins, prev_mins = norm(cur["mins"]), norm(prev["mins"])
    regressions = []
    for op, new in sorted(cur_mins.items()):
        old = prev_mins.get(op)
        if old is None:
            continue  # new op this round — no baseline
        if new > old * RATIO and new - old > FLOOR_S:
            regressions.append((op, old, new))
    gone = sorted(set(prev_mins) - set(cur_mins))
    if gone:
        print(f"[bench-history] ops absent this round (renamed/removed?): "
              f"{', '.join(gone)}")
    for op, old, new in regressions:
        print(f"[bench-history] REGRESSION {op}: {old:.2f} s -> {new:.2f} s "
              f"({new / old:.2f}x)")
    if not regressions:
        print("[bench-history] no per-op minimum regressed "
              f"> {RATIO}x (+{FLOOR_S} s floor)")
    return 1 if regressions else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--append", type=int, metavar="ROUND")
    ap.add_argument("files", nargs="*")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--rounds", default=None, metavar="A,B",
                    help="with --check: compare round B against round A "
                         "instead of latest-vs-previous (flag adjudication "
                         "across a known-degraded round)")
    args = ap.parse_args()
    if args.append is not None:
        if not args.files:
            ap.error("--append needs at least one bench pass JSON file")
        append(args.append, args.files)
    if args.check:
        sys.exit(check(args.rounds))
    if args.append is None and not args.check:
        ap.error("nothing to do: pass --append ROUND files... and/or --check")


if __name__ == "__main__":
    main()
