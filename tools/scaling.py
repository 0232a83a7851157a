#!/usr/bin/env python3
"""Empirical scaling-curve harness (round-8, VERDICT r7 item 1).

Measures the slowest ops of the board at three scales — sf0.01, sf0.1
and a generated sf1 fixture (10x sf0.1; `graft.tools.ScaleGen`) — with
N passes per scale (fresh JVM each; per-op MINIMUM across passes, the
PLANS.md noise protocol), then fits the marginal-cost slope

    slope = (t(sf1) - t(sf0.1)) / (t(sf0.1) - t(sf0.01))

which is ~10 for any t = fixed + c*sf plan regardless of the fixed
term, and flags ops growing superlinearly beyond their documented
shuffle terms. Writes SCALING.md + tools/scaling_results.json.

Usage: python3 tools/scaling.py [--passes 3] [--sf1-dir /tmp/graft-sf1]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# slowest 25 real ops of the round-7 close full pass (fills are timed
# automatically as their own entries when any dedup-* op is present)
OPS = [
    "join-pit-scd2", "verify-full-roundtrip", "dedup-minhash-k-sweep",
    "dedup-simhash-hamming", "dedup-pagerank-rep", "scan-avro",
    "text-novelty-curve", "agg-markov-stationary", "layout-bucketed-join",
    "text-contamination", "dedup-cluster", "interval-subtract",
    "dedup-df-spectrum", "agg-kmv-overlap", "topk-largest-group",
    "list-files", "mm-feature-extract", "sim-ivf-index-layout",
    "sim-rrf-hybrid", "layout-range-boundaries", "agg-dup-txid",
    "win-fork-depth", "scan-avro-pruned", "src-grpc",
    "dedup-substring-spans",
]

SCALES = [("sf0.01", "/root/testdata/sf0.01", 0.01),
          ("sf0.1", "/root/testdata/sf0.1", 0.1),
          ("sf1", None, 1.0)]  # dir filled from --sf1-dir


def run_pass(sf_dir, timeout):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32")
    cmd = ["sbt", "-batch", "runMain graft.Bench " + " ".join(OPS)]
    # Bench rewrites bench_latest.json on success; delete it first so a
    # crashed/timed-out pass can never silently re-serve the previous
    # pass's (or previous scale's) numbers
    out_path = os.path.join(REPO, "bench_latest.json")
    if os.path.exists(out_path):
        os.remove(out_path)
    r = subprocess.run(cmd, cwd=REPO, env=env, timeout=timeout,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if r.returncode != 0 or not os.path.exists(out_path):
        raise RuntimeError(
            f"bench pass failed at {sf_dir} (rc={r.returncode}, "
            f"output {'present' if os.path.exists(out_path) else 'missing'})")
    with open(out_path) as f:
        q = json.load(f)["queries"]
    # Bench times connector-seam sims under a seam: prefix (round 12);
    # strip it so the op keeps its historical key in scaling_results.json
    return {(k[len("seam:"):] if k.startswith("seam:") else k): v
            for k, v in q.items()}


def ensure_sf1(sf1_dir):
    probe = os.path.join(sf1_dir, "embeddings.parquet")
    if os.path.isdir(probe):
        return
    print(f"[scaling] generating sf1 fixture at {sf1_dir} ...", flush=True)
    subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.tools.ScaleGen /root/testdata/sf0.1 {sf1_dir} 10"],
        cwd=REPO, env=dict(os.environ, SPARK_GRAFT_CPUS="32"),
        timeout=900, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def verdict(t001, t01, t1):
    """Classify the growth curve of one op."""
    d1 = t01 - t001
    d2 = t1 - t01
    if t1 <= 1.3 * t01 + 0.5:
        return None, "flat (fixed cost dominates)"
    if d1 < 0.15:  # denominator inside noise: fall back to the raw ratio
        r = t1 / max(t01, 1e-9)
        if r <= 13:
            return r, "<=linear (ratio vs sf0.1)"
        return r, "REVIEW (ratio vs sf0.1 > 13, sf0.01 delta in noise)"
    slope = d2 / d1
    if slope <= 7:
        return slope, "sublinear"
    if slope <= 13:
        return slope, "linear"
    if slope <= 20:
        return slope, "near-linear (n log n band) - review"
    return slope, "SUPERLINEAR - defect"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf1-dir", default="/tmp/graft-sf1")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--ops", default=None,
                    help="comma-separated op ids to measure instead of the "
                         "default slowest-25 list (targeted new-op runs)")
    ap.add_argument("--out", default=None,
                    help="results filename under tools/; REQUIRED with "
                         "--ops (a targeted run must not clobber the "
                         "board-wide scaling_results.json baseline)")
    args = ap.parse_args()

    if args.ops and not args.out:
        ap.error("--ops requires an explicit --out "
                 "(refusing to overwrite the board-wide baseline)")
    if args.out is None:
        args.out = "scaling_results.json"
    # --out is a bare filename UNDER tools/ — a path with a directory
    # component is rejected loudly (ADVICE r11: silently basename-stripping
    # "--out /tmp/x.json" wrote tools/x.json with no warning). The
    # writability probe still runs BEFORE measuring (losing 15 minutes of
    # passes to a write-time ENOENT is the failure mode it guards), but a
    # probe file that did not pre-exist is unlinked if the probe created it.
    norm = args.out
    if norm.startswith("tools/"):  # redundant prefix, unambiguous
        norm = norm[len("tools/"):]
    if os.path.dirname(norm):
        ap.error(f"--out must be a bare filename under tools/ "
                 f"(got {args.out!r}); results always land in tools/")
    args.out = norm
    probe_path = os.path.join(REPO, "tools", args.out)
    pre_existing = os.path.exists(probe_path)
    open(probe_path, "a").close()
    if not pre_existing:
        os.unlink(probe_path)

    if args.ops:
        global OPS
        OPS = [o.strip() for o in args.ops.split(",") if o.strip()]

    if not args.skip_gen:
        ensure_sf1(args.sf1_dir)
    SCALES[2] = ("sf1", args.sf1_dir, 1.0)

    mins = {}  # scale -> op -> min time
    for name, sf_dir, sf in SCALES:
        per_op = {}
        timeout = 1800 if sf >= 1.0 else 600
        for p in range(args.passes):
            qs = run_pass(sf_dir, timeout)
            for k, v in qs.items():
                per_op[k] = min(per_op.get(k, float("inf")), v)
            print(f"[scaling] {name} pass {p + 1}/{args.passes}: "
                  f"total {sum(qs.values()):.1f}s", flush=True)
        mins[name] = per_op

    ops = sorted(mins["sf1"].keys(),
                 key=lambda k: -mins["sf1"][k])
    rows = []
    for op in ops:
        t001 = mins["sf0.01"].get(op, float("nan"))
        t01 = mins["sf0.1"].get(op, float("nan"))
        t1 = mins["sf1"].get(op, float("nan"))
        s, v = verdict(t001, t01, t1)
        rows.append({"op": op, "t_sf0.01": round(t001, 3),
                     "t_sf0.1": round(t01, 3), "t_sf1": round(t1, 3),
                     "slope": None if s is None else round(s, 1),
                     "verdict": v})

    with open(os.path.join(REPO, "tools", args.out), "w") as f:
        json.dump({"passes": args.passes, "rows": rows}, f, indent=1)

    for r in rows:
        print(f"{r['t_sf0.01']:8.2f} {r['t_sf0.1']:8.2f} {r['t_sf1']:8.2f} "
              f"{str(r['slope']):>6} {r['verdict']:<40} {r['op']}")


if __name__ == "__main__":
    main()
