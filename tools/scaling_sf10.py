#!/usr/bin/env python3
"""100x scale evidence for the dedup/sim ladder heads (VERDICT r11 item 4).

SCALING.md's board-wide curves stop at sf1 (10x the bench SF). This
harness generates an sf10 fixture (100x sf0.1, via graft.tools.ScaleGen's
independent-shard model) and measures the ops whose 100 TB story carries
the most weight across sf0.1 -> sf1 -> sf10 — a 100x span — with N passes
per scale (fresh JVM each; per-op MINIMUM across passes).

Slope model: slope10 = (t(sf10) - t(sf1)) / (t(sf1) - t(sf0.1)) is ~10
for any t = fixed + c*sf plan, regardless of the fixed term. Same bands
as tools/scaling.py.

Usage: python3 tools/scaling_sf10.py [--passes 3]
         [--sf1-dir /tmp/graft-sf1] [--sf10-dir /tmp/graft-sf10]
Writes tools/scaling_sf10.json; run with the box otherwise idle.
"""
import argparse
import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The 100 TB-load-bearing targets: the shared dedup fills (timed
# automatically when any dedup-* op is present), the cluster builder,
# the order-3 LM train, the curation composite (VERDICT r11 item 4),
# plus — round 13 (VERDICT r12 item 3) — the ANN/query heads whose
# 100 TB stories (broadcast queries, type-grain models, bounded top-k)
# were asserted in PLANS.md but unmeasured past sf1.
OPS = ["dedup-cluster", "text-kn-trigram", "pipeline-curation-e2e",
       "sim-rrf-hybrid", "sim-semantic-dedup", "text-bm25-topk",
       # round 14 (VERDICT r13 item 6): the r13 rewrites A/B'd only at
       # sf0.1 get their 100x curves, plus the two round-14 restructure
       # targets (§8 prefix-artifacts, fused substring-spans kernel).
       "agg-dedup-largest", "join-fanout-profile", "text-classifier-score",
       "dedup-prefix-artifacts", "dedup-substring-spans"]

# Fixture format version: bump when ScaleGen's model changes so stale
# /tmp fixtures regenerate. v2 = label offset per replica (round 13 —
# an unsalted label violated the "unchanged per-key fan-out" model and
# made the label-blocked all-pairs quadratic in the fixture).
FIXTURE_V = "v2"


def run_pass(sf_dir, timeout):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32")
    cmd = ["sbt", "-batch", "runMain graft.Bench " + " ".join(OPS)]
    out_path = os.path.join(REPO, "bench_latest.json")
    if os.path.exists(out_path):
        os.remove(out_path)
    r = subprocess.run(cmd, cwd=REPO, env=env, timeout=timeout,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if r.returncode != 0 or not os.path.exists(out_path):
        raise RuntimeError(f"bench pass failed at {sf_dir} (rc={r.returncode})")
    with open(out_path) as f:
        d = json.load(f)
    # strip Bench's seam: prefix (round 12) so ops keep one key everywhere
    d["queries"] = {(k[len("seam:"):] if k.startswith("seam:") else k): v
                    for k, v in d["queries"].items()}
    return d


def ensure_fixture(src, out_dir, mult, timeout):
    probe = os.path.join(out_dir, "embeddings.parquet")
    marker = os.path.join(out_dir, f".scalegen_{FIXTURE_V}")
    if os.path.isdir(probe) and os.path.exists(marker):
        return
    if os.path.isdir(probe):
        print(f"[scaling-sf10] {out_dir} predates fixture {FIXTURE_V} — "
              "regenerating", flush=True)
    print(f"[scaling-sf10] generating {mult}x fixture at {out_dir} ...",
          flush=True)
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.tools.ScaleGen {src} {out_dir} {mult}"],
        cwd=REPO, env=dict(os.environ, SPARK_GRAFT_CPUS="32"),
        timeout=timeout, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    open(marker, "w").write(FIXTURE_V)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--sf1-dir", default="/tmp/graft-sf1")
    ap.add_argument("--sf10-dir", default="/tmp/graft-sf10")
    args = ap.parse_args()

    ensure_fixture("/root/testdata/sf0.1", args.sf1_dir, 10, 900)
    ensure_fixture("/root/testdata/sf0.1", args.sf10_dir, 100, 3600)

    scales = [("sf0.1", "/root/testdata/sf0.1", 600),
              ("sf1", args.sf1_dir, 1200),
              ("sf10", args.sf10_dir, 3600)]
    mins = {}
    env_log = {}
    for name, sf_dir, timeout in scales:
        per_op = {}
        env_log[name] = []
        for p in range(args.passes):
            d = run_pass(sf_dir, timeout)
            env_log[name].append(
                [d.get("loadavg_start"), d.get("loadavg_end"),
                 d.get("wall_s"), d.get("spin_ms_start"),
                 d.get("spin_ms_end"), d.get("handoff_us_start"),
                 d.get("handoff_us_end")])
            for op, t in d["queries"].items():
                per_op[op] = min(per_op.get(op, 1e18), t)
            print(f"[scaling-sf10] {name} pass {p + 1}/{args.passes}: "
                  f"total {d['value']:.1f} s, load "
                  f"{d.get('loadavg_start')}->{d.get('loadavg_end')}",
                  flush=True)
        mins[name] = per_op

    rows = []
    for op in sorted(set().union(*[set(m) for m in mins.values()])):
        t01 = mins["sf0.1"].get(op)
        t1 = mins["sf1"].get(op)
        t10 = mins["sf10"].get(op)
        if None in (t01, t1, t10):
            continue
        d1, d2 = t1 - t01, t10 - t1
        # flat test spans the WHOLE measured range (top vs bottom scale,
        # the tools/scaling.py convention) — an op that grows sf0.1->sf1
        # then plateaus is not flat; the 0.3 s noise floor (vs scaling.py's
        # 0.15) is intentional: this harness's bottom span is 10x wider
        if t10 <= 1.3 * t01 + 0.5:
            cls = "flat (fixed cost dominates)"
            slope = None
        elif d1 < 0.3:
            slope = t10 / max(t1, 1e-9)
            cls = ("<=linear (ratio vs sf1)" if slope <= 13
                   else "REVIEW (ratio vs sf1 > 13)")
        else:
            slope = d2 / d1
            cls = ("sublinear" if slope <= 7 else
                   "linear" if slope <= 13 else
                   "near-linear (n log n band) - review" if slope <= 20 else
                   "SUPERLINEAR - defect")
        rows.append({"op": op, "sf0.1": round(t01, 2), "sf1": round(t1, 2),
                     "sf10": round(t10, 2),
                     "slope10": round(slope, 1) if slope is not None else None,
                     "class": cls})
        print(f"[scaling-sf10] {op}: {t01:.2f} / {t1:.2f} / {t10:.2f} "
              f"-> {cls}")

    out = {"passes": args.passes, "env": env_log, "rows": rows}
    with open(os.path.join(REPO, "tools", "scaling_sf10.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("[scaling-sf10] wrote tools/scaling_sf10.json")


if __name__ == "__main__":
    main()
