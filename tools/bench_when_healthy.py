#!/usr/bin/env python3
"""Healthy-window bench watcher (VERDICT r12 item 1).

Every r12 bench pass ran wakeup-degraded (handoff_us 29.6-94.1; healthy
is 2-10 — PLANS.md "Round-12 bench notes"), leaving the round with no
trustworthy cross-round comparison. This watcher polls the standalone
wakeup probe (tools/HandoffProbe.java, the exact Bench.scala:59-73 code)
and, when handoff_us < THRESHOLD sustains over CONSECUTIVE polls, fires
the standard full-board sweep: N passes of `sbt -batch "runMain
graft.Bench"` at sf0.1, pass JSONs saved for `bench_history --append`.

The sweep runs in a CLEAN CLONE of the repo (git clone at launch), so it
never contends for the sbt lock with interactive work in /root/repo and
always measures a committed engine. /tmp/graft_bench_lock exists while a
sweep is running — heavy interactive jobs should wait for it to clear so
they don't pollute the healthy window.

Usage: python3 tools/bench_when_healthy.py [--threshold 10] [--passes 5]
         [--poll 120] [--consecutive 2] [--clone /tmp/graft-bench-clone]
         [--out-prefix /tmp/bench_r13_healthy_p]
Logs to tools/healthy_watch.log; exits after one completed sweep (marker
/tmp/graft_bench_done). Run it early in the round, in the background.
"""
import argparse
import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCK = "/tmp/graft_bench_lock"
DONE = "/tmp/graft_bench_done"
LOG = os.path.join(REPO, "tools", "healthy_watch.log")


def log(msg):
    line = f"[{datetime.datetime.now().strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def probe(clone):
    tools = os.path.join(clone, "tools")
    r = subprocess.run(["java", "HandoffProbe"], cwd=tools,
                       capture_output=True, text=True, timeout=120)
    d = json.loads(r.stdout.strip().splitlines()[-1])
    return max(d["handoff_us_1"], d["handoff_us_2"]), d["spin_ms"]


def ensure_clone(clone):
    if not os.path.isdir(os.path.join(clone, ".git")):
        log(f"cloning {REPO} -> {clone}")
        subprocess.run(["git", "clone", "-q", REPO, clone], check=True)
    else:
        # a pre-existing clone must track the CURRENT engine — a stale one
        # would record a "healthy-window" row for old code (review r13)
        subprocess.run(["git", "fetch", "-q", "origin"], cwd=clone, check=True)
        subprocess.run(["git", "reset", "-q", "--hard", "origin/HEAD"],
                       cwd=clone, check=True)
        log("clone synced to origin/HEAD")
    # always recompile: the probe source may have changed
    subprocess.run(["javac", "HandoffProbe.java"],
                   cwd=os.path.join(clone, "tools"), check=True)


def run_pass(clone, i, out_prefix, timeout):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS="32")
    out_path = os.path.join(clone, "bench_latest.json")
    if os.path.exists(out_path):
        os.remove(out_path)
    t0 = time.time()
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=clone, env=env, timeout=timeout,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    wall = time.time() - t0
    if not os.path.exists(out_path):
        log(f"pass {i}: FAILED (rc={r.returncode}, wall {wall:.0f}s)")
        return None
    dst = f"{out_prefix}{i}.json"
    with open(out_path) as f:
        d = json.load(f)
    with open(dst, "w") as f:
        json.dump(d, f)
    log(f"pass {i}: total {d.get('value', 0):.1f}s engine "
        f"{d.get('value_engine', 0):.1f}s wall {wall:.0f}s "
        f"handoff {d.get('handoff_us_start')}->{d.get('handoff_us_end')} "
        f"spin {d.get('spin_ms_start')}->{d.get('spin_ms_end')} -> {dst}")
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=10.0)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--poll", type=int, default=120)
    ap.add_argument("--consecutive", type=int, default=2)
    ap.add_argument("--clone", default="/tmp/graft-bench-clone")
    ap.add_argument("--out-prefix", default="/tmp/bench_r13_healthy_p")
    ap.add_argument("--max-hours", type=float, default=12.0)
    args = ap.parse_args()

    if os.path.exists(DONE):
        log(f"{DONE} exists — a sweep already completed; remove it to rerun")
        return
    ensure_clone(args.clone)
    deadline = time.time() + args.max_hours * 3600
    streak = 0
    log(f"watching: threshold {args.threshold} us x{args.consecutive}, "
        f"poll {args.poll}s, {args.passes} passes on healthy")
    while time.time() < deadline:
        try:
            h, s = probe(args.clone)
        except Exception as e:
            log(f"probe error: {e}")
            time.sleep(args.poll)
            continue
        streak = streak + 1 if h < args.threshold else 0
        log(f"handoff_us {h:.1f} spin_ms {s:.1f} (streak {streak})")
        if streak >= args.consecutive:
            log("HEALTHY WINDOW — firing sweep")
            open(LOCK, "w").write(str(os.getpid()))
            try:
                files = []
                for i in range(1, args.passes + 1):
                    dst = run_pass(args.clone, i, args.out_prefix, 3600)
                    if dst:
                        files.append(dst)
                with open(DONE, "w") as f:
                    f.write(json.dumps({"files": files}))
                log(f"sweep done: {len(files)}/{args.passes} passes; "
                    f"append with: python3 tools/bench_history.py "
                    f"--append 13 {' '.join(files)}")
            finally:
                if os.path.exists(LOCK):
                    os.remove(LOCK)
            return
        time.sleep(args.poll)
    log("deadline reached without a healthy window")


if __name__ == "__main__":
    main()
