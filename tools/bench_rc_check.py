#!/usr/bin/env python3
"""Bench health-bit check (VERDICT r12 item 3 / "What's wrong" 3).

BENCH_r12.json recorded rc=1 on a run whose own tail showed success —
the capture wrapper's rc is not a trustworthy health bit. graft.Bench
now prints a terminal `BENCH_OK <n_ops>` line and exits 0 explicitly;
this check asserts the marker is present in a captured artifact, so a
wrapper-level rc can never be mistaken for a Bench failure (and a
missing marker IS one).

Accepts either a driver BENCH_rN.json (reads its "tail" field) or a raw
captured-output text file. Exit 0 iff the marker is found.

Usage: python3 tools/bench_rc_check.py BENCH_r13.json [...]
"""
import json
import re
import sys

MARK = re.compile(r"BENCH_OK (\d+)(?: errors=(\d+))?")


def check(path):
    with open(path, errors="replace") as f:
        text = f.read()
    try:
        d = json.loads(text)
        if isinstance(d, dict) and "tail" in d:
            text = str(d.get("tail", ""))
    except ValueError:
        pass
    m = MARK.search(text)
    if not m:
        print(f"[bench-rc] {path}: NO BENCH_OK marker — Bench did not "
              "finish (or the capture predates the marker)")
        return False
    errs = int(m.group(2)) if m.group(2) is not None else 0
    if errs:
        print(f"[bench-rc] {path}: BENCH_OK but {errs} op(s) THREW — "
              "their recorded times are failure stubs, not measurements")
        return False
    print(f"[bench-rc] {path}: BENCH_OK ({m.group(1)} ops, 0 errors) "
          "— healthy")
    return True


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(0 if all([check(p) for p in sys.argv[1:]]) else 1)
