#!/usr/bin/env python
"""Round-end verification gate (round-11 VERDICT item 4): run the
full test suite and the registry-wide plan audit, and FILE both
results as one-line JSON artifacts — SUITE_r{N}.json and
PLANAUDIT_r{N}.json — the same committed-record pattern as
BENCH_r{N}.json. The reference's CI runs plain pytest on every push
(reference .github/workflows/test.yml:11-27); this is the repo's
equivalent gate, with a record the next round's judge can read
instead of re-deriving.

Usage: python round_gate.py N          (N = round number)
       python round_gate.py N --skip-tests   (plan audit only)
Exit non-zero if tests fail or the audit finds cartesians/errors.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def run_suite(n: int) -> bool:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q",
         "-p", "no:cacheprovider"],
        cwd=HERE, capture_output=True, text=True,
    )
    wall = round(time.time() - t0, 1)
    # persist the run's tail (short summary + FAILED lines) — without
    # it a 1-failure run leaves no record of WHICH test failed
    # (round-12 lesson: a 638-pass/1-fail suite cost a triage pass
    # because only the count survived)
    lines = proc.stdout.strip().splitlines() if proc.stdout else []
    with open(os.path.join(HERE, f"SUITE_r{n:02d}_tail.log"), "w") as f:
        f.write("\n".join(lines[-120:]) + "\n")
    tail = lines[-1] if lines else ""
    m = re.search(r"(\d+) passed", tail)
    passed = int(m.group(1)) if m else 0
    m = re.search(r"(\d+) failed", tail)
    failed = int(m.group(1)) if m else 0
    out = {"passed": passed, "failed": failed, "wall_s": wall,
           "tail": tail[:200]}
    with open(os.path.join(HERE, f"SUITE_r{n:02d}.json"), "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out))
    return proc.returncode == 0 and failed == 0 and passed > 0


def run_audit(n: int) -> bool:
    proc = subprocess.run(
        [sys.executable, "plan_audit.py"],
        cwd=HERE, capture_output=True, text=True,
    )
    summary = {}
    for line in proc.stdout.splitlines():
        m = re.match(
            r"checked=(\d+) cartesian=(\d+) "
            r"broadcast_nested_loop=(\d+) errors=(\d+)", line)
        if m:
            summary = {
                "checked": int(m.group(1)),
                "cartesian": int(m.group(2)),
                "bnlj": int(m.group(3)),
                "errors": int(m.group(4)),
            }
    summary["rc"] = proc.returncode
    with open(os.path.join(HERE, f"PLANAUDIT_r{n:02d}.json"), "w") as f:
        json.dump(summary, f)
        f.write("\n")
    print(json.dumps(summary))
    return proc.returncode == 0


def main() -> int:
    n = int(sys.argv[1])
    ok_audit = run_audit(n)
    ok_suite = True
    if "--skip-tests" not in sys.argv:
        ok_suite = run_suite(n)
    return 0 if (ok_audit and ok_suite) else 1


if __name__ == "__main__":
    raise SystemExit(main())
