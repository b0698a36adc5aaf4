#!/usr/bin/env python
"""Digest bench_out/probe*_{op}_{arm}.json into BENCH_PROBE_SCALE.json
plus a readable table on stdout: per op/arm/cpus — min/median wall,
min task-time, min cpu-time over the probe epochs (epoch 0 discarded
as the fresh-process warmup), history rows, and the last epoch's
stage attribution where present."""
from __future__ import annotations

import glob
import json
import os

rows = []
for p in sorted(glob.glob("bench_out/probe*_*.json")):
    try:
        with open(p) as f:
            d = json.loads(f.read().strip().splitlines()[-1])
    except Exception:
        continue
    if "walls" not in d:
        continue
    walls = d["walls"][1:] or d["walls"]  # epoch 0 = warmup
    task = d["task_time_s"][1:] or d["task_time_s"]
    cpu = d["cpu_time_s"][1:] or d["cpu_time_s"]
    srt = sorted(walls)
    rows.append({
        "file": os.path.basename(p),
        "op": d["op"], "arm": d["arm"], "cpus": int(d["cpus"]),
        "history_rows": d["history_rows"],
        "wall_min": srt[0], "wall_median": srt[len(srt) // 2],
        "walls": d["walls"],
        "task_min_s": min(task), "task_all": d["task_time_s"],
        "cpu_min_s": min(cpu),
        "stages_last": d.get("stages_last", []),
    })

with open("BENCH_PROBE_SCALE.json", "w") as f:
    json.dump(rows, f, indent=1)

print(f"{'op':9} {'arm':10} {'cpus':4} {'hist_rows':>11} "
      f"{'wall_min':>9} {'wall_med':>9} {'task_min':>9} {'cpu_min':>8}")
for r in sorted(rows, key=lambda r: (r["op"], r["cpus"], r["arm"])):
    print(f"{r['op']:9} {r['arm']:10} {r['cpus']:4} "
          f"{r['history_rows']:>11} {r['wall_min']:>9.2f} "
          f"{r['wall_median']:>9.2f} {r['task_min_s']:>9.1f} "
          f"{r['cpu_min_s']:>8.1f}")
