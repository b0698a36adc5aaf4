#!/usr/bin/env python
"""Streaming-funnel DECADE bench (round-11 VERDICT item 6): drive
>=500k docs through run_curation_funnel_stream — the full composed
funnel as a foreachBatch drain (gopher gate -> exact-dedup increment
-> maintained near-dup band index -> decontam flag -> state tables)
— with state COMPACTION firing mid-drain and the auto bucket cap on,
and pin per-epoch cost FLAT in history size.

BENCH_FUNNEL_STREAM.json's base section proves the cap's flatness
at 8 epochs x 1.7k docs; this run is the two-orders-up leg matching
the batch side's 5.76M-doc proof: E epochs x D docs (default
40 x 13k = 520k docs through the maintained index). Each epoch =
mostly-unique background + a RECURRING sub-threshold template family
(the history-coupling adversary: uncapped, family probes join every
historical member) + a recurring exact-dup family (exact stage stays
live). Generated engine-side (spark.range expressions, one parquet
file per epoch; maxFilesPerTrigger=1 maps files to epochs).

Flatness gate: mean per-epoch wall of the LAST quartile vs the
FIRST quartile (epoch 0 excluded — codegen warmup) is reported as
`last_over_first`; a maintained index that leaks history coupling
shows a monotone climb instead (~E/4x at these shapes).

Appends a "scale" section to BENCH_FUNNEL_STREAM.json (base section
preserved). Usage:

    python bench_funnel_stream_scale.py [E [D]] [--attr]
        [--major M] [--section NAME]

--attr      meter per-stage wall via the on_stage hook (forces extra
            materializations — attribution runs are NOT headline
            timings; per-stage quartile means land in the section).
--major M   tiered compaction: minor folds every compact_every,
            major folds every M (must be a multiple of
            compact_every). Default: r12 behavior (major every
            compact_every).
--section   JSON section name to write (default "scale").
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = sys.argv[1:]
    e_total = int(args[0]) if len(args) > 0 else 40
    d_epoch = int(args[1]) if len(args) > 1 else 13_000
    attr = "--attr" in flags

    def _flag_value(name: str) -> str:
        i = flags.index(name)
        if i + 1 >= len(flags):
            sys.exit(f"usage: {name} requires a value")
        return flags[i + 1]

    major_every = None
    if "--major" in flags:
        major_every = int(_flag_value("--major"))
    # --compact N: override the default e_total//5 fold cadence. The
    # default gives ~5 folds at any scale; the tiered-vs-major
    # crossover leg needs a FIXED small cadence so major-only pays
    # O(epochs/N) full-history folds while tiered amortizes
    # (r13 VERDICT item 4).
    compact_override = None
    if "--compact" in flags:
        compact_override = int(_flag_value("--compact"))
    section = "scale"
    if "--section" in flags:
        section = _flag_value("--section")
    # --conf k=v (repeatable): session extra_confs for controlled
    # experiments (e.g. spark.ui.enabled=false to test whether the
    # sporadic multi-10s epoch stalls are driver listener/GC state)
    extra_confs = {}
    for i, a in enumerate(flags):
        if a == "--conf":
            if i + 1 >= len(flags):
                sys.exit("usage: --conf requires a k=v value")
            k, sep, v = flags[i + 1].partition("=")
            if not sep or not k:
                sys.exit(f"usage: --conf expects k=v, got {flags[i + 1]!r}")
            extra_confs[k] = v

    from pyspark.sql import functions as F

    from datasette_upload_csvs_spark.session import get_spark
    from datasette_upload_csvs_spark.streaming.funnel_stream import (
        funnel_tables,
        run_curation_funnel_stream,
    )

    spark = get_spark(
        app_name="bench-funnel-stream-scale",
        extra_confs=extra_confs or None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    stop = "the and for with that this from "
    tmpl = " ".join(f"tmpl{j}" for j in range(30))
    k_fam = max(200, d_epoch // 10)   # recurring template family
    k_dup = 50                        # recurring exact-dup family
    src_dir = tempfile.mkdtemp(prefix="bfs_scale_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="bfs_scale_ckpt_")

    def epoch_frame(ep: int):
        base = ep * 1_000_000
        fam = spark.range(k_fam).select(
            (F.lit(base) + F.col("id")).alias("doc_id"),
            F.concat(
                F.lit(stop + tmpl + " "),
                F.concat_ws(" ", F.array(*[
                    F.concat(F.lit(f"u{j}x"),
                             (F.lit(base) + F.col("id")).cast("string"))
                    for j in range(12)
                ])),
            ).alias("text"),
        )
        uniq = spark.range(d_epoch - k_fam - k_dup).select(
            (F.lit(base + 100_000) + F.col("id")).alias("doc_id"),
            F.concat(
                F.lit(stop),
                F.concat_ws(" ", F.array(*[
                    F.concat(
                        F.lit(f"v{j}w"),
                        (F.lit(base + 100_000) + F.col("id"))
                        .cast("string"),
                    )
                    for j in range(20)
                ])),
            ).alias("text"),
        )
        dup_text = stop + " ".join(f"dupXt{j}" for j in range(25))
        dups = spark.range(k_dup).select(
            (F.lit(base + 900_000) + F.col("id")).alias("doc_id"),
            F.lit(dup_text).alias("text"),
        )
        return fam.unionByName(uniq).unionByName(dups)

    print(f"# generating {e_total} x {d_epoch} docs …", file=sys.stderr)
    for ep in range(e_total):
        # one file per epoch: zero-padded name so AvailableNow's
        # lexicographic file order matches epoch order
        epoch_frame(ep).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src_dir, f"tmp_ep{ep:04d}")
        )
        part = [
            f for f in os.listdir(os.path.join(src_dir, f"tmp_ep{ep:04d}"))
            if f.endswith(".parquet")
        ][0]
        os.rename(
            os.path.join(src_dir, f"tmp_ep{ep:04d}", part),
            os.path.join(src_dir, f"ep{ep:04d}.parquet"),
        )
        shutil.rmtree(os.path.join(src_dir, f"tmp_ep{ep:04d}"))

    prefix = "bfs_scale"
    for t in funnel_tables(prefix):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    per_epoch: list[dict] = []
    stage_rows: list[dict] = []
    marks = {"last": time.perf_counter(), "job": -1}

    # jobs-per-epoch meter (r13 VERDICT item 6): max jobId from the
    # UI REST store at each epoch boundary — monotonic, so the diff
    # counts jobs the epoch submitted even if old entries were
    # evicted from the bounded retention window.
    import urllib.request

    ui_url = spark.sparkContext.uiWebUrl
    try:
        _app_id = json.loads(
            urllib.request.urlopen(f"{ui_url}/api/v1/applications").read()
        )[0]["id"]
    except Exception:
        _app_id = None

    def _max_job_id() -> int:
        if _app_id is None:
            return -1
        try:
            jobs = json.loads(
                urllib.request.urlopen(
                    f"{ui_url}/api/v1/applications/{_app_id}/jobs"
                ).read()
            )
            return max((j["jobId"] for j in jobs), default=-1)
        except Exception:
            return -1

    def on_epoch(ep: int) -> None:
        now = time.perf_counter()
        jid = _max_job_id()
        row = {"epoch": ep, "wall_s": round(now - marks["last"], 3)}
        if jid >= 0 and marks["job"] >= 0:
            row["jobs"] = jid - marks["job"]
        per_epoch.append(row)
        marks["last"] = now
        marks["job"] = jid
        print(json.dumps(per_epoch[-1]), file=sys.stderr, flush=True)

    def on_stage(ep: int, stage: str, secs: float) -> None:
        stage_rows.append(
            {"epoch": ep, "stage": stage, "s": round(secs, 3)}
        )

    # default fires >=4 times mid-drain at any scale
    compact_every = compact_override or max(4, e_total // 5)
    marks["job"] = _max_job_id()  # baseline: epoch 0's diff is real
    t0 = time.perf_counter()
    n = run_curation_funnel_stream(
        spark,
        src_dir,
        "doc_id long, text string",
        prefix=prefix,
        bucket_star_cap="auto",
        checkpoint_dir=ckpt_dir,
        compact_every=compact_every,
        major_every=major_every,
        on_epoch=on_epoch,
        on_stage=on_stage if attr else None,
    )
    drain_wall = round(time.perf_counter() - t0, 3)

    walls = [r["wall_s"] for r in per_epoch[1:]]  # epoch 0 = warmup
    q = max(1, len(walls) // 4)
    first_q = statistics.mean(walls[:q])
    last_q = statistics.mean(walls[-q:])
    indexed = spark.table(f"{prefix}_index").select("doc_id").distinct().count()
    scale = {
        "epochs": n,
        "docs_per_epoch": d_epoch,
        "total_docs": e_total * d_epoch,
        "family_per_epoch": k_fam,
        "compact_every": compact_every,
        "major_every": major_every,
        "attributed": attr,
        "drain_wall_s": drain_wall,
        "per_epoch": per_epoch,
        "first_quartile_mean_s": round(first_q, 3),
        "last_quartile_mean_s": round(last_q, 3),
        "last_over_first": round(last_q / first_q, 3),
        "indexed_docs": indexed,
    }
    if attr and stage_rows:
        # per-stage quartile means over non-warmup epochs: the
        # attribution table — which stage's cost grows with history
        names = sorted({r["stage"] for r in stage_rows})
        by_stage = {}
        epochs_seen = sorted({r["epoch"] for r in stage_rows})
        warm = set(epochs_seen[1:])  # drop epoch 0 (codegen warmup)
        for s_name in names:
            walls = [
                r["s"] for r in stage_rows
                if r["stage"] == s_name and r["epoch"] in warm
            ]
            if not walls:
                continue
            sq = max(1, len(walls) // 4)
            by_stage[s_name] = {
                "n": len(walls),
                "first_quartile_mean_s": round(
                    statistics.mean(walls[:sq]), 3
                ),
                "last_quartile_mean_s": round(
                    statistics.mean(walls[-sq:]), 3
                ),
                "total_s": round(sum(walls), 3),
            }
        scale["per_stage"] = by_stage
        scale["stage_rows"] = stage_rows
    for t in funnel_tables(prefix):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(src_dir, ignore_errors=True)
    shutil.rmtree(ckpt_dir, ignore_errors=True)

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_FUNNEL_STREAM.json",
    )
    try:
        with open(path) as f:
            out = json.load(f)
    except (OSError, ValueError):
        out = {}
    out[section] = scale
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "metric": "funnel_stream_scale",
        "section": section,
        "total_docs": scale["total_docs"],
        "drain_wall_s": drain_wall,
        "last_over_first": scale["last_over_first"],
    }))


if __name__ == "__main__":
    main()
