#!/usr/bin/env python
"""nd_cand cap-stage A/B at multi-million-doc history (r14 item:
"nd_cand cap aggregation residual").

The per-epoch near-dup candidate stage pays the bucket-cap guard
(cap_bucket_side) as a groupBy over ALL semi survivors PLUS a second
computation of the survivor relation (the stats subtree and the
tagged-join subtree each re-run the history scan + fused semi —
no exchange is reusable between a partial-agg exchange and a raw-row
join side). This bench isolates that stage against a persisted
synthetic history so code variants can be compared fresh-process.

Phases (same corpus mix as BENCH_ND_PROBE_AB / the xover legs:
recurring sub-threshold template family + unique background +
exact-dup family):

  --build N_EPOCHS DOCS_PER_EPOCH : bulk near_dup_epoch calls into
      the warehouse at --wh, then a major fold to base. Run once.
  --probe K : re-register the persisted tables, run K unmetered
      near_dup_epoch probe calls (26k docs, cap="auto"), print
      per-call wall + a stage attribution for the last call.

Tables persist across processes as plain parquet dirs under --wh;
each process re-registers them as external partitioned tables
(the in-memory catalog dies with the process, the data does not).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

WH = "/root/nd_ab_wh"
PREFIX = "nd_ab"


def _mk_spark(wh):
    from datasette_upload_csvs_spark.session import get_spark

    spark = get_spark(app_name="bench-nd-cap-ab", warehouse_dir=wh)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _register(spark, wh):
    """Re-register persisted parquet state dirs as external tables."""
    for name in (f"{PREFIX}_pairs", f"{PREFIX}_index",
                 f"{PREFIX}_index__sets"):
        p = os.path.join(wh, name)
        if not os.path.isdir(p):
            continue
        df = spark.read.parquet(p)
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields if f.name != "_batch_id"
        )
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(
            f"CREATE TABLE {name} ({cols}, `_batch_id` INT) "
            f"USING parquet PARTITIONED BY (`_batch_id`) "
            f"LOCATION 'file:{p}'"
        )
        spark.sql(f"MSCK REPAIR TABLE {name}")


def _batch(spark, ep: int, n_docs: int):
    from pyspark.sql import functions as F

    stop = "the and for with that this from "
    tmpl = " ".join(f"tmpl{j}" for j in range(30))
    k_fam = max(200, n_docs // 10)
    k_dup = 50
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
    uniq = spark.range(n_docs - k_fam - k_dup).select(
        (F.lit(base + 400_000) + F.col("id")).alias("doc_id"),
        F.concat(
            F.lit(stop),
            F.concat_ws(" ", F.array(*[
                F.concat(F.lit(f"v{j}w"),
                         (F.lit(base + 400_000) + F.col("id"))
                         .cast("string"))
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


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]
    wh = WH
    if "--wh" in args:
        wh = args[args.index("--wh") + 1]

    from datasette_upload_csvs_spark.streaming.near_dup_stream import (
        near_dup_epoch,
    )
    from datasette_upload_csvs_spark.streaming.epoch_write import (
        compact_state_table,
    )

    if "--build" in args:
        i = args.index("--build")
        n_epochs, docs = int(args[i + 1]), int(args[i + 2])
        if os.path.isdir(wh):
            shutil.rmtree(wh)
        os.makedirs(wh)
        spark = _mk_spark(wh)
        for ep in range(n_epochs):
            t0 = time.perf_counter()
            r = near_dup_epoch(
                _batch(spark, ep, docs), ep,
                f"{PREFIX}_pairs", f"{PREFIX}_index",
                bucket_star_cap="auto",
            )
            spark.catalog.clearCache()
            print(f"# build ep{ep}: {time.perf_counter()-t0:.1f}s {r}",
                  file=sys.stderr, flush=True)
        for t in (f"{PREFIX}_pairs", f"{PREFIX}_index",
                  f"{PREFIX}_index__sets"):
            compact_state_table(spark, t, n_epochs)
        n = spark.table(f"{PREFIX}_index").count()
        print(json.dumps({"built_epochs": n_epochs, "docs_per_epoch": docs,
                          "index_rows": n}))
        return

    if "--probe" in args:
        k = int(args[args.index("--probe") + 1])
        label = "probe"
        if "--label" in args:
            label = args[args.index("--label") + 1]
        spark = _mk_spark(wh)
        _register(spark, wh)
        n_hist = spark.table(f"{PREFIX}_index").count()
        walls = []
        stage_rows = []

        def on_stage(ep, st, sec):
            stage_rows.append({"ep": ep, "stage": st, "s": round(sec, 3)})

        for j in range(k):
            ep = 9000 + j  # far above history epochs; each probe appends
            t0 = time.perf_counter()
            near_dup_epoch(
                _batch(spark, ep, 26_000), ep,
                f"{PREFIX}_pairs", f"{PREFIX}_index",
                bucket_star_cap="auto",
                on_stage=on_stage if j == k - 1 else None,
            )
            spark.catalog.clearCache()
            el = round(time.perf_counter() - t0, 3)
            walls.append(el)
            print(f"# {label} ep{ep}: {el}s", file=sys.stderr, flush=True)
        print(json.dumps({"label": label, "history_rows": n_hist,
                          "walls": walls,
                          "stages_last": stage_rows}))
        return

    sys.exit("usage: --build N D | --probe K [--label L] [--wh DIR]")


if __name__ == "__main__":
    main()
