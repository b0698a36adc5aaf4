#!/usr/bin/env python
"""ShingleIndex.compact cost/benefit bench (round 9).

The fold's documented cost model: each compact() rewrites the base —
O(history) — so compact_every=N amortizes to O(history/N) per epoch;
the benefit is bounded partition/file counts and flat per-append read
cost instead of one file-set per batch forever. This script measures
both sides over 60 appends:

  - per-append edges_for_batch wall, split into thirds (does read
    cost stay flat as history grows, and does folding help late?);
  - per-fold wall + shuffle/input bytes + rows rewritten (the
    amortization denominator);
  - final partition and file counts per table.

Two indexes fed identical appends: compact_every=10 vs never.
Writes BENCH_INDEX_COMPACT.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

N_APPENDS = 60
COMPACT_EVERY = 10


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from datasette_upload_csvs_spark.session import get_spark
    from datasette_upload_csvs_spark.operators.shingle_index import ShingleIndex
    from bench_shingle_index import _ShuffleMeter
    from pyspark.sql import functions as F

    spark = get_spark(
        app_name="bench_index_compact",
        # UI-REST shuffle meter: its measure window must out-live a
        # stage block, so undo ENGINE_CONFS' bounded stage retention
        extra_confs={"spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = " ".join(f"c{i}" for i in range(40))

    def mk(b: int):
        rows = [
            (1000 * b, base + f" x{b}"),  # near-dup family across appends
            (1000 * b + 1, " ".join(f"u{b}v{j}" for j in range(14))),
            (1000 * b + 2, " ".join(f"w{b}y{j}" for j in range(14))),
            (1000 * b + 3, " ".join(f"q{b}z{j}" for j in range(14))),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def counts(table):
        n_parts = spark.sql(f"SHOW PARTITIONS {table}").count()
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
            .filter(F.col("col_name") == "Location")
            .first()["data_type"]
        ).replace("file:", "")
        n_files = sum(
            1
            for root, _, files in os.walk(loc)
            for f in files
            if not f.startswith((".", "_"))
        )
        return n_parts, n_files

    meter = None
    out = {}
    # fold   = flat schedule: every fold is a MAJOR (O(history) input)
    # tiered = generational: minors fold one window; every 3rd fold
    #          is a major — the amortization the tiered recipe claims
    for tag, every in (
        ("fold", COMPACT_EVERY),
        ("tiered", COMPACT_EVERY),
        ("plain", None),
    ):
        idx = ShingleIndex(spark, f"bic_{tag}")
        idx.drop()
        q_walls, folds = [], []
        prev_watermark = 0
        n_folds = 0
        for b in range(N_APPENDS):
            batch = mk(b)
            t0 = time.perf_counter()
            idx.edges_for_batch(batch).count()
            q_walls.append(round(time.perf_counter() - t0, 3))
            idx.release_batch_cache()
            idx.append(batch, batch=b)
            if every and b % every == every - 1:
                if meter is None:
                    meter = _ShuffleMeter(spark)
                hist_rows = spark.table(idx.postings).count()
                n_folds += 1
                minor = tag == "tiered" and n_folds % 3 != 0
                t0 = time.perf_counter()
                shuf, inp, folded = meter.measure(
                    lambda: idx.compact(
                        before_batch=b,
                        since_batch=prev_watermark if minor else 0,
                    )
                )
                folds.append(
                    {
                        "at_batch": b,
                        "kind": "minor" if minor else "major",
                        "folded_partitions": folded,
                        "history_rows": hist_rows,
                        "wall_s": round(time.perf_counter() - t0, 3),
                        "shuffle_mb": round(shuf / 2**20, 2),
                        "input_mb": round(inp / 2**20, 2),
                    }
                )
                prev_watermark = b
            spark.catalog.clearCache()
        third = N_APPENDS // 3
        tables = {}
        for t in (idx.postings, idx.sets, idx.df_tab, idx.commits):
            p, f = counts(t)
            tables[t.split("_", 1)[1]] = {"partitions": p, "files": f}
        out[tag] = {
            "query_wall_thirds": [
                round(sum(q_walls[i * third:(i + 1) * third]) / third, 3)
                for i in range(3)
            ],
            "folds": folds,
            "fold_input_mb_total": round(
                sum(f["input_mb"] for f in folds), 2
            ),
            "tables": tables,
        }
        print(f"# {tag}: {json.dumps(out[tag])}", file=sys.stderr)
        idx.drop()

    doc = {
        "metric": "shingle_index_compaction_cost_benefit",
        "n_appends": N_APPENDS,
        "compact_every": COMPACT_EVERY,
        "note": (
            "identical appends to two indexes; fold cost is the "
            "amortization numerator (each fold rewrites O(history)); "
            "query_wall_thirds shows per-append read cost early/mid/"
            "late as history grows"
        ),
        **out,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "BENCH_INDEX_COMPACT.json",
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"file": "BENCH_INDEX_COMPACT.json"}))


if __name__ == "__main__":
    main()
