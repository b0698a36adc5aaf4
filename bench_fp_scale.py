#!/usr/bin/env python
"""Width-scale bench for the fingerprint near-dup tier (round-9
VERDICT item 1): does the pigeonhole chunk join stay sub-quadratic
as the corpus grows?

The density problem: c chunks of b bits each generate
~c·n²/2^(b+1) candidate pairs on a DUP-FREE corpus (birthday math on
bucket keys) — with 64-bit fingerprints and 4 chunks, b=16, so the
candidate mass goes visibly quadratic within this bench's reach.
The 128-bit tier (simhash128 + fingerprint_hamming_pairs_wide) keeps
the same n_chunks=4 / hamming ≤ 3 exact-recall contract but with
b=32-bit keys, pushing the quadratic knee past 10⁹ docs.

This bench builds dup-free corpora at 1×/8×/32×/128× of a 5k-doc
base, precomputes BOTH fingerprint widths to parquet (fingerprinting
cost is common to the tiers and excluded), then measures per width:
  - candidate-pair mass (chunk-join rows before the hamming filter)
  - full-pipeline wall + shuffle/input bytes (_ShuffleMeter)
  - surviving pairs (≈0 on a dup-free corpus at hamming ≤ 3)
Writes BENCH_FP_SCALE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

BASE_DOCS = 5_000
MULTS = [1, 8, 32, 128]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from datasette_upload_csvs_spark.session import get_spark
    from datasette_upload_csvs_spark.operators import dedup
    from bench_shingle_index import _ShuffleMeter
    from pyspark.sql import functions as F

    spark = get_spark(
        app_name="bench_fp_scale",
        # UI-REST shuffle meter: its measure window must out-live a
        # stage block, so undo ENGINE_CONFS' bounded stage retention
        extra_confs={"spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="fp-scale-")

    def docs(n: int):
        # deterministic unique ~12-token docs: worst case for bucket
        # density (no dup mass for the collapse gate to remove)
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(
                        F.lit(f"w{j}x"),
                        ((F.col("id") + 1) * (7919 + 104729 * j))
                        .cast("string"),
                    )
                    for j in range(12)
                ],
            ).alias("text"),
        )

    def chunk_candidates(fp, fp_cols):
        # the chunk join BEFORE distinct/hamming-filter — the mass
        # the shuffle actually moves and the verify actually scans
        n_words = len(fp_cols)
        cpw = 4 // n_words
        bits = 64 // cpw
        mask = (1 << bits) - 1
        chunks = fp.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(w * cpw + j).alias("chunk"),
                            (
                                F.col(fp_cols[w])
                                if cpw == 1
                                else F.shiftrightunsigned(
                                    F.col(fp_cols[w]), bits * j
                                ).bitwiseAND(F.lit(mask))
                            ).alias("val"),
                        )
                        for w in range(n_words)
                        for j in range(cpw)
                    ]
                )
            ).alias("cc"),
        ).select("doc_id", "cc.chunk", "cc.val")
        a = chunks.alias("a")
        b = chunks.alias("b")
        return (
            a.join(b, on=["chunk", "val"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .count()
        )

    meter = None
    rows = []
    try:
        for m in MULTS:
            n = BASE_DOCS * m
            d = docs(n)
            p64 = f"{work}/fp64_x{m}.parquet"
            p128 = f"{work}/fp128_x{m}.parquet"
            dedup.simhash(d).write.mode("overwrite").parquet(p64)
            dedup.simhash128(d, portable=False).write.mode(
                "overwrite"
            ).parquet(p128)

            for width, path, cols in (
                (64, p64, ["simhash64"]),
                (128, p128, ["fp0", "fp1"]),
            ):
                fp = spark.read.parquet(path)
                if meter is None:  # one untimed JVM warmup
                    dedup.fingerprint_hamming_pairs_wide(
                        fp, cols, "doc_id", max_hamming=3
                    ).count()
                    spark.catalog.clearCache()
                    meter = _ShuffleMeter(spark)

                cand = chunk_candidates(fp, cols)

                def run():
                    out = dedup.fingerprint_hamming_pairs_wide(
                        fp, cols, "doc_id", max_hamming=3
                    ).count()
                    spark.catalog.clearCache()
                    return out

                t0 = time.perf_counter()
                shuf, inp, pairs = meter.measure(run)
                wall = time.perf_counter() - t0
                row = {
                    "width_bits": width,
                    "mult": m,
                    "n_docs": n,
                    "candidate_pairs": cand,
                    "pairs_out": pairs,
                    "wall_s": round(wall, 3),
                    "shuffle_mb": round(shuf / 2**20, 2),
                    "input_mb": round(inp / 2**20, 2),
                }
                rows.append(row)
                print(f"# {row}", file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    doc = {
        "metric": "fingerprint_width_scaling",
        "note": (
            "dup-free corpora (collapse gate removes nothing — pure "
            "bucket-density regime), n_chunks=4 / hamming<=3 both "
            "widths; fingerprints precomputed to parquet so the "
            "rows measure ONLY the pair join. Expected candidate "
            "mass ~ 4*n^2/2^(b+1): quadratic knee at b=16 inside "
            "this bench, pushed past 1e9 docs at b=32."
        ),
        "base_docs": BASE_DOCS,
        "rows": rows,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FP_SCALE.json"
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps({"rows": len(rows), "file": "BENCH_FP_SCALE.json"}))


if __name__ == "__main__":
    main()
