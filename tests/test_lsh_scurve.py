"""Empirical banded-MinHash recall vs the published S-curve.

lsh_band_scurve (queries.py) files the textbook prediction
P(candidate | jaccard s) = 1 − (1 − s^r)^b for the engine's
32-band × 4-row signature; this test ties the table to the actual
implementation: construct pairs whose shingle-set Jaccard is EXACTLY
0.5 / 0.8 by token-block design, run minhash_near_dup_pairs with no
exact floor, and check the realized recall sits on the curve
(deterministic fixture — fixed hash permutations, fixed data — with
the tolerance sized as 3σ of a same-size Bernoulli sample, so the
assertion only fails if the fixture is an outlier the curve says is
<1% likely, i.e. if the banding is actually broken).

Pair construction: A = X·Y, B = X·Z over globally-unique tokens.
3-gram shingles: |A∩B| = |X|−2 (only X-internal shingles coincide;
boundary shingles differ), |A∪B| = (|X|−2) + 2·(|Y|+2−2).
|X|=22, |Y|=|Z|=10 → J = 20/40 = 0.5 exactly;
|X|=42, |Y|=|Z|=5  → J = 40/50 = 0.8 exactly.
"""

from __future__ import annotations

import pytest

from datasette_upload_csvs_spark.operators.dedup import (
    minhash_near_dup_pairs,
)
import __spark_entry__ as entry_mod

N_PAIRS = 256


def _pairs_frame(spark, lx: int, ls: int, tag: str):
    rows = []
    for p in range(N_PAIRS):
        x = [f"{tag}x{p}_{i}" for i in range(lx)]
        y = [f"{tag}y{p}_{i}" for i in range(ls)]
        z = [f"{tag}z{p}_{i}" for i in range(ls)]
        rows.append((2 * p, " ".join(x + y)))
        rows.append((2 * p + 1, " ".join(x + z)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _recall(spark, lx, ls, tag, threshold):
    docs = _pairs_frame(spark, lx, ls, tag)
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dup_pairs(
            docs, threshold=threshold
        ).collect()
    }
    # no false positives ever (exact verify), and candidates can only
    # be the planted twins (cross-pair Jaccard is 0)
    assert all(b == a + 1 and a % 2 == 0 for a, b in got)
    return len(got) / N_PAIRS


@pytest.mark.parametrize(
    "lx,ls,threshold,curve_col",
    [(22, 10, 0.45, "p_s50"), (42, 5, 0.75, "p_s80")],
)
def test_recall_sits_on_the_scurve(spark, lx, ls, threshold, curve_col):
    recall = _recall(spark, lx, ls, f"j{curve_col}_", threshold)
    # the prediction comes from the registry entry itself, so the
    # table and the implementation can never drift apart silently
    scurve = entry_mod.queries()["lsh_band_scurve"](spark, "unused")
    predicted = (
        scurve.filter("bands = 32 AND rows_per_band = 4")
        .select(curve_col)
        .first()[0]
    )
    # 3σ of a 256-draw Bernoulli at p=0.873 is 0.062; p_s80 ≈ 0.9998
    tol = 0.07 if curve_col == "p_s50" else 0.02
    assert abs(recall - predicted) <= tol, (recall, predicted)
