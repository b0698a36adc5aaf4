"""unimax_allocate (operators/mixing.py) vs a direct transcription
of the UniMax paper's sequential loop — the closed-form water-filling
window must agree with the loop on crafted edge cases and on
pseudo-random source distributions.
"""

from __future__ import annotations

import pytest

from datasette_upload_csvs_spark.operators.mixing import unimax_allocate


def _loop_reference(counts, budget_num, budget_den, e_num, e_den):
    """The paper's loop: ascending by cap, each source gets
    min(cap, remaining / sources_left)."""
    total = sum(c for _, c in counts)
    budget = budget_num * total / budget_den
    caps = sorted(
        ((e_num * c / e_den, s, c) for s, c in counts),
        key=lambda t: (t[0], t[1]),
    )
    out = {}
    remaining = budget
    for i, (cap, s, c) in enumerate(caps):
        share = remaining / (len(caps) - i)
        alloc = min(cap, share)
        out[s] = (c, cap, alloc)
        remaining -= alloc
    return out


CASES = [
    # every source caps out (budget >= sum of caps)
    ("all_capped", [("a", 100), ("b", 200), ("c", 50)], 3, 1.0),
    # nobody caps out (tiny budget, equal share everywhere)
    ("all_equal_share", [("a", 100), ("b", 200), ("c", 50)], 1, 10.0),
    # mixed: one giant source forces the pivot into the middle
    ("mixed", [("a", 10), ("b", 20), ("c", 1000), ("d", 15)], 1, 1.0),
    # single source
    ("single", [("only", 77)], 1, 1.0),
    # exact tie between cap and fair share at the pivot
    ("tie", [("a", 100), ("b", 100), ("c", 100), ("d", 100)], 3, 2.0),
    # pseudo-random skewed mixture
    (
        "skewed",
        [(f"s{i}", (7 * i * i + 13 * i + 5) % 997 + 1) for i in range(17)],
        1,
        1.0,
    ),
]


@pytest.mark.parametrize("name,counts,bn,bd", [(c[0], c[1], c[2], c[3]) for c in CASES])
def test_water_filling_matches_paper_loop(spark, name, counts, bn, bd):
    df = spark.createDataFrame(counts, "source string, c long")
    got = {
        r["source"]: (r["n_tokens"], r["cap_tokens"], r["alloc_tokens"])
        for r in unimax_allocate(df, bn, bd, 3, 2.0).collect()
    }
    want = _loop_reference(counts, bn, bd, 3, 2.0)
    assert set(got) == set(want)
    total = sum(c for _, c in counts)
    budget = bn * total / bd
    for s, (c, cap, alloc) in want.items():
        gc, gcap, galloc = got[s]
        assert gc == c
        assert gcap == pytest.approx(cap, abs=1e-9)
        assert galloc == pytest.approx(round(alloc, 4), abs=2e-4), (
            name, s, galloc, alloc
        )
        assert galloc <= gcap + 1e-6  # epoch cap never exceeded
    # budget never over-spent (allocation sums to min(B, sum caps))
    spent = sum(v[2] for v in got.values())
    # alloc_tokens rounds to 4 decimals, so the sum can drift by up
    # to 5e-5 per source off the exact budget
    assert spent <= budget + 1e-4 * len(counts)
    assert spent == pytest.approx(
        min(budget, sum(v[1] for v in want.values())),
        abs=1e-4 * len(counts),
    )


# ---------------------------------------------------------------------------
# doremi_reweight vs a transcription of DoReMi Algorithm 1's alpha step
# ---------------------------------------------------------------------------

import math

from datasette_upload_csvs_spark.operators.mixing import doremi_reweight


def _doremi_reference(rows, keep=0.999, smooth=0.001):
    """Algorithm 1's update, written the naive sequential way."""
    tot = sum(ns for _, ns, _ in rows)
    k = len(rows)
    a0 = {s: ns / tot for s, ns, _ in rows}
    up = {s: a0[s] * math.exp(ex) for s, _, ex in rows}
    z = sum(up.values())
    return {
        s: (a0[s], keep * up[s] / z + smooth / k)
        for s, _, _ in rows
    }


DOREMI_CASES = [
    ("single", [("only", 100, 0.5)]),
    # zero excess everywhere: alpha = keep*baseline + smooth/k exactly
    ("zero_excess", [("a", 100, 0.0), ("b", 300, 0.0), ("c", 600, 0.0)]),
    # one domain dominates the excess loss
    ("one_hot", [("a", 500, 2.0), ("b", 500, 0.0), ("c", 500, 0.0)]),
    # skewed counts AND skewed excess
    (
        "skewed",
        [
            (f"s{i}", (7 * i * i + 13 * i + 5) % 997 + 1,
             ((3 * i + 1) % 11) / 10.0)
            for i in range(17)
        ],
    ),
]


@pytest.mark.parametrize(
    "name,rows", [(c[0], c[1]) for c in DOREMI_CASES]
)
def test_doremi_matches_paper_update(spark, name, rows):
    df = spark.createDataFrame(
        rows, "source string, ns long, excess double"
    )
    got = {
        r["source"]: r for r in doremi_reweight(df).collect()
    }
    ref = _doremi_reference(rows)
    assert set(got) == set(ref)
    for s, (a0, dw) in ref.items():
        # operator rounds to 6 dp; allow that plus fp noise
        assert abs(got[s]["baseline_weight"] - a0) <= 1.5e-6
        assert abs(got[s]["domain_weight"] - dw) <= 1.5e-6
        assert abs(got[s]["reweight_ratio"] - dw / a0) <= 1e-4
    # the smoothed weights are a distribution: sum 1, floor smooth/k
    k = len(rows)
    assert abs(sum(r["domain_weight"] for r in got.values()) - 1.0) \
        <= 2e-6 * k
    assert all(
        r["domain_weight"] >= 0.001 / k - 1.5e-6 for r in got.values()
    )
