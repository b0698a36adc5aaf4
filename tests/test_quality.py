"""Data-quality gate: every rule kind must actually count violations
(the registry query runs on clean data where all counts are zero)."""

from __future__ import annotations

from datasette_upload_csvs_spark.operators import quality as DQ


def test_rules_count_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0, 100),
            (1, "O", 20.0, 100),   # duplicate key 1
            (2, "X", -5.0, 100),   # bad status, negative price
            (3, "F", None, 999),   # null price (in_range), dangling ref
            (4, None, 30.0, None), # null status -> accepted_values? no: null
        ],
        "k long, status string, price double, cust long",
    )
    ref = spark.createDataFrame([(100,), (101,)], "c long")
    out = {
        r["rule"]: r["violations"]
        for r in DQ.check(
            df,
            [
                DQ.not_null("status"),
                DQ.accepted_values("status", ["O", "F", "P"]),
                DQ.in_range("price", 0, 100),
                DQ.unique("k"),
                DQ.references("cust", ref, "c"),
            ],
        ).collect()
    }
    assert out["not_null_status"] == 1
    # NULL NOT IN (...) is NULL, not true — only 'X' violates
    assert out["accepted_values_status"] == 1
    assert out["in_range_price"] == 2  # -5.0 and NULL
    assert out["unique_k"] == 1  # one extra row beyond the first
    assert out["ref_cust"] == 1  # 999 dangles; NULL cust is skipped
