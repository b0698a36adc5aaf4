"""The SPARK_GRAFT_VECTOR_BACKEND=arrow swap is a tested
configuration, not prose: every routed registry entry must match its
DuckDB oracle under BOTH backends in one test invocation, and the
arrow-suffixed registry entries (which the driver samples
independently) must equal their expression twins exactly.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

from test_oracle_parity import duck_con, normalize

ROUTED = [
    "semdedup_prune",
    "d4_prototype_prune",
    "kmeans_lloyd_step",
    "semantic_decontamination",
]

ARROW_TWINS = {
    "semdedup_prune_arrow": "semdedup_prune",
    "d4_prototype_prune_arrow": "d4_prototype_prune",
    "kmeans_lloyd_step_arrow": "kmeans_lloyd_step",
}


def _run_vs_oracle(name, spark, sf_dir):
    qs = entry_mod.queries()
    sdf = qs[name](spark, sf_dir)
    cols = sdf.columns
    rows = [tuple(r) for r in sdf.collect()]
    con = duck_con(sf_dir)
    res = con.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(cols) == sorted(dcols), name
    assert normalize(rows, cols) == normalize(drows, dcols), name


@pytest.mark.parametrize("name", ROUTED)
def test_routed_entry_oracle_parity_both_backends(name, spark, sf_dir):
    prev = os.environ.get("SPARK_GRAFT_VECTOR_BACKEND")
    try:
        os.environ["SPARK_GRAFT_VECTOR_BACKEND"] = "expression"
        _run_vs_oracle(name, spark, sf_dir)
        os.environ["SPARK_GRAFT_VECTOR_BACKEND"] = "arrow"
        _run_vs_oracle(name, spark, sf_dir)
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_VECTOR_BACKEND", None)
        else:
            os.environ["SPARK_GRAFT_VECTOR_BACKEND"] = prev


@pytest.mark.parametrize("arrow_name", sorted(ARROW_TWINS))
def test_arrow_registry_entry_equals_expression_twin(
    arrow_name, spark, sf_dir
):
    """The independently-registered arrow entries share their
    expression twins' oracle SQL verbatim — sound only if the outputs
    are EXACTLY equal, which this pins (beyond the operator-level pins
    in test_semdedup_arrow.py, this covers the registry wiring
    itself)."""
    qs = entry_mod.queries()
    expr_name = ARROW_TWINS[arrow_name]
    a = qs[arrow_name](spark, sf_dir)
    e = qs[expr_name](spark, sf_dir)
    assert a.columns == e.columns
    arows = sorted(tuple(r) for r in a.collect())
    erows = sorted(tuple(r) for r in e.collect())
    assert arows == erows


def test_arrow_twins_share_oracle_verbatim():
    oracles = entry_mod.oracle_sql()
    for arrow_name, expr_name in ARROW_TWINS.items():
        assert oracles[arrow_name] == oracles[expr_name]
