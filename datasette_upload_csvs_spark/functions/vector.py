"""Vector math over ``array<float>`` embedding columns.

Everything is expressed with Spark higher-order functions
(``transform`` / ``zip_with`` / ``aggregate``) so the arithmetic
runs as Catalyst expressions on the JVM — no Python in the loop and
bit-for-bit reproducible against the DuckDB oracle (the positional
fold matches ``list_sum(list_transform(...))`` exactly), which is
why every registry entry uses these forms.

Honest performance note (measured, PLANS_r06.md §5c): Spark
evaluates higher-order functions INTERPRETED, outside whole-stage
codegen — ~0.02 ms per dim-64 cosine. That is fine for per-row
features and top-k over broadcast queries, but for BULK scoring
(n×k quantizer assignments, decontamination screens) use the
numpy-matmul twins in ``operators/similarity_arrow.py`` /
``semdedup_arrow.py`` — 25-99× faster, pinned to these expressions
by tests.

All helpers promote elements to double first so results are exact
IEEE doubles, reproducible across engines (floats would accumulate
precision loss in an engine-dependent order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """Cast array<float> → array<double> element-wise."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def double_array_frame(emb, vec_col: str = "embedding",
                       id_col: str = "vec_id"):
    """(id, v double-array) with the cast MATERIALIZED behind a 1:1
    explode(array(...)) generator barrier.

    Use this instead of ``select(id, as_double_array(vec))`` whenever
    the v column feeds MANY expressions (multi-plane LSH codes,
    multi-anchor scoring): inline, CollapseProject substitutes the
    cast into every reference, so a 32-projection bucketing pays 32
    redundant 64-wide casts per row — measured 13.7 s → 3.4 s on the
    sf0.1 ANN recall gate. The generator is a projection barrier the
    optimizer cannot collapse through, so the cast runs once per row
    (the operators/dedup._hash_shingle_frame lesson applied to
    vectors)."""
    return emb.select(
        F.col(id_col),
        F.explode(F.array(as_double_array(F.col(vec_col)))).alias("v"),
    )


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays (left-to-right fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL/zero-norm safe is the caller's concern."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
