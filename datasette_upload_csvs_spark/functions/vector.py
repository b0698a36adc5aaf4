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
