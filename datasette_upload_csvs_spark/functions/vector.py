"""Vector math over ``array<float>`` embedding columns.

Everything is expressed with Spark higher-order functions
(``transform`` / ``zip_with`` / ``aggregate``) so the arithmetic runs
as Catalyst expressions on the JVM — no Python in the loop, no Arrow
transfer, and the expressions participate in whole-stage codegen.
At 100 TB this matters: a Python UDF here would put every embedding
through pickle/Arrow; these stay columnar end to end.

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
