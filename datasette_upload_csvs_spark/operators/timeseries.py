"""Per-key time-series smoothers.

Recursive filters (EWMA, Holt) depend on the previous OUTPUT, which
no window frame expresses. For a bounded global series queries.py
folds an array; for millions of independent keys the Spark shape is
applyInPandas: one shuffle on the key, then each key's series is a
vectorized in-memory recursion — state never crosses keys, so the
operator scales horizontally with key count.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def ewma_by_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.2,
) -> DataFrame:
    """(key, ts, value, ewma) — EWMA per key in event-time order.

    Grouped Arrow batches; pandas' C-implemented ewm(adjust=False)
    is exactly the s_t = α·x_t + (1-α)·s_{t-1} recursion with
    s_0 = x_0. One shuffle (groupBy key); series length bounded by
    per-key history, not corpus size.
    """
    # derive key/ts field types from the input schema: the generic
    # signature accepts string keys or date timestamps, and a
    # hardcoded "long/timestamp" would fail the applyInPandas schema
    # check at runtime for them
    from pyspark.sql.types import DoubleType, StructField, StructType

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = StructType(
        [
            in_fields[key_col],
            in_fields[ts_col],
            StructField(value_col, DoubleType(), True),
            StructField("ewma", DoubleType(), True),
        ]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        pdf[value_col] = pdf[value_col].astype("float64")
        pdf["ewma"] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf[[key_col, ts_col, value_col, "ewma"]]

    return df.groupBy(key_col).applyInPandas(smooth, schema=out_schema)
