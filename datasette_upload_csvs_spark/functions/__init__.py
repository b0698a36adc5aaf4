"""Scalar/higher-order function helpers (all JVM-side built-ins).

No Python UDFs live here: everything compiles to Catalyst expressions
so it stays inside whole-stage codegen on the hot path.
"""

from datasette_upload_csvs_spark.functions.vector import (  # noqa: F401
    as_double_array,
    dot,
    l2_norm,
    cosine,
)
from datasette_upload_csvs_spark.functions.text import (  # noqa: F401
    tokens,
    token_count,
    TOKEN_RE,
)
