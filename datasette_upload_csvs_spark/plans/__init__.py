"""Physical-plan introspection helpers.

The engine's scale contract is enforced here: filters must reach the
parquet scan (PushedFilters), projections must prune the read schema,
small dimensions must broadcast, and hot expressions must sit inside
whole-stage codegen. tests/test_plans.py asserts these on the real
headline queries — a plan regression fails CI, not just a benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def executed_plan(df: DataFrame) -> str:
    """Final (AQE-resolved) plan string after execution."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            inner = line.split("PushedFilters:", 1)[1].strip()
            if inner not in ("[]", ""):
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the (first) parquet scan."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            cols = []
            depth = 0
            cur = ""
            for ch in inner:
                if ch == "," and depth == 0:
                    cols.append(cur.split(":")[0].strip())
                    cur = ""
                else:
                    depth += ch in "<("
                    depth -= ch in ">)"
                    cur += ch
            if cur:
                cols.append(cur.split(":")[0].strip())
            return cols
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen regions in the AQE-final plan.

    Triggers execution of THIS frame (collect, not count — count()
    builds a different plan): under AQE the final plan with codegen
    annotations only exists after the stages materialize.
    """
    import re

    df.collect()
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def shuffle_count(df: DataFrame) -> int:
    """Exchange nodes in the physical plan (one per shuffle)."""
    import re

    return len(re.findall(r"\bExchange (hash|range|single|rebalance)", simple_plan(df)))
