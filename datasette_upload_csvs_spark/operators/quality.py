"""Declarative data-quality checks over DataFrames.

The dbt/Great-Expectations-style gate, engine-native: each rule is a
named predicate; the checker evaluates ALL rules in as few passes as
possible (one conditional aggregation for row-level rules, one
grouped aggregation per uniqueness rule, one anti-join per
referential rule) and returns a tidy (rule, violations) relation.
At 100 TB the thing that matters is pass count: N row-level rules
cost ONE scan, not N.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    kind: str  # 'predicate' | 'unique' | 'ref'
    predicate: Column | None = None  # rows VIOLATE when predicate is true
    cols: tuple[str, ...] = ()
    ref: DataFrame | None = None
    ref_col: str | None = None


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", "predicate", F.col(col).isNull())


def accepted_values(col: str, values: list) -> Rule:
    return Rule(
        f"accepted_values_{col}", "predicate", ~F.col(col).isin(values)
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range_{col}",
        "predicate",
        F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def unique(*cols: str) -> Rule:
    return Rule("unique_" + "_".join(cols), "unique", cols=tuple(cols))


def references(col: str, ref: DataFrame, ref_col: str) -> Rule:
    return Rule(f"ref_{col}", "ref", cols=(col,), ref=ref, ref_col=ref_col)


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule string, violations long) — one row per rule.

    Row-level predicates share ONE scan (conditional sums); each
    unique rule is one grouped agg; each referential rule one
    anti-join against the (deduped, broadcastable) key side.
    """
    spark = df.sparkSession
    results: list[DataFrame] = []

    preds = [r for r in rules if r.kind == "predicate"]
    if preds:
        aggs = [
            F.sum(r.predicate.cast("long")).alias(r.name) for r in preds
        ]
        row = df.agg(*aggs)
        stack = ", ".join(f"'{r.name}', {r.name}" for r in preds)
        results.append(
            row.selectExpr(
                f"stack({len(preds)}, {stack}) as (rule, violations)"
            )
        )

    for r in rules:
        if r.kind == "unique":
            dup = (
                df.groupBy(*r.cols)
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") > 1)
                .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("v"))
                .select(F.lit(r.name).alias("rule"), F.col("v").alias("violations"))
            )
            results.append(dup)
        elif r.kind == "ref":
            missing = (
                df.select(F.col(r.cols[0]).alias("k"))
                .filter(F.col("k").isNotNull())
                .join(
                    F.broadcast(
                        r.ref.select(F.col(r.ref_col).alias("k")).distinct()
                    ),
                    "k",
                    "left_anti",
                )
                .agg(F.count("*").alias("v"))
                .select(F.lit(r.name).alias("rule"), F.col("v").alias("violations"))
            )
            results.append(missing)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
