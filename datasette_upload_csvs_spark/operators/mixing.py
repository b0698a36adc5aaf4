"""Source-mixing allocation operators.

unimax_allocate: UniMax (Chung et al. ICLR '23) — allocate a token
budget across sources as uniformly as possible while capping every
source at E epochs of its own size. The paper states a sequential
loop (sort ascending, give each source min(cap, remaining/left));
the closed form used here is standard water-filling: with sources
sorted ascending by cap, source k's fair share is
u_k = (B - prefix_{k-1}) / (n - k + 1); the pivot p is the FIRST k
whose cap exceeds its fair share; everything before p is fully
capped, everything from p on receives the equal share u_p. (Proof
sketch: if cap_k <= u_k then giving k its cap only RAISES the fair
share of the remainder, so the loop would also cap it; at the first
violation every later source has a larger cap and the same share,
so the loop gives all of them u_p.)

All arithmetic stays on doubles derived from exact integers, so
Spark and any ANSI engine branch identically at every boundary; the
allocation math runs on the |sources|-row aggregate — the corpus is
never touched here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def unimax_allocate(
    counts: DataFrame,
    budget_num: int,
    budget_den: float,
    epochs_num: int = 3,
    epochs_den: float = 2.0,
    source_col: str = "source",
    count_col: str = "c",
) -> DataFrame:
    """(source, n_tokens, cap_tokens, alloc_tokens, epochs_used) for
    every row of ``counts`` (one row per source, ``count_col`` =
    source token count).

    budget B = budget_num * total / budget_den; epoch cap
    E = epochs_num / epochs_den. Both are given as integer
    numerator + float denominator so cap and budget arithmetic stays
    on exact-integer-derived doubles (engine-portable branching).
    """
    s, c = F.col(source_col), F.col(count_col)
    g = counts.agg(
        F.sum(c).cast("bigint").alias("tot"), F.count("*").alias("n")
    )
    o = counts.select(
        s.alias("source"),
        c.alias("c"),
        ((F.lit(epochs_num) * c) / F.lit(epochs_den)).alias("cap"),
    )
    w = Window.orderBy("cap", "source")
    o = o.select(
        "*",
        F.row_number().over(w).alias("k"),
        F.coalesce(
            F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("pre"),
    )
    u = o.join(F.broadcast(g)).select(
        "*",
        (
            ((F.lit(budget_num) * F.col("tot")) / F.lit(budget_den)
             - F.col("pre"))
            / (F.col("n") - F.col("k") + 1)
        ).alias("uk"),
    )
    piv = u.filter(F.col("cap") > F.col("uk")).agg(F.min("k").alias("p"))
    star = u.join(F.broadcast(piv), u["k"] == piv["p"]).select(
        F.col("uk").alias("ustar")
    )
    alloc = F.when(
        F.col("p").isNull() | (F.col("k") < F.col("p")),
        F.col("cap").cast("double"),
    ).otherwise(F.col("ustar"))
    return (
        u.join(F.broadcast(piv), F.lit(True), "left")
        .join(F.broadcast(star), F.lit(True), "left")
        .select(
            "source",
            F.col("c").alias("n_tokens"),
            F.col("cap").alias("cap_tokens"),
            F.round(alloc, 4).alias("alloc_tokens"),
            F.round(alloc / F.col("c"), 6).alias("epochs_used"),
        )
    )


def doremi_reweight(
    kl: DataFrame,
    keep: float = 0.999,
    smooth: float = 0.001,
    source_col: str = "source",
    count_col: str = "ns",
    excess_col: str = "excess",
) -> DataFrame:
    """One DoReMi Group-DRO domain-weight update (Xie et al. NeurIPS
    '23, Algorithm 1, the α step): from one row per domain carrying
    its token count and its non-negative excess loss λ, compute

        w_i   = n_i / Σn          (token-share baseline, the paper's
                                   initialization)
        w'_i  ∝ w_i · exp(η·λ_i)  with the paper's η = 1
        α_i   = keep·w'_i/Z + smooth/k   (c = 1e-3 uniform smoothing;
                                          keep/smooth are passed as
                                          LITERALS, never derived as
                                          1−c — that subtraction can
                                          land 1 ulp off the parsed
                                          SQL literal an oracle uses)

    Emits (source, n_tokens, baseline_weight, excess_loss,
    domain_weight, reweight_ratio); the ratio α_i/w_i is what a
    weighted resampler consumes.

    All arithmetic runs on the |domains|-row frame under a
    single-partition window (k rows — domains are tens, not
    millions); the normalizer rides the repo's DECIMAL
    order-independent-sum discipline so partition order cannot move
    the result."""
    w_all = Window.partitionBy()
    nc = F.sum(count_col).over(w_all)
    alpha0 = F.lit(1.0) * F.col(count_col) / nc
    alpha_up = alpha0 * F.exp(F.col(excess_col))
    upd = kl.select(
        F.col(source_col).alias("source"),
        F.col(count_col).alias("ns"),
        F.col(excess_col).alias("excess"),
        alpha0.alias("alpha0"),
        alpha_up.alias("alpha_up"),
        F.count("*").over(w_all).alias("k"),
        F.sum(alpha_up.cast("decimal(28,18)"))
        .over(w_all)
        .cast("double")
        .alias("zz"),
    )
    dw = (
        F.lit(keep) * F.col("alpha_up") / F.col("zz")
        + F.lit(smooth) / F.col("k")
    )
    return upd.select(
        "source",
        F.col("ns").cast("bigint").alias("n_tokens"),
        F.round("alpha0", 6).alias("baseline_weight"),
        F.col("excess").alias("excess_loss"),
        F.round(dw, 6).alias("domain_weight"),
        F.round(dw / F.col("alpha0"), 6).alias("reweight_ratio"),
    )
