"""Text primitives used by the text-analysis / dedup operators.

JVM-side only (split / filter / higher-order functions) — these run
per-document over potentially billions of rows, so they must stay in
whole-stage codegen. Regexes are kept to the portable subset that
behaves identically under Java regex (Spark) and RE2 (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer. A BPE-ish word/punct splitter is TOKEN_RE.
SPLIT_RE = r"\s+"
# "word or digit-run or single non-space symbol" — approximates a BPE
# pre-tokenizer's coarse segmentation; portable Java/RE2 syntax.
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens with empties removed (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, SPLIT_RE), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles of a document (array<string>).

    Built from the token array with transform + slice + array_join —
    pure Catalyst expressions. A doc shorter than n tokens yields a
    single shingle of all its tokens, so every doc has ≥1 shingle.
    """
    t = tokens(col)
    k = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(k - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i, n), " "))
    )
