"""Text-analysis operators: token stats, quality scoring,
language ID, fingerprinting.

Everything is Catalyst-expression-only (split/filter/transform/
regexp), so these run inside whole-stage codegen — the right shape
for scoring billions of documents. The logic is deliberately
mirror-able in ANSI SQL so each operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.functions.text import STOPWORDS, tokens

# Marker words per language for the n-gram/stopword language-ID
# heuristic. Order = precedence on ties (first wins).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token count, char length, avg token length."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    total_tok_chars = F.aggregate(
        t, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        n_tok.alias("n_tokens"),
        (
            total_tok_chars.cast("double")
            / F.greatest(n_tok, F.lit(1)).cast("double")
        ).alias("avg_token_len"),
    )


def word_frequencies(
    docs: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Corpus-wide top-N word frequencies (explode → partial agg)."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(top_n)
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality signals.

    score = stopword_ratio-weighted heuristic in [0,1]; the exact
    formula is arbitrary but deterministic and SQL-mirrorable.
    """
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.,!?;:]", ""))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tok, F.lit(1)).cast("double")
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    length_ok = (n_tok >= 5) & (n_tok <= 100000)
    score = (
        F.when(length_ok, F.lit(0.5)).otherwise(F.lit(0.0))
        + F.least(stop_ratio * 2.0, F.lit(0.3))
        + F.when(punct_ratio <= 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: argmax of per-language hit counts.

    Returns 'und' (undetermined) when no marker hits at all. Ties are
    broken by LANG_MARKERS declaration order.
    """
    t = tokens(F.lower(F.col(text_col)))

    def marker_count(markers: tuple[str, ...]):
        return F.size(F.filter(t, lambda x: x.isin(*markers)))

    counts = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in reversed(langs):  # reversed → earlier langs win ties
        c = counts[lang]
        best = F.when(c >= F.greatest(best_n, F.lit(1)), F.lit(lang)).otherwise(best)
        best_n = F.greatest(best_n, c)
    return docs.select(
        F.col(id_col),
        best.alias("predicted_lang"),
        *[counts[lang].alias(f"hits_{lang}") for lang in langs],
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted
    distinct token set (the classic 'fingerprint' clustering key —
    robust to token reordering; cf. OpenRefine fingerprinting)."""
    t = F.array_sort(F.array_distinct(tokens(F.lower(F.col(text_col)))))
    return docs.select(
        F.col(id_col),
        F.md5(F.array_join(t, " ")).alias("fingerprint"),
    )


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc average negative log-probability under the corpus's
    own unigram model — the cheap stand-in for KenLM-perplexity
    quality scoring (docs full of globally-rare tokens score high =
    surprising; repetitive template docs score low).

    Determinism follows token_entropy_by_lang's recipe: p = cnt/tot
    is exact integer→double division, each -ln p term is rounded to
    10 digits BEFORE summing, and the per-doc sum runs in decimal so
    accumulation order can't matter. Scale: one vocabulary aggregate
    (map-side combined) joined back to the token stream on the word
    key; the vocab side is small enough to broadcast in practice but
    the plan stays correct as a shuffle join if it isn't.
    """
    from datasette_upload_csvs_spark.functions.text import tokens as _tokens

    toks = docs.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("w"))
    freq = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("tot"))
    term = F.round(-F.log(F.col("cnt") / F.col("tot")), 10).cast(
        "decimal(28,12)"
    )
    scored = freq.crossJoin(F.broadcast(tot)).select("w", term.alias("nll"))
    return (
        toks.join(scored, "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum("nll").cast("double") / F.count("*"), 6
            ).alias("avg_nll"),
        )
    )
