"""Property-based pin of the star-mode equivalence proof: for
ARBITRARY small corpora with arbitrary duplication structure (not
just the fixed fixtures), the star edge set must have the same
transitive closure and the same vertex set as the clique edge set,
and its intra-group output must be linear in dup mass. Any flaw in
the rep-edge construction (a group whose members don't all reach the
rep, a verified cross pair lost at rep level) shows up here on a
10-doc counterexample long before it corrupts a 100 TB run."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from datasette_upload_csvs_spark.operators import dedup, graph

# a corpus is a list of (doc_id, template_idx): documents drawn from
# a tiny template pool, so exact-dup groups, near-dup families, and
# singletons all occur; ids are sparse and unordered
_TEMPLATES = [
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "alpha beta gamma delta epsilon zeta eta theta iota NOPE",
    "one two three four five six seven eight nine ten",
    "completely different words nothing shared here at all folks",
]
_CORPUS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),
        st.integers(min_value=0, max_value=len(_TEMPLATES) - 1),
    ),
    min_size=4,
    max_size=24,
    unique_by=lambda t: t[0],
)


def _components(pairs):
    cc = graph.connected_components(pairs.select("id_a", "id_b"))
    return sorted(map(tuple, cc.collect()))


def _vertices(pairs):
    return sorted(
        r["v"]
        for r in pairs.select(F.col("id_a").alias("v"))
        .unionAll(pairs.select(F.col("id_b").alias("v")))
        .distinct()
        .collect()
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(_CORPUS)
def test_star_equals_clique_closure_on_arbitrary_corpora(spark, corpus):
    dedup_mod = dedup
    old = dedup_mod._COLLAPSE_MIN_DUP
    dedup_mod._COLLAPSE_MIN_DUP = 1  # force the collapse gate open
    try:
        docs = spark.createDataFrame(
            [(i, _TEMPLATES[t]) for i, t in corpus],
            "doc_id long, text string",
        )
        clique = dedup.minhash_near_dup_pairs(
            docs, threshold=0.7, pair_mode="clique"
        )
        star = dedup.minhash_near_dup_pairs(
            docs, threshold=0.7, pair_mode="star"
        )
        assert _components(star) == _components(clique)
        assert _vertices(star) == _vertices(clique)
        # star never exceeds the clique relation
        assert star.count() <= clique.count()
    finally:
        dedup_mod._COLLAPSE_MIN_DUP = old
        spark.catalog.clearCache()
