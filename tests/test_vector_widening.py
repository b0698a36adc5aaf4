"""bench_vector_scale.widened_copy validity: the width bench's claims
are only meaningful if widening does not change the PROBLEM —
within-copy cosine structure must be preserved (each copy is an
orthogonal signed permutation of the base) and cross-copy cosines
must stay far below the ANN threshold (copies must not manufacture
near-duplicates). This pins both, so the filed BENCH_VECTOR_SCALE
numbers rest on a tested transform, not a comment.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

from bench_vector_scale import widened_copy  # noqa: E402


def _cosines(rows):
    vecs = {r["vec_id"]: list(r["embedding"]) for r in rows}
    ids = sorted(vecs)
    out = {}
    for a_i, a in enumerate(ids):
        for b in ids[a_i + 1 :]:
            va, vb = vecs[a], vecs[b]
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            out[(a, b)] = dot / (na * nb)
    return out


def test_widening_preserves_within_and_scrambles_across(spark, sf_dir):
    base = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter("vec_id < 40")
    )
    base_n = base.count()
    dim = len(base.select("embedding").first()[0])

    c0 = base.collect()
    c2 = widened_copy(base, 2, dim, base_n).collect()

    # ids are offset and disjoint from the base range
    ids2 = {r["vec_id"] for r in c2}
    assert ids2 == {r["vec_id"] + 2 * 10 * base_n for r in c0}

    # within-copy: every pairwise cosine preserved (orthogonal
    # transform; float32 storage + reordered summation allow tiny fp
    # noise, nowhere near any decision threshold in the bench)
    cos0 = _cosines(c0)
    off = 2 * 10 * base_n
    cos2 = _cosines(c2)
    assert set(cos2) == {(a + off, b + off) for a, b in cos0}
    for (a, b), v in cos0.items():
        assert abs(cos2[(a + off, b + off)] - v) < 1e-5

    # cross-copy: no manufactured near-duplicates — every base×copy2
    # cosine stays far under the ANN pipeline's 0.99 planted-twin
    # threshold (sign-noise concentrates around 0 at width 1/sqrt(dim))
    vecs0 = {r["vec_id"]: list(r["embedding"]) for r in c0}
    vecs2 = {r["vec_id"]: list(r["embedding"]) for r in c2}
    worst = 0.0
    for va in vecs0.values():
        na = math.sqrt(sum(x * x for x in va))
        for vb in vecs2.values():
            nb = math.sqrt(sum(x * x for x in vb))
            cos = sum(x * y for x, y in zip(va, vb)) / (na * nb)
            worst = max(worst, abs(cos))
    assert worst < 0.9, worst
