#!/usr/bin/env python
"""Synthesize a larger scale-factor dataset with the same schemas,
layout (one parquet file per table) and value distributions as the
driver-generated /root/testdata/sf* dirs, for the r15 core-scaling
study (r14 VERDICT item 3: "the headline bench at sf0.1 no longer
exercises parallelism — file a larger-SF run + the 8-vs-32-core pair
at that SF, per-query").

NOT oracle data: the driver's generator is not public, so this is a
distribution-matched twin (vocab, cardinalities, ranges and type-for-
type schemas measured from sf0.1), usable for timing/scaling only.
Correctness stays pinned to the driver's own SFs. Deterministic
(numpy PCG64 seed 42); nothing is derived from the clock.

Usage: gen_sf_synth.py [MULTIPLIER] [OUTDIR]
  default: 10 /root/sf_synth/sf1.0  (sf0.1 x 10 = "sf1.0")
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
])


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/sf_synth/sf1.0"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    # -- fixed dims: copy verbatim (they do not scale with sf)
    for t in ("region", "nation"):
        pd.read_parquet(f"/root/testdata/sf0.1/{t}.parquet").to_parquet(
            f"{out}/{t}.parquet", index=False
        )

    n_supp = 1000 * mult
    n_part = 20_000 * mult
    n_cust = 15_000 * mult
    n_ord = 150_000 * mult
    n_li = 600_000 * mult
    n_ev = 100_000 * mult
    n_doc = 5_000 * mult
    n_emb = 2_000 * mult

    pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }).to_parquet(f"{out}/supplier.parquet", index=False)

    sizes = ["SMALL", "MEDIUM", "LARGE", "ECONOMY", "STANDARD", "PROMO"]
    adjs = ["large", "hot", "small", "cold", "dim", "bright"]
    nouns = ["ring", "bolt", "cap", "gear", "tube", "pin"]
    pk = np.arange(n_part, dtype=np.int64)
    pd.DataFrame({
        "p_partkey": pk,
        "p_name": [
            f"{adjs[i % 6]} {nouns[(i // 6) % 6]}" for i in range(n_part)
        ],
        "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
        "p_type": [sizes[i % 6] for i in range(n_part)],
        "p_size": (rng.integers(1, 51, n_part)).astype(np.int32),
        "p_retailprice": np.round(900.0 + (pk % 2000) / 10.0, 2),
    }).to_parquet(f"{out}/part.parquet", index=False)

    segs = np.array([
        "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE",
    ])
    pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": segs[rng.integers(0, 5, n_cust)],
    }).to_parquet(f"{out}/customer.parquet", index=False)

    statuses = np.array(["P", "O", "F"])
    prios = np.array([
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ])
    odate = (
        np.datetime64("1995-01-01")
        + rng.integers(0, 2404, n_ord).astype("timedelta64[D]")
    )
    pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": statuses[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": prios[rng.integers(0, 5, n_ord)],
    }).to_parquet(f"{out}/orders.parquet", index=False)

    rflags = np.array(["N", "R", "A"])
    lstat = np.array(["F", "O"])
    sdate = (
        np.datetime64("1995-01-02")
        + rng.integers(0, 2498, n_li).astype("timedelta64[D]")
    )
    pd.DataFrame({
        "l_orderkey": rng.integers(0, n_ord, n_li).astype(np.int64),
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(901, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rflags[rng.integers(0, 3, n_li)],
        "l_linestatus": lstat[rng.integers(0, 2, n_li)],
        "l_shipdate": sdate.astype("datetime64[us]"),
    }).to_parquet(f"{out}/lineitem.parquet", index=False)

    etypes = np.array(["signup", "purchase", "view", "click", "error"])
    ts = (
        np.datetime64("2024-01-01T00:00:00")
        + np.cumsum(
            rng.exponential(25.9, n_ev) * 1e6
        ).astype("timedelta64[us]")
    )
    pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, 1500 * mult, n_ev).astype(np.int64),
        "event_type": etypes[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    }).to_parquet(f"{out}/events.parquet", index=False)

    # -- documents: vocab sentences, 10-100 tokens, 20 sources,
    # weighted langs, and the sf0.1 dup fraction (8 per 5000 docs
    # share one text) so the dedup tier keeps its dup-light regime
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.412, 0.151, 0.149, 0.148, 0.140])
    lang_p = lang_p / lang_p.sum()
    n_tok = rng.integers(10, 101, n_doc)
    texts = [
        " ".join(VOCAB[rng.integers(0, len(VOCAB), k)]) for k in n_tok
    ]
    dup_text = " ".join(VOCAB[rng.integers(0, len(VOCAB), 40)])
    for i in range(8 * mult):
        texts[(i * 613) % n_doc] = dup_text
    pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": langs[rng.choice(5, n_doc, p=lang_p)],
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }).to_parquet(f"{out}/documents.parquet", index=False)

    emb = rng.normal(size=(n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": [e for e in emb],
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }).to_parquet(f"{out}/embeddings.parquet", index=False)

    print(f"wrote {out} at multiplier {mult}")


if __name__ == "__main__":
    main()
