#!/usr/bin/env python
"""Plan + job-count evidence for the r15 ann_bands_recall gate fold
(r14 VERDICT item 5): the query's planted-count aggregate and
embedding_ann_batch's collapse-gate aggregate (dedup._dup_mass_stats
over the corpus) fold into ONE aggregate over the checkpointed base
(queries._ann_recall_stats), one fewer corpus-wide action per
invocation.

Writes, next to this script:
  ann_gate_before.txt — the two OLD gate plans (planted-count agg +
      corpus dup-mass agg) as the pre-fold code built them
  ann_gate_after.txt  — the ONE folded aggregate plan
  ann_gate_jobs.txt   — Spark job count of a full ann_bands_recall
      invocation, before-form vs after-form, measured via the REST
      status API in this same session (the fold's claim is exactly
      one fewer job)
"""
import io
import contextlib
import json
import os
import sys
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.session import get_spark
from datasette_upload_csvs_spark.queries import load, _ann_recall_stats
from datasette_upload_csvs_spark.streaming.ann_stream import (
    embedding_ann_batch,
)
from datasette_upload_csvs_spark.functions.vector import double_array_frame
from datasette_upload_csvs_spark.operators import dedup

spark = get_spark(app_name="plan-capture-ann-gate")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _rest(path):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/{path}"
    ) as r:
        return json.load(r)


def _run_query(folded: bool) -> int:
    """Run the full ann_bands_recall pipeline in before- or
    after-form; return the number of Spark jobs it launched."""
    before = max((j["jobId"] for j in _rest("jobs")), default=-1)
    base = (
        load(spark, sf, "embeddings")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=False)
    )
    if folded:
        st = _ann_recall_stats(base)
        n_planted, off = int(st["p"] or 0), int(st["mx"]) + 1
        dup_stats = (int(st["n"] or 0) + n_planted, int(st["ngc"] or 0))
    else:
        st = base.agg(
            F.count("*").alias("n"),
            F.sum(
                (F.pmod("vec_id", F.lit(5)) == 0).cast("long")
            ).alias("p"),
            F.max("vec_id").alias("mx"),
        ).first()
        n_planted, off = int(st["p"] or 0), int(st["mx"]) + 1
        dup_stats = None
    twins = base.filter(F.pmod("vec_id", F.lit(5)) == 0).select(
        (F.col("vec_id") + off).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
        ).cast("array<float>").alias("embedding"),
    )
    corpus = base.unionByName(twins)
    pairs = embedding_ann_batch(
        corpus, threshold=0.99, dup_stats=dup_stats
    )
    twin_pairs = pairs.filter(
        (F.col("id_b") >= off) & (F.col("id_a") == F.col("id_b") - off)
    )
    found = twin_pairs.count()
    assert found == n_planted, (found, n_planted)
    spark.catalog.clearCache()
    return sum(1 for j in _rest("jobs") if j["jobId"] > before)


base = (
    load(spark, sf, "embeddings")
    .select("vec_id", "embedding")
    .localCheckpoint(eager=False)
)

# before-form gate plans: two aggregates (planted count over base,
# dup-mass over the corpus embedding_ann_batch derives)
planted_agg = base.agg(
    F.count("*").alias("n"),
    F.sum((F.pmod("vec_id", F.lit(5)) == 0).cast("long")).alias("p"),
    F.max("vec_id").alias("mx"),
)
off_probe = base.agg(F.max("vec_id")).first()[0] + 1
twins = base.filter(F.pmod("vec_id", F.lit(5)) == 0).select(
    (F.col("vec_id") + off_probe).alias("vec_id"),
    F.transform(
        "embedding",
        lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
    ).cast("array<float>").alias("embedding"),
)
corpus = base.unionByName(twins)
v = double_array_frame(corpus)
gate_agg = v.agg(
    F.count("*").alias("nd"),
    F.count_distinct(F.struct(F.xxhash64("v"))).alias("ng"),
)
with open(os.path.join(HERE, "ann_gate_before.txt"), "w") as f:
    f.write("== BEFORE action 1: planted-count aggregate over base ==\n")
    f.write(_explain(planted_agg))
    f.write("\n== BEFORE action 2: collapse-gate dup-mass aggregate "
            "over corpus (dedup._dup_mass_stats inside "
            "embedding_ann_batch) ==\n")
    f.write(_explain(gate_agg))

# after-form: the ONE folded aggregate (_ann_recall_stats' plan)
from datasette_upload_csvs_spark.functions.vector import as_double_array

twin_vec = F.transform(
    "embedding",
    lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
).cast("array<float>")
planted = F.pmod("vec_id", F.lit(5)) == 0
self_e = F.struct(
    F.lit(1).alias("pri"),
    F.col("vec_id").alias("vid"),
    F.xxhash64(as_double_array(F.col("embedding"))).alias("h"),
)
twin_e = F.struct(
    F.lit(0).alias("pri"),
    F.col("vec_id").alias("vid"),
    F.xxhash64(as_double_array(twin_vec)).alias("h"),
)
folded_agg = base.select(
    F.explode(
        F.when(planted, F.array(self_e, twin_e)).otherwise(
            F.array(self_e)
        )
    ).alias("e")
).agg(
    F.sum("e.pri").alias("n"),
    F.sum(
        F.when(
            (F.col("e.pri") == 1) & (F.pmod("e.vid", F.lit(5)) == 0),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).alias("p"),
    F.max(F.when(F.col("e.pri") == 1, F.col("e.vid"))).alias("mx"),
    F.count_distinct("e.h").alias("ngc"),
)
with open(os.path.join(HERE, "ann_gate_after.txt"), "w") as f:
    f.write("== AFTER: the ONE folded aggregate "
            "(queries._ann_recall_stats) ==\n")
    f.write(_explain(folded_agg))

spark.catalog.clearCache()

# job-count evidence: warmup once per form (codegen/broadcast
# compilation), then count jobs of a timed invocation
_run_query(folded=False)
jobs_before_form = _run_query(folded=False)
_run_query(folded=True)
jobs_after_form = _run_query(folded=True)
with open(os.path.join(HERE, "ann_gate_jobs.txt"), "w") as f:
    f.write(
        "ann_bands_recall full-invocation Spark job count (REST, "
        "same session, warmed):\n"
        f"  before-form (separate planted agg + internal gate agg): "
        f"{jobs_before_form}\n"
        f"  after-form (folded _ann_recall_stats + dup_stats): "
        f"{jobs_after_form}\n"
    )
print("jobs before-form:", jobs_before_form,
      "after-form:", jobs_after_form)
