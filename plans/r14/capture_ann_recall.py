#!/usr/bin/env python
"""Capture the INTERNAL pairs-pipeline plan of ann_bands_recall
(the registry entry returns a driver-local verdict table, so the
executed pipeline — corpus := base+twins -> embedding_ann_batch ->
twin filter — is what the plan evidence must show)."""
import io, os, sys, contextlib

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
tag = sys.argv[1] if len(sys.argv) > 1 else "after"

from datasette_upload_csvs_spark.session import get_spark
from datasette_upload_csvs_spark.queries import load
from datasette_upload_csvs_spark.streaming.ann_stream import embedding_ann_batch
from pyspark.sql import functions as F

spark = get_spark(app_name="plan-capture-ann")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import datasette_upload_csvs_spark.queries as Q
import inspect
src = inspect.getsource(Q.ann_bands_recall)
uses_spread = "_spread" in src
print("query uses _spread:", uses_spread)

base = load(spark, sf, "embeddings").select("vec_id", "embedding")
if uses_spread:
    from datasette_upload_csvs_spark.operators import dedup
    base = dedup._spread(base, "vec_id")
base = base.localCheckpoint(eager=False)
st = base.agg(
    F.count("*").alias("n"),
    F.sum((F.pmod("vec_id", F.lit(5)) == 0).cast("long")).alias("p"),
    F.max("vec_id").alias("mx"),
).first()
off = int(st["mx"]) + 1
twins = base.filter(F.pmod("vec_id", F.lit(5)) == 0).select(
    (F.col("vec_id") + off).alias("vec_id"),
    F.transform(
        "embedding",
        lambda x, i: x + F.when(i == 0, F.lit(0.001)).otherwise(F.lit(0.0)),
    ).cast("array<float>").alias("embedding"),
)
corpus = base.unionByName(twins)
pairs = embedding_ann_batch(corpus, threshold=0.99)
twin_pairs = pairs.filter(
    (F.col("id_b") >= off) & (F.col("id_a") == F.col("id_b") - off)
)
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    twin_pairs.explain("formatted")
out = os.path.join(HERE, f"ann_bands_recall_{tag}.txt")
with open(out, "w") as f:
    f.write(buf.getvalue())
print("wrote", out, len(buf.getvalue()), "bytes")
