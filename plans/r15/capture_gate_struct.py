#!/usr/bin/env python
"""Plan evidence for the r15 NULL-key gate-statistic fix (r14 ADVICE
item 1): dedup._dup_mass_stats now counts distinct keys through ONE
struct — count_distinct(a, b) DROPS rows where any key expression is
NULL, the old groupBy chain counted NULL-keyed groups. Dumps the
before/after gate aggregate plans over the minhash gate's key
expressions (xxhash64(text), length(text)) so the only diff is the
struct wrap — same single-aggregate shape, no extra exchange.

Writes gate_struct_before.txt / gate_struct_after.txt next to this
script.
"""
import io
import contextlib
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from datasette_upload_csvs_spark.session import get_spark
from datasette_upload_csvs_spark.queries import load

spark = get_spark(app_name="plan-capture-gate-struct")
spark.sparkContext.setLogLevel("ERROR")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


docs = load(spark, sf, "documents")
keys = (F.xxhash64(F.col("text")), F.length(F.col("text")))
before = docs.agg(
    F.count("*").alias("nd"),
    F.count_distinct(*keys).alias("ng"),
)
after = docs.agg(
    F.count("*").alias("nd"),
    F.count_distinct(F.struct(*keys)).alias("ng"),
)
with open(os.path.join(HERE, "gate_struct_before.txt"), "w") as f:
    f.write("== BEFORE: count_distinct(xxhash64(text), length(text)) "
            "— NULL-keyed rows dropped from ng ==\n")
    f.write(_explain(before))
with open(os.path.join(HERE, "gate_struct_after.txt"), "w") as f:
    f.write("== AFTER: count_distinct(struct(...)) — NULL-keyed rows "
            "counted exactly as the groupBy chain did ==\n")
    f.write(_explain(after))
print("wrote gate_struct_{before,after}.txt")
