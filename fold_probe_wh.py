#!/usr/bin/env python
"""Fold a probe warehouse's epoch partitions to BASE after an
interrupted build (bench_probe_scale.py --build killed early):
re-registers the tables and runs compact_state_table on each.
Usage: fold_probe_wh.py WH TABLE [TABLE ...]"""
import sys

sys.path.insert(0, "/root/repo")

wh = sys.argv[1]
tables = sys.argv[2:]

from bench_probe_scale import _mk_spark, _register  # noqa: E402
from datasette_upload_csvs_spark.streaming.epoch_write import (  # noqa: E402
    compact_state_table,
)

spark = _mk_spark(wh)
_register(spark, wh, tables)
for t in tables:
    if spark.catalog.tableExists(t):
        compact_state_table(spark, t, 10_000)
        print(t, spark.table(t).count())

# tables here are EXTERNAL (registered over the persisted dirs), so
# the fold's DROP PARTITION steps are catalog-only — physically
# remove the folded epoch + staging dirs, or a later MSCK REPAIR
# resurrects them as duplicate rows (bit us once: 3x-duplicated ann
# history in the first probe run)
import os
import shutil

for t in tables:
    d = os.path.join(wh, t)
    if not os.path.isdir(d):
        continue
    for sub in os.listdir(d):
        if sub.startswith("_batch_id=") and sub != "_batch_id=-1":
            shutil.rmtree(os.path.join(d, sub))
