"""array_agg_region_nations ships a '|'-joined STRING in the registry
(the driver harness canonicalizes with pandas sort_values, which
crashes on ndarray cells — r5 driver ERR). The raw ArrayType form
lives on as an unregistered twin; this test pins the two forms equal
so the string output is provably the same aggregate.
"""

from __future__ import annotations

from datasette_upload_csvs_spark.queries import (
    _QUERIES,
    array_agg_region_nations_array,
)

SF = "/root/testdata/sf0.001"


def test_array_twin_matches_string_form(spark):
    string_rows = {
        r["r_name"]: (r["nations"], r["n_nations"])
        for r in _QUERIES["array_agg_region_nations"](spark, SF).collect()
    }
    array_rows = {
        r["r_name"]: (list(r["nations"]), r["n_nations"])
        for r in array_agg_region_nations_array(spark, SF).collect()
    }
    assert set(string_rows) == set(array_rows)
    for r_name, (joined, n) in string_rows.items():
        arr, n_arr = array_rows[r_name]
        assert n == n_arr == len(arr)
        assert joined == "|".join(arr)
        assert arr == sorted(arr)  # deterministic: sorted, not arrival order


def test_string_form_schema_is_driver_sortable(spark):
    df = _QUERIES["array_agg_region_nations"](spark, SF)
    kinds = dict(df.dtypes)
    assert kinds["nations"] == "string"  # no ArrayType in driver output
