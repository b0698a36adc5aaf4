"""CSV-ingest correctness tests — ports of the reference's five test
fixtures (reference tests/test_datasette_upload_csvs.py:52-102) plus
type-inference contract pins (reference expectations :52-82).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from datasette_upload_csvs_spark import ingest
from datasette_upload_csvs_spark import catalog as cat

SIMPLE = b"name,age\nCleo,5\nPancakes,4\n"

# latin-1, CRLF, pound signs in headers — reference NOT_UTF8 fixture
NOT_UTF8 = (
    "IncidentNumber,DateOfCall,Lat,Notional Cost (\xa3)\r\n"
    "139091,01/01/2009 03:01,51.5,255\r\n"
    "139093,01/01/2009 03:03,51.6,259\r\n"
    "139094,2008/09,51.7,263\r\n"
).encode("latin-1")

# ascii for the first 2KB, a latin-1 byte later (reference :83-86)
LATIN1_AFTER_2KB = b"content\n" + b"aaaaa\n" * 420 + "sm\xf6rg\xe5s\n".encode("latin-1")


def write(tmp_path, name: str, data: bytes) -> str:
    p = os.path.join(tmp_path, name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def test_simple_upload_types_and_rows(spark, tmp_path):
    path = write(tmp_path, "dogs.csv", SIMPLE)
    res = ingest.upload_csv(spark, path)
    assert res.error is None
    assert res.table == "dogs"
    assert res.types == {"name": "text", "age": "integer"}
    rows = {tuple(r) for r in spark.table("dogs").collect()}
    assert rows == {("Cleo", 5), ("Pancakes", 4)}


def test_not_utf8_encoding_and_types(spark, tmp_path):
    path = write(tmp_path, "encodings.csv", NOT_UTF8)
    res = ingest.upload_csv(spark, path)
    assert res.error is None
    df = spark.table(res.table)
    # £ survives decoding; dates/yearmonth stay text (no date inference)
    assert "Notional Cost (£)" in df.columns
    assert res.types["IncidentNumber"] == "integer"
    assert res.types["DateOfCall"] == "text"
    assert res.types["Lat"] == "float"
    assert res.types["Notional Cost (£)"] == "integer"
    got = {tuple(r) for r in df.collect()}
    assert (139091, "01/01/2009 03:01", 51.5, 255) in got
    assert (139094, "2008/09", 51.7, 263) in got


def test_latin1_after_sniff_window_degrades_gracefully(spark, tmp_path):
    path = write(tmp_path, "latin1_tail.csv", LATIN1_AFTER_2KB)
    res = ingest.upload_csv(spark, path, sniff_bytes=2048)
    # reference: must not fail; content of the late row is unspecified
    assert res.error is None
    assert res.rows == 421


def test_weird_filename_logical_physical_mapping(spark, tmp_path):
    path = write(tmp_path, "weird ~ filename here.csv.csv", SIMPLE)
    res = ingest.upload_csv(spark, path)
    assert res.error is None
    # one trailing .csv stripped (reference :94-97)
    assert res.logical_name == "weird ~ filename here.csv"
    assert spark.catalog.tableExists(res.table)
    assert cat.lookup_physical_name(spark, "weird ~ filename here.csv") == res.table


def test_name_collision_suffixing(spark, tmp_path):
    path = write(tmp_path, "already_exists.csv", SIMPLE)
    r1 = ingest.upload_csv(spark, path)
    r2 = ingest.upload_csv(spark, path)
    assert r1.table == "already_exists"
    assert r2.table == "already_exists_2"
    assert spark.table("already_exists_2").count() == 2


def test_progress_lifecycle(spark, tmp_path):
    path = write(tmp_path, "progress.csv", SIMPLE)
    res = ingest.upload_csv(spark, path)
    prog = ingest.get_progress(spark, res.task_id)
    assert prog is not None
    # the invariant the reference tests poll for (:176)
    assert prog["bytes_done"] == prog["bytes_todo"] == res.bytes_todo
    assert prog["rows_done"] == 2
    assert prog["completed"] is not None
    assert prog["error"] is None


def test_error_captured_not_raised(spark, tmp_path):
    res = ingest.upload_csv(spark, os.path.join(tmp_path, "nope.csv"))
    assert res.error is not None


def test_async_upload(spark, tmp_path):
    path = write(tmp_path, "async_dogs.csv", SIMPLE)
    task = ingest.upload_csv_async(spark, path)
    res = task.result(timeout=120)
    assert res.error is None
    assert res.rows == 2
    prog = ingest.get_progress(spark, task.task_id)
    assert prog["bytes_done"] == prog["bytes_todo"]


@pytest.mark.parametrize(
    "values,expected",
    [
        (["5", "007"], "integer"),
        (["2.55", "139091"], "float"),
        (["1e5", "2"], "float"),
        (["01/01/2009 03:01"], "text"),
        (["2008/09"], "text"),
        (["true", "false"], "text"),  # no boolean inference
        (["", "5"], "integer"),  # empty string = null, ignored
        ([""], "text"),  # all-null column stays text
        (["+17", "-3"], "integer"),
        (["nan?", "5"], "text"),
    ],
)
def test_type_inference_lattice(spark, values, expected):
    df = spark.createDataFrame([(v,) for v in values], "c string")
    assert ingest.infer_column_types(df)["c"] == expected


def test_ragged_rows_null_pad_and_truncate(spark, tmp_path):
    data = b"a,b,c\n1,2,3,EXTRA\n4,5\n"
    path = write(tmp_path, "ragged.csv", data)
    res = ingest.upload_csv(spark, path)
    assert res.error is None
    rows = {tuple(r) for r in spark.table(res.table).collect()}
    # extra cell dropped; short row null-padded (reference dict(zip))
    assert rows == {(1, 2, 3), (4, 5, None)}


def test_utf16_csv(spark, tmp_path):
    data = "name,score\nsmörgås,5\nüber,7\n".encode("utf-16")
    path = write(tmp_path, "utf16.csv", data)
    res = ingest.upload_csv(spark, path)
    assert res.error is None
    assert res.types == {"name": "text", "score": "integer"}
    rows = {tuple(r) for r in spark.table(res.table).collect()}
    assert rows == {("smörgås", 5), ("über", 7)}


def test_quoted_newline_in_field(spark, tmp_path):
    data = b'name,notes\nCleo,"likes\nlong walks"\nPancakes,short\n'
    path = write(tmp_path, "quoted.csv", data)
    res = ingest.upload_csv(spark, path)
    assert res.error is None
    rows = {tuple(r) for r in spark.table(res.table).collect()}
    assert rows == {("Cleo", "likes\nlong walks"), ("Pancakes", "short")}


def test_ingest_meets_reference_latency_budget(spark, tmp_path):
    """The reference's own performance bar: its test suite polls until
    a 1049-row latin-1 CSV is fully ingested, failing after ~4s
    (reference tests :165-180). Same fixture shape, same budget,
    measured end-to-end through our public API (warm session, like
    the reference's warm SQLite)."""
    import time

    rows = "\n".join(f"value{i}" for i in range(1048))
    data = ("content\n" + rows + "\nsm\xf6rg\xe5s\n").encode("latin-1")
    path = write(tmp_path, "reference_budget.csv", data)
    t0 = time.perf_counter()
    res = ingest.upload_csv(spark, path)
    elapsed = time.perf_counter() - t0
    assert res.error is None
    assert res.rows == 1049
    assert elapsed < 4.0, f"ingest took {elapsed:.2f}s (reference budget 4s)"


def test_tsv_delimiter_override(spark, tmp_path):
    data = b"name\tage\nCleo\t5\nPancakes\t4\n"
    path = write(tmp_path, "dogs_tsv.csv", data)
    res = ingest.upload_csv(spark, path, table="dogs_tsv", delimiter="\t")
    assert res.error is None
    assert res.types == {"name": "text", "age": "integer"}
    assert spark.table("dogs_tsv").count() == 2


def test_duplicate_header_last_wins(spark, tmp_path):
    """Reference dict(zip(headers, row)) semantics: for duplicate
    column names the LAST occurrence's value survives."""
    data = b"a,b,a\n1,2,3\n4,5,6\n"
    path = write(tmp_path, "dup_header.csv", data)
    res = ingest.upload_csv(spark, path)
    assert res.error is None
    df = spark.table(res.table)
    assert df.columns == ["a", "b"]
    assert {tuple(r) for r in df.collect()} == {(3, 2), (6, 5)}


def test_gzip_csv_transparent_ingest(spark, tmp_path):
    """Spark's CSV scan gunzips .gz by extension; the driver-side
    encoding sniff and header parse must see the same decompressed
    bytes. Fixture is latin-1 INSIDE gzip to prove the sniff runs on
    decoded content, not the compressed stream."""
    import gzip

    p = os.path.join(tmp_path, "zipped.csv.gz")
    with gzip.open(p, "wb") as f:
        f.write(NOT_UTF8)
    res = ingest.upload_csv(spark, p, table="gz_encodings")
    assert res.error is None
    df = spark.table(res.table)
    assert "Notional Cost (£)" in df.columns
    assert res.types["Lat"] == "float"
    assert df.count() == 3


def test_utf8_bom_stripped_from_header(spark, tmp_path):
    """A UTF-8 BOM must not leak into the first column name (the
    reference's codecs decode strips it; pin our parity)."""
    path = write(tmp_path, "bom.csv", b"\xef\xbb\xbfname,age\nCleo,5\n")
    res = ingest.upload_csv(spark, path, table="bom_pets")
    assert res.error is None
    assert spark.table(res.table).columns == ["name", "age"]
    assert res.types == {"name": "text", "age": "integer"}


def test_int64_overflow_demotes_to_float(spark, tmp_path):
    # integer-shaped but beyond int64: must NOT silently null under a
    # bigint cast — demote the column (reference surfaces OverflowError)
    data = b"n,big\n1,99999999999999999999999\n2,5\n"
    path = write(tmp_path, "overflow.csv", data)
    res = ingest.upload_csv(spark, path)
    assert res.error is None
    assert res.types == {"n": "integer", "big": "float"}
    vals = {r["big"] for r in spark.table(res.table).collect()}
    assert None not in vals and 1e23 in vals


def test_whitespace_only_cell_forces_text(spark, tmp_path):
    # TypeTracker evaluates ' ' (int/float both raise) -> column text;
    # the whitespace cell is preserved, not nulled
    path = write(tmp_path, "ws.csv", b'n,v\n1,"5"\n2," "\n')
    res = ingest.upload_csv(spark, path)
    assert res.error is None
    assert res.types["v"] == "text"
    vals = {r["v"] for r in spark.table(res.table).collect()}
    assert vals == {"5", " "}


def test_error_path_leaves_completed_null(spark, tmp_path):
    path = write(tmp_path, "empty.csv", b"")  # no header -> captured error
    res = ingest.upload_csv(spark, path)
    assert res.error is not None
    prog = ingest.get_progress(spark, res.task_id)
    assert prog["error"] is not None
    assert prog["completed"] is None  # error is the sole failure marker


def test_multiline_sniff(tmp_path):
    plain = write(tmp_path, "plain.csv", b"a,b\n1,x\n2,y\n")
    quoted = write(tmp_path, "quoted.csv", b'a,b\n1,"x\ny"\n')
    assert ingest.sniff_multiline(plain, "utf-8") is False
    assert ingest.sniff_multiline(quoted, "utf-8") is True


def test_plain_csv_scan_is_splittable(spark, tmp_path):
    # multiline sniff says False -> the scan must not collapse to the
    # non-splittable multiLine reader (one partition per file forever)
    rows = b"a,b\n" + b"".join(b"%d,x%d\n" % (i, i) for i in range(20000))
    path = write(tmp_path, "big_plain.csv", rows)
    enc = ingest.detect_encoding(path)
    df = ingest.read_csv_all_strings(
        spark, path, enc, multiline=ingest.sniff_multiline(path, enc)
    )
    # maxPartitionBytes tiny -> a splittable scan yields >1 partition
    with_conf = df.sparkSession.conf
    old = with_conf.get("spark.sql.files.maxPartitionBytes")
    with_conf.set("spark.sql.files.maxPartitionBytes", "16384")
    try:
        n = ingest.read_csv_all_strings(
            spark, path, enc, multiline=False
        ).rdd.getNumPartitions()
        assert n > 1
    finally:
        with_conf.set("spark.sql.files.maxPartitionBytes", old)


def test_mid_ingest_progress_ticks(spark, tmp_path):
    """A poller during a long ingest must see 0 < bytes_done <
    bytes_todo at least once (reference __init__.py:186-190 ticks
    every 10 rows); the completion invariant is unchanged."""
    rows = b"a,b\n" + b"".join(b"%d,v%d\n" % (i, i) for i in range(60000))
    path = write(tmp_path, "slow_ingest.csv", rows)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    # many small tasks -> several task waves -> observable mid states
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        res = ingest.upload_csv(spark, path, progress_interval=0.05)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert res.error is None
    hist = (
        spark.table(ingest.PROGRESS_TABLE)
        .filter(F.col("id") == res.task_id)
        .orderBy("seq")
        .collect()
    )
    # init row, >=1 intermediate tick, completion row
    assert len(hist) >= 3
    mids = [r for r in hist if 0 < r["bytes_done"] < r["bytes_todo"]]
    assert mids, "no intermediate progress tick recorded"
    assert all(r["completed"] is None for r in mids)
    done = hist[-1]
    assert done["bytes_done"] == done["bytes_todo"] == res.bytes_todo
    assert done["rows_done"] == 60000 and done["completed"] is not None
    # bytes_done is monotone across the whole history
    bd = [r["bytes_done"] for r in hist]
    assert bd == sorted(bd)


def test_xhr_response_contract(spark, tmp_path):
    """Reference __init__.py:233-241: the upload response carries
    {url, database_path, task_id, bytes_todo}."""
    path = write(tmp_path, "resp.csv", SIMPLE)
    res = ingest.upload_csv(spark, path)
    r = res.response()
    assert set(r) == {"url", "database_path", "task_id", "bytes_todo"}
    assert r["task_id"] == res.task_id
    assert r["bytes_todo"] == res.bytes_todo == len(SIMPLE)
    assert r["url"] == f"/default/{res.table}"
    assert r["database_path"] == "default"


def test_permission_gate(spark, tmp_path):
    """A18 parity: denied actors raise Forbidden BEFORE any work;
    allowed actors proceed; no hook = open (library default)."""
    path = write(tmp_path, "gated.csv", SIMPLE)
    ingest.set_allow_hook(
        lambda actor, action: bool(actor) and actor.get("id") == "root"
    )
    try:
        with pytest.raises(ingest.Forbidden):
            ingest.upload_csv(spark, path, actor=None)
        with pytest.raises(ingest.Forbidden):
            ingest.upload_csv_async(spark, path, actor={"id": "eve"})
        res = ingest.upload_csv(spark, path, table="gated_ok", actor={"id": "root"})
        assert res.error is None and res.rows == 2
    finally:
        ingest.set_allow_hook(None)
    # gate cleared: open again
    assert ingest.upload_csv(spark, path, table="gated_open").error is None


def test_append_csv_forwards_actor_to_upload(spark, tmp_path):
    """append_csv on a NOT-yet-existing table falls through to
    upload_csv; the actor must ride along or a deny-anonymous hook
    wrongly rejects an authorized appender."""
    path = write(tmp_path, "fwd.csv", SIMPLE)
    ingest.set_allow_hook(
        lambda actor, action: bool(actor) and actor.get("id") == "root"
    )
    try:
        res = ingest.append_csv(
            spark, path, table="fwd_actor_tbl", actor={"id": "root"}
        )
        assert res.error is None and res.rows == 2
    finally:
        ingest.set_allow_hook(None)


def test_quoted_newline_past_sniff_window_escalates(spark, tmp_path):
    """The head sniff can't see a quoted embedded newline that first
    appears beyond sniff_bytes; the quote-balance probe must catch it
    and escalate to the multiLine scan instead of silently splitting
    the record mid-field."""
    filler = "".join(f"{i},plainrow{i}\n" for i in range(300))
    content = "id,note\n" + filler + '9999,"line one\nline two"\n'
    assert len(content) > 2048
    path = write(tmp_path, "late_quote.csv", content.encode())
    res = ingest.upload_csv(
        spark, path, table="late_quote_tbl", sniff_bytes=1024
    )
    assert res.error is None
    assert res.rows == 301  # 300 filler + 1 multiline record
    row = (
        spark.table("late_quote_tbl")
        .filter(F.col("id") == 9999)
        .collect()[0]
    )
    assert row["note"] == "line one\nline two"


def test_quote_balance_probe_negative_stays_splittable(spark, tmp_path):
    """A big quote-free CSV must NOT escalate: resolve_multiline
    keeps the splittable scan when the full-file probe finds balanced
    quotes everywhere."""
    content = "id,v\n" + "".join(f"{i},x{i}\n" for i in range(500))
    path = write(tmp_path, "clean_big.csv", content.encode())
    assert (
        ingest.resolve_multiline(spark, path, "utf-8", sniff_bytes=512)
        is False
    )
