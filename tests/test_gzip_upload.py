"""Gzip-compressed CSV ingestion: extension-carrying paths already
ride Spark's codec selection; the round-8 addition is magic-byte
detection for EXTENSIONLESS gzip streams (the web spool's temp files)
via a hard-link alias that is removed after the ingest."""

from __future__ import annotations

import gzip
import json
import os

from datasette_upload_csvs_spark import ingest

SIMPLE = b"name,age\nalice,30\nbob,25\n"


def test_extensionless_gzip_spool_ingests(spark, tmp_path):
    p = str(tmp_path / "spool_no_ext")  # the web-spool shape
    with open(p, "wb") as f:
        f.write(gzip.compress(SIMPLE))
    res = ingest.upload_csv(spark, p, table="gz_spool")
    assert res.error is None
    assert res.rows == 2
    got = {(r["name"], r["age"]) for r in spark.table(res.table).collect()}
    assert got == {("alice", 30), ("bob", 25)}
    # the .csv.gz alias is cleaned up; the spool file survives
    assert os.path.exists(p)
    assert not os.path.exists(p + ".csv.gz")
    spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_extensionless_plain_csv_unaffected(spark, tmp_path):
    p = str(tmp_path / "plain_no_ext")
    with open(p, "wb") as f:
        f.write(SIMPLE)
    res = ingest.upload_csv(spark, p, table="gz_plain")
    assert res.error is None and res.rows == 2
    assert not os.path.exists(p + ".csv.gz")
    spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_web_upload_of_csv_gz(spark, tmp_path):
    from tests.test_web import BOUNDARY, call, multipart_body
    from datasette_upload_csvs_spark.web import UploadApp

    app = UploadApp(spark, upload_dir=str(tmp_path))
    body = multipart_body(
        {
            "csv": ("people_gz.csv.gz", gzip.compress(SIMPLE)),
            "xhr": (None, b"1"),
        }
    )
    status, _, payload = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 200
    data = json.loads(payload)
    # table-name fallback strips the double extension
    assert data["url"].endswith("/people_gz")
    res = app.tasks[data["task_id"]].result(timeout=120)
    assert res.error is None and res.rows == 2
    got = {(r["name"], r["age"]) for r in spark.table(res.table).collect()}
    assert got == {("alice", 30), ("bob", 25)}
    spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_web_upload_uppercase_extension_matches_catalog_rule(spark, tmp_path):
    """ADVICE r8: the web fallback used to strip '.csv.gz'
    case-SENSITIVELY while catalog.derive_table_name lowercases, so
    'X.CSV.GZ' derived different tables depending on the entry path.
    The handler now delegates to derive_table_name."""
    from tests.test_web import BOUNDARY, call, multipart_body
    from datasette_upload_csvs_spark.web import UploadApp
    from datasette_upload_csvs_spark import catalog as cat

    assert cat.derive_table_name("PEOPLE_UP.CSV.GZ") == "PEOPLE_UP"
    app = UploadApp(spark, upload_dir=str(tmp_path))
    body = multipart_body(
        {
            "csv": ("PEOPLE_UP.CSV.GZ", gzip.compress(SIMPLE)),
            "xhr": (None, b"1"),
        }
    )
    status, _, payload = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 200
    data = json.loads(payload)
    # suffix stripped case-insensitively (stem case preserved, as
    # derive_table_name does) — NOT 'PEOPLE_UP.CSV.GZ'
    assert data["url"].endswith("/PEOPLE_UP")
    res = app.tasks[data["task_id"]].result(timeout=120)
    assert res.error is None and res.rows == 2
    spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_alias_failure_lands_in_result_error(spark, tmp_path, monkeypatch):
    """ADVICE r8: a hard-link AND copy failure while aliasing an
    extensionless gzip spool (ENOSPC, read-only dir) must degrade to
    a captured error result — not escape upload_csv — and must not
    leak a partial alias file."""
    import shutil

    p = str(tmp_path / "spool_alias_fail")
    with open(p, "wb") as f:
        f.write(gzip.compress(SIMPLE))

    def boom(*a, **k):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(os, "link", boom)
    monkeypatch.setattr(shutil, "copyfile", boom)
    res = ingest.upload_csv(spark, p, table="gz_alias_fail")
    assert res.error is not None and "space" in res.error
    assert res.rows == 0
    assert not os.path.exists(p + ".csv.gz")  # no partial alias leak
