"""Property-based check for the hand-rolled streaming multipart
parser (web.spool_multipart): for ARBITRARY binary payloads and
ARBITRARY ASGI chunk boundaries, every field must round-trip byte
for byte — file parts via their spool files, non-file parts via
their in-memory values — and no temp file may survive beyond the
returned paths. Boundary-prefix bytes straddling a chunk cut are the
classic failure mode for incremental parsers; random chunking hunts
exactly that."""

from __future__ import annotations

import asyncio
import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from datasette_upload_csvs_spark.web import spool_multipart

BOUNDARY = "hypSEPx7Q9zK4mW2"
_DELIM = b"\r\n--" + BOUNDARY.encode()

_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=12
)
# payloads may contain CR/LF/dashes — everything short of the literal
# delimiter, which a conforming encoder guarantees absent
_payload = st.binary(max_size=512).filter(
    lambda b: _DELIM not in b"\r\n" + b + b"\r\n"
)
_field = st.tuples(_name, st.booleans(), _payload)
_fields = st.lists(_field, min_size=1, max_size=6, unique_by=lambda f: f[0])


def _body(fields) -> bytes:
    out = b""
    for name, is_file, payload in fields:
        cd = f'Content-Disposition: form-data; name="{name}"'
        if is_file:
            cd += f'; filename="{name}.bin"'
        out += (
            f"--{BOUNDARY}\r\n".encode() + cd.encode() + b"\r\n\r\n"
            + payload + b"\r\n"
        )
    return out + f"--{BOUNDARY}--\r\n".encode()


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(fields=_fields, data=st.data())
def test_spool_multipart_roundtrips_any_chunking(fields, data):
    body = _body(fields)
    # draw random cut points → chunks of wildly uneven sizes,
    # including 1-byte slivers inside the delimiter itself
    n_cuts = data.draw(st.integers(min_value=0, max_value=12))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(body)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    pieces, prev = [], 0
    for c in cuts + [len(body)]:
        pieces.append(body[prev:c])
        prev = c

    state = {"i": 0}

    async def receive():
        i = state["i"]
        state["i"] += 1
        return {
            "type": "http.request",
            "body": pieces[i] if i < len(pieces) else b"",
            "more_body": state["i"] < len(pieces),
        }

    upload_dir = tempfile.mkdtemp(prefix="spoolprop_")
    try:
        parsed = asyncio.run(
            spool_multipart(
                f"multipart/form-data; boundary={BOUNDARY}",
                receive,
                upload_dir,
            )
        )
        assert set(parsed) == {name for name, _, _ in fields}
        for name, is_file, payload in fields:
            got = parsed[name]
            assert got["size"] == len(payload)
            if is_file:
                assert got["filename"] == f"{name}.bin"
                with open(got["path"], "rb") as f:
                    assert f.read() == payload
            else:
                assert got["filename"] is None and got["path"] is None
                assert got["value"] == payload
        # every temp file in the dir is accounted for by a returned path
        on_disk = {
            os.path.join(upload_dir, p) for p in os.listdir(upload_dir)
        }
        returned = {g["path"] for g in parsed.values() if g["path"]}
        assert on_disk == returned
    finally:
        shutil.rmtree(upload_dir, ignore_errors=True)
