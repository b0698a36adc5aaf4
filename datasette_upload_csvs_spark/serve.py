"""Serve the upload UI (web.UploadApp) over real HTTP — stdlib only.

The ASGI app in web.py is normally exercised by calling the ASGI
callable directly (tests/test_web.py). This module adds a minimal
asyncio HTTP/1.1 bridge so a REAL browser can drive the reference's
upload surface end-to-end (form render, drag-and-drop, fetch-submit
with xhr=1, the 1 Hz progress poll, navigation to the table URL):

    python -m datasette_upload_csvs_spark.serve --port 8765

The bridge is deliberately small: request line + headers,
Content-Length-delimited bodies streamed to the ASGI receive channel
in 64 KiB chunks (exercising web.spool_multipart's incremental
parser), Connection: close responses. It is a test/demo harness, not
a production server (reference: datasette-upload-csvs runs under
Datasette's ASGI stack; deployments of this repo would use any ASGI
server the same way).

On ingest completion the browser navigates to /{db}/{table}; the
bridge serves a tiny JSON table summary at that URL (row count +
schema from the Spark catalog) so "lands on the table URL" is
observable rather than a 404.
"""

from __future__ import annotations

import argparse
import asyncio
import json
from urllib.parse import unquote


async def _handle(app, reader, writer):
    try:
        req = await reader.readline()
        if not req:
            writer.close()
            return
        method, target, _ = req.decode("latin-1").split(" ", 2)
        headers = []
        while True:
            line = await reader.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            k, _, v = line.decode("latin-1").partition(":")
            headers.append((k.strip().lower().encode(), v.strip().encode()))
        hmap = dict(headers)
        length = int(hmap.get(b"content-length", b"0"))
        path, _, query = target.partition("?")

        scope = {
            "type": "http",
            "method": method,
            "path": unquote(path),
            "query_string": query.encode(),
            "headers": headers,
        }

        remaining = length

        async def receive():
            nonlocal remaining
            if remaining <= 0:
                return {"type": "http.request", "body": b"", "more_body": False}
            chunk = await reader.read(min(remaining, 64 * 1024))
            if not chunk:
                # Client closed before sending Content-Length bytes:
                # signal end-of-stream instead of yielding empty
                # more_body=True chunks forever (which would pin the
                # app's multipart loop on a dead socket).
                remaining = 0
                return {
                    "type": "http.request",
                    "body": b"",
                    "more_body": False,
                }
            remaining -= len(chunk)
            return {
                "type": "http.request",
                "body": chunk,
                "more_body": remaining > 0,
            }

        state = {"started": False}

        async def send(msg):
            if msg["type"] == "http.response.start":
                writer.write(
                    f"HTTP/1.1 {msg['status']} X\r\n".encode()
                    + b"".join(
                        k + b": " + v + b"\r\n" for k, v in msg["headers"]
                    )
                    + b"connection: close\r\n\r\n"
                )
                state["started"] = True
            elif msg["type"] == "http.response.body":
                writer.write(msg.get("body", b""))
            await writer.drain()

        await app(scope, receive, send)
    except (ConnectionError, asyncio.IncompleteReadError):
        pass
    finally:
        try:
            writer.close()
            await writer.wait_closed()
        except Exception:
            pass


class AppWithTableView:
    """Wrap UploadApp: serve a JSON table summary at /{db}/{table}
    (the URL the poll script navigates to on completion) so the
    browser-level check can observe a real landing page."""

    def __init__(self, upload_app, spark):
        self.upload_app = upload_app
        self.spark = spark

    async def __call__(self, scope, receive, send):
        path = scope["path"]
        parts = [p for p in path.split("/") if p]
        known = path.startswith("/-/") or path.endswith(
            "/_csv_progress_.json"
        )
        if scope["method"] == "GET" and len(parts) == 2 and not known:
            table = unquote(parts[1])
            loop = asyncio.get_running_loop()

            def describe():
                df = self.spark.table(table)
                return {
                    "table": table,
                    "rows": df.count(),
                    "columns": df.columns,
                }

            try:
                body = await loop.run_in_executor(None, describe)
                status = 200
            except Exception as ex:
                body, status = {"error": str(ex)}, 404
            payload = json.dumps(body).encode()
            await send(
                {
                    "type": "http.response.start",
                    "status": status,
                    "headers": [(b"content-type", b"application/json")],
                }
            )
            await send({"type": "http.response.body", "body": payload})
            return
        await self.upload_app(scope, receive, send)


async def serve(app, host: str = "127.0.0.1", port: int = 8765):
    server = await asyncio.start_server(
        lambda r, w: _handle(app, r, w), host, port
    )
    async with server:
        await server.serve_forever()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--warehouse", default=None)
    ap.add_argument(
        "--open-sql",
        action="store_true",
        help="enable GET /{db}.json?sql= without a permission hook "
        "(the endpoint executes caller-supplied SQL, so hookless "
        "deployments must opt in explicitly)",
    )
    args = ap.parse_args()

    from datasette_upload_csvs_spark.session import get_spark
    from datasette_upload_csvs_spark.web import UploadApp

    spark = get_spark(app_name="upload-ui", warehouse_dir=args.warehouse)
    spark.sparkContext.setLogLevel("ERROR")
    app = AppWithTableView(UploadApp(spark, open_sql=args.open_sql), spark)
    print(f"serving upload UI on http://{args.host}:{args.port}/-/upload-csvs")
    asyncio.run(serve(app, args.host, args.port))


if __name__ == "__main__":
    main()
