"""GcsLogStore: the gs:// conditional-put commit seam, driven against
an in-process fake GCS JSON-API server (no network). The fake enforces
``ifGenerationMatch=0`` with a lock — the exact server-side atomicity
real GCS provides — so these tests prove the PROTOCOL (one winner, the
rest get 412 → FileExistsError) end to end through real HTTP.
"""

from __future__ import annotations

import threading
import urllib.parse
from concurrent.futures import ThreadPoolExecutor
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from gcs2postgres_spark.sources.logstore import (
    GcsLogStore,
    log_store_for,
    register_log_store,
)


class _FakeGcs(BaseHTTPRequestHandler):
    objects: dict[str, bytes] = {}
    lock = threading.Lock()
    seen_auth: list[str] = []

    def log_message(self, *a):  # quiet
        pass

    batch_requests = 0

    def do_POST(self):
        parsed = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(parsed.query)
        if parsed.path == "/batch/storage/v1":
            # GCS JSON batch endpoint: multipart/mixed DELETE subrequests
            body = self.rfile.read(
                int(self.headers.get("Content-Length", 0))
            ).decode()
            type(self).batch_requests += 1
            statuses = []
            for line in body.splitlines():
                if not line.startswith("DELETE "):
                    continue
                target = line.split(" ", 2)[1]
                # /storage/v1/b/<bucket>/o/<quoted-object>
                segs = target.split("/")
                bkt = segs[segs.index("b") + 1]
                obj = urllib.parse.unquote(segs[segs.index("o") + 1])
                key = f"{bkt}/{obj}"
                with self.lock:
                    if key in self.objects:
                        del self.objects[key]
                        statuses.append(204)
                    else:
                        statuses.append(404)
            boundary = "batch_resp"
            out = "".join(
                f"--{boundary}\r\nContent-Type: application/http\r\n\r\n"
                f"HTTP/1.1 {s} {'No Content' if s == 204 else 'Not Found'}"
                "\r\n\r\n\r\n"
                for s in statuses
            ) + f"--{boundary}--\r\n"
            data = out.encode()
            self.send_response(200)
            self.send_header(
                "Content-Type", f"multipart/mixed; boundary={boundary}"
            )
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        # upload/storage/v1/b/<bucket>/o
        parts = parsed.path.strip("/").split("/")
        bucket = parts[parts.index("b") + 1]
        name = qs["name"][0]
        key = f"{bucket}/{name}"
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        self.seen_auth.append(self.headers.get("Authorization", ""))
        with self.lock:
            if "ifGenerationMatch" in qs and qs["ifGenerationMatch"][0] == "0":
                if key in self.objects:
                    self.send_response(412)
                    self.end_headers()
                    return
            self.objects[key] = body
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(b"{}")


@pytest.fixture()
def fake_gcs():
    _FakeGcs.objects = {}
    _FakeGcs.seen_auth = []
    _FakeGcs.batch_requests = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeGcs)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _FakeGcs
    srv.shutdown()


def test_put_if_absent_protocol(fake_gcs):
    endpoint, state = fake_gcs
    store = GcsLogStore(endpoint, token_provider=lambda: "tok-123")
    store.put_if_absent("gs://bkt/_delta_log/00000000000000000000.json", b"v0")
    assert state.objects["bkt/_delta_log/00000000000000000000.json"] == b"v0"
    with pytest.raises(FileExistsError):
        store.put_if_absent("gs://bkt/_delta_log/00000000000000000000.json", b"v0b")
    # loser never clobbered the winner
    assert state.objects["bkt/_delta_log/00000000000000000000.json"] == b"v0"
    assert any(a == "Bearer tok-123" for a in state.seen_auth)


def test_concurrent_race_single_winner(fake_gcs):
    endpoint, state = fake_gcs
    store = GcsLogStore(endpoint, token_provider=lambda: "t")

    def attempt(i):
        try:
            store.put_if_absent("gs://bkt/metadata/v2.metadata.json",
                                f"writer-{i}".encode())
            return i
        except FileExistsError:
            return None

    with ThreadPoolExecutor(8) as ex:
        winners = [w for w in ex.map(attempt, range(8)) if w is not None]
    assert len(winners) == 1
    assert state.objects["bkt/metadata/v2.metadata.json"] == (
        f"writer-{winners[0]}".encode()
    )


def test_write_atomic_overwrites(fake_gcs):
    endpoint, state = fake_gcs
    store = GcsLogStore(endpoint, token_provider=lambda: "t")
    store.write_atomic("gs://bkt/metadata/version-hint.text", b"1")
    store.write_atomic("gs://bkt/metadata/version-hint.text", b"2")
    assert state.objects["bkt/metadata/version-hint.text"] == b"2"


def test_scheme_registration_routes(fake_gcs):
    endpoint, _ = fake_gcs
    from gcs2postgres_spark.sources import logstore as _ls

    store = GcsLogStore(endpoint, token_provider=lambda: "")
    register_log_store("gs", store)
    try:
        assert log_store_for("gs://bkt/x") is store
    finally:
        _ls._BY_SCHEME.pop("gs", None)
    with pytest.raises(ValueError, match="bucket and object"):
        store.put_if_absent("gs://only-bucket", b"")


def test_batch_delete_gcs(fake_gcs):
    endpoint, state = fake_gcs
    store = GcsLogStore(endpoint, token_provider=lambda: "t")
    keys = [f"gs://bkt/data/part-{i:05d}.parquet" for i in range(150)]
    for k in keys:
        store.write_atomic(k, b"x")
    assert len(state.objects) == 150
    removed = store.delete_batch(keys + ["gs://bkt/data/never-existed"])
    assert removed == 150
    assert state.objects == {}
    # 151 objects -> ceil(151/100) = 2 HTTP round trips, not 151
    assert state.batch_requests == 2


class _FakeS3(BaseHTTPRequestHandler):
    objects: dict[str, bytes] = {}
    lock = threading.Lock()
    batch_requests = 0

    def log_message(self, *a):
        pass

    def do_POST(self):
        parsed = urllib.parse.urlparse(self.path)
        if "delete" not in urllib.parse.parse_qs(parsed.query) and (
            parsed.query != "delete"
        ):
            self.send_response(400)
            self.end_headers()
            return
        assert self.headers.get("Content-MD5"), "DeleteObjects requires MD5"
        bucket = parsed.path.strip("/")
        body = self.rfile.read(
            int(self.headers.get("Content-Length", 0))
        ).decode()
        type(self).batch_requests += 1
        import re as _re

        deleted = []
        with self.lock:
            for key in _re.findall(r"<Key>([^<]+)</Key>", body):
                full = f"{bucket}/{key}"
                if full in self.objects:
                    del self.objects[full]
                    deleted.append(key)
        out = (
            "<DeleteResult>"
            + "".join(f"<Deleted><Key>{k}</Key></Deleted>" for k in deleted)
            + "</DeleteResult>"
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def do_PUT(self):
        key = urllib.parse.urlparse(self.path).path.strip("/")
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        with self.lock:
            if self.headers.get("If-None-Match") == "*" and key in self.objects:
                self.send_response(412)
                self.end_headers()
                return
            self.objects[key] = body
        self.send_response(200)
        self.end_headers()


def test_s3_compat_conditional_put():
    from gcs2postgres_spark.sources.logstore import S3CompatLogStore

    _FakeS3.objects = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeS3)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        store = S3CompatLogStore(f"http://127.0.0.1:{srv.server_address[1]}")
        store.put_if_absent("s3://bkt/_delta_log/00000000000000000001.json", b"a")
        with pytest.raises(FileExistsError):
            store.put_if_absent(
                "s3://bkt/_delta_log/00000000000000000001.json", b"b"
            )
        assert _FakeS3.objects["bkt/_delta_log/00000000000000000001.json"] == b"a"

        def attempt(i):
            try:
                store.put_if_absent("s3://bkt/m/v9.metadata.json", str(i).encode())
                return i
            except FileExistsError:
                return None

        with ThreadPoolExecutor(8) as ex:
            winners = [w for w in ex.map(attempt, range(8)) if w is not None]
        assert len(winners) == 1
        store.write_atomic("s3://bkt/m/version-hint.text", b"9")
        assert _FakeS3.objects["bkt/m/version-hint.text"] == b"9"
    finally:
        srv.shutdown()


def test_batch_delete_s3():
    from gcs2postgres_spark.sources.logstore import S3CompatLogStore

    _FakeS3.objects = {}
    _FakeS3.batch_requests = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeS3)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        store = S3CompatLogStore(f"http://127.0.0.1:{srv.server_address[1]}")
        keys = [f"s3://bkt/data/part-{i:05d}.parquet" for i in range(25)]
        for k in keys:
            store.write_atomic(k, b"x")
        removed = store.delete_batch(keys + ["s3://bkt/data/ghost"])
        assert removed == 25
        assert _FakeS3.objects == {}
        assert _FakeS3.batch_requests == 1  # one DeleteObjects round trip
    finally:
        srv.shutdown()
