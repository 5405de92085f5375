"""Pluggable PUT-IF-ABSENT commit seam for the jar-less lakehouse
committers (the LogStore abstraction delta-spark and Iceberg's
HadoopTableOperations both need on object stores).

Every jar-less committer's atomicity reduces to ONE primitive: write
``N.json`` (Delta) / ``vN.metadata.json`` (Iceberg) only if nothing
exists at that path, so two writers racing the same version number lose
at the STORE, never silently. On a local filesystem that primitive is
``open(O_CREAT|O_EXCL)`` / ``os.link``; on GCS it is a conditional put
(``x-goog-if-generation-match: 0``), on S3 ``If-None-Match: *``. This
module routes the committers through a per-scheme registry so an
object-store implementation can be plugged in without touching them —
the same seam ``spark.delta.logStore.gs.impl`` fills for the jar-ful
stack. The reference's whole identity is ``gs://`` objects (reference
src/db/db.go:22-30), so this is the committers' remote story.

Scope (r14): the seam covers the COMMIT POINT; everything else a write
needs is generalized through Spark (data-file staging writes to final
unique ``data-<uuid>/`` names — no rename) and fsio/Hadoop (manifests,
checkpoints, DV blobs, vacuum deletes), so registering a store for a
scheme enables END-TO-END remote writes — pinned by
tests/test_remote_write.py's posix-tripwire suite. ``check_write_scheme``
is the committers' single early gate: posix and ``file:`` always pass;
a remote scheme passes iff a LogStore is registered.

``FakeObjectStore`` emulates the object-store contract for tests: no
rename, no O_EXCL — only an atomic conditional create (a mutex around
exists+write, which is exactly the server-side atomicity GCS/S3 give) —
so the committer race tests prove the protocol holds when the ONLY
atomicity available is conditional put.
"""

from __future__ import annotations

import os
import threading

# every urllib call in this module is bounded: one stuck request must
# not hang a maintenance job (a 100-object batch delete that never
# answers would otherwise block the driver forever)
_HTTP_TIMEOUT_S = 60


class LogStore:
    """Commit-point primitives. Implementations must make
    ``put_if_absent`` ATOMIC: exactly one of N concurrent calls for the
    same path succeeds; the rest raise FileExistsError."""

    def put_if_absent(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def write_atomic(self, path: str, data: bytes) -> None:
        """Overwrite-allowed atomic write (version-hint style pointers
        that are best-effort optimizations, never the commit point)."""
        raise NotImplementedError

    # Implementations MAY define
    #     delete_batch(paths: list[str]) -> int
    # deleting many objects in one request (GCS batch API, S3
    # DeleteObjects) and returning how many existed. Maintenance ops
    # (VACUUM / expire_snapshots) route garbage-file deletion through it
    # via fsio.bulk_delete — one RPC per ~100-1000 objects instead of
    # one per file, the difference between minutes and hours at 10^5
    # garbage files. Absence of the attribute = per-file fallback.
    #
    # Implementations MAY also define
    #     read_range(path: str, offset: int, length: int) -> bytes
    # a bounded partial read (HTTP Range GET on object stores).
    # fsio.read_range prefers it over the Hadoop stream fallback — the
    # plan-time probe seam for ORC postscripts / Avro headers.


class LocalLogStore(LogStore):
    """Posix: O_CREAT|O_EXCL is the conditional put; temp+rename is the
    atomic overwrite. This is the default and preserves the exact
    behavior the committers had before the seam existed. ``file:``-
    scheme URIs are served here too (same filesystem, same atomicity) —
    they are stripped to their local form first."""

    @staticmethod
    def _local(path: str) -> str:
        from gcs2postgres_spark.sources import fsio

        return fsio.strip_scheme(path)

    def put_if_absent(self, path: str, data: bytes) -> None:
        path = self._local(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
        except BaseException:
            os.unlink(path)
            raise

    def write_atomic(self, path: str, data: bytes) -> None:
        path = self._local(path)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def delete_batch(self, paths: list[str]) -> int:
        # posix unlink loop: ~microseconds per file, and it spares
        # file:-scheme maintenance the per-file JVM hop
        removed = 0
        for p in paths:
            try:
                os.remove(self._local(p))
                removed += 1
            except FileNotFoundError:
                pass
        return removed

    def read_range(self, path: str, offset: int, length: int) -> bytes:
        # posix seek+read; spares file:-scheme probes the JVM hop
        with open(self._local(path), "rb") as f:
            f.seek(offset)
            return f.read(length)


class FakeObjectStore(LogStore):
    """Object-store semantics over a local directory, for tests: the
    only atomic primitive is CONDITIONAL CREATE (mutex around
    exists+write — the server-side atomicity a GCS
    ``if-generation-match: 0`` put provides); no rename, no O_EXCL.
    ``puts``/``overwrites`` count traffic so tests can assert the
    committers actually routed through the seam."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.puts = 0
        self.overwrites = 0
        self.batch_calls = 0
        self.range_reads = 0
        self.bytes_ranged = 0

    def put_if_absent(self, path: str, data: bytes) -> None:
        from gcs2postgres_spark.sources import fsio

        path = fsio.strip_scheme(path)
        with self._lock:
            if os.path.exists(path):
                raise FileExistsError(path)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # plain write INSIDE the mutex — the emulated conditional put
            with open(path, "wb") as f:
                f.write(data)
            self.puts += 1

    def write_atomic(self, path: str, data: bytes) -> None:
        from gcs2postgres_spark.sources import fsio

        path = fsio.strip_scheme(path)
        with self._lock:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(data)
            self.overwrites += 1

    def delete_batch(self, paths: list[str]) -> int:
        """One 'RPC' per call, like the real batch endpoints —
        ``batch_calls`` lets tests assert maintenance ops batch their
        deletes instead of issuing one call per garbage file."""
        from gcs2postgres_spark.sources import fsio

        removed = 0
        with self._lock:
            self.batch_calls += 1
            for p in paths:
                try:
                    os.remove(fsio.strip_scheme(p))
                    removed += 1
                except FileNotFoundError:
                    pass
        return removed

    def read_range(self, path: str, offset: int, length: int) -> bytes:
        """Bounded partial read, instrumented: ``range_reads`` /
        ``bytes_ranged`` let tests pin that plan-time probes fetch
        header/footer-scale byte counts, never whole objects."""
        from gcs2postgres_spark.sources import fsio

        with open(fsio.strip_scheme(path), "rb") as f:
            f.seek(offset)
            data = f.read(length)
        with self._lock:
            self.range_reads += 1
            self.bytes_ranged += len(data)
        return data


_LOCAL = LocalLogStore()
_BY_SCHEME: dict[str, LogStore] = {}
_OVERRIDE: LogStore | None = None


def register_log_store(scheme: str, store: LogStore) -> None:
    """Make ``store`` the commit seam for paths with ``scheme://``
    (e.g. a real conditional-put implementation for ``gs``)."""
    _BY_SCHEME[scheme.lower()] = store


def set_log_store_override(store: LogStore | None) -> None:
    """Test seam: force EVERY commit through ``store`` regardless of
    scheme (None restores scheme routing). Lets the race tests prove
    the committers use the seam rather than private os calls."""
    global _OVERRIDE
    _OVERRIDE = store


def log_store_for(path: str) -> LogStore:
    """The LogStore owning ``path``: the override if set, a registered
    per-scheme store, or the posix default for plain paths. An
    unregistered remote scheme raises — committing through rename/EXCL
    semantics an object store does not have would be SILENT commit
    corruption, the one failure a lakehouse must never risk."""
    if _OVERRIDE is not None:
        return _OVERRIDE
    from gcs2postgres_spark.sources import fsio

    if not fsio.has_scheme(path):
        return _LOCAL
    scheme = path.split(":", 1)[0].lower()
    if scheme == "file":
        return _LOCAL
    store = _BY_SCHEME.get(scheme)
    if store is None:
        raise NotImplementedError(
            f"no LogStore registered for scheme {scheme!r}: object-store "
            "commits need conditional-put atomicity (register one with "
            "gcs2postgres_spark.sources.logstore.register_log_store)"
        )
    return store


def check_write_scheme(table_path: str) -> None:
    """The committers' single EARLY write gate: raise before any
    staging work when ``table_path``'s scheme has no commit seam —
    posix and ``file:`` always pass; a remote scheme passes iff a
    LogStore is registered (or the test override is set). Failing here,
    not at the commit point, means a refused write stages nothing."""
    log_store_for(table_path)


class GcsLogStore(LogStore):
    """Conditional-put commit seam for ``gs://`` paths over the public
    GCS JSON API (stdlib urllib, no SDK): uploads carry
    ``ifGenerationMatch=0``, which the service enforces ATOMICALLY — of
    N concurrent creates for one object exactly one wins, the rest get
    412 Precondition Failed (surfaced as FileExistsError, the
    committers' loss signal). This is the same primitive
    ``spark.delta.logStore.gs.impl`` relies on, and the reference's
    own ``gs://`` object identity (reference src/db/db.go:22-30).

    ``endpoint`` is overridable for emulators/tests (the fake-GCS
    pytest drives the full 412 protocol without network);
    ``token_provider`` returns a bearer token per request (default: the
    ``GOOGLE_OAUTH_ACCESS_TOKEN`` env var, else anonymous — emulators
    accept it, production requires a real token). Only the COMMIT POINT
    goes through this store; data staging and the other non-commit
    writes go through Spark / the Hadoop GCS connector (module scope
    note above)."""

    def __init__(self, endpoint: str = "https://storage.googleapis.com",
                 token_provider=None) -> None:
        self.endpoint = endpoint.rstrip("/")
        self._token_provider = token_provider or (
            lambda: os.environ.get("GOOGLE_OAUTH_ACCESS_TOKEN", "")
        )

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        if not path.startswith("gs://"):
            raise ValueError(f"not a gs:// path: {path!r}")
        bucket, _, name = path[len("gs://"):].partition("/")
        if not bucket or not name:
            raise ValueError(f"gs path needs bucket and object: {path!r}")
        return bucket, name

    def _upload(self, path: str, data: bytes, if_absent: bool) -> None:
        import urllib.error
        import urllib.parse
        import urllib.request

        bucket, name = self._split(path)
        url = (
            f"{self.endpoint}/upload/storage/v1/b/{urllib.parse.quote(bucket)}/o"
            f"?uploadType=media&name={urllib.parse.quote(name, safe='')}"
            + ("&ifGenerationMatch=0" if if_absent else "")
        )
        req = urllib.request.Request(
            url, data=data, method="POST",
            headers={"Content-Type": "application/octet-stream"},
        )
        token = self._token_provider()
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        try:
            with urllib.request.urlopen(req, timeout=_HTTP_TIMEOUT_S) as resp:
                resp.read()
        except urllib.error.HTTPError as e:
            if if_absent and e.code == 412:
                # generation precondition lost: the object exists — the
                # committers' rebase/conflict protocols take over
                raise FileExistsError(path) from None
            raise

    def put_if_absent(self, path: str, data: bytes) -> None:
        self._upload(path, data, if_absent=True)

    def write_atomic(self, path: str, data: bytes) -> None:
        # GCS object writes are atomic server-side (no partial objects)
        self._upload(path, data, if_absent=False)

    def read_range(self, path: str, offset: int, length: int) -> bytes:
        """Bounded partial read via an ``alt=media`` GET with a Range
        header — one round trip for a header/footer probe. 416 (range
        past EOF) reads as empty, matching posix seek-past-end."""
        import urllib.error
        import urllib.parse
        import urllib.request

        bucket, name = self._split(path)
        url = (
            f"{self.endpoint}/storage/v1/b/{urllib.parse.quote(bucket)}/o/"
            f"{urllib.parse.quote(name, safe='')}?alt=media"
        )
        req = urllib.request.Request(
            url, headers={"Range": f"bytes={offset}-{offset + length - 1}"}
        )
        token = self._token_provider()
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        try:
            with urllib.request.urlopen(req, timeout=_HTTP_TIMEOUT_S) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 416:
                return b""
            raise

    def delete_batch(self, paths: list[str]) -> int:
        """Bulk delete via the GCS JSON batch endpoint
        (``POST /batch/storage/v1`` with up to 100 ``DELETE`` subrequests
        in one ``multipart/mixed`` body — the documented public batching
        surface). Already-gone objects (404 parts) count as deleted:
        maintenance deletes are idempotent. Returns how many of
        ``paths`` existed. One HTTP round trip per 100 objects — the
        scale fix for VACUUM/expire on 10^5 garbage files."""
        import urllib.parse
        import urllib.request

        removed = 0
        for i in range(0, len(paths), 100):
            chunk = paths[i:i + 100]
            boundary = "batch_gcs2postgres"
            parts = []
            for n, p in enumerate(chunk):
                bucket, name = self._split(p)
                target = (
                    f"/storage/v1/b/{urllib.parse.quote(bucket)}/o/"
                    f"{urllib.parse.quote(name, safe='')}"
                )
                parts.append(
                    f"--{boundary}\r\n"
                    "Content-Type: application/http\r\n"
                    f"Content-ID: <item{n}>\r\n\r\n"
                    f"DELETE {target} HTTP/1.1\r\n\r\n"
                )
            body = ("".join(parts) + f"--{boundary}--\r\n").encode()
            req = urllib.request.Request(
                f"{self.endpoint}/batch/storage/v1", data=body, method="POST",
                headers={"Content-Type":
                         f"multipart/mixed; boundary={boundary}"},
            )
            token = self._token_provider()
            if token:
                req.add_header("Authorization", f"Bearer {token}")
            with urllib.request.urlopen(req, timeout=_HTTP_TIMEOUT_S) as resp:
                text = resp.read().decode("utf-8", "replace")
            # each part answers with its own HTTP status line; 204 =
            # deleted, 404 = already gone (both terminal-success for
            # idempotent maintenance deletes). ANY other part status
            # (403/412/5xx) is a per-object FAILURE that must surface:
            # swallowing it would report a successful VACUUM while the
            # garbage (and its storage bill) remains.
            import re as _re

            codes = _re.findall(r"HTTP/[0-9.]+ (\d{3})", text)
            bad = [c for c in codes if c not in ("204", "404")]
            if bad:
                raise OSError(
                    f"GCS batch delete: {len(bad)}/{len(codes)} subrequests "
                    f"failed with statuses {sorted(set(bad))}"
                )
            removed += codes.count("204")
        return removed


class S3CompatLogStore(LogStore):
    """Conditional-put commit seam for ``s3://`` paths against
    S3-COMPATIBLE stores: a PUT carrying ``If-None-Match: *`` (the
    conditional-write primitive S3 added in 2024, long supported by
    MinIO and friends) — 412 Precondition Failed surfaces as
    FileExistsError, exactly one of N racing creates wins server-side.

    ``endpoint`` is the path-style base URL (``http://minio:9000``);
    ``headers_provider(method, url)`` returns auth headers per request —
    the seam where SigV4 signing (or a MinIO service token, or nothing
    for anonymous emulator buckets) plugs in. Stdlib-only; full AWS
    SigV4 signing is deliberately left to the provider (a ~50-line hmac
    chain callers with real AWS credentials can supply)."""

    def __init__(self, endpoint: str, headers_provider=None) -> None:
        self.endpoint = endpoint.rstrip("/")
        self._headers_provider = headers_provider or (lambda method, url: {})

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        if not path.startswith("s3://"):
            raise ValueError(f"not an s3:// path: {path!r}")
        bucket, _, name = path[len("s3://"):].partition("/")
        if not bucket or not name:
            raise ValueError(f"s3 path needs bucket and object: {path!r}")
        return bucket, name

    def _put(self, path: str, data: bytes, if_absent: bool) -> None:
        import urllib.error
        import urllib.parse
        import urllib.request

        bucket, name = self._split(path)
        url = (
            f"{self.endpoint}/{urllib.parse.quote(bucket)}/"
            f"{urllib.parse.quote(name)}"
        )
        headers = {"Content-Type": "application/octet-stream"}
        if if_absent:
            headers["If-None-Match"] = "*"
        headers.update(self._headers_provider("PUT", url))
        req = urllib.request.Request(url, data=data, method="PUT", headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=_HTTP_TIMEOUT_S) as resp:
                resp.read()
        except urllib.error.HTTPError as e:
            if if_absent and e.code == 412:
                raise FileExistsError(path) from None
            raise

    def put_if_absent(self, path: str, data: bytes) -> None:
        self._put(path, data, if_absent=True)

    def write_atomic(self, path: str, data: bytes) -> None:
        self._put(path, data, if_absent=False)

    def delete_batch(self, paths: list[str]) -> int:
        """Bulk delete via S3 DeleteObjects (``POST /{bucket}?delete``,
        up to 1000 keys per request, Content-MD5 required by the API).
        Keys are grouped per bucket; missing keys succeed (Quiet mode
        semantics — maintenance deletes are idempotent). Returns the
        count of <Deleted> results. One round trip per 1000 objects."""
        import base64
        import hashlib
        import re as _re
        import urllib.parse
        import urllib.request
        from xml.sax.saxutils import escape

        by_bucket: dict[str, list[str]] = {}
        for p in paths:
            bucket, name = self._split(p)
            by_bucket.setdefault(bucket, []).append(name)
        removed = 0
        for bucket, names in by_bucket.items():
            for i in range(0, len(names), 1000):
                chunk = names[i:i + 1000]
                xml = (
                    "<Delete>"
                    + "".join(
                        f"<Object><Key>{escape(k)}</Key></Object>"
                        for k in chunk
                    )
                    + "</Delete>"
                ).encode()
                url = f"{self.endpoint}/{urllib.parse.quote(bucket)}?delete"
                headers = {
                    "Content-Type": "application/xml",
                    "Content-MD5": base64.b64encode(
                        hashlib.md5(xml).digest()
                    ).decode(),
                }
                headers.update(self._headers_provider("POST", url))
                req = urllib.request.Request(
                    url, data=xml, method="POST", headers=headers
                )
                with urllib.request.urlopen(req, timeout=_HTTP_TIMEOUT_S) as resp:
                    text = resp.read().decode("utf-8", "replace")
                # DeleteObjects answers 200 even when individual keys
                # fail — each failure is an <Error> entry. NoSuchKey is
                # terminal-success (idempotent maintenance); anything
                # else (AccessDenied, InternalError, ...) must surface,
                # not silently leave garbage behind a "successful" run.
                errs = [
                    e
                    for e in _re.findall(r"<Error>.*?</Error>", text, _re.S)
                    if "<Code>NoSuchKey</Code>" not in e
                ]
                if errs:
                    raise OSError(
                        f"S3 DeleteObjects: {len(errs)} keys failed; "
                        f"first: {errs[0][:300]}"
                    )
                removed += len(_re.findall(r"<Deleted>", text))
        return removed

    def read_range(self, path: str, offset: int, length: int) -> bytes:
        """Bounded partial read via a Range GET — one round trip for a
        header/footer probe. 416 (range past EOF) reads as empty."""
        import urllib.error
        import urllib.parse
        import urllib.request

        bucket, name = self._split(path)
        url = (
            f"{self.endpoint}/{urllib.parse.quote(bucket)}/"
            f"{urllib.parse.quote(name)}"
        )
        headers = {"Range": f"bytes={offset}-{offset + length - 1}"}
        headers.update(self._headers_provider("GET", url))
        req = urllib.request.Request(url, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=_HTTP_TIMEOUT_S) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code == 416:
                return b""
            raise
