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
            with urllib.request.urlopen(req) as resp:
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
            with urllib.request.urlopen(req) as resp:
                resp.read()
        except urllib.error.HTTPError as e:
            if if_absent and e.code == 412:
                raise FileExistsError(path) from None
            raise

    def put_if_absent(self, path: str, data: bytes) -> None:
        self._put(path, data, if_absent=True)

    def write_atomic(self, path: str, data: bytes) -> None:
        self._put(path, data, if_absent=False)
