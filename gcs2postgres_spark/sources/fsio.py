"""Driver-side file-metadata IO seam for the jar-less table-format
readers: plain paths use posix (fast, no JVM hop); paths with a
filesystem scheme (``gs://``, ``s3a://``, ``hdfs://``, ``file:``) route
through the Hadoop FileSystem API of the active SparkSession — the same
client every Spark scan planner uses, so any object store the cluster
can scan, the log/metadata walkers can list and read.

This closes the one parity dimension where the rebuild was local-FS-only
(the reference is GCS-native: it registers ``gs://`` objects directly,
reference src/db/db.go:22-30). The Hadoop branch is exercised in tests
with ``file:`` URIs — the same API surface an object store sees, minus
network.

Scope: the READ path (list/exists/read) — exactly what log replay and
snapshot walking need. Table WRITES stay posix: a portable writer needs
object-store-specific atomic-commit semantics (no rename on GCS/S3),
which is connector territory, and is documented as such in delta_py.
"""

from __future__ import annotations

import os
import re

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def has_scheme(path: str) -> bool:
    """True for URI-style paths (``gs://b/p``, ``file:/p``) that must go
    through the Hadoop FileSystem API; False for plain posix paths.
    Windows drive letters are not a concern in this deployment."""
    return bool(_SCHEME_RE.match(path))


def _fs(path: str):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"no active SparkSession to resolve filesystem for {path!r}"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jpath, jvm


def exists(path: str) -> bool:
    if not has_scheme(path):
        return os.path.exists(path)
    fs, p, _jvm = _fs(path)
    return bool(fs.exists(p))


def isdir(path: str) -> bool:
    if not has_scheme(path):
        return os.path.isdir(path)
    fs, p, _jvm = _fs(path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def listdir(path: str) -> list[str]:
    """Child basenames of a directory (one listStatus call — a bulk
    LIST on an object store, not a per-entry stat crawl)."""
    if not has_scheme(path):
        return os.listdir(path)
    fs, p, _jvm = _fs(path)
    return [st.getPath().getName() for st in fs.listStatus(p)]


def read_text(path: str) -> str:
    """Whole small file as UTF-8 text (log commits, _last_checkpoint,
    metadata JSON — all O(KB) driver-side metadata)."""
    if not has_scheme(path):
        with open(path) as f:
            return f.read()
    fs, p, jvm = _fs(path)
    stream = fs.open(p)
    try:
        # commons-io ships with Hadoop; one call drains the stream
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, jvm.java.nio.charset.StandardCharsets.UTF_8
        )
    finally:
        stream.close()


def read_bytes(path: str) -> bytes:
    """Whole small file as bytes (Avro manifests / manifest lists —
    O(KB-MB) driver-side metadata)."""
    if not has_scheme(path):
        with open(path, "rb") as f:
            return f.read()
    fs, p, jvm = _fs(path)
    stream = fs.open(p)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()


def join(base: str, *parts: str) -> str:
    """Path join that preserves URI schemes (os.path.join is fine for
    both cases on posix-style separators, which Hadoop paths use)."""
    return "/".join([base.rstrip("/"), *[p.strip("/") for p in parts]])
