"""Round-16 regression pins for the r15 ADVICE findings:

1. (med) datasource.to_logical rebuilt map columns with
   pa.MapArray.from_arrays (no mask parameter) — NULL map values in a
   columnMapping table silently read back as EMPTY maps through the
   Python DataSource front door. Validity must be reattached.
2. (low) LogStore delete_batch swallowed per-object failures: GCS parts
   with 403/412/5xx and S3 <Error> entries counted as "not removed" but
   never surfaced, so VACUUM/expire reported success while garbage
   remained; urlopen also had no timeout. Failures now raise; 404 /
   NoSuchKey stay terminal-success (idempotent maintenance deletes).
3. (low) _scan_orc_groups / _scan_avro_groups downloaded every remote
   ORC/Avro data file IN FULL on the driver just to read a schema —
   now bounded ranged reads (ORC tail, Avro header) through the
   fsio.read_range / LogStore.read_range seam.
4. (low) version_at_timestamp broke out of the commit walk at the first
   timestamp above the target, assuming monotonic wall-clocks, and a
   commit with no commitInfo counted as ts=0 (could wrongly become
   "best"). Now: running-max monotonization (delta-spark's history
   adjustment), timestamp-less commits are skipped, full walk.
5. (low) Staged-file stats were keyed by splitting on the staging dir's
   BASENAME token — an ancestor directory sharing that basename
   desyncs caller and stats-job keys, committing files with
   record_count=0. Now: fsio.relativize against the full prefix, plus
   a loud unclaimed-stats assertion on both committers.
"""

from __future__ import annotations

import glob
import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.sources import fsio
from gcs2postgres_spark.sources.logstore import (
    FakeObjectStore,
    GcsLogStore,
    S3CompatLogStore,
    set_log_store_override,
)


@pytest.fixture
def fake_store():
    store = FakeObjectStore()
    set_log_store_override(store)
    yield store
    set_log_store_override(None)


# ---------------------------------------------------------------------------
# 1. (med) NULL map values survive the DataSource physical->logical rebuild
# ---------------------------------------------------------------------------

def test_datasource_mapped_null_map_values(spark, tmp_path):
    from gcs2postgres_spark.sources.datasource import (
        register_lakehouse_datasources,
    )
    from gcs2postgres_spark.sources.delta_py import (
        alter_delta_rename_column,
        read_delta_py,
        write_delta,
    )

    register_lakehouse_datasources(spark)
    t = str(tmp_path / "t_mapnull")
    df = spark.range(0, 6).selectExpr(
        "CAST(id AS LONG) AS k",
        # rows 0..2 carry a real map, rows 3..5 a NULL map cell
        "CASE WHEN id < 3 THEN map('a', id) END AS m",
        "CAST(id * 2 AS LONG) AS v",
    )
    write_delta(df, t, "overwrite", timestamp_ms=1_700_000_000_000)
    alter_delta_rename_column(spark, t, "v", "val")  # upgrades to mapping
    got = {
        r["k"]: (None if r["m"] is None else dict(r["m"]))
        for r in spark.read.format("delta_py").option("path", t).load().collect()
    }
    assert got[0] == {"a": 0} and got[2] == {"a": 2}
    # the bug read these back as EMPTY maps {}
    assert got[3] is None and got[5] is None
    ref = {
        r["k"]: (None if r["m"] is None else dict(r["m"]))
        for r in read_delta_py(spark, t).collect()
    }
    assert got == ref


# ---------------------------------------------------------------------------
# 2. (low) batch-delete failures surface; 404/NoSuchKey stay success
# ---------------------------------------------------------------------------

class _FailingGcs(BaseHTTPRequestHandler):
    """Batch endpoint: objects whose name contains 'locked' answer 403;
    missing objects 404; the rest 204."""

    objects: dict[str, bool] = {}

    def log_message(self, *a):
        pass

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", 0))).decode()
        statuses = []
        for line in body.splitlines():
            if not line.startswith("DELETE "):
                continue
            target = line.split(" ", 2)[1]
            segs = target.split("/")
            obj = urllib.parse.unquote(segs[segs.index("o") + 1])
            if "locked" in obj:
                statuses.append(403)
            elif obj in self.objects:
                statuses.append(204)
            else:
                statuses.append(404)
        boundary = "b"
        out = "".join(
            f"--{boundary}\r\nContent-Type: application/http\r\n\r\n"
            f"HTTP/1.1 {s} X\r\n\r\n\r\n"
            for s in statuses
        ) + f"--{boundary}--\r\n"
        data = out.encode()
        self.send_response(200)
        self.send_header("Content-Type", f"multipart/mixed; boundary={boundary}")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture
def failing_gcs():
    _FailingGcs.objects = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FailingGcs)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_gcs_batch_delete_surfaces_part_failures(failing_gcs):
    store = GcsLogStore(failing_gcs, token_provider=lambda: "t")
    _FailingGcs.objects = {"data/a.parquet": True}
    # mixed 204 + 404 is fine (idempotent)
    removed = store.delete_batch(
        ["gs://bkt/data/a.parquet", "gs://bkt/data/gone.parquet"]
    )
    assert removed == 1
    # a 403 part must RAISE, not silently report success
    with pytest.raises(OSError, match="403"):
        store.delete_batch(["gs://bkt/data/locked.parquet"])


class _FailingS3(BaseHTTPRequestHandler):
    """DeleteObjects: keys containing 'locked' come back as
    <Error><Code>AccessDenied</Code>; 'ghost' keys as NoSuchKey errors
    (the non-Quiet rendering some stores use); the rest <Deleted>."""

    def log_message(self, *a):
        pass

    def do_POST(self):
        import re as _re

        body = self.rfile.read(int(self.headers.get("Content-Length", 0))).decode()
        parts = []
        for key in _re.findall(r"<Key>([^<]+)</Key>", body):
            if "locked" in key:
                parts.append(
                    f"<Error><Key>{key}</Key><Code>AccessDenied</Code></Error>"
                )
            elif "ghost" in key:
                parts.append(
                    f"<Error><Key>{key}</Key><Code>NoSuchKey</Code></Error>"
                )
            else:
                parts.append(f"<Deleted><Key>{key}</Key></Deleted>")
        out = f"<DeleteResult>{''.join(parts)}</DeleteResult>".encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/xml")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture
def failing_s3():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FailingS3)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_s3_batch_delete_surfaces_errors(failing_s3):
    store = S3CompatLogStore(failing_s3)
    # NoSuchKey errors are terminal-success (idempotent deletes)
    removed = store.delete_batch(["s3://bkt/a.parquet", "s3://bkt/ghost.parquet"])
    assert removed == 1
    with pytest.raises(OSError, match="AccessDenied"):
        store.delete_batch(["s3://bkt/a.parquet", "s3://bkt/locked.parquet"])


def test_logstore_http_calls_carry_timeout(monkeypatch, failing_gcs):
    import urllib.request

    seen: list = []
    real = urllib.request.urlopen

    def spy(req, *a, **k):
        seen.append(k.get("timeout"))
        return real(req, *a, **k)

    monkeypatch.setattr(urllib.request, "urlopen", spy)
    store = GcsLogStore(failing_gcs, token_provider=lambda: "t")
    store.delete_batch(["gs://bkt/data/gone.parquet"])
    assert seen and all(t is not None and t > 0 for t in seen)


# ---------------------------------------------------------------------------
# 3. (low) plan-time ORC/Avro probes are BOUNDED ranged reads
# ---------------------------------------------------------------------------

def test_orc_probe_is_ranged_not_full_download(spark, tmp_path, fake_store):
    import pyarrow as pa
    import pyarrow.orc as orc

    from gcs2postgres_spark.sources.iceberg_py import _scan_orc_groups

    p = str(tmp_path / "big.orc")
    n = 200_000
    orc.write_table(
        pa.table(
            {
                "a": pa.array(range(n), pa.int64()),
                "b": pa.array([str(i) * 5 for i in range(n)]),
            }
        ),
        p,
    )
    size = os.path.getsize(p)
    assert size > 1_000_000  # the probe must NOT be "small file anyway"
    groups = _scan_orc_groups(spark, [f"file://{p}"], need_tag=True)
    # probe went through the ranged seam, bounded far below file size
    assert fake_store.range_reads >= 1
    assert fake_store.bytes_ranged < size / 10, (
        fake_store.bytes_ranged, size,
    )
    (idmap, df), = groups
    assert df.count() == n
    got = df.orderBy("a").limit(2).collect()
    assert [r["a"] for r in got] == [0, 1]
    assert got[0]["__ice_pos"] == 0


def test_avro_probe_is_ranged_not_full_download(spark, tmp_path, fake_store):
    from gcs2postgres_spark.sources import avro_py
    from gcs2postgres_spark.sources.iceberg_py import _scan_avro_groups

    p = str(tmp_path / "big.avro")
    sch = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "x", "type": "long", "field-id": 1},
            {"name": "s", "type": "string", "field-id": 2},
        ],
    }
    avro_py.write_avro_file(
        p, sch, [{"x": i, "s": str(i) * 20} for i in range(60_000)], codec="null"
    )
    size = os.path.getsize(p)
    assert size > 1_000_000
    groups = _scan_avro_groups(spark, [f"file://{p}"], need_tag=False)
    assert fake_store.range_reads >= 1
    assert fake_store.bytes_ranged < size / 10, (
        fake_store.bytes_ranged, size,
    )
    (idmap, df), = groups
    assert idmap == {1: "x", 2: "s"}
    assert df.count() == 60_000


def test_fsio_read_range_posix_and_store():
    import tempfile

    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(b"0123456789abcdef")
        p = f.name
    try:
        assert fsio.read_range(p, 4, 4) == b"4567"
        assert fsio.read_range(p, 12, 100) == b"cdef"  # clamped at EOF
        assert fsio.read_range(p, 0, 0) == b""
        store = FakeObjectStore()
        set_log_store_override(store)
        try:
            assert fsio.read_range(f"file://{p}", 4, 4) == b"4567"
            assert store.range_reads == 1 and store.bytes_ranged == 4
        finally:
            set_log_store_override(None)
    finally:
        os.unlink(p)


# ---------------------------------------------------------------------------
# 4. (low) version_at_timestamp: monotonized walk, no ts=0 anchoring
# ---------------------------------------------------------------------------

def _three_commits(spark, tmp_path, name, stamps):
    from gcs2postgres_spark.sources.delta_py import write_delta

    t = str(tmp_path / name)
    df = spark.range(0, 3).selectExpr("id AS k")
    write_delta(df, t, "overwrite", timestamp_ms=stamps[0])
    for ts in stamps[1:]:
        write_delta(df, t, "append", timestamp_ms=ts)
    return t


def test_version_at_timestamp_clock_skew_monotonized(spark, tmp_path):
    from gcs2postgres_spark.sources.delta_py import version_at_timestamp

    # v2's wall-clock (3000) runs BEHIND v1's (5000): delta-spark's
    # history adjustment clamps v2 up to 5000
    t = _three_commits(spark, tmp_path, "t_skew", [1000, 5000, 3000])
    assert version_at_timestamp(t, 5000) == 2  # adjusted v2 == 5000
    assert version_at_timestamp(t, 4999) == 0  # v1=5000 and v2(adj)=5000 miss
    assert version_at_timestamp(t, 1000) == 0
    with pytest.raises(ValueError):
        version_at_timestamp(t, 999)


def test_version_at_timestamp_skips_commitinfo_less(spark, tmp_path):
    from gcs2postgres_spark.sources.delta_py import version_at_timestamp

    t = _three_commits(spark, tmp_path, "t_noci", [1000, 2000, 9000])
    # strip commitInfo from v1: the protocol makes it OPTIONAL
    c1 = os.path.join(t, "_delta_log", f"{1:020d}.json")
    lines = [
        ln for ln in open(c1).read().splitlines()
        if ln.strip() and "commitInfo" not in ln
    ]
    with open(c1, "w") as f:
        f.write("\n".join(lines) + "\n")
    # old code: v1 counted as ts=0 and became "best" for any target.
    # r17 (ADVICE): a commitInfo-less commit anchors at its log file's
    # MODIFICATION time, matching delta-spark's DeltaHistoryManager
    # fallback — pin the mtime so the walk is deterministic
    os.utime(c1, (1.5, 1.5))  # mtime = 1500 ms
    assert version_at_timestamp(t, 1499) == 0
    assert version_at_timestamp(t, 1500) == 1  # mtime anchors v1
    assert version_at_timestamp(t, 9000) == 2


# ---------------------------------------------------------------------------
# 5. (low) staging-relative stats keys: full-prefix, ancestor-proof
# ---------------------------------------------------------------------------

def test_fsio_relativize():
    assert fsio.relativize("/a/b/c/f.parquet", "/a/b") == "c/f.parquet"
    assert fsio.relativize("file:///a/b/f.parquet", "/a/b") == "f.parquet"
    assert fsio.relativize("/a/b/f.parquet", "file:///a/b") == "f.parquet"
    # percent-encoding disagreement (partition-dir values): the raw
    # form wins when it matches; consumers index/look up BOTH forms
    assert fsio.relativize("file:///a/b/p=x%20y/f", "/a/b") == "p=x%20y/f"
    assert fsio.relativize("file:///a/p%20q/b/f", "/a/p q/b") == "f"
    # the ancestor-basename trap: NEVER split on the first token hit
    assert (
        fsio.relativize("/r/data-3/tbl/data-3/f.parquet", "/r/data-3/tbl/data-3")
        == "f.parquet"
    )
    assert fsio.relativize("/elsewhere/f.parquet", "/a/b") is None


def test_add_files_ancestor_basename_collision(spark, tmp_path, fake_store):
    """src_dir's basename ('data-3') also names an ANCESTOR directory:
    the old token split relativized against the ancestor, missed every
    stats row, and committed record_count=0 for all files."""
    from gcs2postgres_spark.sources.avro_py import read_avro_file_meta
    from gcs2postgres_spark.sources.iceberg_py import (
        add_files,
        create_iceberg_v2_table,
        read_iceberg_py,
    )

    root = tmp_path / "data-3" / "tbl"
    src = root / "data-3"  # <- ancestor and leaf share the basename
    df = spark.range(0, 7).selectExpr("id AS k", "id * 2 AS v")
    df.coalesce(1).write.parquet(f"file://{src}")
    tbl = f"file://{tmp_path}/data-3/ice_tbl"
    create_iceberg_v2_table(df.schema, tbl)
    add_files(spark, tbl, f"file://{src}", snapshot_ts_ms=1_700_000_000_000)
    manifests = glob.glob(
        f"{tmp_path}/data-3/ice_tbl/metadata/manifest-addfiles-*.avro"
    )
    assert manifests
    _s, rows, _m = read_avro_file_meta(manifests[0])
    counts = [int(r["data_file"]["record_count"]) for r in rows]
    assert sum(counts) == 7 and all(c > 0 for c in counts), counts
    assert read_iceberg_py(spark, tbl).count() == 7


def test_stage_data_files_ancestor_basename_collision(spark, tmp_path,
                                                      fake_store):
    """Delta twin: a table living UNDER a dir named like the commit's
    staging prefix keeps exact per-file stats (numRecords drives row
    tracking; min/max drive file skipping)."""
    from gcs2postgres_spark.sources.delta_py import (
        read_delta_py,
        write_delta,
    )

    t = f"file://{tmp_path}/t_nested"
    df = spark.range(0, 9).selectExpr("id AS k", "id * 10 AS v")
    write_delta(df.coalesce(2), t, "overwrite", timestamp_ms=1_700_000_000_000)
    log = fsio.read_text(fsio.join(t, "_delta_log", f"{0:020d}.json"))
    adds = [json.loads(ln)["add"] for ln in log.splitlines() if '"add"' in ln]
    assert adds and all("stats" in a for a in adds)
    total = sum(json.loads(a["stats"])["numRecords"] for a in adds)
    assert total == 9
    assert read_delta_py(spark, t).count() == 9
