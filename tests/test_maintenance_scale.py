"""Round-15 item 1: maintenance ops must be scale-shaped.

- VACUUM / expire_snapshots route garbage-file deletion through
  ``fsio.bulk_delete`` → ``LogStore.delete_batch`` (one batched call per
  ~100-1000 objects), never one driver-side ``fsio.delete`` per file.
- VACUUM replays from the latest checkpoint (which now records remove
  TOMBSTONES, like every real Delta writer) plus the JSON tail — not
  from version 0 — so it works after log cleanup and stays O(tail).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.sources import delta_py, fsio
from gcs2postgres_spark.sources.delta_py import (
    read_delta_py,
    vacuum_delta,
    write_checkpoint,
    write_delta,
)
from gcs2postgres_spark.sources.iceberg_py import (
    append_iceberg_v2,
    create_iceberg_v2_table,
    expire_snapshots,
    read_iceberg_py,
    rewrite_data_files,
)
from gcs2postgres_spark.sources.logstore import (
    FakeObjectStore,
    set_log_store_override,
)


@pytest.fixture
def fake_store():
    store = FakeObjectStore()
    set_log_store_override(store)
    yield store
    set_log_store_override(None)


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumnRenamed("id", "k")
        .withColumn("v", (F.col("k") * 2).cast("long"))
    )


def test_vacuum_batches_deletes_no_per_file_rpc(spark, tmp_path, fake_store,
                                                monkeypatch):
    """Many garbage files -> zero per-file fsio.delete calls; deletes
    arrive at the store in a handful of batch calls."""
    t = f"file://{tmp_path}/vt"
    # 2 overwrites of a 24-file layout -> ~24+ garbage files (plus a DV)
    write_delta(_df(spark, 0, 200).repartition(24), t, "overwrite",
                timestamp_ms=1_700_000_000_000)
    write_delta(_df(spark, 0, 200).repartition(24), t, "overwrite",
                timestamp_ms=1_700_000_001_000)
    write_delta(_df(spark, 0, 50).repartition(4), t, "overwrite",
                timestamp_ms=1_700_000_002_000)
    per_file_calls: list = []
    real_delete = fsio.delete

    def counting_delete(path, recursive=False):
        per_file_calls.append(path)
        return real_delete(path, recursive)

    monkeypatch.setattr(fsio, "delete", counting_delete)
    monkeypatch.setattr(delta_py.fsio, "delete", counting_delete)
    batches_before = fake_store.batch_calls
    removed = vacuum_delta(t)
    assert removed >= 48, removed
    assert len(per_file_calls) == 0, per_file_calls[:5]
    # one batch RPC would fit all of it; allow a small constant
    assert fake_store.batch_calls - batches_before <= 3
    assert read_delta_py(spark, t).count() == 50


def test_vacuum_from_checkpoint_after_log_cleanup(spark, tmp_path):
    """Tombstones recorded in the checkpoint are enough: VACUUM finds
    pre-checkpoint garbage even when the early JSON commits are gone."""
    t = str(tmp_path / "cpvac")
    write_delta(_df(spark, 0, 40).repartition(4), t, "overwrite",
                timestamp_ms=1_700_000_000_000)
    old_files = {
        p for p, _sz in fsio.list_files(t) if p.endswith(".parquet")
    }
    write_delta(_df(spark, 0, 10), t, "overwrite",
                timestamp_ms=1_700_000_001_000)
    write_checkpoint(spark, t, 1)
    write_delta(_df(spark, 10, 20), t, "append",
                timestamp_ms=1_700_000_002_000)
    # simulate log cleanup: drop the JSON prefix the checkpoint covers
    os.remove(os.path.join(t, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(t, "_delta_log", f"{1:020d}.json"))
    removed = vacuum_delta(t)
    assert removed >= 4, removed
    for p in old_files:
        assert not os.path.exists(p), f"garbage survived: {p}"
    got = read_delta_py(spark, t)
    assert got.count() == 20


def test_vacuum_replays_tail_not_history(spark, tmp_path, monkeypatch):
    """With a tombstone-bearing checkpoint at v2, VACUUM must not read
    the v0/v1 JSON commits at all."""
    t = str(tmp_path / "tailvac")
    write_delta(_df(spark, 0, 10).repartition(2), t, "overwrite",
                timestamp_ms=1_700_000_000_000)
    write_delta(_df(spark, 0, 10).repartition(2), t, "overwrite",
                timestamp_ms=1_700_000_001_000)
    write_delta(_df(spark, 0, 10).repartition(2), t, "overwrite",
                timestamp_ms=1_700_000_002_000)
    write_checkpoint(spark, t, 2)
    write_delta(_df(spark, 10, 12), t, "append",
                timestamp_ms=1_700_000_003_000)
    reads: list = []
    real = fsio.read_text

    def counting(path):
        reads.append(path)
        return real(path)

    monkeypatch.setattr(fsio, "read_text", counting)
    monkeypatch.setattr(delta_py.fsio, "read_text", counting)
    removed = vacuum_delta(t)
    assert removed >= 4, removed
    early = [p for p in reads
             if p.endswith(f"{0:020d}.json") or p.endswith(f"{1:020d}.json")
             or p.endswith(f"{2:020d}.json")]
    assert early == [], f"vacuum replayed the checkpointed prefix: {early}"
    assert read_delta_py(spark, t).count() == 12


def test_expire_snapshots_batches_deletes(spark, tmp_path, fake_store,
                                          monkeypatch):
    t = f"file://{tmp_path}/ice"
    df = _df(spark, 0, 40)
    create_iceberg_v2_table(df.schema, t)
    for lo in range(0, 40, 10):
        append_iceberg_v2(spark, t, _df(spark, lo, lo + 10).repartition(4),
                          snapshot_ts_ms=1_700_000_000_000 + lo)
    rewrite_data_files(spark, t, snapshot_ts_ms=1_700_000_100_000)
    per_file_calls: list = []
    real_delete = fsio.delete

    def counting_delete(path, recursive=False):
        per_file_calls.append(path)
        return real_delete(path, recursive)

    import gcs2postgres_spark.sources.iceberg_py as ice_mod

    monkeypatch.setattr(fsio, "delete", counting_delete)
    monkeypatch.setattr(ice_mod.fsio, "delete", counting_delete)
    batches_before = fake_store.batch_calls
    removed = expire_snapshots(t, keep_last=1)
    assert removed >= 16, removed  # 4 appends x 4 files + metadata avro
    assert len(per_file_calls) == 0, per_file_calls[:5]
    assert fake_store.batch_calls - batches_before <= 3
    assert read_iceberg_py(spark, t).count() == 40


def test_remove_orphans_delta(spark, tmp_path, fake_store):
    import time as _time

    from gcs2postgres_spark.sources.delta_py import remove_orphans_delta

    t = f"file://{tmp_path}/orph"
    write_delta(_df(spark, 0, 20).repartition(2), t, "overwrite",
                timestamp_ms=1_700_000_000_000)
    write_delta(_df(spark, 20, 25), t, "append",
                timestamp_ms=1_700_000_001_000)
    root = f"{tmp_path}/orph"
    # plant orphans: a crashed writer's staged parquet (with rows that
    # would corrupt the table if ever read) + a _SUCCESS marker
    _df(spark, 900, 950).coalesce(1).write.parquet(f"{root}/data-dead")
    (tmp_path / "orph" / "_SUCCESS").write_text("")
    now = int(_time.time() * 1000)
    # age guard first: freshly planted files survive the default 72h
    assert remove_orphans_delta(t, now_ms=now) == 0
    # backdate and re-run: orphans (and only they) are reclaimed
    old = (now - 90 * 3_600_000) / 1000
    for p, _sz in fsio.list_files(root):
        if "data-dead" in p or p.endswith("/_SUCCESS"):
            os.utime(p.replace("file://", ""), (old, old))
    removed = remove_orphans_delta(t, now_ms=now)
    assert removed >= 2, removed
    # Hadoop's local FS hides .crc checksum shadows from listings (a
    # posix-only artifact no object store has) — exclude them here too
    left = {p for p, _ in fsio.list_files(root)
            if not os.path.basename(p).startswith(".")}
    assert not any("data-dead" in p for p in left)
    # every version still reads exactly
    got = read_delta_py(spark, t)
    assert got.count() == 25 and got.where("k >= 900").count() == 0
    assert read_delta_py(spark, t, version_as_of=0).count() == 20
    # the log itself is never an orphan
    assert any("/_delta_log/" in p for p in left)


def test_remove_orphan_files_iceberg(spark, tmp_path, fake_store):
    import time as _time

    from gcs2postgres_spark.sources.iceberg_py import remove_orphan_files

    t = f"file://{tmp_path}/iorph"
    df = _df(spark, 0, 20)
    create_iceberg_v2_table(df.schema, t)
    append_iceberg_v2(spark, t, df, snapshot_ts_ms=1_700_000_000_000)
    append_iceberg_v2(spark, t, _df(spark, 20, 30),
                      snapshot_ts_ms=1_700_000_001_000)
    root = f"{tmp_path}/iorph"
    _df(spark, 900, 950).coalesce(1).write.parquet(f"{root}/data/commit-dead")
    (tmp_path / "iorph" / "metadata" / "manifest-dead.avro").write_bytes(b"x")
    now = int(_time.time() * 1000)
    assert remove_orphan_files(t, now_ms=now) == 0  # age guard
    old = (now - 90 * 3_600_000) / 1000
    for p, _sz in fsio.list_files(root):
        if "commit-dead" in p or "manifest-dead" in p:
            os.utime(p.replace("file://", ""), (old, old))
    removed = remove_orphan_files(t, now_ms=now)
    assert removed >= 2, removed
    left = {p for p, _ in fsio.list_files(root)
            if not os.path.basename(p).startswith(".")}
    assert not any("commit-dead" in p or "manifest-dead" in p for p in left)
    got = read_iceberg_py(spark, t)
    assert got.count() == 30 and got.where("k >= 900").count() == 0
    # older snapshot still reads (orphan removal never breaks reachability)
    assert read_iceberg_py(spark, t, snapshot_id=1).count() == 20


def test_rewrite_manifests_folds_and_stays_probe_free(spark, tmp_path,
                                                      monkeypatch):
    """rewrite_manifests: N appends' manifests fold to one per content
    kind, entries keep original sequence numbers (delete gating holds),
    time travel is untouched, and scan planning over the folded
    manifest still does ZERO parquet footer probes (schema-id stamps
    survive the fold)."""
    import json as _json

    import pyarrow.parquet as pq

    from gcs2postgres_spark.sources.avro_py import read_avro_file
    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        latest_metadata_file,
        rewrite_manifests,
    )

    t = str(tmp_path / "rwman")
    df = _df(spark, 0, 10)
    create_iceberg_v2_table(df.schema, t)
    for lo in range(0, 50, 10):
        append_iceberg_v2(spark, t, _df(spark, lo, lo + 10),
                          snapshot_ts_ms=1_700_000_000_000 + lo)
    delete_where(spark, t, "k % 9 = 0", snapshot_ts_ms=1_700_000_001_000)

    def _manifests():
        meta = _json.loads(open(latest_metadata_file(t)).read())
        cur = next(s for s in meta["snapshots"]
                   if s["snapshot-id"] == meta["current-snapshot-id"])
        _s, rows = read_avro_file(cur["manifest-list"])
        return rows

    assert len(_manifests()) == 6
    assert rewrite_manifests(spark, t, snapshot_ts_ms=1_700_000_002_000)
    rows = _manifests()
    assert len(rows) == 2  # one data + one delete manifest
    assert {r["content"] for r in rows} == {0, 1}
    # re-fold is a no-op
    assert rewrite_manifests(spark, t, snapshot_ts_ms=1_700_000_003_000) is None
    # exact content + sequence gating survived the fold
    got = sorted(r["k"] for r in read_iceberg_py(spark, t).collect())
    assert got == [i for i in range(50) if i % 9 != 0]
    assert read_iceberg_py(spark, t, snapshot_id=2).count() == 20
    # planning over the folded manifest: zero footer probes
    calls: list = []
    real = pq.ParquetFile

    class Counting(real):
        def __init__(self, *a, **k):
            calls.append(a[0] if a else None)
            super().__init__(*a, **k)

    monkeypatch.setattr(pq, "ParquetFile", Counting)
    read_iceberg_py(spark, t)
    assert calls == [], f"footer probes after fold: {calls}"
