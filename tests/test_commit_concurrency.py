"""Multi-writer commit safety (round 12).

Both jar-less committers now commit with PUT-IF-ABSENT semantics
(Delta: ``N.json`` via O_CREAT|O_EXCL; Iceberg: ``vN.metadata.json``
via hard-link-no-overwrite) plus optimistic-concurrency handling: a
writer that loses the version race REBASES when the intervening
commits are logically disjoint (appends; file-disjoint DML) and raises
``CommitConflictError`` otherwise — never a silent lost update, which
is exactly what the round-11 committers allowed (two writers both
writing ``N.json``, second overwrite wins, first commit vanishes).
"""

import json
import os
import threading

import pytest


def _nation(spark, lo=0, hi=24):
    return spark.range(lo, hi).selectExpr(
        "CAST(id AS INT) AS k",
        "concat('N_', id) AS name",
        "CAST(id % 4 AS INT) AS region",
    )


def _race(fn_a, fn_b):
    """Run two callables with a start barrier; return ([res_a, res_b],
    [exc_a, exc_b])."""
    barrier = threading.Barrier(2)
    results: list = [None, None]
    errors: list = [None, None]

    def runner(i, fn):
        barrier.wait()
        try:
            results[i] = fn()
        except BaseException as e:  # noqa: BLE001 — surface to the test
            errors[i] = e

    ts = [
        threading.Thread(target=runner, args=(i, f))
        for i, f in enumerate((fn_a, fn_b))
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return results, errors


# ------------------------------------------------------------------ delta


def test_delta_commit_is_put_if_absent(spark, tmp_path):
    """The core primitive: writing an existing version number fails at
    the filesystem (FileExistsError), never overwrites."""
    from gcs2postgres_spark.sources.delta_py import _write_commit, write_delta

    t = str(tmp_path / "d")
    write_delta(_nation(spark).coalesce(1), t, "overwrite",
                timestamp_ms=1_700_000_000_000)
    log_dir = os.path.join(t, "_delta_log")
    before = open(os.path.join(log_dir, f"{0:020d}.json")).read()
    with pytest.raises(FileExistsError):
        _write_commit(log_dir, 0, [{"add": {"path": "x.parquet"}}], 1)
    assert open(os.path.join(log_dir, f"{0:020d}.json")).read() == before


def test_delta_rebase_vs_conflict_rules(spark, tmp_path):
    """_commit_with_rebase: DISJOINT intervening commits rebase to the
    new head; overlapping files / metaData changes / rebase_ok=False
    raise CommitConflictError."""
    from gcs2postgres_spark.sources.delta_py import (
        CommitConflictError,
        _commit_with_rebase,
        _write_commit,
        write_delta,
    )

    t = str(tmp_path / "d")
    write_delta(_nation(spark).coalesce(1), t, "overwrite",
                timestamp_ms=1_700_000_000_000)
    log_dir = os.path.join(t, "_delta_log")

    # a competing writer already took version 1, touching other.parquet
    _write_commit(log_dir, 1, [{"add": {"path": "other.parquet",
                                        "partitionValues": {}}}], 2)
    # disjoint: our add rebases to version 2
    v = _commit_with_rebase(
        log_dir, 1, [{"add": {"path": "mine.parquet", "partitionValues": {}}}],
        3, operation="WRITE",
    )
    assert v == 2
    # overlapping file: conflict
    with pytest.raises(CommitConflictError, match="same files"):
        _commit_with_rebase(
            log_dir, 1,
            [{"remove": {"path": "other.parquet", "deletionTimestamp": 4}}],
            4, operation="DELETE",
        )
    # rebase_ok=False (overwrite/restore semantics): any interloper conflicts
    with pytest.raises(CommitConflictError):
        _commit_with_rebase(
            log_dir, 1, [{"add": {"path": "z.parquet", "partitionValues": {}}}],
            5, operation="WRITE", rebase_ok=False,
        )
    # intervening metaData: conflict even for disjoint files
    _write_commit(log_dir, 3, [{"metaData": {"id": "m", "schemaString": "{}",
                                             "partitionColumns": [],
                                             "configuration": {},
                                             "format": {"provider": "parquet",
                                                        "options": {}}}}], 6)
    with pytest.raises(CommitConflictError):
        _commit_with_rebase(
            log_dir, 3, [{"add": {"path": "q.parquet", "partitionValues": {}}}],
            7, operation="WRITE",
        )


def test_delta_concurrent_appends_both_land(spark, tmp_path):
    """Two threads appending concurrently: no lost update — both
    commits exist, the table holds both row sets."""
    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta

    t = str(tmp_path / "d")
    write_delta(_nation(spark, 0, 4).coalesce(1), t, "overwrite",
                timestamp_ms=1_700_000_000_000)

    def appender(lo, hi, ts):
        return lambda: write_delta(
            _nation(spark, lo, hi).coalesce(1), t, "append", timestamp_ms=ts
        )

    results, errors = _race(appender(100, 104, 2), appender(200, 204, 3))
    assert errors == [None, None], errors
    assert sorted(results) == [1, 2]
    ks = sorted(r["k"] for r in read_delta_py(spark, t).collect())
    assert ks == list(range(4)) + list(range(100, 104)) + list(range(200, 204))


def test_delta_concurrent_dml_no_lost_update(spark, tmp_path):
    """Two DELETEs hitting the SAME file concurrently: each either
    commits (its rows are gone) or raises CommitConflictError (its rows
    remain) — the final state always equals the sum of the successes."""
    from gcs2postgres_spark.sources.delta_py import (
        CommitConflictError,
        delete_where_delta,
        read_delta_py,
        write_delta,
    )

    t = str(tmp_path / "d")
    write_delta(_nation(spark).coalesce(1), t, "overwrite",
                timestamp_ms=1_700_000_000_000)

    def deleter(pred, ts):
        return lambda: delete_where_delta(spark, t, pred, timestamp_ms=ts)

    results, errors = _race(deleter("k IN (1, 2)", 2), deleter("k IN (3, 4)", 3))
    for e in errors:
        assert e is None or isinstance(e, CommitConflictError), e
    gone = set()
    if errors[0] is None and results[0] is not None:
        gone |= {1, 2}
    if errors[1] is None and results[1] is not None:
        gone |= {3, 4}
    ks = {r["k"] for r in read_delta_py(spark, t).collect()}
    assert ks == set(range(24)) - gone


# ---------------------------------------------------------------- iceberg


def test_iceberg_commit_is_put_if_absent(spark, tmp_path):
    from gcs2postgres_spark.sources.iceberg_py import (
        _write_json_if_absent,
        write_iceberg_v2_fixture,
    )

    t = str(tmp_path / "i")
    write_iceberg_v2_fixture(_nation(spark), t, sort_col="k")
    p = os.path.join(t, "metadata", "v1.metadata.json")
    before = open(p).read()
    with pytest.raises(FileExistsError):
        _write_json_if_absent(p, {"clobber": True})
    assert open(p).read() == before
    assert not [f for f in os.listdir(os.path.dirname(p)) if ".tmp." in f]


def test_iceberg_concurrent_appends_rebase(spark, tmp_path):
    """Two concurrent fast-appends: the loser rebases its (immutable)
    data files onto the winner's head — both snapshots land, all rows
    survive, and sequence numbers stay strictly increasing."""
    from gcs2postgres_spark.sources.iceberg_py import (
        append_iceberg_v2,
        read_iceberg_meta,
        read_iceberg_py,
        write_iceberg_v2_fixture,
    )

    t = str(tmp_path / "i")
    write_iceberg_v2_fixture(_nation(spark, 0, 4), t, sort_col="k")

    def appender(lo, hi, ts):
        return lambda: append_iceberg_v2(
            spark, t, _nation(spark, lo, hi), snapshot_ts_ms=ts
        )

    results, errors = _race(
        appender(100, 104, 1_700_000_001_000), appender(200, 204, 1_700_000_002_000)
    )
    assert errors == [None, None], errors
    assert len(set(results)) == 2  # two distinct snapshot ids
    ks = sorted(r["k"] for r in read_iceberg_py(spark, t).collect())
    assert ks == list(range(4)) + list(range(100, 104)) + list(range(200, 204))
    snaps = read_iceberg_meta(spark, t, "snapshots").collect()
    seqs = sorted(s["sequence_number"] for s in snaps)
    assert seqs == sorted(set(seqs))  # strictly increasing, no duplicates
    # the final metadata's version chain has no gaps or orphan tmp files
    mdir = os.path.join(t, "metadata")
    assert not [f for f in os.listdir(mdir) if ".tmp." in f]


def test_iceberg_non_append_conflict_raises(spark, tmp_path, monkeypatch):
    """A DELETE whose version race is lost MID-FLIGHT (the winner lands
    AFTER this writer read its file inventory) must raise — its
    position deletes were matched against a stale state — and leave the
    winner's metadata untouched."""
    from gcs2postgres_spark.sources import iceberg_py

    t = str(tmp_path / "i")
    iceberg_py.write_iceberg_v2_fixture(_nation(spark), t, sort_col="k")

    real = iceberg_py._write_json_if_absent
    stolen = {}

    def racer_wins_first(path, obj):
        if not stolen:
            # the concurrent winner takes this exact version first
            head = iceberg_py.latest_metadata_file(t)
            json.dump(json.load(open(head)), open(path, "w"))
            stolen["path"] = path
        real(path, obj)

    monkeypatch.setattr(iceberg_py, "_write_json_if_absent", racer_wins_first)
    with pytest.raises(iceberg_py.CommitConflictError, match="re-read and retry"):
        iceberg_py.delete_where(spark, t, "k = 1", snapshot_ts_ms=1_700_000_001_000)
    monkeypatch.setattr(iceberg_py, "_write_json_if_absent", real)
    # the winner's metadata survives byte-for-byte; the table still
    # reads the winner's state (a copy of v1 here: all 24 rows)
    assert json.load(open(stolen["path"]))  # intact, parseable
    assert iceberg_py.read_iceberg_py(spark, t).count() == 24
    # a fresh retry (new state read) now succeeds on top of the winner
    assert iceberg_py.delete_where(spark, t, "k = 1") is not None
    assert iceberg_py.read_iceberg_py(spark, t).count() == 23


# ------------------------------------------------------------- logstore seam


def test_race_through_injected_object_store(spark, tmp_path):
    """The committers route their commit point through the pluggable
    LogStore (sources/logstore.py): with a FakeObjectStore injected —
    conditional-put-only semantics, no rename, no O_EXCL, the atomicity
    GCS/S3 actually offer — the two-writer append race still loses at
    the store, both commits land, and the store's put counter proves
    the committers used the seam rather than private os calls."""
    from gcs2postgres_spark.sources import logstore
    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta
    from gcs2postgres_spark.sources.iceberg_py import (
        append_iceberg_v2,
        read_iceberg_py,
        write_iceberg_v2_fixture,
    )

    store = logstore.FakeObjectStore()
    logstore.set_log_store_override(store)
    try:
        d = str(tmp_path / "d")
        write_delta(_nation(spark, 0, 4).coalesce(1), d, "overwrite",
                    timestamp_ms=1_700_000_000_000)

        def appender(lo, hi, ts):
            return lambda: write_delta(
                _nation(spark, lo, hi).coalesce(1), d, "append",
                timestamp_ms=ts,
            )

        results, errors = _race(appender(100, 104, 2), appender(200, 204, 3))
        assert errors == [None, None], errors
        assert sorted(results) == [1, 2]
        ks = sorted(r["k"] for r in read_delta_py(spark, d).collect())
        assert ks == list(range(4)) + list(range(100, 104)) + list(range(200, 204))
        assert store.puts >= 3  # v0 + both appends went through the seam

        i = str(tmp_path / "i")
        write_iceberg_v2_fixture(_nation(spark, 0, 4), i, sort_col="k")
        puts_before = store.puts

        def iappender(lo, hi, ts):
            return lambda: append_iceberg_v2(
                spark, i, _nation(spark, lo, hi), snapshot_ts_ms=ts
            )

        results, errors = _race(
            iappender(100, 104, 1_700_000_001_000),
            iappender(200, 204, 1_700_000_002_000),
        )
        assert errors == [None, None], errors
        assert len(set(results)) == 2
        ks = sorted(r["k"] for r in read_iceberg_py(spark, i).collect())
        assert ks == list(range(4)) + list(range(100, 104)) + list(range(200, 204))
        assert store.puts >= puts_before + 2
    finally:
        logstore.set_log_store_override(None)


def test_unregistered_remote_scheme_refuses_at_commit(tmp_path):
    """An unregistered object-store scheme must refuse at the commit
    seam (committing through rename/EXCL semantics an object store does
    not have would be silent commit corruption); registering a store
    for the scheme routes to it."""
    import pytest as _pytest

    from gcs2postgres_spark.sources import logstore

    with _pytest.raises(NotImplementedError, match="no LogStore registered"):
        logstore.log_store_for("gs://bucket/table/_delta_log/0.json")
    fake = logstore.FakeObjectStore()
    logstore.register_log_store("gs", fake)
    try:
        assert logstore.log_store_for("gs://bucket/t/0.json") is fake
    finally:
        logstore._BY_SCHEME.pop("gs", None)
    # plain and file: paths use the posix default
    assert isinstance(logstore.log_store_for("/tmp/x"), logstore.LocalLogStore)
    assert isinstance(
        logstore.log_store_for("file:///tmp/x"), logstore.LocalLogStore
    )


def test_iceberg_append_rebase_refuses_schema_change(spark, tmp_path, monkeypatch):
    """An APPEND that loses the version race to a SCHEMA CHANGE must
    raise (its rows were staged against the old contract), while a
    race lost to a plain append still rebases — the Iceberg twin of
    the Delta metaData conflict rule."""
    from gcs2postgres_spark.sources import iceberg_py

    t = str(tmp_path / "i")
    iceberg_py.write_iceberg_v2_fixture(_nation(spark, 0, 4), t, sort_col="k")

    real = iceberg_py._write_json_if_absent
    state = {"raced": False}

    def racer_renames_first(path, obj):
        if not state["raced"]:
            state["raced"] = True
            iceberg_py.alter_iceberg_rename_column(t, "name", "label")
        real(path, obj)

    monkeypatch.setattr(iceberg_py, "_write_json_if_absent", racer_renames_first)
    with pytest.raises(iceberg_py.CommitConflictError, match="schema or partition"):
        iceberg_py.append_iceberg_v2(
            spark, t, _nation(spark, 100, 102),
            snapshot_ts_ms=1_700_000_001_000,
        )
    monkeypatch.setattr(iceberg_py, "_write_json_if_absent", real)
    # the winner's rename survives; a fresh retry against the new head works
    from gcs2postgres_spark.sources.iceberg_py import read_iceberg_py

    assert "label" in read_iceberg_py(spark, t).columns
    df = _nation(spark, 100, 102).withColumnRenamed("name", "label")
    assert iceberg_py.append_iceberg_v2(spark, t, df) is not None
    assert read_iceberg_py(spark, t).count() == 6
