"""Checkpoint-layout coverage for the jar-less Delta reader/writer: the
protocol's THREE checkpoint layouts (classic single-file, classic
multi-part, v2 uuid-named manifest + sidecars) all reconstruct the same
snapshot, survive log cleanup (the case checkpoints exist for), and
interoperate with deletion vectors, txn watermarks, and row tracking.

Reference tie: the reference registers external objects and delegates
snapshot resolution to the engine (src/db/db.go:22-43); here the Delta
snapshot resolution IS the engine's job, so every layout a real writer
produces must parse. V2 checkpoints are what current Delta writers emit
by default (delta.checkpointPolicy=v2), making them the most likely
refusal for a user pointing this reader at a modern table.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.sources import delta_py
from gcs2postgres_spark.sources.delta_py import (
    _find_checkpoint,
    checkpoint_actions_pyarrow,
    delete_where_delta,
    last_txn_version,
    read_delta_py,
    set_delta_property,
    write_checkpoint,
    write_delta,
)


def _k_range(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def _cleanup_json(table, through_version):
    log = os.path.join(table, "_delta_log")
    for f in glob.glob(os.path.join(log, "*.json")):
        if int(os.path.basename(f).split(".")[0]) <= through_version:
            os.remove(f)


def _enable_v2(spark, table):
    return set_delta_property(spark, table, "delta.checkpointPolicy", "v2")


def test_v2_checkpoint_roundtrip_with_dv(spark, tmp_path):
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 20), d, "overwrite", timestamp_ms=1_700_000_000_000)
    write_delta(_k_range(spark, 20, 30), d, "append", timestamp_ms=1_700_000_001_000)
    delete_where_delta(spark, d, "k >= 25", timestamp_ms=1_700_000_002_000)
    v = _enable_v2(spark, d)
    write_checkpoint(spark, d, v)
    log = os.path.join(d, "_delta_log")
    # the layout is the spec's: uuid-named manifest + _sidecars parquet
    manifests = [
        f for f in os.listdir(log)
        if f.startswith(f"{v:020d}.checkpoint.") and f != f"{v:020d}.checkpoint.parquet"
    ]
    assert len(manifests) == 1
    assert os.listdir(os.path.join(log, "_sidecars"))
    _cleanup_json(d, v)
    got = sorted(r["k"] for r in read_delta_py(spark, d).collect())
    # the DV descriptor must ride through the sidecar: losing it would
    # resurrect the 5 deleted rows
    assert got == list(range(25))


def test_v2_checkpoint_chains_after_cleanup(spark, tmp_path):
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 10), d, "overwrite", timestamp_ms=1_700_000_000_000)
    v = _enable_v2(spark, d)
    write_checkpoint(spark, d, v)
    _cleanup_json(d, v)
    # a later checkpoint must SEED from the previous one — replaying the
    # (now incomplete) JSON prefix alone would drop the first 10 rows
    write_delta(_k_range(spark, 100, 105), d, "append", timestamp_ms=1_700_000_001_000)
    write_checkpoint(spark, d, v + 1)
    _cleanup_json(d, v + 1)
    got = sorted(r["k"] for r in read_delta_py(spark, d).collect())
    assert got == list(range(10)) + list(range(100, 105))


def test_multipart_classic_checkpoint_reads(spark, tmp_path):
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 12), d, "overwrite", timestamp_ms=1_700_000_000_000)
    write_delta(_k_range(spark, 12, 24), d, "append", timestamp_ms=1_700_000_001_000)
    v = 1
    write_checkpoint(spark, d, v)  # classic single-file
    log = os.path.join(d, "_delta_log")
    classic = os.path.join(log, f"{v:020d}.checkpoint.parquet")
    # split the classic checkpoint into a 2-part multi-part layout (what
    # large tables' writers produce): rows 0..n/2 in part 1, rest in 2
    import pyarrow.parquet as pq

    t = pq.read_table(classic)
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), os.path.join(
        log, f"{v:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    pq.write_table(t.slice(half), os.path.join(
        log, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    os.remove(classic)
    _cleanup_json(d, v)
    got = sorted(r["k"] for r in read_delta_py(spark, d).collect())
    assert got == list(range(24))


def test_incomplete_multipart_raises(spark, tmp_path):
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 6), d, "overwrite", timestamp_ms=1_700_000_000_000)
    write_checkpoint(spark, d, 0)
    log = os.path.join(d, "_delta_log")
    classic = os.path.join(log, f"{0:020d}.checkpoint.parquet")
    os.rename(classic, os.path.join(
        log, f"{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet"))
    with pytest.raises(FileNotFoundError, match="incomplete"):
        _find_checkpoint(log, 0)


def test_txn_and_protocol_survive_v2_cleanup(spark, tmp_path):
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 5), d, "overwrite", timestamp_ms=1_700_000_000_000)
    # stamp a txn the way the streaming sink does
    log = os.path.join(d, "_delta_log")
    delta_py._write_commit(
        log, 1,
        [{"txn": {"appId": "stream-app", "version": 41, "lastUpdated": 0}}],
        1_700_000_001_000, operation="STREAMING UPDATE",
    )
    v = _enable_v2(spark, d)
    write_checkpoint(spark, d, v)
    _cleanup_json(d, v)
    # exactly-once bookkeeping must survive: the watermark lives only in
    # the v2 manifest now
    assert last_txn_version(spark, d, "stream-app") == 41
    proto = delta_py._head_protocol(d)
    assert "v2Checkpoint" in (proto.get("readerFeatures") or [])
    # session-free action load (the datasource worker's path) sees the
    # same state
    actions = checkpoint_actions_pyarrow(log, v)
    kinds = {next(iter(a)) for a in actions}
    assert {"checkpointMetadata", "sidecar", "metaData", "protocol", "txn"} <= kinds
    txn = next(a["txn"] for a in actions if "txn" in a)
    assert txn["appId"] == "stream-app" and int(txn["version"]) == 41


def test_row_tracking_hwm_survives_v2_cleanup(spark, tmp_path):
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 8), d, "overwrite", timestamp_ms=1_700_000_000_000)
    delta_py.enable_row_tracking(spark, d, timestamp_ms=1_700_000_001_000)
    hwm_before = delta_py._row_id_high_watermark(spark, d)
    assert hwm_before >= 7
    v = _enable_v2(spark, d)
    write_checkpoint(spark, d, v)
    _cleanup_json(d, v)
    assert delta_py._row_id_high_watermark(spark, d) == hwm_before
    # new writes keep allocating ABOVE the preserved watermark
    write_delta(_k_range(spark, 100, 103), d, "append", timestamp_ms=1_700_000_002_000)
    assert delta_py._row_id_high_watermark(spark, d) >= hwm_before + 3
    ids = delta_py.read_delta_with_row_ids(spark, d).select("_row_id")
    vals = [r["_row_id"] for r in ids.collect()]
    assert len(vals) == 11 and len(set(vals)) == 11  # unique, none lost


def test_v2_policy_requires_feature(spark, tmp_path):
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 3), d, "overwrite", timestamp_ms=1_700_000_000_000)
    with pytest.raises(ValueError, match="v2Checkpoint table feature"):
        write_checkpoint(spark, d, 0, policy="v2")


def test_auto_checkpoint_honors_policy(spark, tmp_path):
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 3), d, "overwrite", timestamp_ms=1_700_000_000_000)
    _enable_v2(spark, d)
    v = max(
        int(os.path.basename(f).split(".")[0])
        for f in glob.glob(os.path.join(d, "_delta_log", "*.json"))
    )
    # commit until the CHECKPOINT_EVERY cadence fires
    while v % delta_py.CHECKPOINT_EVERY != 0:
        v = write_delta(
            _k_range(spark, 10 * v, 10 * v + 2), d, "append",
            timestamp_ms=1_700_000_001_000 + v,
        )
    log = os.path.join(d, "_delta_log")
    assert _find_checkpoint(log, v)["kind"] == "v2"
    lc = json.loads(open(os.path.join(log, "_last_checkpoint")).read())
    assert lc["version"] == v


def test_checkpoint_refuses_gap_without_base(spark, tmp_path):
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 4), d, "overwrite", timestamp_ms=1_700_000_000_000)
    write_delta(_k_range(spark, 4, 8), d, "append", timestamp_ms=1_700_000_001_000)
    os.remove(os.path.join(d, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(FileNotFoundError, match="no prior checkpoint"):
        write_checkpoint(spark, d, 1)


def test_datasource_batch_reads_v2_checkpoint_only(spark, tmp_path):
    from gcs2postgres_spark.sources.datasource import register_lakehouse_datasources

    register_lakehouse_datasources(spark)
    d = str(tmp_path / "t")
    write_delta(_k_range(spark, 0, 7), d, "overwrite", timestamp_ms=1_700_000_000_000)
    v = _enable_v2(spark, d)
    write_checkpoint(spark, d, v)
    _cleanup_json(d, v)
    got = (
        spark.read.format("delta_py").load(d)
        .agg(F.count("*").alias("n"), F.sum("k").alias("s"))
        .collect()[0]
    )
    assert (got["n"], got["s"]) == (7, 21)
