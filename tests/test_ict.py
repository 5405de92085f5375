"""Delta in-commit timestamps (writer feature ``inCommitTimestamp``):
once ``delta.enableInCommitTimestamps`` is set, every commitInfo
carries a MONOTONIC timestamp that timestamp time travel trusts over
wall clocks — the defense against clock-skewed writers."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from gcs2postgres_spark.sources.delta_py import (
    read_delta_py,
    set_delta_property,
    write_checkpoint,
    write_delta,
)


def _k(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def _icts(table):
    out = {}
    for f in sorted(glob.glob(os.path.join(table, "_delta_log", "*.json"))):
        v = int(os.path.basename(f).split(".")[0])
        for line in open(f):
            ci = json.loads(line).get("commitInfo")
            if ci:
                out[v] = ci.get("inCommitTimestamp")
    return out


def test_ict_chain_is_monotonic_despite_clock_skew(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_k(spark, 0, 5), t, "overwrite", timestamp_ms=1_700_000_000_000)
    v1 = set_delta_property(spark, t, "delta.enableInCommitTimestamps", "true",
                            timestamp_ms=1_700_000_010_000)
    # wall clock goes BACKWARDS on the next two commits
    write_delta(_k(spark, 10, 12), t, "append", timestamp_ms=1_700_000_005_000)
    write_delta(_k(spark, 20, 22), t, "append", timestamp_ms=1_700_000_001_000)
    icts = _icts(t)
    assert icts[0] is None  # pre-enablement commits have none
    assert icts[v1] == 1_700_000_010_000
    assert icts[v1 + 1] == 1_700_000_010_001  # max(wall, prev+1)
    assert icts[v1 + 2] == 1_700_000_010_002
    # enablement properties recorded (spec)
    from gcs2postgres_spark.sources.delta_py import replay_head_state

    _, meta = replay_head_state(spark, t)
    cfg = meta["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == str(v1)
    assert cfg["delta.inCommitTimestampEnablementTimestamp"] == "1700000010000"
    # protocol carries the writer feature
    from gcs2postgres_spark.sources.delta_py import _head_protocol

    assert "inCommitTimestamp" in (_head_protocol(t).get("writerFeatures") or [])


def test_time_travel_trusts_ict_over_wall_clock(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_k(spark, 0, 5), t, "overwrite", timestamp_ms=1_700_000_000_000)
    set_delta_property(spark, t, "delta.enableInCommitTimestamps", "true",
                       timestamp_ms=1_700_000_010_000)
    # skewed writer: wall says BEFORE the enablement instant
    write_delta(_k(spark, 100, 103), t, "append", timestamp_ms=1_700_000_005_000)
    # as-of the enablement instant: the append's ICT (10_000+1) is in
    # the future, so it must NOT be visible — wall-clock semantics
    # would wrongly include it (5_000 <= 10_000)
    got = read_delta_py(spark, t, timestamp_as_of_ms=1_700_000_010_000)
    assert got.count() == 5
    got2 = read_delta_py(spark, t, timestamp_as_of_ms=1_700_000_010_001)
    assert got2.count() == 8


def test_ict_continues_after_log_cleanup(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_k(spark, 0, 4), t, "overwrite", timestamp_ms=1_700_000_000_000)
    v = set_delta_property(spark, t, "delta.enableInCommitTimestamps", "true",
                           timestamp_ms=1_700_000_010_000)
    write_checkpoint(spark, t, v)
    for f in glob.glob(os.path.join(t, "_delta_log", "*.json")):
        os.remove(f)
    # chain signal now comes from the checkpoint's metaData; the floor
    # is the enablement timestamp
    write_delta(_k(spark, 50, 52), t, "append", timestamp_ms=1_700_000_001_000)
    icts = _icts(t)
    assert icts[v + 1] == 1_700_000_010_001  # > enablement floor
