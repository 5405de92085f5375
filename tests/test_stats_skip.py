"""File-level column statistics + planning-time data skipping.

Delta: per-file ``stats`` JSON (numRecords/minValues/maxValues/nullCount)
recorded from the parquet footer on every staged add, preserved through
checkpoints, consumed by ``read_delta_py(stats_filter=...)``.
Iceberg: manifest ``lower_bounds``/``upper_bounds``/``null_value_counts``
in the spec's single-value binary form, consumed by
``read_iceberg_py(stats_filter=...)``.

The filter is a planning-time optimization with a conservative
contract: missing stats, unknown columns, or undecodable values KEEP
the file; callers still apply the predicate as a row filter. At 100 TB
this is the manifest-level min/max skip every production scan planner
performs — zero I/O for files whose recorded range cannot match.
"""

from __future__ import annotations

import datetime as dt
import glob
import json
import os

from pyspark.sql import functions as F

from gcs2postgres_spark.sources.delta_py import (
    _stats_skip_file,
    read_delta_py,
    replay_head_state,
    write_checkpoint,
    write_delta,
)
from gcs2postgres_spark.sources.iceberg_py import (
    _bound_decode,
    _bound_encode,
    _storage_value,
    read_iceberg_py,
    write_iceberg_v2_fixture,
)


def _ranged(spark, n=400, parts=4):
    return (
        spark.range(0, n)
        .withColumnRenamed("id", "k")
        .withColumn("v", (F.col("k") * 2).cast("long"))
        .repartitionByRange(parts, "k")
        .sortWithinPartitions("k")
    )


# ------------------------------------------------------------------- delta


def test_delta_stats_recorded_and_skip(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_ranged(spark), t, "overwrite", timestamp_ms=1_700_000_000_000)
    live, _ = replay_head_state(spark, t)
    assert len(live) == 4 and all(a.get("stats") for a in live.values())
    st = json.loads(next(iter(live.values()))["stats"])
    assert set(st) == {"numRecords", "minValues", "maxValues", "nullCount"}
    # range files: a k >= 350 filter skips 3 of 4 at PLANNING time
    flt = {"k": (350, None)}
    assert sum(_stats_skip_file(a, flt) for a in live.values()) == 3
    scanned = read_delta_py(spark, t, stats_filter=flt)
    assert scanned.count() == 100  # only the surviving file's rows
    assert scanned.filter("k >= 350").count() == 50  # predicate still applies
    # unfiltered read unchanged
    assert read_delta_py(spark, t).count() == 400


def test_delta_stats_conservative_paths(spark, tmp_path):
    # missing stats → keep
    assert not _stats_skip_file({"path": "x"}, {"k": (0, 1)})
    # malformed stats JSON → keep
    assert not _stats_skip_file({"stats": "{nope"}, {"k": (0, 1)})
    # unknown column → keep
    ok = json.dumps({"minValues": {"k": 5}, "maxValues": {"k": 9}})
    assert not _stats_skip_file({"stats": ok}, {"other": (0, 1)})
    # cross-type comparison → keep
    assert not _stats_skip_file({"stats": ok}, {"k": ("zz", None)})
    # both-sided range: inside keeps, outside skips
    assert not _stats_skip_file({"stats": ok}, {"k": (6, 8)})
    assert _stats_skip_file({"stats": ok}, {"k": (10, 20)})
    assert _stats_skip_file({"stats": ok}, {"k": (None, 4)})


def test_delta_stats_survive_checkpoint(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_ranged(spark), t, "overwrite", timestamp_ms=1_700_000_000_000)
    write_checkpoint(spark, t, 0)
    for f in glob.glob(os.path.join(t, "_delta_log", "*.json")):
        os.remove(f)
    live, _ = replay_head_state(spark, t)
    assert all(a.get("stats") for a in live.values())
    assert read_delta_py(spark, t, stats_filter={"k": (350, None)}).count() == 100


def test_delta_string_bounds_lexicographic(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("apple",), ("beta",), ("gamma",), ("zeta",)], "s string"
    ).repartitionByRange(2, "s")
    write_delta(df, t, "overwrite", timestamp_ms=1_700_000_000_000)
    live, _ = replay_head_state(spark, t)
    flt = {"s": ("x", None)}
    assert sum(_stats_skip_file(a, flt) for a in live.values()) >= 1
    got = read_delta_py(spark, t, stats_filter=flt).filter("s >= 'x'")
    assert [r["s"] for r in got.collect()] == ["zeta"]


# ----------------------------------------------------------------- iceberg


def test_bound_codec_roundtrip():
    cases = [
        (42, "int"), (-7, "int"), (1 << 40, "long"), (2.5, "double"),
        (1.5, "float"), (True, "boolean"), ("héllo", "string"),
    ]
    for v, t in cases:
        assert _bound_decode(_bound_encode(v, t), t) == v
    d = dt.date(2024, 3, 1)
    assert _bound_decode(_bound_encode(d, "date"), "date") == _storage_value(d, "date")
    ts = dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    assert _bound_decode(
        _bound_encode(ts, "timestamptz"), "timestamptz"
    ) == _storage_value(ts, "timestamptz")


def test_iceberg_bounds_skip_and_deletes_survive(spark, tmp_path):
    t = str(tmp_path / "t")
    write_iceberg_v2_fixture(_ranged(spark), t, sort_col="k")
    flt = {"k": (350, None)}
    scanned = read_iceberg_py(spark, t, stats_filter=flt)
    assert scanned.count() == 100
    assert scanned.filter("k >= 350").count() == 50
    # deletes apply on the surviving files: drop some matching rows
    from gcs2postgres_spark.sources.iceberg_py import delete_where

    delete_where(spark, t, "k >= 390", snapshot_ts_ms=1_700_000_001_000)
    got = read_iceberg_py(spark, t, stats_filter=flt).filter("k >= 350")
    assert got.count() == 40  # 350..389
    assert read_iceberg_py(spark, t).count() == 390


def test_iceberg_temporal_stats_filter(spark, tmp_path):
    t = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    df = (
        spark.range(0, 200)
        .select(
            F.col("id").alias("k"),
            (F.lit(base) + F.make_interval(hours=F.col("id"))).alias("ts"),
        )
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    write_iceberg_v2_fixture(df, t, sort_col="k")
    cut = base + dt.timedelta(hours=150)
    scanned = read_iceberg_py(spark, t, stats_filter={"ts": (cut, None)})
    assert scanned.count() == 50  # one of four range files survives
    assert scanned.filter(F.col("ts") >= F.lit(cut)).count() == 50
