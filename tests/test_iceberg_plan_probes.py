"""Round-14 close-out of the r13 ``weak`` flag: Iceberg scan planning
must NOT footer-probe every data file. Every manifest this build writes
stamps its write-time schema ("schema" + "schema-id") into the Avro
header — the same facts the Java writer records — so the planner groups
files by RECORDED schema id: zero driver-side parquet opens at plan
time, O(1) in data-file count. The footer probe survives only as the
per-file fallback for unstamped (foreign/legacy) manifests.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.sources.iceberg_py import (
    alter_iceberg_rename_column,
    alter_iceberg_widen_column,
    append_iceberg_v2,
    create_iceberg_v2_table,
    read_iceberg_py,
)


def _df(spark, lo, hi, cast="int"):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").cast("long").alias("k"),
            (F.col("id") * 2).cast(cast).alias("v"),
        )
    )


@pytest.fixture
def probe_counter(monkeypatch):
    import pyarrow.parquet as pq

    calls: list = []
    real = pq.ParquetFile

    class Counting(real):
        def __init__(self, *a, **k):
            calls.append(a[0] if a else None)
            super().__init__(*a, **k)

    monkeypatch.setattr(pq, "ParquetFile", Counting)
    return calls


def test_plan_time_footer_opens_zero_for_own_tables(spark, tmp_path, probe_counter):
    t = str(tmp_path / "t")
    create_iceberg_v2_table(_df(spark, 0, 1).schema, t)
    for lo in range(0, 40, 10):  # 4 appends → 4 stamped manifests
        append_iceberg_v2(spark, t, _df(spark, lo, lo + 10),
                          snapshot_ts_ms=1_700_000_000_000 + lo)
    probe_counter.clear()
    df = read_iceberg_py(spark, t)  # planning happens HERE (driver)
    assert probe_counter == [], (
        f"scan planning opened {len(probe_counter)} parquet footers — "
        "schema-id grouping must make this 0"
    )
    assert df.count() == 40


def test_rename_evolution_reads_without_probes(spark, tmp_path, probe_counter):
    t = str(tmp_path / "t")
    create_iceberg_v2_table(_df(spark, 0, 1).schema, t)
    append_iceberg_v2(spark, t, _df(spark, 0, 5), snapshot_ts_ms=1_700_000_000_000)
    alter_iceberg_rename_column(t, "v", "value")
    append_iceberg_v2(
        spark, t,
        _df(spark, 5, 8).withColumnRenamed("v", "value"),
        snapshot_ts_ms=1_700_000_001_000,
    )
    probe_counter.clear()
    got = read_iceberg_py(spark, t)
    assert probe_counter == []
    rows = {r["k"]: r["value"] for r in got.collect()}
    # pre-rename files resolve by the OLD name through the manifest's
    # recorded schema (id-based resolution without parquet field ids)
    assert rows[2] == 4 and rows[7] == 14 and len(rows) == 8


def test_type_promotion_mixed_width_without_probes(spark, tmp_path, probe_counter):
    t = str(tmp_path / "t")
    create_iceberg_v2_table(_df(spark, 0, 1, cast="int").schema, t)
    append_iceberg_v2(spark, t, _df(spark, 0, 5, cast="int"),
                      snapshot_ts_ms=1_700_000_000_000)
    alter_iceberg_widen_column(t, "v", "long")
    append_iceberg_v2(spark, t, _df(spark, 5, 8, cast="long"),
                      snapshot_ts_ms=1_700_000_001_000)
    probe_counter.clear()
    got = read_iceberg_py(spark, t)
    assert probe_counter == []
    assert dict(got.dtypes)["v"] == "bigint"
    rows = {r["k"]: r["v"] for r in got.collect()}
    assert rows[2] == 4 and rows[7] == 14 and len(rows) == 8


def test_unstamped_manifests_still_probe_and_read(spark, tmp_path):
    """Legacy/foreign manifests without the schema stamp keep the
    footer-probe fallback — same results, just per-file IO."""
    from gcs2postgres_spark.sources.iceberg_py import write_iceberg_v2_fixture

    t = str(tmp_path / "t")
    df = spark.range(0, 10).withColumnRenamed("id", "k").withColumn(
        "v", (F.col("k") * 2).cast("long")
    )
    write_iceberg_v2_fixture(df, t, sort_col="k")
    assert read_iceberg_py(spark, t).count() == 10


def test_dml_matching_scan_zero_probes(spark, tmp_path, probe_counter):
    """DELETE/UPDATE's matching scan groups by recorded schema-id too —
    a range-targeted DML on a 10^5-file table must not footer-probe."""
    from gcs2postgres_spark.sources.iceberg_py import delete_where

    t = str(tmp_path / "t")
    create_iceberg_v2_table(_df(spark, 0, 1).schema, t)
    for lo in range(0, 30, 10):
        append_iceberg_v2(spark, t, _df(spark, lo, lo + 10),
                          snapshot_ts_ms=1_700_000_000_000 + lo)
    probe_counter.clear()
    delete_where(spark, t, "k IN (5, 25)", snapshot_ts_ms=1_700_000_001_000)
    # the only footer opens allowed are the freshly STAGED position-
    # delete files' non-empty checks — bounded by THIS commit's output
    # (O(staged), same class as stats collection), never by table size
    data_probes = [p for p in probe_counter if "/delete-" not in str(p)]
    assert data_probes == [], (
        f"DML planning opened {len(data_probes)} DATA footers: {data_probes}"
    )
    assert read_iceberg_py(spark, t).count() == 28
