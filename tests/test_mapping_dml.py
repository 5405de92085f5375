"""Round-14 item 3: WRITE / UPDATE / MERGE / OPTIMIZE on columnMapping
Delta tables (previously the most likely real-table refusal —
columnMapping is on by default on current Databricks runtimes).

The staging path rewrites the frame to the table's PHYSICAL schema
(_to_physical_df — recursive physicalName rename, the exact inverse of
the mapping read path), so staged files store physical names like
delta-spark's own mapping-mode writer. Reads resolve through the
existing mapping layer; the fixture-written col-XX tables and the
upgrade-in-place tables both roundtrip.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.sources.delta_py import (
    alter_delta_rename_column,
    compact_delta,
    delete_where_delta,
    merge_delta,
    read_delta_py,
    replay_head_state,
    update_where_delta,
    write_delta,
    write_delta_column_mapping_fixture,
)


def _head_meta(spark, table_path: str) -> dict:
    _live, meta = replay_head_state(spark, table_path)
    return meta


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumnRenamed("id", "k")
        .withColumn("v", (F.col("k") * 2).cast("long"))
    )


def test_mapping_write_rename_merge_optimize_roundtrip(spark, tmp_path):
    """The verdict's done-criterion flow: write → rename column →
    append → merge → optimize → read exact."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 10), t, "overwrite", timestamp_ms=1_700_000_000_000)
    alter_delta_rename_column(spark, t, "v", "val")  # upgrades to mapping
    # append AFTER the upgrade: staged under physical name "v"
    write_delta(
        _df(spark, 10, 15).withColumnRenamed("v", "val"), t, "append",
        timestamp_ms=1_700_000_001_000,
    )
    got = read_delta_py(spark, t)
    assert got.columns == ["k", "val"]
    assert got.count() == 15
    # physical files must NOT contain the logical name: check a staged
    # file of the post-upgrade append stores "v"
    phys = spark.read.parquet(
        *[os.path.join(t, p) for p in os.listdir(t) if p.endswith(".parquet")]
    )
    assert "val" not in phys.columns and "v" in phys.columns
    # MERGE on the mapped table
    src = (
        spark.range(12, 18)
        .withColumnRenamed("id", "k")
        .withColumn("val", F.lit(-1).cast("long"))
    )
    merge_delta(spark, t, src, on=["k"], timestamp_ms=1_700_000_002_000)
    rows = {r["k"]: r["val"] for r in read_delta_py(spark, t).collect()}
    assert len(rows) == 18
    assert rows[13] == -1 and rows[17] == -1 and rows[5] == 10
    # UPDATE
    update_where_delta(spark, t, "k < 2", {"val": "val + 100"},
                       timestamp_ms=1_700_000_003_000)
    rows = {r["k"]: r["val"] for r in read_delta_py(spark, t).collect()}
    assert rows[0] == 100 and rows[1] == 102
    # OPTIMIZE (compaction rewrite stays physical)
    compact_delta(spark, t, timestamp_ms=1_700_000_004_000)
    rows2 = {r["k"]: r["val"] for r in read_delta_py(spark, t).collect()}
    assert rows2 == rows


def test_mapping_fixture_table_append_and_delete(spark, tmp_path):
    """Appending to a col-XX physical-name table (the modern Databricks
    shape) stores col-XX names in the new files too."""
    t = str(tmp_path / "t")
    write_delta_column_mapping_fixture(_df(spark, 0, 8), t)
    write_delta(_df(spark, 8, 12), t, "append", timestamp_ms=1_700_000_001_000)
    got = read_delta_py(spark, t)
    assert got.count() == 12
    assert set(got.columns) == {"k", "v"}
    # every data file under the table stores ONLY physical names
    import glob as _glob

    for p in _glob.glob(os.path.join(t, "**", "*.parquet"), recursive=True):
        if "_delta_log" in p:
            continue
        cols = set(spark.read.parquet(p).columns)
        assert cols <= {"col-01", "col-02"}, f"{p} stores {cols}"
    delete_where_delta(spark, t, "k IN (0, 9)", timestamp_ms=1_700_000_002_000)
    ks = {r["k"] for r in read_delta_py(spark, t).collect()}
    assert ks == set(range(1, 12)) - {9}


def test_mapping_schema_change_append_mints_ids(spark, tmp_path):
    """r15 verdict item 3: an APPEND that adds columns to a mapped
    table mints mapping ids (same path as the schema-changing
    overwrite) and commits the evolved metaData atomically with the
    adds — instead of the r14 refusal."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 5), t, "overwrite", timestamp_ms=1_700_000_000_000)
    alter_delta_rename_column(spark, t, "v", "val")
    extra = (
        _df(spark, 5, 8).withColumnRenamed("v", "val")
        .withColumn("extra", F.lit(1).cast("integer"))
    )
    # without merge_schema the unknown column refuses (delta-spark's
    # default), with it the append mints ids and evolves atomically
    with pytest.raises(NotImplementedError, match="merge_schema"):
        write_delta(extra, t, "append", timestamp_ms=1_700_000_001_000)
    write_delta(extra, t, "append", timestamp_ms=1_700_000_001_000,
                merge_schema=True)
    got = read_delta_py(spark, t)
    assert set(got.columns) == {"k", "val", "extra"}
    rows = {r["k"]: (r["val"], r["extra"]) for r in got.collect()}
    assert len(rows) == 8
    assert rows[2] == (4, None)   # pre-evolution rows: NULL extra
    assert rows[6] == (12, 1)
    # the new column carries a freshly minted id above the old max and
    # a col-<id> physical name; old columns keep theirs
    fields = json.loads(
        _head_meta(spark, t)["schemaString"]
    )["fields"]
    by_name = {f["name"]: f["metadata"] for f in fields}
    assert by_name["extra"]["delta.columnMapping.physicalName"].startswith("col-")
    assert int(by_name["extra"]["delta.columnMapping.id"]) > int(
        by_name["val"]["delta.columnMapping.id"]
    )
    # physical file of the append stores the PHYSICAL name, not "extra"
    phys = spark.read.parquet(
        *[os.path.join(t, p) for p in os.listdir(t) if p.endswith(".parquet")]
    )
    assert "extra" not in phys.columns


def test_mapping_subset_append_allowed(spark, tmp_path):
    """A df missing table columns is a plain subset append: staged
    files lack the column, readers inject NULL."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 4), t, "overwrite", timestamp_ms=1_700_000_000_000)
    alter_delta_rename_column(spark, t, "v", "val")
    write_delta(
        spark.range(4, 6).withColumnRenamed("id", "k"), t, "append",
        timestamp_ms=1_700_000_001_000,
    )
    rows = {r["k"]: r["val"] for r in read_delta_py(spark, t).collect()}
    assert len(rows) == 6 and rows[5] is None and rows[3] == 6


def test_mapping_partitioned_write_physical_partition_keys(spark, tmp_path):
    """partitionValues in the log are keyed by PHYSICAL name after an
    append to a mapped partitioned table."""
    t = str(tmp_path / "t")
    df = _df(spark, 0, 8).withColumn("p", (F.col("k") % 2).cast("string"))
    write_delta(df, t, "overwrite", partition_by=["p"],
                timestamp_ms=1_700_000_000_000)
    alter_delta_rename_column(spark, t, "p", "bucket")
    write_delta(
        _df(spark, 8, 10).withColumn("bucket", F.lit("0")), t, "append",
        timestamp_ms=1_700_000_001_000,
    )
    got = read_delta_py(spark, t)
    assert got.count() == 10
    # partition pruning by the NEW logical name still works
    assert read_delta_py(
        spark, t, partition_filter={"bucket": {"0"}}
    ).where("bucket = '0'").count() == 6
    # log check: the append's add carries physical partition key "p"
    log_dir = os.path.join(t, "_delta_log")
    last = sorted(p for p in os.listdir(log_dir) if p.endswith(".json"))[-1]
    adds = [
        json.loads(line)["add"]
        for line in open(os.path.join(log_dir, last))
        if '"add"' in line
    ]
    assert adds and all(list(a["partitionValues"]) == ["p"] for a in adds)


def test_mapping_schema_change_overwrite_mints_ids(spark, tmp_path):
    """r14 follow-up: a schema-CHANGING overwrite on a mapped table
    keeps old columns' mapping ids and mints fresh ones for new
    columns (schema-evolving APPEND mints too — r15,
    test_mapping_schema_change_append_mints_ids)."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 5), t, "overwrite", timestamp_ms=1_700_000_000_000)
    alter_delta_rename_column(spark, t, "v", "val")
    wide = _df(spark, 0, 6).withColumnRenamed("v", "val").withColumn(
        "extra", (F.col("k") + 1000).cast("long")
    )
    write_delta(wide, t, "overwrite", timestamp_ms=1_700_000_002_000)
    got = read_delta_py(spark, t)
    assert set(got.columns) == {"k", "val", "extra"}
    rows = {r["k"]: (r["val"], r["extra"]) for r in got.collect()}
    assert rows[5] == (10, 1005) and len(rows) == 6
    # mapping metadata: kept columns keep ids, new column got a fresh one
    from gcs2postgres_spark.sources.delta_py import replay_head_state

    _, meta = replay_head_state(spark, t)
    fields = {f["name"]: f for f in json.loads(meta["schemaString"])["fields"]}
    ids = {n: f["metadata"]["delta.columnMapping.id"] for n, f in fields.items()}
    phys = {
        n: f["metadata"]["delta.columnMapping.physicalName"]
        for n, f in fields.items()
    }
    assert phys["val"] == "v"  # kept: physical = pre-rename name
    assert phys["extra"].startswith("col-") and ids["extra"] > max(
        ids["k"], ids["val"]
    )
    # new files store the minted physical name, never "extra"
    import glob as _glob

    newest = max(
        (p for p in _glob.glob(os.path.join(t, "**", "*.parquet"), recursive=True)
         if "_delta_log" not in p),
        key=os.path.getmtime,
    )
    cols = set(spark.read.parquet(newest).columns)
    assert "extra" not in cols and phys["extra"] in cols
    # dropping a column also works: overwrite with (k) only
    write_delta(
        _df(spark, 0, 3).select("k"), t, "overwrite",
        timestamp_ms=1_700_000_003_000,
    )
    assert read_delta_py(spark, t).columns == ["k"]
    # time travel still resolves the dropped-era files (v2 = the wide
    # overwrite: v0 write, v1 rename, v2 wide, v3 drop)
    wide_era = read_delta_py(spark, t, version_as_of=2)
    assert wide_era.count() == 6 and set(wide_era.columns) == {"k", "val", "extra"}


def test_mapping_stats_skip_translates_names(spark, tmp_path):
    """r14: stats_filter keys are LOGICAL names; mapped tables record
    stats under PHYSICAL names — the reader translates, so file
    skipping works across a rename."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 100).repartition(4, "k"), t, "overwrite",
                timestamp_ms=1_700_000_000_000)
    alter_delta_rename_column(spark, t, "k", "key")
    # filter by the NEW logical name against stats recorded as "k"
    assert read_delta_py(
        spark, t, stats_filter={"key": (1000, None)}
    ).count() == 0
    got = read_delta_py(spark, t, stats_filter={"key": (50, None)}).where(
        "key >= 50"
    )
    assert got.count() == 50
