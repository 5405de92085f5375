"""Iceberg format-version 3: Puffin deletion vectors + row lineage.

Covers the spec's v3 row-level-delete model (public spec, "Version 3"
and the Puffin spec):

- Puffin codec roundtrip (magic, footer payload, DV frame CRC)
- upgrade_iceberg_format_version: v2 position-delete parquet files are
  CONVERTED to DVs (v3 forbids position-delete files); pure-metadata
  bump when no deletes exist
- v3 DELETE writes DVs, merging each file's existing DV (superset rule)
  and keeping AT MOST ONE DV per data file per snapshot
- reads apply DVs executor-side with the same sequence gating as
  position deletes; time travel to pre-upgrade snapshots still works
- row lineage: snapshots carry first-row-id, next-row-id advances by
  the added record count
- UPDATE on a v3 table routes its matched-row removal through DVs

Reference tie: snapshot resolution is the engine work the reference
delegates (src/db/db.go:22-43)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.sources import fsio
from gcs2postgres_spark.sources.avro_py import read_avro_file
from gcs2postgres_spark.sources.iceberg_py import (
    append_iceberg_v2,
    delete_where,
    latest_metadata_file,
    read_iceberg_py,
    update_where,
    upgrade_iceberg_format_version,
    write_iceberg_v2_fixture,
)
from gcs2postgres_spark.sources.puffin import (
    frame_dv,
    read_dv_frame,
    read_puffin_footer,
    write_puffin_dv_file,
)


def _mk(spark, path, n=40):
    df = spark.range(0, n).withColumnRenamed("id", "k").withColumn(
        "v", (F.col("k") * 2).cast("long")
    )
    write_iceberg_v2_fixture(df, path, sort_col="k")


def _meta(path):
    return json.loads(fsio.read_text(latest_metadata_file(path)))


def _head_dv_refs(path):
    meta = _meta(path)
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mrows = read_avro_file(snap["manifest-list"])
    refs = []
    for m in mrows:
        _, es = read_avro_file(m["manifest_path"])
        for e in es:
            df_ = e["data_file"]
            if e["status"] != 2 and df_.get("file_format", "").lower() == "puffin":
                refs.append(df_["referenced_data_file"])
    return refs


# ------------------------------------------------------------- puffin codec


def test_puffin_dv_file_roundtrip(tmp_path):
    p = str(tmp_path / "x.puffin")
    res = write_puffin_dv_file(
        p, [("/data/a.parquet", [3, 1, 2, 2]), ("/data/b.parquet", [10])],
        snapshot_id=7, sequence_number=9,
    )
    raw = open(p, "rb").read()
    assert raw[:4] == b"PFA1" and raw[-4:] == b"PFA1"
    off, size, card = res["/data/a.parquet"]
    assert card == 3
    assert read_dv_frame(raw, off, size) == [1, 2, 3]
    off2, size2, _ = res["/data/b.parquet"]
    assert read_dv_frame(raw, off2, size2) == [10]
    footer = read_puffin_footer(raw)
    assert [b["type"] for b in footer["blobs"]] == ["deletion-vector-v1"] * 2
    blob = footer["blobs"][0]
    assert blob["properties"]["referenced-data-file"] == "/data/a.parquet"
    assert blob["properties"]["cardinality"] == "3"
    assert (blob["offset"], blob["length"]) == (off, size)
    assert blob["snapshot-id"] == 7 and blob["sequence-number"] == 9


def test_puffin_dv_frame_rejects_corruption(tmp_path):
    frame = frame_dv([1, 5])
    # flipped payload byte -> CRC mismatch
    bad = bytearray(frame)
    bad[6] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        read_dv_frame(bytes(bad), 0, len(frame))
    # descriptor size disagreeing with the frame's length word
    with pytest.raises(ValueError, match="content_size_in_bytes"):
        read_dv_frame(frame, 0, len(frame) + 4)


# ------------------------------------------------------------ upgrade to v3


def test_upgrade_converts_position_deletes(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)
    delete_where(spark, t, "k >= 35", snapshot_ts_ms=1_700_000_001_000)
    sid = upgrade_iceberg_format_version(spark, t, snapshot_ts_ms=1_700_000_002_000)
    assert sid is not None
    meta = _meta(t)
    assert meta["format-version"] == 3 and meta["next-row-id"] == 0
    assert sorted(r["k"] for r in read_iceberg_py(spark, t).collect()) == list(
        range(35)
    )
    # the converted head carries DVs, no parquet position-delete entries
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mrows = read_avro_file(snap["manifest-list"])
    for m in mrows:
        _, es = read_avro_file(m["manifest_path"])
        for e in es:
            df_ = e["data_file"]
            if e["status"] != 2 and df_.get("content", 0) == 1:
                assert df_["file_format"].lower() == "puffin"
    # time travel to the PRE-upgrade snapshot still applies the parquet
    # position deletes (old snapshots are immutable)
    pre = sorted(s["snapshot-id"] for s in meta["snapshots"])[-2]
    assert read_iceberg_py(spark, t, snapshot_id=pre).count() == 35


def test_upgrade_without_deletes_is_metadata_only(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=10)
    n_snaps = len(_meta(t)["snapshots"])
    assert upgrade_iceberg_format_version(spark, t) is None
    meta = _meta(t)
    assert meta["format-version"] == 3
    assert len(meta["snapshots"]) == n_snaps  # no new snapshot
    assert read_iceberg_py(spark, t).count() == 10


def test_upgrade_refuses_v3_table(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=5)
    upgrade_iceberg_format_version(spark, t)
    with pytest.raises(ValueError, match="already format-version 3"):
        upgrade_iceberg_format_version(spark, t)


# --------------------------------------------------------------- v3 deletes


def test_v3_delete_writes_merged_dvs(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)
    delete_where(spark, t, "k >= 35", snapshot_ts_ms=1_700_000_001_000)
    upgrade_iceberg_format_version(spark, t, snapshot_ts_ms=1_700_000_002_000)
    delete_where(spark, t, "k < 5", snapshot_ts_ms=1_700_000_003_000)
    assert sorted(r["k"] for r in read_iceberg_py(spark, t).collect()) == list(
        range(5, 35)
    )
    # superset merge kept at most one DV per data file
    refs = _head_dv_refs(t)
    assert len(refs) == len(set(refs))
    # repeated predicate: true no-op (existing DV already covers it)
    assert delete_where(spark, t, "k < 5", snapshot_ts_ms=1_700_000_004_000) is None


def test_v3_update_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=20)
    upgrade_iceberg_format_version(spark, t)
    update_where(
        spark, t, "k >= 18", {"v": "v + 1000"}, snapshot_ts_ms=1_700_000_003_000
    )
    rows = {r["k"]: r["v"] for r in read_iceberg_py(spark, t).collect()}
    assert len(rows) == 20
    assert rows[19] == 2 * 19 + 1000 and rows[17] == 2 * 17
    # the matched-row removal went through a DV, not a parquet delete
    assert _head_dv_refs(t)


def test_v3_row_lineage_advances(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=8)
    upgrade_iceberg_format_version(spark, t)
    assert _meta(t)["next-row-id"] == 0
    append_iceberg_v2(
        spark, t,
        spark.range(100, 107).withColumnRenamed("id", "k").withColumn(
            "v", (F.col("k") * 2).cast("long")
        ),
        snapshot_ts_ms=1_700_000_004_000,
    )
    meta = _meta(t)
    assert meta["next-row-id"] == 7
    head = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert head["first-row-id"] == 0
    # a DELETE adds no rows: first-row-id stays at the watermark
    delete_where(spark, t, "k = 100", snapshot_ts_ms=1_700_000_005_000)
    meta = _meta(t)
    head = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert meta["next-row-id"] == 7 and head["first-row-id"] == 7


def test_v3_refuses_stray_position_deletes(spark, tmp_path):
    """A hand-upgraded table that still carries parquet position-delete
    files must be refused loudly (spec: v3 position deletes are DVs)."""
    t = str(tmp_path / "t")
    _mk(spark, t, n=10)
    delete_where(spark, t, "k = 1", snapshot_ts_ms=1_700_000_001_000)
    # flip format-version WITHOUT converting (what a buggy tool would do)
    mp = latest_metadata_file(t)
    meta = json.loads(fsio.read_text(mp))
    meta["format-version"] = 3
    v = int(os.path.basename(mp).split(".")[0].lstrip("v")) + 1
    with open(os.path.join(t, "metadata", f"v{v}.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(t, "metadata", "version-hint.text"), "w") as f:
        f.write(str(v))
    with pytest.raises(ValueError, match="deletion vectors"):
        delete_where(spark, t, "k = 2")


def test_v3_column_defaults(spark, tmp_path):
    """v3 "Default values": files written BEFORE the column existed read
    initial-default (not NULL); defaults on v2 tables are refused."""
    from gcs2postgres_spark.sources.iceberg_py import alter_iceberg_add_column

    t = str(tmp_path / "t")
    _mk(spark, t, n=6)
    with pytest.raises(ValueError, match="format-version-3"):
        alter_iceberg_add_column(t, "tier", "string", default="bronze")
    upgrade_iceberg_format_version(spark, t)
    alter_iceberg_add_column(t, "tier", "string", default="bronze")
    alter_iceberg_add_column(t, "score", "long", default=100)
    rows = read_iceberg_py(spark, t).collect()
    assert all(r["tier"] == "bronze" and r["score"] == 100 for r in rows)
    # new writes that carry values keep them; old files keep the default
    append_iceberg_v2(
        spark, t,
        spark.createDataFrame([(900, 1800, "gold", 5)], "k long, v long, tier string, score long"),
        snapshot_ts_ms=1_700_000_006_000,
    )
    by_k = {r["k"]: (r["tier"], r["score"]) for r in read_iceberg_py(spark, t).collect()}
    assert by_k[900] == ("gold", 5) and by_k[0] == ("bronze", 100)
    # a v3 DELETE over the defaulted frame works (predicate on the
    # defaulted column routes through the same tagged scan)
    delete_where(spark, t, "score = 100 AND k < 2", snapshot_ts_ms=1_700_000_007_000)
    assert read_iceberg_py(spark, t).count() == 5


def test_facade_v3_upgrade(spark, tmp_path):
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    t = str(tmp_path / "t")
    _mk(spark, t, n=12)
    delete_where(spark, t, "k >= 10", snapshot_ts_ms=1_700_000_001_000)
    lakehouse_sql(
        spark, f"ALTER TABLE iceberg.`{t}` SET TBLPROPERTIES ('format-version' = '3')"
    )
    assert _meta(t)["format-version"] == 3
    assert _head_dv_refs(t)  # position deletes converted
    assert read_iceberg_py(spark, t).count() == 10


def test_v3_row_id_materialization(spark, tmp_path):
    """_row_id = first_row_id + physical position; stable across DV
    deletes; NULL for pre-lineage files; unique across appends."""
    from gcs2postgres_spark.sources.iceberg_py import read_iceberg_with_row_ids

    t = str(tmp_path / "t")
    _mk(spark, t, n=8)  # pre-lineage files: NULL ids
    upgrade_iceberg_format_version(spark, t)
    append_iceberg_v2(
        spark, t,
        spark.range(100, 110).withColumnRenamed("id", "k").withColumn(
            "v", (F.col("k") * 2).cast("long")
        ),
        snapshot_ts_ms=1_700_000_004_000,
    )
    append_iceberg_v2(
        spark, t,
        spark.range(200, 205).withColumnRenamed("id", "k").withColumn(
            "v", (F.col("k") * 2).cast("long")
        ),
        snapshot_ts_ms=1_700_000_005_000,
    )
    rows = read_iceberg_with_row_ids(spark, t).collect()
    assert len(rows) == 23
    pre = [r for r in rows if r["k"] < 100]
    post = [r for r in rows if r["k"] >= 100]
    assert all(r["_row_id"] is None for r in pre)  # unassigned (spec)
    ids = [r["_row_id"] for r in post]
    assert None not in ids and len(set(ids)) == 15
    assert sorted(ids) == list(range(15))  # two blocks carved [0,10)+[10,15)
    # DV delete: surviving rows KEEP their ids
    before = {r["k"]: r["_row_id"] for r in post}
    delete_where(spark, t, "k IN (101, 203)", snapshot_ts_ms=1_700_000_006_000)
    after = {
        r["k"]: r["_row_id"]
        for r in read_iceberg_with_row_ids(spark, t).collect()
        if r["k"] >= 100
    }
    assert len(after) == 13
    assert all(after[k] == before[k] for k in after)
