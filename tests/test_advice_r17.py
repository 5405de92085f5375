"""Round-17 regression pins for the r16 ADVICE findings:

1. (med) _fills_file_index keyed its broadcast file->partition map by
   _norm_path alone; a relative table_path (or a _resolve rebase of a
   MOVED table onto a non-normalized path) made the map keys disagree
   with Spark's absolute, normalized ``_metadata.file_path`` and the
   inner join silently dropped EVERY row. Now scheme-less keys get
   os.path.abspath (the delta twin _scan_file_index's exact rule).
2. (med) sync_uniform_iceberg wrote last-column-id as the max over
   TOP-LEVEL field ids only, and _delta_mapping_to_iceberg minted
   nested list/map element ids past max(schema ids) rather than
   delta.columnMapping.maxColumnId — nested/minted ids could exceed
   the recorded last-column-id and dropped-column ids could be
   re-minted, letting a catalog-committing foreign engine mint a
   COLLIDING field id. Now last-column-id = max over ALL ids (nested
   and minted included, plus maxColumnId), and minting seeds from
   maxColumnId when the table records it.
3. (low) _micros parsed tz-naive timestamp partitionValues as UTC, but
   delta-spark serializes them in the SESSION timezone — UniForm-
   syncing a foreign-written timestamp-partitioned table from a
   non-UTC writer shifted partition values by the tz offset. Now the
   sync interprets them in the current session's timezone (this repo's
   own sessions pin UTC, so repo-written tables are unaffected).
4. (low) the SQL facade's iceberg.<cat>.<ns>.<tbl> rewrite ran over the
   raw statement: the pattern INSIDE a string literal (or with no
   catalog registered at all) was rewritten/raised, corrupting valid
   SELECTs. Now literal spans are skipped and only REGISTERED catalog
   names rewrite; everything else falls through verbatim.
5. (low) version_at_timestamp SKIPPED commits lacking commitInfo, so a
   table whose commits all omit it (commitInfo is optional per
   protocol) made every TIMESTAMP AS OF raise. Now such commits anchor
   at their log file's modification time — delta-spark's
   DeltaHistoryManager fallback — still under the running-max
   monotonization.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. (med) _fills_file_index: non-normalized / rebased paths keep their rows
# ---------------------------------------------------------------------------

def test_fills_file_index_survives_moved_table_nonnormalized_path(
    spark, tmp_path
):
    from gcs2postgres_spark.sources.delta_py import write_delta
    from gcs2postgres_spark.sources.iceberg_py import (
        read_iceberg_py,
        sync_uniform_iceberg,
    )

    src = str(tmp_path / "a" / "t")
    df = spark.range(0, 400).selectExpr(
        "id AS k", "CAST(id % 40 AS LONG) AS bucket"
    )
    # 40 partition tuples > _MAX_UNION_ARMS=32 forces the fills branch
    # onto the broadcast file-index plan — the code path under test
    write_delta(df.repartition("bucket"), src, "overwrite",
                partition_by=["bucket"], timestamp_ms=1_700_000_000_000)
    sync_uniform_iceberg(spark, src, snapshot_ts_ms=1_700_000_001_000)

    # move the table, then read it via a NON-NORMALIZED path: _resolve
    # rebases every manifest path onto this string, so without abspath
    # the broadcast-map keys keep the ".." while _metadata.file_path is
    # normalized — the old code dropped all 400 rows here
    dst = str(tmp_path / "b" / "t")
    os.makedirs(str(tmp_path / "b" / "x"), exist_ok=True)
    shutil.move(src, dst)
    crooked = os.path.join(str(tmp_path), "b", "x", "..", "t")
    got = read_iceberg_py(spark, crooked)
    rows = got.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    assert len(rows) == 40 and all(r["n"] == 10 for r in rows)
    assert got.count() == 400


# ---------------------------------------------------------------------------
# 2. (med) last-column-id dominates nested/minted ids; minting seeds from
#    delta.columnMapping.maxColumnId
# ---------------------------------------------------------------------------

def test_mapping_minted_ids_seed_from_max_column_id():
    from gcs2postgres_spark.sources.iceberg_py import (
        _delta_mapping_to_iceberg,
        _max_field_id,
    )

    delta_schema = {
        "type": "struct",
        "fields": [
            {
                "name": "k",
                "type": "long",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-aaaa",
                },
            },
            {
                "name": "tags",
                "type": {
                    "type": "array",
                    "elementType": "string",
                    "containsNull": True,
                },
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-bbbb",
                },
            },
        ],
    }
    # a table that DROPPED columns records maxColumnId above the live
    # schema's max id (here: 7 > 2); minted element ids must start
    # past it, or a re-minted id collides with the dropped column's
    logical, physical, _nm = _delta_mapping_to_iceberg(
        delta_schema, max_column_id=7
    )
    elem_id = next(
        f["type"]["element-id"]
        for f in logical["fields"]
        if f["name"] == "tags"
    )
    assert elem_id == 8  # minted AFTER maxColumnId, not after max(1, 2)
    assert _max_field_id(logical) == 8
    # the physical twin mints identically
    assert _max_field_id(physical) == 8


def test_uniform_last_column_id_dominates_all_ids(spark, tmp_path):
    from gcs2postgres_spark.sources.delta_py import (
        alter_delta_rename_column,
        write_delta,
    )
    from gcs2postgres_spark.sources.iceberg_py import (
        _max_field_id,
        latest_metadata_file,
        sync_uniform_iceberg,
    )

    t = str(tmp_path / "t_ids")
    df = spark.range(0, 8).selectExpr(
        "id AS k",
        "array(CAST(id AS STRING)) AS tags",
        "map('a', id) AS m",
        "id * 2 AS v",
    )
    write_delta(df, t, "overwrite", timestamp_ms=1_700_000_000_000)
    # rename upgrades the table to columnMapping (stamps ids + maxColumnId)
    alter_delta_rename_column(spark, t, "v", "val")
    sync_uniform_iceberg(spark, t, snapshot_ts_ms=1_700_000_001_000)
    meta = json.loads(open(latest_metadata_file(t)).read())
    schema = next(
        s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
    )
    # array element + map key/value ids are MINTED past the mapping ids;
    # last-column-id must dominate every one of them
    assert _max_field_id(schema) > max(f["id"] for f in schema["fields"])
    assert meta["last-column-id"] >= _max_field_id(schema)


# ---------------------------------------------------------------------------
# 3. (low) timestamp partitionValues interpret in the SESSION timezone
# ---------------------------------------------------------------------------

def test_uniform_timestamp_partition_honors_session_tz(spark, tmp_path):
    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta
    from gcs2postgres_spark.sources.iceberg_py import (
        read_iceberg_py,
        sync_uniform_iceberg,
    )

    t = str(tmp_path / "t_tsz")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # +05:30 (half-hour offset catches sign AND granularity bugs):
        # delta-spark serializes tz-naive timestamp partitionValues in
        # the session tz, and Spark's partitionBy dirs do the same here
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        df = spark.sql(
            "SELECT id AS k, "
            "CASE WHEN id < 4 THEN timestamp'2024-03-01 10:00:00' "
            "     ELSE timestamp'2024-03-02 10:00:00' END AS ts "
            "FROM range(0, 8)"
        )
        write_delta(df.repartition("ts"), t, "overwrite",
                    partition_by=["ts"], timestamp_ms=1_700_000_000_000)
        sync_uniform_iceberg(spark, t, snapshot_ts_ms=1_700_000_001_000)
        a = sorted(
            (r["k"], r["ts"]) for r in read_delta_py(spark, t).collect()
        )
        b = sorted(
            (r["k"], r["ts"]) for r in read_iceberg_py(spark, t).collect()
        )
        # old code parsed the wall-clock strings as UTC: every iceberg-
        # side ts came back 5h30m late vs the delta reader
        assert a == b and len(a) == 8
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


# ---------------------------------------------------------------------------
# 4. (low) facade: catalog-identifier rewrite skips literals + unknown cats
# ---------------------------------------------------------------------------

def test_facade_cat_pattern_inside_literal_passes_through(spark):
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    # the pattern as DATA (no catalog registered at all): the old code
    # raised "no REST catalog registered as 'cat'" mid-rewrite
    out = lakehouse_sql(
        spark, "SELECT 'iceberg.cat.ns.tbl' AS s, 1 AS one"
    )
    rows = out.collect()
    assert rows[0]["s"] == "iceberg.cat.ns.tbl" and rows[0]["one"] == 1


def test_facade_unregistered_catalog_falls_through(spark):
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    # unregistered catalog name OUTSIDE a literal: must NOT be
    # rewritten by the facade (falls through to Spark, which reports
    # its own missing-table error — not a facade rewrite crash)
    with pytest.raises(Exception) as ei:
        lakehouse_sql(spark, "SELECT * FROM iceberg.nosuch.ns.tbl")
    assert "no REST catalog" not in str(ei.value)


def test_facade_literal_skip_keeps_real_catalog_rewrites(spark, tmp_path):
    # a REGISTERED catalog identifier still rewrites even when the same
    # text also appears inside a literal in the same statement
    from gcs2postgres_spark.sources import rest_catalog
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    class _FakeClient:
        def read(self, spark_, ns, tbl, snapshot_id=None, as_of_ms=None,
                 ref=None):
            return spark_.range(0, 3).selectExpr("id AS k")

    rest_catalog.register_catalog("advcat", _FakeClient())
    try:
        out = lakehouse_sql(
            spark,
            "SELECT count(*) AS n, 'iceberg.advcat.ns.t' AS tag "
            "FROM iceberg.advcat.ns.t",
        )
        row = out.collect()[0]
        assert row["n"] == 3 and row["tag"] == "iceberg.advcat.ns.t"
    finally:
        rest_catalog._CATALOGS.pop("advcat", None)


# ---------------------------------------------------------------------------
# 5. (low) version_at_timestamp: mtime fallback for commitInfo-less commits
# ---------------------------------------------------------------------------

def test_version_at_timestamp_all_commits_lack_commitinfo(spark, tmp_path):
    from gcs2postgres_spark.sources.delta_py import (
        version_at_timestamp,
        write_delta,
    )

    t = str(tmp_path / "t_noci_all")
    df = spark.range(0, 3).selectExpr("id AS k")
    write_delta(df, t, "overwrite", timestamp_ms=1000)
    write_delta(df, t, "append", timestamp_ms=2000)
    write_delta(df, t, "append", timestamp_ms=3000)
    log = os.path.join(t, "_delta_log")
    for v in range(3):
        c = os.path.join(log, f"{v:020d}.json")
        lines = [
            ln for ln in open(c).read().splitlines()
            if ln.strip() and "commitInfo" not in ln
        ]
        with open(c, "w") as f:
            f.write("\n".join(lines) + "\n")
        # pin each commit file's mtime: the only timestamps left
        os.utime(c, ((v + 1) * 10, (v + 1) * 10))  # 10 s, 20 s, 30 s
    # old code skipped every commit and raised for ANY target
    assert version_at_timestamp(t, 10_000) == 0
    assert version_at_timestamp(t, 19_999) == 0
    assert version_at_timestamp(t, 20_000) == 1
    assert version_at_timestamp(t, 99_999_999) == 2
    with pytest.raises(ValueError):
        version_at_timestamp(t, 9_999)
