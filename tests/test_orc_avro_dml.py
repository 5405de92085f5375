"""r15 verdict item 5 (+ extension): Iceberg row-level deletes and DML
over ORC and Avro DATA files. Spark's native ORC scan exposes no
per-row position, so delete-bearing ORC files decode executor-side via
pyarrow.orc with explicit record ordinals (_scan_orc_groups), exactly
like the Avro decoder; the DML matching scan uses the same decoders, so
UPDATE/DELETE/MERGE work on ORC- and Avro-data tables (replacement
files commit as parquet — mixed formats are spec-legal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.sources.iceberg_py import (
    delete_where,
    read_iceberg_py,
    update_where,
    write_iceberg_v2_fixture,
)


def _df(spark):
    return (
        spark.range(0, 20)
        .withColumnRenamed("id", "k")
        .withColumn("v", (F.col("k") * 3).cast("long"))
        .repartition(3)
    )


@pytest.mark.parametrize("fmt", ["orc", "avro"])
def test_row_level_deletes_over_nonparquet_data(spark, tmp_path, fmt):
    t = str(tmp_path / fmt)
    write_iceberg_v2_fixture(
        _df(spark), t, sort_col="k",
        position_delete_keys=[2, 7, 11],
        equality_deletes=[({"k": 15}, 3)],
        data_format=fmt,
    )
    got = sorted(r["k"] for r in read_iceberg_py(spark, t).collect())
    assert got == [i for i in range(20) if i not in (2, 7, 11, 15)]


@pytest.mark.parametrize("fmt", ["orc", "avro"])
def test_dml_over_nonparquet_data(spark, tmp_path, fmt):
    t = str(tmp_path / fmt)
    write_iceberg_v2_fixture(
        _df(spark), t, sort_col="k", position_delete_keys=[2],
        data_format=fmt,
    )
    update_where(spark, t, "k = 4", {"v": "v + 1000"},
                 snapshot_ts_ms=1_700_000_000_000)
    delete_where(spark, t, "k >= 18", snapshot_ts_ms=1_700_000_001_000)
    rows = {r["k"]: r["v"] for r in read_iceberg_py(spark, t).collect()}
    assert sorted(rows) == [i for i in range(18) if i != 2]
    assert rows[4] == 1012 and rows[5] == 15
    # a second UPDATE must see the first one's parquet replacement AND
    # the remaining non-parquet files in one matching scan
    update_where(spark, t, "k = 4", {"v": "v + 1"},
                 snapshot_ts_ms=1_700_000_002_000)
    rows = {r["k"]: r["v"] for r in read_iceberg_py(spark, t).collect()}
    assert rows[4] == 1013


@pytest.mark.parametrize("fmt", ["orc", "avro"])
def test_rename_evolution_over_nonparquet_data(spark, tmp_path, fmt):
    """r16: a column RENAME during an ORC era reads correctly — the
    manifest's schema-id stamp ties each ORC file to its write-time
    schema, whose {field-id: write-time name} map resolves the file's
    columns to the CURRENT name by id (parquet got this in r10; ORC
    previously fell back to name resolution and read NULLs after a
    rename; Avro always carried field-ids and pins the invariant)."""
    from gcs2postgres_spark.sources.iceberg_py import (
        alter_iceberg_rename_column,
    )

    t = str(tmp_path / f"ren_{fmt}")
    write_iceberg_v2_fixture(_df(spark), t, sort_col="k", data_format=fmt)
    alter_iceberg_rename_column(t, "v", "value")
    got = read_iceberg_py(spark, t)
    assert set(got.columns) == {"k", "value"}
    rows = {r["k"]: r["value"] for r in got.collect()}
    # the renamed column carries VALUES, not NULLs
    assert rows == {i: i * 3 for i in range(20)}, rows


@pytest.mark.parametrize("fmt", ["orc"])
def test_rename_evolution_orc_with_deletes(spark, tmp_path, fmt):
    """Same invariant through the delete-bearing decode path
    (_scan_orc_groups + stamped idmap)."""
    from gcs2postgres_spark.sources.iceberg_py import (
        alter_iceberg_rename_column,
    )

    t = str(tmp_path / "ren_orc_del")
    write_iceberg_v2_fixture(
        _df(spark), t, sort_col="k", position_delete_keys=[3, 9],
        data_format=fmt,
    )
    alter_iceberg_rename_column(t, "v", "value")
    rows = {r["k"]: r["value"] for r in read_iceberg_py(spark, t).collect()}
    assert rows == {i: i * 3 for i in range(20) if i not in (3, 9)}, rows
