"""Format round-trip (FIXTURES.md): the same rows written as parquet, csv,
json must produce identical reconciled output (reference supports
CSV/JSON/Parquet/Avro/Iceberg — README.md:11; Avro/Iceberg need runtime
jars and are skipped if absent)."""

from __future__ import annotations

import pytest

from gcs2postgres_spark.reconcile import reconcile_to_target
from gcs2postgres_spark.sources.readers import format_from_extension, read_source, table_id_from_path

TARGET = [("r_regionkey", "integer"), ("r_name", "text")]


@pytest.fixture(scope="module")
def region_df(spark, sf_dir):
    return read_source(spark, f"{sf_dir}/region.parquet")


def _normalized(df):
    out = reconcile_to_target(df, TARGET)
    return sorted((r["r_regionkey"], r["r_name"]) for r in out.collect())


def test_format_from_extension():
    assert format_from_extension("gs://b/data/region.parquet") == "parquet"
    assert format_from_extension("x.CSV".lower()) == "csv"
    assert format_from_extension("a/b.jsonl") == "json"
    with pytest.raises(ValueError):
        format_from_extension("x.xlsx")


def test_table_id_from_path():
    # reference src/db/db.go:23: basename minus extension
    assert table_id_from_path("gs://bucket/path/regions.parquet") == "regions"


def test_round_trip_csv_json_parquet(spark, region_df, tmp_path):
    base = _normalized(region_df)
    assert len(base) == 5

    csv_path = str(tmp_path / "region_csv")
    json_path = str(tmp_path / "region_json")
    pq_path = str(tmp_path / "region_pq")
    region_df.coalesce(1).write.option("header", True).csv(csv_path)
    region_df.coalesce(1).write.json(json_path)
    region_df.coalesce(1).write.parquet(pq_path)

    assert _normalized(read_source(spark, csv_path, fmt="csv")) == base
    assert _normalized(read_source(spark, json_path, fmt="json")) == base
    assert _normalized(read_source(spark, pq_path, fmt="parquet")) == base


def test_round_trip_orc(spark, region_df, tmp_path):
    base = _normalized(region_df)
    orc_path = str(tmp_path / "region_orc")
    region_df.coalesce(1).write.orc(orc_path)
    assert _normalized(read_source(spark, orc_path, fmt="orc")) == base


def test_round_trip_avro_if_available(spark, region_df, tmp_path):
    base = _normalized(region_df)
    avro_path = str(tmp_path / "region_avro")
    try:
        region_df.coalesce(1).write.format("avro").save(avro_path)
    except Exception:
        pytest.skip("spark-avro jar not on classpath")
    assert _normalized(read_source(spark, avro_path, fmt="avro")) == base


def test_register_view(spark, sf_dir):
    read_source(spark, f"{sf_dir}/region.parquet", register_view=True)
    assert spark.sql("SELECT count(*) AS n FROM region").collect()[0]["n"] == 5
