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


@pytest.fixture(scope="module")
def avro_fixture(spark, region_df, tmp_path_factory):
    """region rows written as a 2-part .avro directory via the pure-Python
    container writer (deflate codec, the reference's own sample format —
    reference config.yaml:15-17)."""
    from gcs2postgres_spark.sources.avro_py import spark_to_avro_schema, write_avro_file

    d = tmp_path_factory.mktemp("region_avro")
    schema = spark_to_avro_schema(region_df.schema, "region")
    records = [r.asDict() for r in region_df.collect()]
    write_avro_file(str(d / "part-0.avro"), schema, records[:3])
    write_avro_file(str(d / "part-1.avro"), schema, records[3:])
    return str(d), schema, records


def test_round_trip_avro(spark, region_df, avro_fixture):
    """read_source(fmt=avro) on a jar-less classpath falls back to the
    distributed pure-Python reader and must reconcile identically to
    parquet."""
    base = _normalized(region_df)
    path, _, _ = avro_fixture
    assert _normalized(read_source(spark, path, fmt="avro")) == base


def test_avro_java_reads_our_files(spark, avro_fixture):
    """Spec conformance, not self-consistency: the JVM's reference Avro
    implementation (org.apache.avro, bundled with Spark) must read the
    pure-Python writer's output value-for-value."""
    import glob

    path, _, records = avro_fixture
    jvm = spark._jvm
    got = []
    for f in sorted(glob.glob(f"{path}/*.avro")):
        dr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        while dr.hasNext():
            r = dr.next()
            got.append((r.get("r_regionkey"), str(r.get("r_name"))))
        dr.close()
    assert sorted(got) == sorted((r["r_regionkey"], r["r_name"]) for r in records)


def test_avro_our_reader_reads_java_files(spark, avro_fixture, tmp_path):
    """Reverse direction: a deflate-coded file written by the Java Avro
    reference implementation decodes identically with the pure-Python
    codec."""
    import json

    from gcs2postgres_spark.sources.avro_py import read_avro_file

    _, schema, records = avro_fixture
    jvm = spark._jvm
    js = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(schema))
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(js)
    )
    w.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    out = str(tmp_path / "java.avro")
    w.create(js, jvm.java.io.File(out))
    rec = jvm.org.apache.avro.generic.GenericData.Record(js)
    for r in records:
        for k, v in r.items():
            rec.put(k, v)
        w.append(rec)
    w.close()
    _, got = read_avro_file(out)
    assert [(r["r_regionkey"], r["r_name"]) for r in got] == [
        (r["r_regionkey"], r["r_name"]) for r in records
    ]


def test_iceberg_missing_jar_clear_error(spark, tmp_path):
    """The reference lists iceberg (README.md:11); without the runtime jar
    the reader must fail with an actionable message naming the package,
    not a raw ClassNotFoundException."""
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_source(spark, str(tmp_path / "t"), fmt="iceberg")


def test_register_view(spark, sf_dir):
    read_source(spark, f"{sf_dir}/region.parquet", register_view=True)
    assert spark.sql("SELECT count(*) AS n FROM region").collect()[0]["n"] == 5
