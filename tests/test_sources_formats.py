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


def test_avro_logical_types_roundtrip_codec(tmp_path):
    """date / timestamp-micros / decimal(bytes) logicalType annotations
    must decode to typed Python values and re-encode losslessly —
    including pre-epoch dates, negative decimals, and nulls (the
    reference's own supplier.avro carries such columns,
    reference config.yaml:15-17)."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import types as T

    from gcs2postgres_spark.sources.avro_py import (
        avro_to_spark_type,
        read_avro_file,
        spark_to_avro_schema,
        write_avro_file,
    )

    st = T.StructType(
        [
            T.StructField("d", T.DateType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("dec", T.DecimalType(12, 2), True),
        ]
    )
    schema = spark_to_avro_schema(st, "row")
    assert schema["fields"][0]["type"][1] == {"type": "int", "logicalType": "date"}
    assert schema["fields"][1]["type"][1] == {
        "type": "long",
        "logicalType": "timestamp-micros",
    }
    assert schema["fields"][2]["type"][1]["logicalType"] == "decimal"
    recs = [
        {
            "d": dt.date(2024, 2, 29),
            "ts": dt.datetime(2024, 2, 29, 12, 30, 5, 123456),
            "dec": Decimal("-12345.67"),
        },
        {"d": None, "ts": None, "dec": None},
        {
            "d": dt.date(1969, 12, 31),  # pre-epoch: negative days
            "ts": dt.datetime(1969, 12, 31, 23, 59, 59),
            "dec": Decimal("0.00"),
        },
    ]
    p = str(tmp_path / "logical.avro")
    write_avro_file(p, schema, recs)
    got_schema, got = read_avro_file(p)
    assert got == recs
    assert avro_to_spark_type(got_schema) == st


def test_avro_logical_types_java_base_encoding(spark, tmp_path):
    """Spec conformance of the logical encodings: the JVM reference Avro
    implementation (no conversions registered → raw base values) must
    see exactly the spec's base representation — days-since-epoch int,
    micros-since-epoch long, big-endian two's-complement unscaled
    bytes."""
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import types as T

    from gcs2postgres_spark.sources.avro_py import (
        spark_to_avro_schema,
        write_avro_file,
    )

    st = T.StructType(
        [
            T.StructField("d", T.DateType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("dec", T.DecimalType(12, 2), False),
        ]
    )
    schema = spark_to_avro_schema(st, "row")
    rec = {
        "d": dt.date(1970, 1, 11),  # +10 days
        "ts": dt.datetime(1970, 1, 1, 0, 0, 1),  # +1_000_000 µs
        "dec": Decimal("-1.00"),  # unscaled -100 → b'\x9c'
    }
    p = str(tmp_path / "logical_java.avro")
    write_avro_file(p, schema, [rec])
    jvm = spark._jvm
    dr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    r = dr.next()
    assert r.get("d") == 10
    assert r.get("ts") == 1_000_000
    buf = r.get("dec")  # java.nio.ByteBuffer
    raw = bytes([buf.get(i) % 256 for i in range(buf.limit())])
    assert int.from_bytes(raw, "big", signed=True) == -100
    dr.close()


def test_avro_split_read_single_giant_file(spark, tmp_path):
    """Sync-marker byte-range splits over ONE container file must
    reproduce the whole-file read exactly at every split size —
    including splits that land mid-block (block belongs to the task
    where it STARTS), splits aligned on block starts, and ranges that
    contain no boundary at all (one giant block)."""
    from pyspark.sql import types as T

    from gcs2postgres_spark.sources.avro_py import (
        read_avro_file,
        read_avro_split_distributed,
        spark_to_avro_schema,
        write_avro_file,
    )

    st = T.StructType(
        [
            T.StructField("i", T.LongType(), False),
            T.StructField("s", T.StringType(), False),
        ]
    )
    schema = spark_to_avro_schema(st, "row")
    recs = [{"i": i, "s": f"value-{i:06d}-" + "x" * (i % 37)} for i in range(5000)]
    p = str(tmp_path / "giant.avro")
    # many small blocks so several boundaries exist
    write_avro_file(p, schema, recs, block_records=100)
    _, want = read_avro_file(p)
    import os

    size = os.path.getsize(p)
    for split in (size, size // 3, 4096, 1024):
        got = sorted(
            (r["i"], r["s"])
            for r in read_avro_split_distributed(
                spark, p, split_bytes=split
            ).collect()
        )
        assert got == sorted((r["i"], r["s"]) for r in want), f"split={split}"
    # degenerate: split smaller than one block — most ranges hold no
    # block start and must yield nothing rather than duplicating
    got = read_avro_split_distributed(spark, p, split_bytes=64).count()
    assert got == len(recs)


def test_avro_split_read_with_logical_types(spark, tmp_path):
    import datetime as dt
    from decimal import Decimal

    from pyspark.sql import types as T

    from gcs2postgres_spark.sources.avro_py import (
        read_avro_split_distributed,
        spark_to_avro_schema,
        write_avro_file,
    )

    st = T.StructType(
        [
            T.StructField("d", T.DateType(), True),
            T.StructField("dec", T.DecimalType(10, 2), True),
        ]
    )
    schema = spark_to_avro_schema(st, "row")
    recs = [
        {"d": dt.date(2024, 1, 1) + dt.timedelta(days=i), "dec": Decimal(i) / 4}
        for i in range(0, 2000, 1)
    ]
    for r in recs:
        r["dec"] = Decimal(f"{r['dec']:.2f}")
    p = str(tmp_path / "logical_giant.avro")
    write_avro_file(p, schema, recs, block_records=64)
    out = read_avro_split_distributed(spark, p, split_bytes=2048)
    assert dict(out.dtypes)["d"] == "date"
    assert out.count() == len(recs)
    got = {r["d"]: r["dec"] for r in out.collect()}
    assert got[dt.date(2024, 1, 1)] == Decimal("0.00")
    assert got[dt.date(2024, 1, 1) + dt.timedelta(days=1999)] == Decimal("499.75")


def test_bigquery_missing_connector_clear_error(spark):
    """The reference's native-BQ scan (src/db/db.go:95-147) maps to the
    spark-bigquery-connector; without the jar the error must name the
    package and the in-harness alternative."""
    with pytest.raises(RuntimeError, match="spark-bigquery-with-dependencies"):
        read_source(spark, "dataset.table", fmt="bigquery")


def test_iceberg_not_a_table_clear_error(spark, tmp_path):
    """A path with no metadata/*.metadata.json must fail with a message
    saying it is not an Iceberg table, not a raw stack trace."""
    with pytest.raises(FileNotFoundError, match="not an Iceberg table"):
        read_source(spark, str(tmp_path / "t"), fmt="iceberg")


def test_iceberg_roundtrip_jarless(spark, sf_dir, tmp_path):
    """write_iceberg_fixture → read_source(iceberg): the jar-less
    metadata-chain walk (metadata JSON → Avro manifest list → Avro
    manifest → parquet) must reproduce the table exactly, through the
    same read_source entry point the reference's format dispatch maps
    to (README.md:11)."""
    from gcs2postgres_spark.sources.iceberg_py import write_iceberg_fixture

    nation = read_source(spark, f"{sf_dir}/nation.parquet")
    table = str(tmp_path / "nation_iceberg")
    write_iceberg_fixture(nation.repartition(3), table)
    got = read_source(spark, table, fmt="iceberg")
    assert [f.name for f in got.schema.fields] == [f.name for f in nation.schema.fields]
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, nation.collect()))


def test_iceberg_deleted_entries_and_snapshot_selection(spark, tmp_path):
    """Manifest entries with status=DELETED are excluded, and only the
    CURRENT snapshot's manifest list is read (older snapshots may
    reference files that no longer count)."""
    import os

    from gcs2postgres_spark.sources.iceberg_py import (
        data_file_entry,
        write_manifest,
        write_manifest_list,
        write_snapshot_metadata,
    )

    table = str(tmp_path / "t")
    data = os.path.join(table, "data")
    df = spark.range(10).withColumnRenamed("id", "v")
    df.filter("v < 5").coalesce(1).write.parquet(os.path.join(data, "f1"))
    df.filter("v >= 5").coalesce(1).write.parquet(os.path.join(data, "f2"))
    import glob as g

    f1 = g.glob(os.path.join(data, "f1", "part-*.parquet"))[0]
    f2 = g.glob(os.path.join(data, "f2", "part-*.parquet"))[0]
    mdir = os.path.join(table, "metadata")
    os.makedirs(mdir)
    # snapshot 1: both files live; snapshot 2 (current): f1 DELETED
    m1 = os.path.join(mdir, "m1.avro")
    write_manifest(m1, [data_file_entry(f1, 1, 1), data_file_entry(f2, 1, 1)])
    l1 = os.path.join(mdir, "s1.avro")
    write_manifest_list(l1, [m1], 1)
    m2 = os.path.join(mdir, "m2.avro")
    write_manifest(m2, [data_file_entry(f1, 2, 2), data_file_entry(f2, 0, 1)])
    l2 = os.path.join(mdir, "s2.avro")
    write_manifest_list(l2, [m2], 2)
    write_snapshot_metadata(
        table,
        df.schema,
        [{"snapshot-id": 1, "manifest-list": l1}, {"snapshot-id": 2, "manifest-list": l2}],
        current_snapshot_id=2,
        version=2,
    )
    got = sorted(r["v"] for r in read_source(spark, table, fmt="iceberg").collect())
    assert got == [5, 6, 7, 8, 9]


def test_iceberg_v2_position_and_equality_deletes(spark, tmp_path):
    """v2 row-level deletes applied jar-lessly: position deletes remove
    exactly the (file, pos) rows; an equality delete with sequence
    number STRICTLY greater than the data files' applies; one with an
    equal sequence number must NOT (spec's strict-past rule)."""
    from gcs2postgres_spark.sources.iceberg_py import write_iceberg_v2_fixture

    df = spark.range(20).selectExpr("id AS v", "CAST(id % 4 AS INT) AS grp")
    table = str(tmp_path / "v2tab")
    write_iceberg_v2_fixture(
        df.repartition(2),
        table,
        sort_col="v",
        position_delete_keys=[3, 11],
        equality_deletes=[({"grp": 2}, 2), ({"grp": 1}, 1)],
    )
    got = sorted(r["v"] for r in read_source(spark, table, fmt="iceberg").collect())
    expect = [v for v in range(20) if v not in (3, 11) and v % 4 != 2]
    assert got == expect


def test_iceberg_v2_delete_where_and_overwrite_where(spark, tmp_path):
    """Merge-on-read DML committer: position-delete commits stack, the
    matching scan sees only LIVE rows (repeat predicate → no-op, None),
    overwrite_where atomically deletes + appends at one sequence number
    (replacement rows never self-deleted), and prior snapshots remain
    time-travelable."""
    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        overwrite_where,
        read_iceberg_py,
        write_iceberg_v2_fixture,
    )

    df = spark.range(20).selectExpr("id AS v", "CAST(id % 4 AS INT) AS grp")
    table = str(tmp_path / "dmltab")
    write_iceberg_v2_fixture(df.repartition(2), table, sort_col="v")

    s1 = delete_where(spark, table, "grp = 2")
    live = sorted(r["v"] for r in read_iceberg_py(spark, table).collect())
    assert live == [v for v in range(20) if v % 4 != 2]
    # repeat predicate: already-deleted rows are NOT re-matched
    assert delete_where(spark, table, "grp = 2") is None

    s2 = delete_where(spark, table, "v IN (1, 3, 6)")  # 6 already dead
    live = sorted(r["v"] for r in read_iceberg_py(spark, table).collect())
    assert live == [v for v in range(20) if v % 4 != 2 and v not in (1, 3)]

    # overwrite: v=5 replaced by v=105 in one commit; v=6 (dead) targeted
    # by the predicate but only live rows are deleted
    repl = spark.range(1).selectExpr("CAST(105 AS BIGINT) AS v", "CAST(1 AS INT) AS grp")
    s3 = overwrite_where(spark, table, "v IN (5, 6)", repl)
    live = sorted(r["v"] for r in read_iceberg_py(spark, table).collect())
    assert 5 not in live and 105 in live
    # time travel: every intermediate snapshot still reads exactly
    assert sorted(r["v"] for r in read_iceberg_py(spark, table, snapshot_id=1).collect()) == list(range(20))
    assert len(read_iceberg_py(spark, table, snapshot_id=s1).collect()) == 15
    assert len(read_iceberg_py(spark, table, snapshot_id=s2).collect()) == 13
    assert s3 > s2 > s1


def test_iceberg_delete_where_v1_clear_error(spark, tmp_path):
    """Row-level deletes are a v2 feature; a v1 table must get an
    actionable error, not silent metadata corruption."""
    from gcs2postgres_spark.sources.iceberg_py import delete_where, write_iceberg

    table = str(tmp_path / "v1tab")
    write_iceberg(spark.range(5), table, "overwrite", snapshot_ts_ms=100)
    with pytest.raises(ValueError, match="format-version-2"):
        delete_where(spark, table, "id = 1")


def test_iceberg_partitioned_dml_roundtrip(spark, tmp_path):
    """DML on an identity-PARTITIONED v2 table (the round-8/9 gap):
    delete commits stack across partitions, a whole-partition delete
    leaves the partition time-travelable, overwrite routes replacement
    rows into their own partition, and partition_filter pruning stays
    correct after DML (delete files are never pruned)."""
    import pyspark.sql.functions as F

    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        overwrite_where,
        read_iceberg_py,
        write_iceberg_v2_partitioned_fixture,
    )

    df = (
        spark.range(20)
        .withColumn("g", (F.col("id") % 4).cast("int"))
        .withColumn("name", F.concat(F.lit("n"), F.col("id")))
    )
    table = str(tmp_path / "ice_part_dml")
    write_iceberg_v2_partitioned_fixture(df.repartition(2), table, "g")

    s1 = delete_where(spark, table, "g = 2")  # whole partition
    s2 = delete_where(spark, table, "id IN (3, 5)")  # crosses partitions
    rep = df.filter("id = 7").withColumn("name", F.lit("REPLACED"))
    s3 = overwrite_where(spark, table, "id = 7", rep)

    rows = {r["id"]: (r["g"], r["name"]) for r in read_iceberg_py(spark, table).collect()}
    expect_live = sorted(set(range(20)) - {2, 6, 10, 14, 18} - {3, 5})
    assert sorted(rows) == expect_live
    assert rows[7] == (3, "REPLACED")
    # repeat predicate on the emptied partition: true no-op
    assert delete_where(spark, table, "g = 2") is None
    # every snapshot still time-travels exactly
    assert read_iceberg_py(spark, table, snapshot_id=1).count() == 20
    assert read_iceberg_py(spark, table, snapshot_id=s1).count() == 15
    assert read_iceberg_py(spark, table, snapshot_id=s2).count() == 13
    assert s3 > s2 > s1
    # pruning after DML: only g=1 files scanned, answer identical
    pruned = read_iceberg_py(spark, table, partition_filter={"g": {1}})
    got = sorted(r["id"] for r in pruned.filter("g = 1").collect())
    assert got == [1, 9, 13, 17]


def test_iceberg_partitioned_delete_files_are_partition_scoped(spark, tmp_path):
    """Spec conformance of the committed metadata: every delete-file
    manifest entry on a partitioned table carries the partition tuple of
    the rows it hides, and the positions in each delete file reference
    ONLY data files of that same partition — the scoping another
    engine's scan planner relies on to prune delete application."""
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from gcs2postgres_spark.sources.avro_py import read_avro_file
    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        latest_metadata_file,
        write_iceberg_v2_partitioned_fixture,
    )
    import json as _json
    import os as _os

    df = spark.range(24).withColumn("g", (F.col("id") % 3).cast("int"))
    table = str(tmp_path / "ice_scoped")
    write_iceberg_v2_partitioned_fixture(df.repartition(2), table, "g")
    delete_where(spark, table, "id % 2 = 0")  # hits every partition

    meta = _json.loads(open(latest_metadata_file(table)).read())
    snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, manifests = read_avro_file(snap["manifest-list"])
    # data file -> partition value, from the data manifests
    file_part: dict[str, int] = {}
    delete_entries = []
    for m in manifests:
        _, entries = read_avro_file(m["manifest_path"])
        for e in entries:
            dfile = e["data_file"]
            if dfile.get("content", 0) == 0:
                file_part[dfile["file_path"]] = dfile["partition"]["g"]
            elif dfile.get("content") == 1:
                delete_entries.append(dfile)
    assert delete_entries, "no delete files committed"
    seen_parts = set()
    for dfile in delete_entries:
        part_g = dfile["partition"]["g"]
        assert part_g is not None
        seen_parts.add(part_g)
        refs = pq.read_table(dfile["file_path"], columns=["file_path"])[
            "file_path"
        ].to_pylist()
        assert refs, "empty delete file committed"
        for ref in set(refs):
            assert file_part[ref] == part_g, (
                f"delete file scoped to partition {part_g} references a "
                f"data file of partition {file_part[ref]}"
            )
    assert seen_parts == {0, 1, 2}  # the predicate hit all three


def test_iceberg_multi_column_partition_dml(spark, tmp_path):
    """DML over a TWO-column identity partition spec: the committer's
    tuple interning, routing, and typed manifest structs must all be
    arity-generic — deletes crossing both dimensions, overwrite into an
    existing composite partition, and pruning on either column."""
    import pyspark.sql.functions as F

    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        overwrite_where,
        read_iceberg_py,
        write_iceberg_v2_partitioned_fixture,
    )

    df = (
        spark.range(24)
        .withColumn("g", (F.col("id") % 3).cast("int"))
        .withColumn("region", F.concat(F.lit("r"), (F.col("id") % 2).cast("string")))
    )
    table = str(tmp_path / "ice_mc")
    write_iceberg_v2_partitioned_fixture(df.repartition(2), table, ["g", "region"])
    assert read_iceberg_py(spark, table).count() == 24
    s1 = delete_where(spark, table, "g = 1 AND region = 'r0'")
    live = sorted(r["id"] for r in read_iceberg_py(spark, table).collect())
    assert live == [i for i in range(24) if not (i % 3 == 1 and i % 2 == 0)]
    s2 = delete_where(spark, table, "id IN (3, 8)")
    rep = df.filter("id = 5").withColumn("id", F.lit(505).cast("long"))
    s3 = overwrite_where(spark, table, "id = 5", rep)
    live = sorted(r["id"] for r in read_iceberg_py(spark, table).collect())
    expect = sorted(
        (set(range(24)) - {i for i in range(24) if i % 3 == 1 and i % 2 == 0}
         - {3, 8, 5}) | {505}
    )
    assert live == expect
    assert s3 > s2 > s1
    # pruning on either partition column
    pr = read_iceberg_py(spark, table, partition_filter={"region": {"r1"}})
    assert sorted(r["id"] for r in pr.filter("region = 'r1'").collect()) == [
        i for i in expect if (i % 2 == 1)
    ]


def test_iceberg_write_to_partitioned_table_refuses(spark, tmp_path):
    """write_iceberg would commit UNPARTITIONED manifest entries into a
    partitioned table — readable here (conservative keep) but mis-scoped
    for any pruning scan planner. Must refuse with the DML alternative
    named."""
    import pyspark.sql.functions as F

    from gcs2postgres_spark.sources.iceberg_py import (
        write_iceberg,
        write_iceberg_v2_partitioned_fixture,
    )

    df = spark.range(6).withColumn("g", (F.col("id") % 2).cast("int"))
    table = str(tmp_path / "ice_wguard")
    write_iceberg_v2_partitioned_fixture(df, table, "g")
    with pytest.raises(NotImplementedError, match="PARTITIONED"):
        write_iceberg(df, table, "append", snapshot_ts_ms=999)


def test_iceberg_transform_dml_supported_and_unsupported(spark, tmp_path):
    """Round 12: bucket/truncate/day transforms ARE routed jar-lessly
    (tests/test_iceberg_transforms.py covers the semantics); this pins
    the boundary — a transform the committers genuinely cannot route
    (unknown string, or a kind/type combo outside the spec) still
    refuses with an actionable error, never emits mis-scoped metadata."""
    import json as _json

    import pyspark.sql.functions as F

    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        latest_metadata_file,
        read_iceberg_py,
        write_iceberg_v2_partitioned_fixture,
    )

    df = spark.range(8).withColumn("g", (F.col("id") % 2).cast("int"))
    table = str(tmp_path / "ice_bucket")
    write_iceberg_v2_partitioned_fixture(df, table, "g")
    meta_path = latest_metadata_file(table)
    meta = _json.loads(open(meta_path).read())
    meta["partition-specs"][0]["fields"][0]["transform"] = "wibble[4]"
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    with pytest.raises(ValueError, match="unknown iceberg partition transform"):
        delete_where(spark, table, "id = 1")
    # a supported non-identity transform routes DML (values stay exact)
    meta["partition-specs"][0]["fields"][0]["transform"] = "bucket[4]"
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    assert delete_where(spark, table, "id = 1", snapshot_ts_ms=999) is not None
    assert sorted(r["id"] for r in read_iceberg_py(spark, table).collect()) == [
        0, 2, 3, 4, 5, 6, 7,
    ]


def test_iceberg_field_id_rename_evolution(spark, tmp_path):
    """Spec-correct schema evolution: a column renamed in the table
    metadata (same field id) must read its OLD files' values under the
    NEW name when the files carry parquet field ids — and files written
    BEFORE and AFTER the rename (different parquet column names, same
    id) must union into one correct result. Files without ids keep the
    name-resolved fallback (missing -> NULL), pinned too."""
    import json as _json

    from gcs2postgres_spark.sources.iceberg_py import (
        latest_metadata_file,
        read_iceberg_py,
        with_parquet_field_ids,
        write_iceberg,
        write_iceberg_fixture,
    )

    df = spark.range(10).selectExpr("id AS v", "concat('n', id) AS name")
    table = str(tmp_path / "ice_rename")
    write_iceberg_fixture(with_parquet_field_ids(df).coalesce(1), table)

    # rename name -> title in the table metadata (same field id)
    meta_path = latest_metadata_file(table)
    meta = _json.loads(open(meta_path).read())
    fld = next(f for f in meta["schema"]["fields"] if f["name"] == "name")
    fld["name"] = "title"
    with open(meta_path, "w") as f:
        _json.dump(meta, f)

    out = read_iceberg_py(spark, table)
    assert set(out.columns) == {"v", "title"}
    got = {r["v"]: r["title"] for r in out.collect()}
    assert got == {i: f"n{i}" for i in range(10)}  # id-resolved, not NULL

    # post-rename append: files whose parquet column IS 'title' (same id)
    df2 = spark.range(10, 15).selectExpr("id AS v", "concat('n', id) AS title")
    ice_schema = {
        "type": "struct",
        "fields": [
            {"id": 1, "name": "v", "required": False, "type": "long"},
            {"id": 2, "name": "title", "required": False, "type": "string"},
        ],
    }
    write_iceberg(
        with_parquet_field_ids(df2, ice_schema), table, "append", snapshot_ts_ms=5
    )
    # write_iceberg re-derives metadata from df2.schema (name 'title'),
    # so the rename persists; both file generations must union by id
    out2 = {r["v"]: r["title"] for r in read_iceberg_py(spark, table).collect()}
    assert out2 == {i: f"n{i}" for i in range(15)}

    # no-ids fallback unchanged: a plain fixture + rename reads NULLs
    table2 = str(tmp_path / "ice_rename_noids")
    write_iceberg_fixture(df.coalesce(1), table2)
    meta_path2 = latest_metadata_file(table2)
    meta2 = _json.loads(open(meta_path2).read())
    next(f for f in meta2["schema"]["fields"] if f["name"] == "name")["name"] = "title"
    with open(meta_path2, "w") as f:
        _json.dump(meta2, f)
    assert read_iceberg_py(spark, table2).filter("title IS NULL").count() == 10


def test_iceberg_dml_on_renamed_column(spark, tmp_path):
    """delete_where over a RENAMED column: the matching scan projects to
    the table schema by field id before the predicate runs, so a
    predicate naming the new logical column matches rows stored under
    the old parquet name — and the committed deletes read back."""
    import json as _json

    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        latest_metadata_file,
        read_iceberg_py,
        spark_to_iceberg_schema,
        with_parquet_field_ids,
        write_iceberg_v2_fixture,
    )

    df = spark.range(12).selectExpr("id AS v", "CAST(id % 3 AS INT) AS grp")
    table = str(tmp_path / "ice_dml_rename")
    write_iceberg_v2_fixture(
        with_parquet_field_ids(df, spark_to_iceberg_schema(df.schema)).coalesce(1),
        table,
        sort_col="v",
    )
    meta_path = latest_metadata_file(table)
    meta = _json.loads(open(meta_path).read())
    next(f for f in meta["schemas"][0]["fields"] if f["name"] == "grp")["name"] = "bucket"
    with open(meta_path, "w") as f:
        _json.dump(meta, f)

    assert delete_where(spark, table, "bucket = 1") is not None
    rows = sorted(r["v"] for r in read_iceberg_py(spark, table).collect())
    assert rows == [v for v in range(12) if v % 3 != 1]


def test_iceberg_expire_snapshots(spark, tmp_path):
    """expire_snapshots: overwrite-orphaned data files and expired-only
    manifests are deleted, files still reachable from kept snapshots
    survive (append chains share manifests), time travel to expired ids
    raises, and HEAD reads are byte-identical before/after."""
    import glob as _glob

    from gcs2postgres_spark.sources.iceberg_py import (
        expire_snapshots,
        read_iceberg_py,
        write_iceberg,
    )

    table = str(tmp_path / "ice_expire")
    s1 = write_iceberg(spark.range(10).coalesce(1), table, "overwrite", snapshot_ts_ms=100)
    s2 = write_iceberg(
        spark.range(100, 105).coalesce(1), table, "overwrite", snapshot_ts_ms=200
    )  # orphans s1's data files
    s3 = write_iceberg(
        spark.range(200, 203).coalesce(1), table, "append", snapshot_ts_ms=300
    )  # shares s2's manifest
    before = sorted(r["id"] for r in read_iceberg_py(spark, table).collect())
    n_data_before = len(_glob.glob(str(tmp_path / "ice_expire" / "data" / "*" / "*.parquet")))

    removed = expire_snapshots(table, keep_last=1)
    assert removed > 0
    after = sorted(r["id"] for r in read_iceberg_py(spark, table).collect())
    assert after == before == list(range(100, 105)) + list(range(200, 203))
    # s1's overwritten data files are gone; s2's files survive (s3 kept)
    n_data_after = len(_glob.glob(str(tmp_path / "ice_expire" / "data" / "*" / "*.parquet")))
    assert n_data_after < n_data_before
    with pytest.raises(ValueError, match="not found"):
        read_iceberg_py(spark, table, snapshot_id=s1)
    with pytest.raises(ValueError, match="not found"):
        read_iceberg_py(spark, table, snapshot_id=s2)
    assert read_iceberg_py(spark, table, snapshot_id=s3).count() == 8
    # idempotent: nothing left to expire
    assert expire_snapshots(table, keep_last=1) == 0


def test_iceberg_table_changes_feed(spark, tmp_path):
    """Incremental scan: position-delete commits surface as deletes of
    the targeted rows, overwrite as delete+insert at one snapshot,
    windows restrict, appends attribute to their snapshot, and
    EQUALITY deletes surface as deletes of the rows live at the prior
    snapshot matching the values."""
    import pyspark.sql.functions as F

    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        iceberg_table_changes,
        overwrite_where,
        write_iceberg,
        write_iceberg_v2_fixture,
    )

    table = str(tmp_path / "icecdf")
    df = spark.range(30).selectExpr("id AS v", "CAST(id % 3 AS INT) AS grp")
    write_iceberg_v2_fixture(df.coalesce(1), table, sort_col="v")  # snapshot 1
    s2 = delete_where(spark, table, "grp = 2")
    s3 = overwrite_where(
        spark, table, "v = 7", df.filter("v = 7").withColumn("grp", F.lit(9))
    )
    rows = sorted(
        (r["_commit_snapshot_id"], r["_change_type"], r["v"])
        for r in iceberg_table_changes(spark, table, 1).collect()
    )
    assert rows == sorted(
        [(s2, "delete", v) for v in range(30) if v % 3 == 2]
        + [(s3, "delete", 7), (s3, "insert", 7)]
    )
    ch = iceberg_table_changes(spark, table, s2)
    assert sorted((r["_change_type"], r["v"]) for r in ch.collect()) == [
        ("delete", 7),
        ("insert", 7),
    ]
    assert iceberg_table_changes(spark, table, s3).count() == 0

    # v1 append chain attributes inserts to the appending snapshot
    table2 = str(tmp_path / "icecdf_v1")
    a = write_iceberg(spark.range(5).coalesce(1), table2, "overwrite", snapshot_ts_ms=100)
    write_iceberg(spark.range(100, 103).coalesce(1), table2, "append", snapshot_ts_ms=200)
    ch3 = iceberg_table_changes(spark, table2, a)
    assert sorted(r["id"] for r in ch3.collect()) == [100, 101, 102]
    assert {r["_change_type"] for r in ch3.collect()} == {"insert"}

    # equality deletes committed AT the base snapshot are base state,
    # not changes — the feed must not double-report them
    table3 = str(tmp_path / "icecdf_eq")
    write_iceberg_v2_fixture(
        df.coalesce(1), table3, sort_col="v",
        equality_deletes=[({"grp": 1}, 2)],
    )
    assert iceberg_table_changes(spark, table3, 1).count() == 0

    # an equality delete committed in a LATER snapshot surfaces as
    # deletes of the rows live at the previous one (hand-committed in
    # the committer's own metadata shapes)
    import json as _json
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gcs2postgres_spark.sources.avro_py import read_avro_file, write_avro_file
    from gcs2postgres_spark.sources.iceberg_py import (
        MANIFEST_LIST_SCHEMA_V2,
        _v2_entry,
        _write_json_atomic,
        _write_text_atomic,
        latest_metadata_file,
        manifest_entry_schema_v2,
        read_iceberg_py,
    )

    table4 = str(tmp_path / "icecdf_eq2")
    write_iceberg_v2_fixture(df.coalesce(1), table4, sort_col="v")
    meta_path = latest_metadata_file(table4)
    meta = _json.loads(open(meta_path).read())
    mdir = _os.path.join(table4, "metadata")
    eq_path = _os.path.join(table4, "data", "delete-eq-late.parquet")
    pq.write_table(pa.table({"grp": pa.array([0], pa.int32())}), eq_path)
    grp_id = next(
        f["id"] for f in meta["schemas"][0]["fields"] if f["name"] == "grp"
    )
    man = _os.path.join(mdir, "manifest-deletes-2.avro")
    write_avro_file(
        man,
        manifest_entry_schema_v2([]),
        [_v2_entry(eq_path, content=2, seq=2, equality_ids=[grp_id], snapshot_id=2)],
        codec="null",
    )
    _, old_list = read_avro_file(meta["snapshots"][0]["manifest-list"])
    ml = _os.path.join(mdir, "snap-2.avro")
    write_avro_file(
        ml,
        MANIFEST_LIST_SCHEMA_V2,
        list(old_list)
        + [
            {
                "manifest_path": _os.path.abspath(man),
                "manifest_length": _os.path.getsize(man),
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": 2,
                "min_sequence_number": 2,
                "added_snapshot_id": 2,
            }
        ],
        codec="null",
    )
    meta["last-sequence-number"] = 2
    meta["current-snapshot-id"] = 2
    meta["snapshots"].append(
        {
            "snapshot-id": 2,
            "sequence-number": 2,
            "timestamp-ms": 10,
            "summary": {"operation": "delete"},
            "manifest-list": _os.path.abspath(ml),
        }
    )
    _write_json_atomic(_os.path.join(mdir, "v2.metadata.json"), meta)
    _write_text_atomic(_os.path.join(mdir, "version-hint.text"), "2")
    assert read_iceberg_py(spark, table4).count() == 20  # grp 0 gone
    got = sorted(
        (r["_change_type"], r["v"])
        for r in iceberg_table_changes(spark, table4, 1).collect()
    )
    assert got == [("delete", v) for v in range(30) if v % 3 == 0]


def test_iceberg_atomic_commit_crash_window(spark, tmp_path, monkeypatch):
    """Crash between the metadata-JSON write and the version-hint write:
    since round 12 the METADATA FILE is the commit point (put-if-absent
    via _write_json_if_absent) and the hint is a best-effort pointer
    readers PROBE FORWARD from — exactly HadoopTableOperations'
    behavior. So the crashed DELETE is COMMITTED: readers see it despite
    the stale hint, a replayed DELETE is a no-op, and the next
    successful commit heals the hint."""
    import json as _json
    import os

    from gcs2postgres_spark.sources import iceberg_py

    df = spark.range(10).selectExpr("id AS v", "CAST(id % 2 AS INT) AS grp")
    table = str(tmp_path / "ice_crash")
    iceberg_py.write_iceberg_v2_fixture(df.coalesce(1), table, sort_col="v")
    assert iceberg_py.read_iceberg_py(spark, table).count() == 10

    real_atomic = iceberg_py._write_text_atomic

    def crash_on_hint(path, text):
        if path.endswith("version-hint.text"):
            raise OSError("simulated crash before the hint update")
        real_atomic(path, text)

    monkeypatch.setattr(iceberg_py, "_write_text_atomic", crash_on_hint)
    with pytest.raises(OSError, match="simulated crash"):
        iceberg_py.delete_where(spark, table, "grp = 1")
    monkeypatch.setattr(iceberg_py, "_write_text_atomic", real_atomic)

    hint = os.path.join(table, "metadata", "version-hint.text")
    assert open(hint).read().strip() == "1"  # hint is stale...
    assert iceberg_py.read_iceberg_py(spark, table).count() == 5  # ...commit landed
    # replaying the delete matches nothing: honest no-op
    assert iceberg_py.delete_where(spark, table, "grp = 1") is None
    # the next real commit heals the hint
    sid = iceberg_py.delete_where(spark, table, "grp = 0 AND v < 4")
    assert sid is not None
    assert int(open(hint).read().strip()) >= 3
    assert iceberg_py.read_iceberg_py(spark, table).count() == 3
    meta = _json.loads(open(iceberg_py.latest_metadata_file(table)).read())
    assert meta["current-snapshot-id"] == sid


def test_iceberg_v2_equality_delete_without_ids_clear_error(spark, tmp_path):
    """An equality delete entry missing equality_ids cannot be applied
    correctly — must raise an actionable error naming the runtime jar,
    never silently return undeleted rows."""
    import os

    from gcs2postgres_spark.sources.iceberg_py import write_iceberg_v2_fixture

    df = spark.range(4).withColumnRenamed("id", "v")
    table = str(tmp_path / "t2")
    write_iceberg_v2_fixture(
        df.coalesce(1), table, sort_col="v", equality_deletes=[({"v": 1}, 2)]
    )
    # corrupt the delete manifest: rewrite with equality_ids = null
    from gcs2postgres_spark.sources.avro_py import read_avro_file, write_avro_file
    from gcs2postgres_spark.sources.iceberg_py import MANIFEST_ENTRY_SCHEMA_V2

    mpath = os.path.join(table, "metadata", "manifest-deletes-1.avro")
    _, entries = read_avro_file(mpath)
    for e in entries:
        e["data_file"]["equality_ids"] = None
    write_avro_file(mpath, MANIFEST_ENTRY_SCHEMA_V2, entries, codec="null")
    with pytest.raises(NotImplementedError, match="iceberg-spark-runtime"):
        read_source(spark, table, fmt="iceberg")


def test_iceberg_time_travel(spark, tmp_path):
    """snapshot-id / as-of-timestamp options pin an older snapshot."""
    import glob as g
    import os

    from gcs2postgres_spark.sources.iceberg_py import (
        data_file_entry,
        write_manifest,
        write_manifest_list,
        write_snapshot_metadata,
    )

    table = str(tmp_path / "tt")
    data = os.path.join(table, "data")
    df = spark.range(10).withColumnRenamed("id", "v")
    df.filter("v < 5").coalesce(1).write.parquet(os.path.join(data, "f1"))
    df.filter("v >= 5").coalesce(1).write.parquet(os.path.join(data, "f2"))
    f1 = g.glob(os.path.join(data, "f1", "part-*.parquet"))[0]
    f2 = g.glob(os.path.join(data, "f2", "part-*.parquet"))[0]
    mdir = os.path.join(table, "metadata")
    os.makedirs(mdir)
    m1 = os.path.join(mdir, "m1.avro")
    write_manifest(m1, [data_file_entry(f1, 1, 1)])
    l1 = os.path.join(mdir, "s1.avro")
    write_manifest_list(l1, [m1], 1)
    m2 = os.path.join(mdir, "m2.avro")
    write_manifest(m2, [data_file_entry(f1, 0, 1), data_file_entry(f2, 1, 2)])
    l2 = os.path.join(mdir, "s2.avro")
    write_manifest_list(l2, [m2], 2)
    write_snapshot_metadata(
        table,
        df.schema,
        [
            {"snapshot-id": 1, "manifest-list": l1, "timestamp-ms": 1000},
            {"snapshot-id": 2, "manifest-list": l2, "timestamp-ms": 2000},
        ],
        current_snapshot_id=2,
        version=1,
    )
    cur = sorted(r["v"] for r in read_source(spark, table, fmt="iceberg").collect())
    assert cur == list(range(10))
    old = read_source(spark, table, fmt="iceberg", **{"snapshot-id": 1})
    assert sorted(r["v"] for r in old.collect()) == [0, 1, 2, 3, 4]
    asof = read_source(spark, table, fmt="iceberg", **{"as-of-timestamp": 1500})
    assert sorted(r["v"] for r in asof.collect()) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="snapshot 99 not found"):
        read_source(spark, table, fmt="iceberg", **{"snapshot-id": 99}).collect()


def test_iceberg_empty_table_gives_schema(spark, tmp_path):
    """A table with no current snapshot reads as an empty DataFrame with
    the metadata-declared schema."""
    from gcs2postgres_spark.sources.iceberg_py import write_snapshot_metadata

    table = str(tmp_path / "t3")
    schema = "a long, b string"
    from pyspark.sql.types import _parse_datatype_string

    st = _parse_datatype_string(schema)
    write_snapshot_metadata(table, st, [], current_snapshot_id=-1, version=1)
    got = read_source(spark, table, fmt="iceberg")
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["a", "b"]


def test_register_view(spark, sf_dir):
    read_source(spark, f"{sf_dir}/region.parquet", register_view=True)
    assert spark.sql("SELECT count(*) AS n FROM region").collect()[0]["n"] == 5


def test_delta_roundtrip_jarless(spark, sf_dir, tmp_path):
    """write_delta_fixture → read_source(delta): jar-less _delta_log
    replay with partition-column injection and remove actions."""
    from gcs2postgres_spark.catalog import load_table
    from gcs2postgres_spark.sources.delta_py import write_delta_fixture

    nation = load_table(spark, sf_dir, "nation")
    table = str(tmp_path / "delta_nation")
    write_delta_fixture(
        nation.repartition(2), table, partition_col="n_regionkey", remove_partition_value="3"
    )
    got = read_source(spark, table, fmt="delta")
    expect = nation.filter("n_regionkey <> 3")
    assert got.count() == expect.count()
    assert set(got.columns) == set(nation.columns)
    assert [r["n_regionkey"] for r in got.select("n_regionkey").distinct().collect()] != []
    # version 0 resurrects the removed partition
    v0 = read_source(spark, table, fmt="delta", versionAsOf=0)
    assert v0.count() == nation.count()


def test_delta_checkpoint_branch(spark, sf_dir, tmp_path):
    """_last_checkpoint + checkpoint.parquet replaces the JSON prefix;
    state after compaction equals state from full JSON replay."""
    from gcs2postgres_spark.catalog import load_table
    from gcs2postgres_spark.sources.delta_py import (
        read_delta_py,
        write_checkpoint,
        write_delta_fixture,
    )

    nation = load_table(spark, sf_dir, "nation")
    table = str(tmp_path / "delta_cp")
    write_delta_fixture(
        nation.repartition(2), table, partition_col="n_regionkey", remove_partition_value="1"
    )
    before = sorted(r["n_nationkey"] for r in read_delta_py(spark, table).collect())
    write_checkpoint(spark, table, 1)
    after = sorted(r["n_nationkey"] for r in read_delta_py(spark, table).collect())
    assert before == after


def test_delta_unsupported_features_clear_error(spark, tmp_path):
    """Unsupported reader features and column mapping must raise
    actionable errors naming the delta-spark package, never return wrong
    rows. deletionVectors (r10) and typeWidening (r13) are honored
    natively now, so the feature gate is exercised with an UNKNOWN
    future feature — the gate's contract is that anything it does not
    recognize refuses rather than silently misreading."""
    import json
    import os

    from gcs2postgres_spark.sources.delta_py import read_delta_py

    table = str(tmp_path / "delta_tw")
    log = os.path.join(table, "_delta_log")
    os.makedirs(log)
    schema = '{"type":"struct","fields":[{"name":"a","type":"integer","nullable":true,"metadata":{}}]}'
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                                         "readerFeatures": ["deletionVectors", "someFutureFeature"]}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet"},
                                         "schemaString": schema, "partitionColumns": [],
                                         "configuration": {}}}) + "\n")
    with pytest.raises(NotImplementedError, match="someFutureFeature"):
        read_delta_py(spark, table)

    # column mapping is supported since r10: a mapping-mode table whose
    # fields carry no physicalName metadata (an upgraded table where
    # physical == logical) reads fine — here empty, with the logical
    # schema. An UNKNOWN mapping mode still refuses.
    table2 = str(tmp_path / "delta_cm")
    log2 = os.path.join(table2, "_delta_log")
    os.makedirs(log2)
    with open(os.path.join(log2, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet"},
                                         "schemaString": schema, "partitionColumns": [],
                                         "configuration": {"delta.columnMapping.mode": "name"}}})
                + "\n")
    out = read_delta_py(spark, table2)
    assert out.columns == ["a"] and out.count() == 0

    table3 = str(tmp_path / "delta_cm_bogus")
    log3 = os.path.join(table3, "_delta_log")
    os.makedirs(log3)
    with open(os.path.join(log3, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {"id": "x", "format": {"provider": "parquet"},
                                         "schemaString": schema, "partitionColumns": [],
                                         "configuration": {"delta.columnMapping.mode": "bogus"}}})
                + "\n")
    with pytest.raises(NotImplementedError, match="bogus"):
        read_delta_py(spark, table3)


def test_delta_not_a_table_clear_error(spark, tmp_path):
    from gcs2postgres_spark.sources.delta_py import read_delta_py

    with pytest.raises(FileNotFoundError, match="_delta_log"):
        read_delta_py(spark, str(tmp_path / "nope"))


def test_delta_write_append_overwrite_semantics(spark, tmp_path):
    import pyspark.sql.functions as F

    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta

    path = str(tmp_path / "t")
    df = spark.range(10).withColumn("part", (F.col("id") % 2).cast("string"))
    v0 = write_delta(df, path, "overwrite", partition_by=["part"], timestamp_ms=1)
    v1 = write_delta(
        spark.range(10, 15).withColumn("part", F.lit("0")),
        path,
        "append",
        partition_by=["part"],
        timestamp_ms=2,
    )
    v2 = write_delta(
        spark.range(100, 103).withColumn("part", F.lit("1")),
        path,
        "overwrite",
        partition_by=["part"],
        timestamp_ms=3,
    )
    assert (v0, v1, v2) == (0, 1, 2)
    assert read_delta_py(spark, path).count() == 3  # overwrite replaced all
    assert read_delta_py(spark, path, version_as_of=1).count() == 15
    assert read_delta_py(spark, path, version_as_of=0).count() == 10
    # partition column injected, typed, and filterable
    got = read_delta_py(spark, path, version_as_of=1).filter("part = '0'").count()
    assert got == 10


def test_iceberg_write_snapshot_semantics(spark, tmp_path):
    from gcs2postgres_spark.sources.iceberg_py import read_iceberg_py, write_iceberg

    path = str(tmp_path / "ice")
    s1 = write_iceberg(spark.range(5), path, "overwrite", snapshot_ts_ms=100)
    s2 = write_iceberg(spark.range(5, 8), path, "append", snapshot_ts_ms=200)
    s3 = write_iceberg(spark.range(100, 101), path, "overwrite", snapshot_ts_ms=300)
    assert (s1, s2, s3) == (1, 2, 3)
    assert read_iceberg_py(spark, path).count() == 1
    assert read_iceberg_py(spark, path, snapshot_id=s2).count() == 8
    assert read_iceberg_py(spark, path, snapshot_id=s1).count() == 5
    # as_of_ms time travel picks the latest snapshot at or before ts
    assert read_iceberg_py(spark, path, as_of_ms=250).count() == 8


def test_delta_vacuum_removes_tombstoned_files(spark, tmp_path):
    import glob as _glob

    from gcs2postgres_spark.sources.delta_py import (
        read_delta_py,
        vacuum_delta,
        write_delta,
    )

    path = str(tmp_path / "t")
    write_delta(spark.range(10), path, "overwrite", timestamp_ms=1)
    write_delta(spark.range(20, 25), path, "overwrite", timestamp_ms=2)
    before = len(_glob.glob(f"{path}/**/*.parquet", recursive=True))
    removed = vacuum_delta(path)
    after = len(_glob.glob(f"{path}/**/*.parquet", recursive=True))
    assert removed > 0 and after == before - removed
    # HEAD unaffected; vacuumed version unreadable (as with real VACUUM)
    assert read_delta_py(spark, path).count() == 5


def test_delta_read_via_hadoop_fs_uri(spark, tmp_path):
    # the object-store read path: same table, read through a file: URI —
    # exercises the Hadoop FileSystem branch of fsio (listdir/exists/
    # read_text) end to end, the exact API surface a gs:// path hits
    from pyspark.sql import functions as F

    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta

    path = str(tmp_path / "fsuri")
    df = spark.range(500).select("id", (F.col("id") % 2).cast("string").alias("par"))
    write_delta(df, path, "overwrite", partition_by=["par"], timestamp_ms=1)
    write_delta(spark.range(500, 600).select("id", F.lit("0").alias("par")), path, "append", timestamp_ms=2)

    via_uri = read_delta_py(spark, "file:" + path)
    assert via_uri.count() == 600
    assert via_uri.filter(F.col("par").isNull()).count() == 0
    assert via_uri.agg(F.sum("id")).first()[0] == sum(range(600))
    # time travel through the URI path too
    assert read_delta_py(spark, "file:" + path, version_as_of=0).count() == 500


def test_delta_write_on_object_store_scheme_raises(spark, tmp_path):
    """Unregistered remote schemes still refuse EARLY (nothing staged);
    file: URIs — and any scheme with a registered LogStore — write
    end-to-end (tests/test_remote_write.py)."""
    import pytest as _pytest

    from gcs2postgres_spark.sources.delta_py import vacuum_delta, write_delta

    with _pytest.raises(NotImplementedError, match="LogStore"):
        write_delta(spark.range(3), "gs://bucket/table", "overwrite")
    with _pytest.raises(NotImplementedError, match="LogStore"):
        vacuum_delta("s3a://bucket/table")
    # file: scheme is first-class now
    write_delta(spark.range(3), "file:" + str(tmp_path / "x"), "overwrite")
    from gcs2postgres_spark.sources.delta_py import read_delta_py

    assert read_delta_py(spark, "file:" + str(tmp_path / "x")).count() == 3


def test_iceberg_read_via_hadoop_fs_uri(spark, tmp_path):
    # object-store read path for the jar-less Iceberg reader: metadata
    # JSON, version hint, and Avro manifests all fetched through the
    # Hadoop FileSystem branch (file: URI = the gs:// API surface)
    from pyspark.sql import functions as F

    from gcs2postgres_spark.sources.iceberg_py import read_iceberg_py, write_iceberg

    path = str(tmp_path / "ice_uri")
    df = spark.range(300).select("id", (F.col("id") * 2).alias("dbl"))
    write_iceberg(df, path, "overwrite", snapshot_ts_ms=1_700_000_000_000)
    s2 = write_iceberg(
        spark.range(300, 400).select("id", (F.col("id") * 2).alias("dbl")),
        path, "append", snapshot_ts_ms=1_700_000_001_000,
    )
    via_uri = read_iceberg_py(spark, "file:" + path)
    assert via_uri.count() == 400
    assert via_uri.agg(F.sum("id")).first()[0] == sum(range(400))
    assert read_iceberg_py(spark, "file:" + path, snapshot_id=s2).count() == 400


def test_iceberg_partition_prune_skips_files(spark, sf_dir, tmp_path):
    # manifest-level pruning must reach the SCAN: the pruned read's
    # parquet file list holds only the matching partitions' files,
    # while the unpruned read sees every partition — and pruning never
    # changes the (filtered) answer
    from gcs2postgres_spark.sources.iceberg_py import (
        read_iceberg_py,
        write_iceberg_partitioned_fixture,
    )
    from gcs2postgres_spark.catalog import load_table

    nation = load_table(spark, str(sf_dir), "nation")
    tmp = str(tmp_path / "ice_part")
    write_iceberg_partitioned_fixture(nation, tmp, "n_regionkey")

    full = read_iceberg_py(spark, tmp)
    pruned = read_iceberg_py(spark, tmp, partition_filter={"n_regionkey": {1, 2}})
    n_full = len(set(full.inputFiles()))
    n_pruned = len(set(pruned.inputFiles()))
    assert n_full == 5, full.inputFiles()
    assert n_pruned == 2, pruned.inputFiles()

    import pyspark.sql.functions as F

    a = sorted(
        tuple(r)
        for r in pruned.filter(F.col("n_regionkey").isin(1, 2)).collect()
    )
    b = sorted(
        tuple(r)
        for r in full.filter(F.col("n_regionkey").isin(1, 2)).collect()
    )
    assert a == b


def test_delta_deletion_vectors_file_inline_and_supersede(spark, tmp_path):
    """DV read path: 'u'-storage file DVs hide exactly the listed row
    positions, an 'i' inline DV re-added for the same file SUPERSEDES
    the older one (protocol: newest add per path wins), pre-DV versions
    time-travel clean, and a protocol upgrade to readerVersion 3 +
    deletionVectors does not trip the feature gate."""
    import os
    from urllib.parse import unquote

    import pyarrow.parquet as pq

    from gcs2postgres_spark.sources.delta_py import (
        add_deletion_vectors,
        read_delta_py,
        replay_head_state,
        write_delta_fixture,
    )

    table = str(tmp_path / "dvtab")
    df = spark.range(30).selectExpr("id", "CAST(id % 3 AS STRING) AS part").coalesce(1)
    write_delta_fixture(df, table, partition_col="part")
    live, _ = replay_head_state(spark, table)
    rels = sorted(live)

    def ids_of(rel):
        return pq.read_table(os.path.join(table, unquote(rel)), columns=["id"])[
            "id"
        ].to_pylist()

    add_deletion_vectors(table, {rels[0]: [0, 2], rels[1]: [1]})
    removed = {ids_of(rels[0])[0], ids_of(rels[0])[2], ids_of(rels[1])[1]}
    got = sorted(r["id"] for r in read_delta_py(spark, table).collect())
    assert got == sorted(set(range(30)) - removed)
    # pre-DV version resurrects everything
    assert read_delta_py(spark, table, version_as_of=0).count() == 30
    # inline superset DV supersedes rels[0]'s file DV
    add_deletion_vectors(table, {rels[0]: [0, 1, 2, 3]}, inline=True)
    assert read_delta_py(spark, table).count() == 30 - 4 - 1


def test_delta_deletion_vector_checksum_corruption_raises(spark, tmp_path):
    """A corrupt DV must fail loudly (CRC mismatch), never silently
    resurrect deleted rows."""
    import glob as _glob

    from gcs2postgres_spark.sources.delta_py import (
        add_deletion_vectors,
        read_delta_py,
        write_delta_fixture,
    )

    table = str(tmp_path / "dvcorrupt")
    write_delta_fixture(spark.range(10).coalesce(1), table)
    live_rel = None
    from gcs2postgres_spark.sources.delta_py import replay_head_state

    live, _ = replay_head_state(spark, table)
    live_rel = sorted(live)[0]
    add_deletion_vectors(table, {live_rel: [0, 1]})
    (dv_file,) = _glob.glob(str(tmp_path / "dvcorrupt" / "deletion_vector_*.bin"))
    raw = bytearray(open(dv_file, "rb").read())
    raw[-1] ^= 0xFF  # flip a checksum byte
    with open(dv_file, "wb") as f:
        f.write(raw)
    with pytest.raises(Exception, match="checksum|CRC|mismatch"):
        read_delta_py(spark, table).collect()


def test_delta_unknown_reader_feature_still_refuses(spark, tmp_path):
    """deletionVectors and columnMapping are now honored, but an unknown
    row-transforming reader feature must still raise the jar hint."""
    import json as _json
    import os as _os

    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta_fixture

    table = str(tmp_path / "dvfeat")
    write_delta_fixture(spark.range(5).coalesce(1), table)
    log = _os.path.join(table, "_delta_log", f"{1:020d}.json")
    with open(log, "w") as f:
        f.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": ["deletionVectors", "icebergCompatV2"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(NotImplementedError, match="icebergCompatV2"):
        read_delta_py(spark, table).collect()


def test_delta_checkpoint_preserves_deletion_vectors(spark, tmp_path):
    """A checkpoint compacted over DV'd adds must carry the descriptors
    through _checkpoint_base — dropping them would silently resurrect
    deleted rows on checkpoint-based reads."""
    import json as _json
    import os as _os

    from gcs2postgres_spark.sources.delta_py import (
        add_deletion_vectors,
        read_delta_py,
        replay_head_state,
        write_delta_fixture,
    )

    table = str(tmp_path / "dvcp")
    write_delta_fixture(spark.range(12).coalesce(1), table)
    live, meta = replay_head_state(spark, table)
    rel = sorted(live)[0]
    v = add_deletion_vectors(table, {rel: [2, 3, 5]})
    before = sorted(r["id"] for r in read_delta_py(spark, table).collect())

    # write a checkpoint AT the DV commit carrying the descriptor struct
    live2, meta2 = replay_head_state(spark, table)
    rows = []
    for a in live2.values():
        dv = a.get("deletionVector")
        rows.append(
            (
                {
                    "path": a["path"],
                    "partitionValues": a.get("partitionValues") or {},
                    "deletionVector": dv,
                },
                None,
                None,
            )
        )
    rows.append((None, meta2, None))
    rows.append((None, None, {"minReaderVersion": 3, "minWriterVersion": 7}))
    cp_schema = (
        "add struct<path: string, partitionValues: map<string,string>, "
        "deletionVector: struct<storageType: string, pathOrInlineDv: string, "
        "offset: int, sizeInBytes: int, cardinality: long>>, "
        "metaData struct<id: string, format: struct<provider: string>, "
        "schemaString: string, partitionColumns: array<string>, "
        "configuration: map<string,string>>, "
        "protocol struct<minReaderVersion: int, minWriterVersion: int>"
    )
    cp_df = spark.createDataFrame(rows, cp_schema)
    log_dir = _os.path.join(table, "_delta_log")
    tmp_cp = _os.path.join(log_dir, "_cp_tmp")
    cp_df.coalesce(1).write.mode("overwrite").parquet(tmp_cp)
    part = next(p for p in _os.listdir(tmp_cp) if p.endswith(".parquet"))
    _os.replace(
        _os.path.join(tmp_cp, part), _os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
    )
    import shutil as _shutil

    _shutil.rmtree(tmp_cp, ignore_errors=True)
    with open(_os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        _json.dump({"version": v, "size": len(rows)}, f)
    # drop the JSON commits the checkpoint replaced: the read now MUST
    # source the DV from the checkpoint
    for old in range(v + 1):
        p = _os.path.join(log_dir, f"{old:020d}.json")
        if _os.path.exists(p):
            _os.remove(p)
    after = sorted(r["id"] for r in read_delta_py(spark, table).collect())
    assert after == before and len(after) == 9


def test_delta_column_mapping_rename_partition_and_dv(spark, tmp_path):
    """Column mapping ('name' mode): physical col-NN data files read
    back under logical names, a renamed column resolves through its
    physicalName (a name-resolving reader would return NULLs), the
    partition filter prunes by LOGICAL name against physical-keyed
    partitionValues, deletion vectors compose with the rename, and
    'id'-mode tables read identically."""
    from gcs2postgres_spark.sources.delta_py import (
        add_deletion_vectors,
        read_delta_py,
        replay_head_state,
        write_delta,
        write_delta_column_mapping_fixture,
    )

    table = str(tmp_path / "cmtab")
    df = spark.range(20).selectExpr(
        "id", "CAST(id % 4 AS STRING) AS grp", "id * 2 AS twice"
    )
    write_delta_column_mapping_fixture(
        df.coalesce(1), table, partition_col="grp", renamed={"twice": "doubled"}
    )
    out = read_delta_py(spark, table)
    assert set(out.columns) == {"id", "grp", "doubled"}
    rows = {r["id"]: (r["grp"], r["doubled"]) for r in out.collect()}
    assert len(rows) == 20 and rows[7] == ("3", 14)
    pruned = read_delta_py(spark, table, partition_filter={"grp": {"1"}})
    assert sorted(r["id"] for r in pruned.collect()) == [1, 5, 9, 13, 17]
    # DVs compose with mapping (feature list carries both)
    live, _ = replay_head_state(spark, table)
    add_deletion_vectors(table, {sorted(live)[0]: [0]})
    assert read_delta_py(spark, table).count() == 19
    # r14: jar-less WRITE to a mapping table works — but only with the
    # table's CURRENT logical names ('doubled', post-rename); a frame
    # shaped like the pre-rename schema fails loudly (top-level name
    # drift reads as a schema change on the append path)
    with pytest.raises(NotImplementedError, match="column-mapping"):
        write_delta(df, table, "append")
    write_delta(
        df.withColumnRenamed("twice", "doubled").limit(2), table, "append",
        timestamp_ms=1_700_000_002_000,
    )
    assert read_delta_py(spark, table).count() == 21
    # id mode reads through the same physical-name path
    table2 = str(tmp_path / "cmid")
    write_delta_column_mapping_fixture(df.coalesce(1), table2, mode="id")
    assert read_delta_py(spark, table2).count() == 20


def test_delta_delete_where_dv_stacks_and_merges(spark, tmp_path):
    """delete_where_delta: matching runs over LIVE rows only (repeat
    predicate is a no-op None), a second delete on an already-DV'd file
    commits the UNION vector (supersede semantics), time travel
    resurrects, and the whole flow works on a column-mapping table with
    a renamed predicate column."""
    from gcs2postgres_spark.sources.delta_py import (
        delete_where_delta,
        read_delta_py,
        replay_head_state,
        write_delta_column_mapping_fixture,
        write_delta_fixture,
    )

    table = str(tmp_path / "dvdel")
    df = spark.range(30).selectExpr("id", "CAST(id % 3 AS STRING) AS part")
    write_delta_fixture(df.coalesce(1), table, partition_col="part")
    v1 = delete_where_delta(spark, table, "id % 5 = 0", timestamp_ms=100)
    assert v1 is not None
    got = sorted(r["id"] for r in read_delta_py(spark, table).collect())
    assert got == [i for i in range(30) if i % 5]
    assert delete_where_delta(spark, table, "id % 5 = 0", timestamp_ms=200) is None
    v2 = delete_where_delta(spark, table, "id IN (1, 2)", timestamp_ms=300)
    assert v2 == v1 + 1
    got = sorted(r["id"] for r in read_delta_py(spark, table).collect())
    assert got == [i for i in range(30) if i % 5 and i not in (1, 2)]
    assert read_delta_py(spark, table, version_as_of=0).count() == 30
    # every live add now carries exactly one DV descriptor per touched
    # file, and cardinality matches the hidden rows
    live, _ = replay_head_state(spark, table)
    total_card = sum(
        (a.get("deletionVector") or {}).get("cardinality", 0) for a in live.values()
    )
    assert total_card == 8  # 6 multiples of 5 + ids 1, 2

    # column-mapping composition: predicate over the RENAMED column
    table2 = str(tmp_path / "dvdel_cm")
    write_delta_column_mapping_fixture(
        df.coalesce(1), table2, partition_col="part", renamed={"id": "row_id"}
    )
    assert delete_where_delta(spark, table2, "row_id < 10", timestamp_ms=400) is not None
    assert read_delta_py(spark, table2).count() == 20


def test_delta_vacuum_collects_superseded_dv_files(spark, tmp_path):
    """VACUUM must remove deletion-vector files no live add references
    (superseded by a merged vector) while keeping the live one — and
    compaction through the DV-applying reader must not resurrect
    deleted rows."""
    import glob as _glob

    from gcs2postgres_spark.layout import compact_delta
    from gcs2postgres_spark.sources.delta_py import (
        delete_where_delta,
        read_delta_py,
        vacuum_delta,
        write_delta_fixture,
    )

    table = str(tmp_path / "dvvac")
    write_delta_fixture(spark.range(40).selectExpr("id").coalesce(1), table)
    delete_where_delta(spark, table, "id < 5", timestamp_ms=100)
    delete_where_delta(spark, table, "id >= 35", timestamp_ms=200)  # supersedes
    assert len(_glob.glob(str(tmp_path / "dvvac" / "deletion_vector_*.bin"))) == 2
    n = vacuum_delta(table)
    assert n == 1  # the superseded vector collected, the live one kept
    assert len(_glob.glob(str(tmp_path / "dvvac" / "deletion_vector_*.bin"))) == 1
    assert read_delta_py(spark, table).count() == 30

    # OPTIMIZE-style compaction folds the DVs into rewritten files and
    # the follow-up vacuum clears the now-unreferenced vector
    compact_delta(spark, table)
    assert read_delta_py(spark, table).count() == 30
    assert _glob.glob(str(tmp_path / "dvvac" / "deletion_vector_*.bin")) == []


def test_delta_alter_rename_and_add_column(spark, tmp_path):
    """ALTER committers: rename upgrades an un-mapped table to column
    mapping (physicalName = original names, so every existing file keeps
    resolving), partition columns rename too (physical-keyed
    partitionValues still prune), added columns read NULL, and DML works
    over the renamed logical name."""
    from gcs2postgres_spark.sources.delta_py import (
        alter_delta_add_column,
        alter_delta_rename_column,
        delete_where_delta,
        read_delta_py,
        write_delta,
    )

    table = str(tmp_path / "alter")
    df = spark.range(20).selectExpr("id", "CAST(id % 4 AS STRING) AS grp")
    write_delta(df.coalesce(1), table, "overwrite", partition_by=["grp"], timestamp_ms=1)
    alter_delta_rename_column(spark, table, "id", "row_id")
    out = read_delta_py(spark, table)
    assert set(out.columns) == {"row_id", "grp"}
    assert sorted(r["row_id"] for r in out.collect()) == list(range(20))
    alter_delta_rename_column(spark, table, "grp", "bucket")  # partition col
    out = read_delta_py(spark, table)
    assert out.filter('bucket = "1"').count() == 5
    pruned = read_delta_py(spark, table, partition_filter={"bucket": {"1"}})
    assert pruned.count() == 5  # pruning through the renamed partition col
    alter_delta_add_column(spark, table, "score", '"double"')
    assert read_delta_py(spark, table).filter("score IS NULL").count() == 20
    delete_where_delta(spark, table, "row_id < 5", timestamp_ms=500)
    assert read_delta_py(spark, table).count() == 15
    with pytest.raises(ValueError, match="already exists"):
        alter_delta_rename_column(spark, table, "row_id", "bucket")
    with pytest.raises(ValueError, match="no column"):
        alter_delta_rename_column(spark, table, "nope", "x")


def test_iceberg_alter_rename_and_add_column(spark, tmp_path):
    """Iceberg metadata-only ALTERs: rename keeps the field id so
    id-stamped files read under the new name; added columns are
    optional with a fresh id and read NULL; v2 tables append a new
    schema-id (old snapshots keep theirs)."""
    import json as _json

    from gcs2postgres_spark.sources.iceberg_py import (
        alter_iceberg_add_column,
        alter_iceberg_rename_column,
        latest_metadata_file,
        read_iceberg_py,
        with_parquet_field_ids,
        write_iceberg_fixture,
        write_iceberg_v2_fixture,
    )

    table = str(tmp_path / "ice_alter")
    df = spark.range(10).selectExpr("id AS v", "concat('n', id) AS name")
    write_iceberg_fixture(with_parquet_field_ids(df).coalesce(1), table)
    alter_iceberg_rename_column(table, "name", "title")
    out = read_iceberg_py(spark, table)
    assert {r["v"]: r["title"] for r in out.collect()} == {i: f"n{i}" for i in range(10)}
    alter_iceberg_add_column(table, "weight", "double")
    assert read_iceberg_py(spark, table).filter("weight IS NULL").count() == 10
    with pytest.raises(ValueError, match="unsupported iceberg type"):
        alter_iceberg_add_column(table, "bad", "varchar")

    # v2: evolution appends a schema-id
    table2 = str(tmp_path / "ice_alter_v2")
    from gcs2postgres_spark.sources.iceberg_py import spark_to_iceberg_schema

    write_iceberg_v2_fixture(
        with_parquet_field_ids(df, spark_to_iceberg_schema(df.schema)).coalesce(1),
        table2,
        sort_col="v",
    )
    alter_iceberg_rename_column(table2, "name", "title")
    meta = _json.loads(open(latest_metadata_file(table2)).read())
    assert len(meta["schemas"]) == 2 and meta["current-schema-id"] == 1
    out = read_iceberg_py(spark, table2)
    assert {r["v"]: r["title"] for r in out.collect()} == {i: f"n{i}" for i in range(10)}


def test_delta_table_changes_feed(spark, tmp_path):
    """Change feed: DV commits surface as position-diff deletes,
    appends as inserts, overwrites as delete(live-at-prev)+insert,
    version windows restrict, and an empty window is empty."""
    from gcs2postgres_spark.sources.delta_py import (
        delete_where_delta,
        delta_table_changes,
        write_delta,
    )

    table = str(tmp_path / "cdf")
    df = spark.range(30).selectExpr("id", "CAST(id % 3 AS STRING) AS part")
    write_delta(df.coalesce(1), table, "overwrite", partition_by=["part"], timestamp_ms=1)
    delete_where_delta(spark, table, "id < 5", timestamp_ms=100)  # v1
    write_delta(
        spark.range(100, 105).selectExpr("id", "CAST(id % 3 AS STRING) AS part").coalesce(1),
        table, "append", timestamp_ms=200,
    )  # v2
    delete_where_delta(spark, table, "id IN (7, 101)", timestamp_ms=300)  # v3

    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in delta_table_changes(spark, table, 0).collect()
    )
    assert rows == sorted(
        [(1, "delete", i) for i in range(5)]
        + [(2, "insert", i) for i in range(100, 105)]
        + [(3, "delete", 7), (3, "delete", 101)]
    )
    ch = delta_table_changes(spark, table, 1, 2)
    assert sorted(r["id"] for r in ch.collect()) == list(range(100, 105))
    assert delta_table_changes(spark, table, 3).count() == 0

    # overwrite: deletes of the rows live at v3, inserts of the new set
    write_delta(
        spark.range(500, 503).selectExpr("id", "CAST(id % 3 AS STRING) AS part").coalesce(1),
        table, "overwrite", timestamp_ms=400,
    )  # v4
    got = sorted(
        (r["_change_type"], r["id"])
        for r in delta_table_changes(spark, table, 3).collect()
    )
    live_at_3 = sorted((set(range(5, 30)) - {7}) | (set(range(100, 105)) - {101}))
    assert got == sorted(
        [("delete", i) for i in live_at_3] + [("insert", i) for i in (500, 501, 502)]
    )


def test_delta_column_mapping_nested_reads(spark, tmp_path):
    """physicalName on NESTED struct members (including inside arrays)
    resolves recursively — a nested rename-evolution table reads the
    logical names with the physical data, NULL structs stay NULL, and
    row-tracking add metadata is ignored safely."""
    from pyspark.sql import Row

    from gcs2postgres_spark.sources.delta_py import (
        read_delta_py,
        write_delta,
        write_delta_column_mapping_fixture,
    )

    table = str(tmp_path / "cmnested")
    df = spark.createDataFrame(
        [
            (1, Row(city="berlin", zip=10115), [Row(q=2, sku="a")]),
            (2, Row(city="oslo", zip=359), [Row(q=5, sku="b"), Row(q=1, sku="c")]),
            (3, None, []),
        ],
        "k int, addr struct<city string, zip int>, "
        "items array<struct<q int, sku string>>",
    )
    write_delta_column_mapping_fixture(
        df, table, renamed={"addr.city": "town", "items.sku": "code"},
        row_tracking=True,
    )
    out = read_delta_py(spark, table)
    assert out.schema["addr"].dataType.fieldNames() == ["town", "zip"]
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["addr"]["town"] == "berlin" and rows[1]["addr"]["zip"] == 10115
    assert [it["code"] for it in rows[2]["items"]] == ["b", "c"]
    assert rows[3]["addr"] is None and rows[3]["items"] == []
    # r14: appends work, but ONLY with the table's current LOGICAL
    # names at every nesting depth — the pre-rename frame (addr.city /
    # items.sku) fails loudly instead of an opaque analysis error
    with pytest.raises(ValueError, match="LOGICAL schema"):
        write_delta(df, table, mode="append")
    renamed_df = spark.createDataFrame(
        [(9, ("paris", 75001), [(1, "z")])],
        "k int, addr struct<town string, zip int>, "
        "items array<struct<q int, code string>>",
    )
    write_delta(renamed_df, table, mode="append", timestamp_ms=1_700_000_001_000)
    got = {r["k"]: r for r in read_delta_py(spark, table).collect()}
    assert got[9]["addr"]["town"] == "paris"
    assert [it["code"] for it in got[9]["items"]] == ["z"]


def test_delta_partition_filter_skips_files(spark, sf_dir, tmp_path):
    # the log-level partition skip must shrink the parquet file list to
    # the matching partitions only, without changing the filtered answer
    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta_fixture
    from gcs2postgres_spark.catalog import load_table
    import pyspark.sql.functions as F

    nation = load_table(spark, str(sf_dir), "nation")
    tmp = str(tmp_path / "delta_part")
    write_delta_fixture(nation.repartition(2), tmp, partition_col="n_regionkey")

    full = read_delta_py(spark, tmp)
    pruned = read_delta_py(spark, tmp, partition_filter={"n_regionkey": {"1", "2"}})
    assert len(set(pruned.inputFiles())) < len(set(full.inputFiles()))

    a = sorted(tuple(r) for r in pruned.filter(F.col("n_regionkey").isin(1, 2)).collect())
    b = sorted(tuple(r) for r in full.filter(F.col("n_regionkey").isin(1, 2)).collect())
    assert a == b


def test_delta_partition_filter_empty_result(spark, sf_dir, tmp_path):
    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta_fixture
    from gcs2postgres_spark.catalog import load_table

    nation = load_table(spark, str(sf_dir), "nation")
    tmp = str(tmp_path / "delta_part_none")
    write_delta_fixture(nation, tmp, partition_col="n_regionkey")
    out = read_delta_py(spark, tmp, partition_filter={"n_regionkey": {"99"}})
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [f.name for f in nation.schema.fields]


def test_dynamic_overwrite_leaves_other_partitions_untouched(spark, sf_dir, tmp_path):
    # the physical claim behind parquet_partitioned_overwrite_roundtrip:
    # only the overwritten partition's files change; every other
    # partition keeps the exact same file set (names + mtimes)
    import os

    from gcs2postgres_spark.catalog import load_table
    import pyspark.sql.functions as F

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = str(tmp_path / "events_part")
    e.repartition("event_type").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(path)

    def snapshot(skip: str):
        out = {}
        for d in os.listdir(path):
            if d.startswith("event_type=") and skip not in d:
                full = os.path.join(path, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full)
                    if f.endswith(".parquet")
                )
        return out

    before = snapshot(skip="click")
    clicks2 = (
        e.where(F.col("event_type") == "click")
        .withColumn("value", F.col("value") * 2)
        .repartition("event_type")
    )
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        clicks2.write.mode("overwrite").partitionBy("event_type").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    assert snapshot(skip="click") == before
    # and the click partition really was replaced
    back = spark.read.parquet(path)
    orig_click_sum = [
        r.s for r in e.where("event_type = 'click'").agg(F.sum("value").alias("s")).collect()
    ][0]
    new_click_sum = [
        r.s
        for r in back.where("event_type = 'click'").agg(F.sum("value").alias("s")).collect()
    ][0]
    assert abs(new_click_sum - 2 * orig_click_sum) < 1e-6 * abs(orig_click_sum)


def test_avro_fixed_decimal_full_width_roundtrip(tmp_path):
    """A decimal logicalType over a `fixed` base must be written at
    exactly schema['size'] bytes, sign-extended (Avro spec: fixed
    decimals occupy the full fixed width) — minimal-length
    two's-complement is only legal over `bytes`. Not reachable via
    spark_to_avro_schema (which maps DecimalType to bytes), but
    write_avro_file accepts arbitrary external writer schemas."""
    from decimal import Decimal

    from gcs2postgres_spark.sources.avro_py import read_avro_file, write_avro_file

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {
                "name": "dec",
                "type": {
                    "type": "fixed",
                    "name": "dec8",
                    "size": 8,
                    "logicalType": "decimal",
                    "precision": 12,
                    "scale": 2,
                },
            }
        ],
    }
    recs = [
        {"dec": Decimal("1.00")},       # 1-byte unscaled → pad to 8
        {"dec": Decimal("-12345.67")},  # negative → sign-extended 0xFF pad
        {"dec": Decimal("0.00")},
        {"dec": Decimal("99999999.99")},
    ]
    p = str(tmp_path / "fixed_dec.avro")
    write_avro_file(p, schema, recs)
    _, got = read_avro_file(p)
    assert got == recs
    # the container's data bytes must hold full-width cells: re-write a
    # single row and confirm its raw block is exactly 8 bytes of datum
    import pytest

    with pytest.raises(ValueError, match="fixed size"):
        write_avro_file(
            str(tmp_path / "overflow.avro"),
            {
                "type": "record",
                "name": "row",
                "fields": [
                    {
                        "name": "dec",
                        "type": {
                            "type": "fixed",
                            "name": "dec1",
                            "size": 1,
                            "logicalType": "decimal",
                            "precision": 12,
                            "scale": 2,
                        },
                    }
                ],
            },
            [{"dec": Decimal("12345.00")}],
        )
    # knife edge (r8 advisor): unscaled -128 has bit_length 8 but fits
    # ONE signed byte — the old (bit_length+8)//8 guard overestimated
    # and spuriously rejected negative exact powers of two at the width
    # limit; +128 genuinely needs two bytes and must still raise
    size1 = {
        "type": "record",
        "name": "row",
        "fields": [
            {
                "name": "dec",
                "type": {
                    "type": "fixed",
                    "name": "dec1b",
                    "size": 1,
                    "logicalType": "decimal",
                    "precision": 3,
                    "scale": 2,
                },
            }
        ],
    }
    p_edge = str(tmp_path / "edge.avro")
    write_avro_file(p_edge, size1, [{"dec": Decimal("-1.28")}])
    _, got_edge = read_avro_file(p_edge)
    assert got_edge == [{"dec": Decimal("-1.28")}]
    with pytest.raises(ValueError, match="fixed size"):
        write_avro_file(
            str(tmp_path / "edge_over.avro"), size1, [{"dec": Decimal("1.28")}]
        )


# ------------------------------------------------- iceberg AVRO data files


def test_iceberg_avro_field_id_rename(spark, tmp_path):
    """Avro data files resolve columns BY FIELD ID (the iceberg avro
    schema's "field-id" attribute): a column renamed after the avro era
    still reads the old files' values under its NEW name — the parity
    point ORC can't offer (native scan is name-only)."""
    import os

    from pyspark.sql import types as T

    from gcs2postgres_spark.sources.avro_py import write_avro_file
    from gcs2postgres_spark.sources.iceberg_py import (
        data_file_entry,
        read_iceberg_py,
        write_manifest,
        write_manifest_list,
        write_snapshot_metadata,
    )

    table = str(tmp_path / "tbl")
    data_dir = os.path.join(table, "data")
    os.makedirs(data_dir)
    avro_schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long", "field-id": 1},
            {"name": "v", "type": "string", "field-id": 2},
        ],
    }
    part = os.path.join(data_dir, "part-00000.avro")
    write_avro_file(part, avro_schema, [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    mdir = os.path.join(table, "metadata")
    os.makedirs(mdir)
    manifest = os.path.join(mdir, "manifest-1.avro")
    write_manifest(manifest, [data_file_entry(part)])
    mlist = os.path.join(mdir, "snap-1.avro")
    write_manifest_list(mlist, [manifest], snapshot_id=1)
    # table schema renames field id 1: k -> k_renamed
    write_snapshot_metadata(
        table,
        T.StructType(
            [
                T.StructField("k_renamed", T.LongType()),
                T.StructField("v", T.StringType()),
            ]
        ),
        [{"snapshot-id": 1, "manifest-list": mlist}],
        current_snapshot_id=1,
        version=1,
    )
    df = read_iceberg_py(spark, table)
    assert df.columns == ["k_renamed", "v"]
    assert sorted((r["k_renamed"], r["v"]) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def test_iceberg_mixed_parquet_and_avro_data(spark, tmp_path):
    """One snapshot holding BOTH parquet and avro data files: the two
    format groups scan natively/decoded respectively and union to the
    table schema — a mid-migration table shape."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from gcs2postgres_spark.sources.avro_py import write_avro_file
    from gcs2postgres_spark.sources.iceberg_py import (
        data_file_entry,
        read_iceberg_py,
        write_manifest,
        write_manifest_list,
        write_snapshot_metadata,
    )

    table = str(tmp_path / "tbl")
    data_dir = os.path.join(table, "data")
    os.makedirs(data_dir)
    pq_part = os.path.join(data_dir, "part-00000.parquet")
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array(["a", "b"])}), pq_part
    )
    av_part = os.path.join(data_dir, "part-00001.avro")
    write_avro_file(
        av_part,
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "k", "type": "long", "field-id": 1},
                {"name": "v", "type": "string", "field-id": 2},
            ],
        },
        [{"k": 3, "v": "c"}],
    )
    mdir = os.path.join(table, "metadata")
    os.makedirs(mdir)
    manifest = os.path.join(mdir, "manifest-1.avro")
    write_manifest(manifest, [data_file_entry(pq_part), data_file_entry(av_part)])
    mlist = os.path.join(mdir, "snap-1.avro")
    write_manifest_list(mlist, [manifest], snapshot_id=1)
    write_snapshot_metadata(
        table,
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
        ),
        [{"snapshot-id": 1, "manifest-list": mlist}],
        current_snapshot_id=1,
        version=1,
    )
    got = sorted((r["k"], r["v"]) for r in read_iceberg_py(spark, table).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_avro_row_count_matches_decode(tmp_path):
    """avro_row_count (block-header skim, no decode) equals the decoded
    record count, including across multiple blocks and deflate."""
    import os

    from gcs2postgres_spark.sources.avro_py import (
        avro_row_count,
        read_avro_file,
        write_avro_file,
    )

    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "x", "type": "long"}],
    }
    for codec in ("null", "deflate"):
        p = os.path.join(str(tmp_path), f"f_{codec}.avro")
        records = [{"x": i} for i in range(1234)]
        write_avro_file(p, schema, records, codec=codec)
        assert avro_row_count(p) == 1234
        _s, got = read_avro_file(p)
        assert len(got) == 1234
