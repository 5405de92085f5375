"""Python DataSource front door (Spark 4 pyspark.sql.datasource):
``spark.read.format("delta_py")`` and streaming sources for both
jar-less formats — the native way to stream a Delta/Iceberg table
without connector jars (round 12)."""

import os
import shutil

import pytest


@pytest.fixture
def registered(spark):
    from gcs2postgres_spark.sources.datasource import (
        register_lakehouse_datasources,
    )

    register_lakehouse_datasources(spark)
    return spark


def _nation(spark, lo=0, hi=24):
    return spark.range(lo, hi).selectExpr(
        "CAST(id AS INT) AS k",
        "concat('N_', id) AS name",
        "CAST(id % 4 AS INT) AS region",
    )


def test_delta_py_batch_format(registered, tmp_path):
    """Batch format: live files after replay, partition columns
    injected from partitionValues with their declared types; deletion
    vectors applied in the partition reader (r15 — the r14 refusal is
    gone)."""
    from gcs2postgres_spark.sources.delta_py import (
        delete_where_delta,
        write_delta,
        write_delta_fixture,
    )

    spark = registered
    t = str(tmp_path / "d")
    write_delta_fixture(_nation(spark).coalesce(1), t, partition_col="region")
    df = spark.read.format("delta_py").option("path", t).load()
    assert df.schema["region"].dataType.typeName() == "integer"
    rows = {(r["k"], r["region"]) for r in df.collect()}
    assert rows == {(i, i % 4) for i in range(24)}
    # DV-bearing table: the deleted row vanishes from the batch read
    delete_where_delta(spark, t, "k = 1", timestamp_ms=1_700_000_001_000)
    rows = {(r["k"], r["region"]) for r in
            spark.read.format("delta_py").option("path", t).load().collect()}
    assert rows == {(i, i % 4) for i in range(24) if i != 1}


def test_delta_py_batch_mapped_nested_and_dv(registered, tmp_path):
    """r15 verdict item 2: columnMapping (incl. NESTED struct fields)
    + deletion vectors through the native front door — physical names
    resolved at every depth, DV bitmap applied per file."""
    from pyspark.sql import functions as F

    from gcs2postgres_spark.sources.delta_py import (
        alter_delta_rename_column,
        delete_where_delta,
        write_delta,
    )

    spark = registered
    t = str(tmp_path / "m")
    df = (
        spark.range(0, 12)
        .withColumnRenamed("id", "k")
        .withColumn("p", (F.col("k") % 3).cast("integer"))
        .withColumn(
            "meta",
            F.struct(
                (F.col("k") * 2).alias("v"),
                F.array(F.col("k").cast("string")).alias("tags"),
            ),
        )
    )
    write_delta(df, t, "overwrite", partition_by=["p"],
                timestamp_ms=1_700_000_000_000)
    alter_delta_rename_column(spark, t, "meta", "info")  # mapping on
    delete_where_delta(spark, t, "k >= 9", timestamp_ms=1_700_000_001_000)
    got = spark.read.format("delta_py").option("path", t).load()
    assert set(got.columns) == {"k", "p", "info"}
    rows = {
        (r["k"], r["p"], r["info"]["v"], tuple(r["info"]["tags"]))
        for r in got.collect()
    }
    assert rows == {(i, i % 3, i * 2, (str(i),)) for i in range(9)}
    # exactness vs the certified functional reader
    from gcs2postgres_spark.sources.delta_py import read_delta_py

    ref = {
        (r["k"], r["p"], r["info"]["v"], tuple(r["info"]["tags"]))
        for r in read_delta_py(spark, t).collect()
    }
    assert rows == ref


def test_delta_py_stream_sink_mapped_table_roundtrip(registered, tmp_path):
    """r16 (the refusal is gone): streamed appends to a columnMapping
    table stage PHYSICAL-named files with physical hive dirs /
    partitionValues keys, exactly-once across a replayed batch — read
    back identical through BOTH the functional reader and the front
    door."""
    from pyspark.sql import functions as F

    from gcs2postgres_spark.sources.delta_py import (
        alter_delta_rename_column,
        read_delta_py,
        write_delta,
    )

    spark = registered
    t = str(tmp_path / "sinkmap")
    write_delta(
        spark.range(0, 3).withColumnRenamed("id", "k")
        .withColumn("p", (F.col("k") % 2).cast("long"))
        .withColumn("v", F.col("k") * 2),
        t, "overwrite", partition_by=["p"], timestamp_ms=1_700_000_000_000,
    )
    alter_delta_rename_column(spark, t, "v", "val")  # mapping on
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    (src_dir / "a.json").write_text(
        '{"k": 10, "p": 0, "val": 20}\n{"k": 11, "p": 1, "val": 22}\n'
    )

    def run():
        q = (
            spark.readStream.schema("k long, p long, val long")
            .json(str(src_dir))
            .writeStream.format("delta_py").option("path", t)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    run()  # replayed availableNow restart: txn dedup, no duplicates
    expect = {(0, 0, 0), (1, 1, 2), (2, 0, 4), (10, 0, 20), (11, 1, 22)}
    got = {(r["k"], r["p"], r["val"])
           for r in read_delta_py(spark, t).collect()}
    assert got == expect
    front = {(r["k"], r["p"], r["val"])
             for r in spark.read.format("delta_py").option("path", t)
             .load().collect()}
    assert front == expect
    # staged stream files store PHYSICAL names (val's physicalName is
    # the pre-rename 'v'), so foreign mapped readers resolve them
    import glob as _glob

    import pyarrow.parquet as _pq

    streamed = [
        p for p in _glob.glob(f"{t}/**/part-stream-*.parquet", recursive=True)
    ]
    assert streamed
    names = set(_pq.ParquetFile(streamed[0]).schema_arrow.names)
    assert "v" in names and "val" not in names, names


def test_delta_py_stream_appends_and_change_commits(registered, tmp_path):
    """Streaming: appends arrive incrementally with exactly-once
    offsets across restarts; a data-changing commit fails the stream
    unless skipChangeCommits=true (delta-spark source semantics)."""
    from gcs2postgres_spark.sources.delta_py import (
        delete_where_delta,
        write_delta,
    )

    spark = registered
    t = str(tmp_path / "d")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_delta(_nation(spark, 0, 5).coalesce(1), t, "overwrite",
                timestamp_ms=1_700_000_000_000)

    def run():
        q = (
            spark.readStream.format("delta_py").option("path", t).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt).start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    assert spark.read.parquet(out).count() == 5
    write_delta(_nation(spark, 100, 103).coalesce(1), t, "append",
                timestamp_ms=1_700_000_001_000)
    run()  # restart from checkpoint: only the new commit's rows arrive
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 102]

    # a DV delete is a change commit: stream fails without the option
    delete_where_delta(spark, t, "k = 0", timestamp_ms=1_700_000_002_000)
    with pytest.raises(Exception, match="skipChangeCommits"):
        run()
    shutil.rmtree(ckpt)  # failed-run checkpoint is poisoned; restart fresh
    shutil.rmtree(out)
    q = (
        spark.readStream.format("delta_py").option("path", t)
        .option("skipChangeCommits", "true").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
    )
    q.processAllAvailable()
    q.stop()
    # change commit skipped wholesale; append commits all present
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 102]


def test_iceberg_py_stream_appends_skip_replace(registered, tmp_path):
    """Iceberg streaming: append snapshots stream their added files;
    replace (compaction) snapshots are skipped silently; delete
    snapshots fail without skipChangeCommits."""
    from gcs2postgres_spark.sources.iceberg_py import (
        append_iceberg_v2,
        create_iceberg_v2_table,
        delete_where,
        rewrite_data_files,
    )

    spark = registered
    t = str(tmp_path / "i")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = _nation(spark, 0, 6)
    create_iceberg_v2_table(df.schema, t)
    append_iceberg_v2(spark, t, df, snapshot_ts_ms=1_700_000_000_000)

    def run(**opts):
        r = spark.readStream.format("iceberg_py").option("path", t)
        for k, v in opts.items():
            r = r.option(k, v)
        q = (
            r.load().writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt).start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    assert spark.read.parquet(out).count() == 6
    append_iceberg_v2(spark, t, _nation(spark, 100, 102),
                      snapshot_ts_ms=1_700_000_001_000)
    rewrite_data_files(spark, t, snapshot_ts_ms=1_700_000_002_000)  # replace
    run()
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 3, 4, 5, 100, 101]  # compaction emitted nothing

    delete_where(spark, t, "k = 0", snapshot_ts_ms=1_700_000_003_000)
    with pytest.raises(Exception, match="skipChangeCommits"):
        run()
    shutil.rmtree(ckpt)
    shutil.rmtree(out)
    run(skipChangeCommits="true")
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2, 3, 4, 5, 100, 101]


def test_delta_py_stream_sink_exactly_once(registered, tmp_path):
    """Native streaming SINK: writeStream.format('delta_py') appends
    one put-if-absent Delta version per micro-batch stamped with a txn
    watermark; a checkpoint-replayed batch is recognized and dropped
    (zero duplicate rows, zero extra versions); the result is readable
    by the jar-less reader AND streams back out through the source."""
    from gcs2postgres_spark.sources.delta_py import (
        _list_commits,
        last_txn_version,
        read_delta_py,
    )

    spark = registered
    src_stage = str(tmp_path / "stage")
    target = str(tmp_path / "delta_target")
    ckpt = str(tmp_path / "ckpt")
    _nation(spark, 0, 30).repartition(3).write.parquet(src_stage)
    schema = spark.read.parquet(src_stage).schema

    def run():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_stage)
            .writeStream.format("delta_py").option("path", target)
            .option("txnAppId", "sink_test")
            .option("checkpointLocation", ckpt).start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    out = read_delta_py(spark, target)
    assert sorted(r["k"] for r in out.collect()) == list(range(30))
    versions = max(_list_commits(os.path.join(target, "_delta_log")))
    assert last_txn_version(spark, target, "sink_test") >= 0

    # force a replay of the last micro-batch: the sink must drop it
    commits_dir = os.path.join(ckpt, "commits")
    last = max(int(f) for f in os.listdir(commits_dir) if f.isdigit())
    os.remove(os.path.join(commits_dir, str(last)))
    crc = os.path.join(commits_dir, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run()
    assert sorted(r["k"] for r in read_delta_py(spark, target).collect()) == list(range(30))
    assert max(_list_commits(os.path.join(target, "_delta_log"))) == versions

    # the sink's output is itself a valid streaming SOURCE (round trip)
    out2 = str(tmp_path / "echo")
    ckpt2 = str(tmp_path / "ckpt2")
    q = (
        spark.readStream.format("delta_py").option("path", target).load()
        .writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", ckpt2).start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out2).count() == 30


def test_delta_py_stream_sink_guards(registered, tmp_path):
    """The sink must refuse a target whose SCHEMA its appends would
    corrupt; an existing PARTITIONED target is adopted (its
    partitioning wins) when the stream schema covers it."""
    from gcs2postgres_spark.sources.delta_py import (
        read_delta_py,
        write_delta,
        write_delta_fixture,
    )

    spark = registered
    src_stage = str(tmp_path / "stage")
    _nation(spark, 100, 106).coalesce(1).write.parquet(src_stage)
    schema = spark.read.parquet(src_stage).schema

    def run(target, ckpt):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_stage)
            .writeStream.format("delta_py").option("path", target)
            .option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # existing partitioned table: adopted, rows routed to its layout
    part_target = str(tmp_path / "pt")
    write_delta_fixture(_nation(spark).coalesce(1), part_target,
                        partition_col="region")
    run(part_target, str(tmp_path / "c1"))
    assert read_delta_py(spark, part_target).count() == 30

    mismatched = str(tmp_path / "mt")
    write_delta(
        spark.createDataFrame([(1, 2.0)], "a int, b double").coalesce(1),
        mismatched, "overwrite", timestamp_ms=1_700_000_000_000,
    )
    with pytest.raises(Exception, match="!= table"):
        run(mismatched, str(tmp_path / "c2"))


def test_iceberg_py_stream_sink_exactly_once(registered, tmp_path):
    """Iceberg native streaming SINK: one fast-append snapshot per
    micro-batch stamped with app-id/batch-id; a checkpoint-replayed
    batch is dropped (zero extra snapshots); partitioned targets
    refuse; the result reads back through the jar-less reader."""
    from gcs2postgres_spark.sources.iceberg_py import (
        create_iceberg_v2_table,
        latest_metadata_file,
        read_iceberg_py,
        write_iceberg_v2_partitioned_fixture,
    )
    import json as _json

    spark = registered
    src_stage = str(tmp_path / "stage")
    target = str(tmp_path / "ice_target")
    ckpt = str(tmp_path / "ckpt")
    _nation(spark, 0, 30).repartition(3).write.parquet(src_stage)
    schema = spark.read.parquet(src_stage).schema
    create_iceberg_v2_table(schema, target)

    def run(tgt=target, ck=ckpt):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_stage)
            .writeStream.format("iceberg_py").option("path", tgt)
            .option("txnAppId", "ice_sink_test")
            .option("checkpointLocation", ck).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    assert sorted(
        r["k"] for r in read_iceberg_py(spark, target).collect()
    ) == list(range(30))
    meta = _json.loads(open(latest_metadata_file(target)).read())
    snaps_before = len(meta["snapshots"])

    # force replay of the last micro-batch
    commits_dir = os.path.join(ckpt, "commits")
    last = max(int(f) for f in os.listdir(commits_dir) if f.isdigit())
    os.remove(os.path.join(commits_dir, str(last)))
    crc = os.path.join(commits_dir, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run()
    meta = _json.loads(open(latest_metadata_file(target)).read())
    assert len(meta["snapshots"]) == snaps_before  # replay dropped
    assert read_iceberg_py(spark, target).count() == 30

    # partitioned target refuses
    pt = str(tmp_path / "pt")
    write_iceberg_v2_partitioned_fixture(_nation(spark), pt, "region")
    with pytest.raises(Exception, match="partitioned"):
        run(tgt=pt, ck=str(tmp_path / "ckpt2"))


def test_delta_py_stream_sink_partitioned(registered, tmp_path):
    """Partitioned sink: rows are routed to hive-layout partition dirs
    with partition columns EXCLUDED from the files (protocol layout);
    a fresh table takes partitioning from the partitionBy option, an
    existing partitioned table is matched (mismatch refuses); the
    result reads back typed through BOTH the jar-less reader and the
    batch datasource."""
    from gcs2postgres_spark.sources.delta_py import read_delta_py

    spark = registered
    src_stage = str(tmp_path / "stage")
    target = str(tmp_path / "pt_target")
    ckpt = str(tmp_path / "ckpt")
    _nation(spark, 0, 24).repartition(2).write.parquet(src_stage)
    schema = spark.read.parquet(src_stage).schema

    def run(ck=ckpt, **opts):
        r = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src_stage)
            .writeStream.format("delta_py").option("path", target)
            .option("partitionBy", "region")
            .option("checkpointLocation", ck)
        )
        for k, v in opts.items():
            r = r.option(k, v)
        q = r.start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    out = read_delta_py(spark, target)
    assert sorted((r["k"], r["region"]) for r in out.collect()) == [
        (i, i % 4) for i in range(24)
    ]
    # hive layout on disk; files do NOT contain the partition column
    import glob as _glob

    import pyarrow.parquet as pq

    pdirs = _glob.glob(os.path.join(target, "region=*"))
    assert len(pdirs) == 4
    one = _glob.glob(os.path.join(pdirs[0], "*.parquet"))[0]
    assert "region" not in pq.read_schema(one).names
    # batch datasource injects partition values typed
    df = spark.read.format("delta_py").option("path", target).load()
    assert df.schema["region"].dataType.typeName() == "integer"
    assert df.filter("region = 2").count() == 6

    # appending with MISMATCHED partitioning refuses
    target2 = target  # same table, different declared partitioning
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src_stage)
        .writeStream.format("delta_py").option("path", target2)
        .option("partitionBy", "name")
        .option("checkpointLocation", str(tmp_path / "ckpt_bad"))
        .start()
    )
    with pytest.raises(Exception, match="partitionColumns"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def test_iceberg_py_batch_format(registered, tmp_path):
    """Batch format over a delete-free Iceberg table; tables with
    delete files refuse with the fast-path pointer."""
    from gcs2postgres_spark.sources.iceberg_py import (
        append_iceberg_v2,
        create_iceberg_v2_table,
        delete_where,
    )

    spark = registered
    t = str(tmp_path / "i")
    df = _nation(spark, 0, 12)
    create_iceberg_v2_table(df.schema, t)
    append_iceberg_v2(spark, t, df, snapshot_ts_ms=1_700_000_000_000)
    got = spark.read.format("iceberg_py").option("path", t).load()
    assert sorted(r["k"] for r in got.collect()) == list(range(12))

    delete_where(spark, t, "k = 3", snapshot_ts_ms=1_700_000_001_000)
    with pytest.raises(Exception, match="read_iceberg_py"):
        spark.read.format("iceberg_py").option("path", t).load().collect()


def test_iceberg_py_batch_nonparquet_data_files(registered, tmp_path):
    """The datasource's per-file reader dispatches on data-file format:
    ORC reads via pyarrow.orc, AVRO via the pure-Python codec —
    previously both crashed in pq.read_table with an opaque parquet
    magic-bytes error."""
    from gcs2postgres_spark.sources.iceberg_py import write_iceberg_fixture

    spark = registered
    df = _nation(spark, 0, 10)
    for fmt in ("avro", "orc"):
        t = str(tmp_path / fmt)
        write_iceberg_fixture(df.repartition(2), t, data_format=fmt)
        got = spark.read.format("iceberg_py").option("path", t).load()
        assert sorted(r["k"] for r in got.collect()) == list(range(10))
