"""Physical layout: bucketed joins must plan without Exchange;
partitioned reads must prune directories (PartitionFilters)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.catalog import load_table
from gcs2postgres_spark.layout import bucketed_equijoin, write_bucketed, write_partitioned
from gcs2postgres_spark.plans.inspect import formatted_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", "o_orderkey", n_buckets=4, sort_col="o_orderkey")
    li2 = li.withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(li2, "lineitem_b", "o_orderkey", n_buckets=4, sort_col="o_orderkey")
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_exchange(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the planner must pick sort-merge — the case
    # bucketing exists for (two big fact tables)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_equijoin(spark, left, right, "o_orderkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "hashpartitioning" not in plan, plan  # no shuffle exchange
        # sort-within-bucket also removes the pre-join Sort
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        expect = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_does_exchange(spark, sf_dir):
    # control: the same join on plain tables shuffles (unless broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        plan = formatted_plan(li.join(o, li.l_orderkey == o.o_orderkey))
        assert "Exchange" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_q18_q21_bucketed_match_unbucketed_and_skip_fact_shuffle(spark, sf_dir):
    """The registered bucketed variants must (a) return exactly the
    unbucketed results and (b) plan the per-orderkey aggregate + fact
    join WITHOUT hash-exchanging lineitem/orders (the bucket scan
    satisfies the distribution)."""
    from gcs2postgres_spark.queries.advanced import q12_priority_caseagg, q18_large_orders
    from gcs2postgres_spark.queries.bucketed_q import (
        q12_priority_caseagg_bucketed,
        q18_large_orders_bucketed,
        q21_waiting_supplier_bucketed,
        q3_shipping_priority_bucketed,
    )
    from gcs2postgres_spark.queries.joins import q3_shipping_priority
    from gcs2postgres_spark.queries.tpch_rest import q21_waiting_supplier

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for plain_fn, bkt_fn in [
            (q18_large_orders, q18_large_orders_bucketed),
            (q21_waiting_supplier, q21_waiting_supplier_bucketed),
            (q3_shipping_priority, q3_shipping_priority_bucketed),
            (q12_priority_caseagg, q12_priority_caseagg_bucketed),
        ]:
            bkt = bkt_fn(spark, sf_dir)
            plan = formatted_plan(bkt)
            # the fact-side scans must be bucketed scans...
            assert "SelectedBucketsCount" in plan, plan
            # ...and no hash exchange may touch a fact-table column
            for frag in plan.split("Exchange hashpartitioning")[1:]:
                keys = frag[:120]
                assert "l_orderkey" not in keys and "o_orderkey" not in keys, plan
            assert sorted(map(tuple, bkt.collect())) == sorted(
                map(tuple, plain_fn(spark, sf_dir).collect())
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_partitioned_write_prunes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory(prefix="part_docs_") as d:
        write_partitioned(docs, d, ["lang"])
        rd = spark.read.parquet(d).filter(F.col("lang") == "en")
        plan = formatted_plan(rd)
        assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:200], plan
        n_en = docs.filter(F.col("lang") == "en").count()
        assert rd.count() == n_en


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from gcs2postgres_spark.layout import compact_parquet

    src = str(tmp_path / "many")
    spark.range(100000).repartition(40).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 40
    n = compact_parquet(spark, src, str(tmp_path / "few"), target_bytes=10**9)
    assert n == 1
    got = spark.read.parquet(str(tmp_path / "few")).count()
    assert got == 100000


def test_compact_delta_atomic_and_lossless(spark, tmp_path):
    import glob

    from gcs2postgres_spark.layout import compact_delta
    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta

    path = str(tmp_path / "t")
    write_delta(spark.range(5000).repartition(20), path, "overwrite", timestamp_ms=1)
    write_delta(spark.range(5000, 6000).repartition(10), path, "append", timestamp_ms=2)
    before = len(
        [f for f in glob.glob(f"{path}/**/*.parquet", recursive=True) if "_delta_log" not in f]
    )
    assert before == 30
    n = compact_delta(spark, path, target_bytes=10**9)
    assert n < before
    df = read_delta_py(spark, path)
    assert df.count() == 6000
    assert df.agg({"id": "sum"}).first()[0] == sum(range(6000))


def test_compact_delta_partitioned_keeps_partition_values(spark, tmp_path):
    # the ADVICE-flagged corruption: compacting a partitioned table used
    # to rewrite files without partitionBy while metaData kept the
    # partition column, so the reader injected NULL for it on every row
    from pyspark.sql import functions as F

    from gcs2postgres_spark.layout import compact_delta
    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta

    path = str(tmp_path / "pt")
    df = spark.range(2000).select(
        "id", (F.col("id") % 3).cast("string").alias("grp")
    )
    write_delta(df.repartition(12), path, "overwrite", partition_by=["grp"], timestamp_ms=1)
    n = compact_delta(spark, path, target_bytes=10**9)
    assert n <= 3  # one file per partition value
    rd = read_delta_py(spark, path)
    assert rd.filter(F.col("grp").isNull()).count() == 0
    got = {r["grp"]: r["n"] for r in rd.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert got == {"0": 667, "1": 667, "2": 666}
    assert rd.agg(F.sum("id")).first()[0] == sum(range(2000))


def test_write_delta_partition_mismatch_raises(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from gcs2postgres_spark.sources.delta_py import write_delta

    path = str(tmp_path / "pm")
    df = spark.range(100).select("id", (F.col("id") % 2).cast("string").alias("grp"))
    write_delta(df, path, "overwrite", partition_by=["grp"], timestamp_ms=1)
    with _pytest.raises(ValueError, match="partitionColumns"):
        write_delta(df, path, "append", partition_by=[], timestamp_ms=2)
    # partition_by=None inherits the table layout instead of breaking it
    write_delta(df, path, "append", timestamp_ms=3)
    from gcs2postgres_spark.sources.delta_py import read_delta_py

    assert read_delta_py(spark, path).filter(F.col("grp").isNull()).count() == 0
    assert read_delta_py(spark, path).count() == 200


def test_write_delta_overwrite_schema_change_reemits_metadata(spark, tmp_path):
    from pyspark.sql import functions as F

    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta

    path = str(tmp_path / "sc")
    write_delta(spark.range(10), path, "overwrite", timestamp_ms=1)
    wider = spark.range(5).select("id", F.lit("x").alias("tag"))
    write_delta(wider, path, "overwrite", timestamp_ms=2)
    rd = read_delta_py(spark, path)
    assert set(rd.columns) == {"id", "tag"}
    assert rd.count() == 5


def test_list_data_files_hadoop_fs(spark, tmp_path):
    from gcs2postgres_spark.layout import list_data_files

    src = str(tmp_path / "lf")
    spark.range(1000).repartition(4).write.parquet(src)
    files = list_data_files(spark, src)
    assert len(files) == 4
    assert all(size > 0 for _p, size in files)
    assert all(p.endswith(".parquet") for p, _s in files)
    assert list_data_files(spark, str(tmp_path / "missing")) == []
