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
