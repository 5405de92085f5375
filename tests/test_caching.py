"""Size-conditional transient persist (operators/caching.py): small
parquet inputs must SKIP the cache (the sf0.1 A/B showed the build cost
exceeding the recompute saving below ~20k rows), larger/unknown inputs
must persist, and release_transient_caches() must drain what was
cached."""

from pyspark import StorageLevel

from gcs2postgres_spark.catalog import load_table
from gcs2postgres_spark.operators import caching
from gcs2postgres_spark.operators.caching import (
    MIN_PERSIST_INPUT_ROWS,
    maybe_persist,
    release_transient_caches,
    scan_rows_upper_bound,
)

from tests.conftest import SF_SMOKE


def test_scan_rows_upper_bound_parquet(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    rows = scan_rows_upper_bound(docs)
    assert rows == docs.count()
    # derived frames over the same scan still report their input files
    derived = docs.selectExpr("doc_id", "length(text) as n").filter("n >= 0")
    assert scan_rows_upper_bound(derived) == rows


def test_scan_rows_upper_bound_unknown_for_in_memory(spark):
    df = spark.range(10).toDF("id")
    assert scan_rows_upper_bound(df) is None


def test_maybe_persist_skips_small_parquet_input(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    assert docs.count() < MIN_PERSIST_INPUT_ROWS
    before = len(caching._TRANSIENT)
    out = maybe_persist(docs.select("doc_id"))
    assert out.storageLevel == StorageLevel.NONE
    assert len(caching._TRANSIENT) == before


def test_maybe_persist_caches_unknown_input_and_release_drains(spark):
    df = spark.range(100).toDF("id")
    out = maybe_persist(df)
    assert out.storageLevel != StorageLevel.NONE
    released = release_transient_caches()
    assert released >= 1
    assert out.storageLevel == StorageLevel.NONE
    assert caching._TRANSIENT == []
