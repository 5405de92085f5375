"""bounds_from_predicate: the WHERE-clause → stats_filter bridge, and
its facade wiring (single-table SELECTs skip files; everything
unprovable contributes nothing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcs2postgres_spark.sources.predicate_bounds import bounds_from_predicate


def test_simple_shapes():
    assert bounds_from_predicate("k >= 10") == {"k": (10, None)}
    assert bounds_from_predicate("k > 10") == {"k": (10, None)}  # widened
    assert bounds_from_predicate("k <= 5") == {"k": (None, 5)}
    assert bounds_from_predicate("k = 7") == {"k": (7, 7)}
    assert bounds_from_predicate("10 <= k") == {"k": (10, None)}
    assert bounds_from_predicate("k BETWEEN 3 AND 9") == {"k": (3, 9)}
    assert bounds_from_predicate("name >= 'm'") == {"name": ("m", None)}
    assert bounds_from_predicate("x = 1.5") == {"x": (1.5, 1.5)}


def test_conjunctions_tighten():
    b = bounds_from_predicate("k >= 10 AND k <= 20 AND name = 'a' AND v > 3")
    assert b == {"k": (10, 20), "name": ("a", "a"), "v": (3, None)}
    # repeated bounds take the tighter side
    assert bounds_from_predicate("k >= 1 AND k >= 5") == {"k": (5, None)}


def test_unprovable_contributes_nothing():
    assert bounds_from_predicate("k >= 10 OR k <= 2") == {}
    assert bounds_from_predicate("(k >= 10)") == {}
    assert bounds_from_predicate("upper(name) = 'A'") == {}
    assert bounds_from_predicate("a = b") == {}
    assert bounds_from_predicate("k IN (1, 2)") == {}
    # mixed: the provable conjunct still contributes
    assert bounds_from_predicate("k >= 10 AND a <> b") == {"k": (10, None)}
    # AND inside a string literal never splits
    assert bounds_from_predicate("name = 'x AND y'") == {"name": ("x AND y", "x AND y")}


def test_facade_where_skips_files(spark, tmp_path):
    """A plain facade SELECT with a range WHERE reads fewer files: the
    scan's row count under the derived stats_filter equals only the
    surviving range files, and the VALUES are exactly the predicate's."""
    from gcs2postgres_spark.sources.delta_py import write_delta
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    t = str(tmp_path / "t")
    df = (
        spark.range(0, 400).withColumnRenamed("id", "k")
        .withColumn("v", (F.col("k") * 2).cast("long"))
        .repartitionByRange(4, "k").sortWithinPartitions("k")
    )
    write_delta(df, t, "overwrite", timestamp_ms=1_700_000_000_000)
    got = lakehouse_sql(
        spark, f"SELECT count(*) AS n, min(k) AS lo FROM delta.`{t}` WHERE k >= 390"
    ).collect()[0]
    assert (got["n"], got["lo"]) == (10, 390)
    # equality + join statements still work (no extraction on joins)
    spark.range(5).withColumnRenamed("id", "k").createOrReplaceTempView("pb_side")
    n = lakehouse_sql(
        spark,
        f"SELECT count(*) AS n FROM delta.`{t}` a JOIN pb_side b ON a.k = b.k",
    ).collect()[0]["n"]
    assert n == 5


def test_dml_matching_scan_pruned_but_correct(spark, tmp_path):
    """DELETE/UPDATE with a range predicate: the derived bounds prune
    the matching scan, and the results are value-identical to the
    unpruned semantics (skipped files keep their rows and any existing
    DVs untouched)."""
    from gcs2postgres_spark.sources.delta_py import (
        delete_where_delta,
        read_delta_py,
        update_where_delta,
        write_delta,
    )
    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        read_iceberg_py,
        write_iceberg_v2_fixture,
    )

    df = (
        spark.range(0, 200).withColumnRenamed("id", "k")
        .withColumn("v", (F.col("k") * 2).cast("long"))
        .repartitionByRange(4, "k").sortWithinPartitions("k")
    )
    d = str(tmp_path / "d")
    write_delta(df, d, "overwrite", timestamp_ms=1_700_000_000_000)
    delete_where_delta(spark, d, "k >= 180", timestamp_ms=1_700_000_001_000)
    delete_where_delta(spark, d, "k < 10", timestamp_ms=1_700_000_002_000)
    got = sorted(r["k"] for r in read_delta_py(spark, d).collect())
    assert got == list(range(10, 180))
    update_where_delta(spark, d, "k BETWEEN 10 AND 12", {"v": "v + 1000"},
                       timestamp_ms=1_700_000_003_000)
    vals = {r["k"]: r["v"] for r in read_delta_py(spark, d).collect()}
    assert vals[10] == 1020 and vals[13] == 26

    i = str(tmp_path / "i")
    write_iceberg_v2_fixture(df, i, sort_col="k")
    delete_where(spark, i, "k >= 180", snapshot_ts_ms=1_700_000_001_000)
    delete_where(spark, i, "k < 10", snapshot_ts_ms=1_700_000_002_000)
    got = sorted(r["k"] for r in read_iceberg_py(spark, i).collect())
    assert got == list(range(10, 180))
    # repeated predicate stays a no-op with pruning active
    assert delete_where(spark, i, "k >= 180",
                        snapshot_ts_ms=1_700_000_003_000) is None
