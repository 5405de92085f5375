"""Pins for functions/exact.py — the round-6 replacement for the
floor(decimal-division) 6-dp pattern.

Spark's decimal division rounds HALF_UP to scale 6 BEFORE floor, so
``floor(1999999/2000000 :: decimal)`` = 1 while the exact integer
quotient is 0 (the advisor-verified knife edge). ``exact_intdiv``
computes ``(n - n % d) / d`` — an evenly-divisible division the scale-6
rounding cannot perturb — and must agree with Spark's integral ``div``
operator (and DuckDB's ``//``, checked in the oracle-parity suite)
everywhere, including negatives (truncation toward zero, not floor).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.functions.exact import exact_intdiv, ratio_6dp

CASES = [
    (1999999, 2000000),  # the HALF_UP knife edge: floor(dec-div) says 1
    (2000001, 2000000),
    (7, 2),
    (-7, 2),
    (7, -2),
    (-7, -2),
    (0, 5),
    (10**18 + 10**12 - 1, 10**12),
    (999999999999999999, 1000000000000000000),
    (10**17, 3),
]


def test_exact_intdiv_matches_div_operator_and_duckdb(spark):
    df = spark.createDataFrame(CASES, "a long, b long")
    rows = df.select(
        "a",
        "b",
        exact_intdiv(F.col("a"), F.col("b")).alias("mine"),
        F.expr("a div b").alias("spark_div"),
    ).collect()
    for r in rows:
        assert int(r["mine"]) == r["spark_div"], (r["a"], r["b"])
        duck = duckdb.sql(
            f"SELECT CAST({r['a']} AS HUGEINT) // {r['b']}"
        ).fetchone()[0]
        assert int(r["mine"]) == int(duck), (r["a"], r["b"])


def test_floor_decimal_division_is_actually_broken(spark):
    # regression guard for the premise: if a Spark upgrade ever makes
    # floor(decimal-division) exact, this pin flags the helper as
    # droppable rather than silently keeping the workaround
    row = (
        spark.createDataFrame([(1999999, 2000000)], "a long, b long")
        .select(
            F.floor(
                F.col("a").cast("decimal(38,0)") / F.col("b")
            ).alias("floored")
        )
        .first()
    )
    assert int(row["floored"]) == 1  # HALF_UP-then-floor artifact


def test_ratio_6dp_knife_edge(spark):
    df = spark.createDataFrame(
        [(1999999, 2000000), (1, 3), (2, 3), (5, 4)], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): r["r"]
        for r in df.select(
            "a", "b", ratio_6dp(F.col("a"), F.col("b")).alias("r")
        ).collect()
    }
    assert got[(1999999, 2000000)] == 0.999999  # NOT 1.0
    assert got[(1, 3)] == 0.333333
    assert got[(2, 3)] == 0.666666
    assert got[(5, 4)] == 1.25


def test_exact_intdiv_property_random(spark):
    # property: equals Python's exact integer quotient truncated toward
    # zero (which is what Spark div and DuckDB // implement), over a
    # hypothesis-style random grid incl. knife-edge-adjacent values
    import random

    rng = random.Random(42)
    cases = []
    for _ in range(300):
        b = rng.choice([1, 2, 3, 7, 97, 10**6, 2 * 10**6, 10**12])
        q = rng.randint(-(10**6), 10**6)
        r = rng.randint(0, b - 1)
        a = q * b + r  # exercises exact multiples AND near-boundary
        cases.append((a, b))
        cases.append((a - 1, b))
        cases.append((a + 1, b))
    df = spark.createDataFrame(cases, "a long, b long")
    rows = df.select(
        "a", "b", exact_intdiv(F.col("a"), F.col("b")).alias("got")
    ).collect()
    for row in rows:
        a, b = row["a"], row["b"]
        want = abs(a) // abs(b) * (1 if (a >= 0) == (b > 0) else -1)
        assert int(row["got"]) == want, (a, b, int(row["got"]), want)


def test_ppr_empty_seed_intersection_raises(spark):
    from gcs2postgres_spark.operators.pagerank import ppr_fixed

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("zzz",)], "node string")
    with pytest.raises(ValueError, match="seed set does not intersect"):
        ppr_fixed(edges, seeds, checkpoint=False)
