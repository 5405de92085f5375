"""Skew-resistant aggregation (SURVEY.md §2.6 / 100 TB design).

When a groupBy key is heavily skewed (a handful of hot keys own most
rows — events.user_id in the testdata: 15 users, thousands of rows
each), a plain hash aggregation sends every hot key's rows to one
reducer. Two mitigations, both expressed as stock DataFrame plans:

- AQE skew-join splitting handles *join* skew automatically
  (session.py enables it).
- For *aggregation* skew with non-algebraic combine steps, the
  classic salt-and-two-phase pattern: append a random-but-
  deterministic salt to the key, partially aggregate on
  (key, salt) — spreading each hot key over `salt_buckets`
  reducers — then finish on the key alone. For algebraic aggregates
  (sum/count/min/max/avg) Spark's partial aggregation already does
  map-side combine, so salting buys little; it matters for
  count-distinct-style or collect-style aggregates whose partial
  state is large per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    salt_buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-spread count-distinct + sum, parameterized by key.

    Phase 1 groups on (keys…, salt) where salt = xxhash64(salt_on) %
    salt_buckets (deterministic — reruns give identical plans), phase 2
    merges the per-salt partials. Exact result, two narrow shuffles
    instead of one skewed one.

    Returns columns: key_cols…, n_rows, n_distinct_types, total_value —
    shaped for the events table; generalize by passing different
    aggregate lists if reused.
    """
    salt_src = salt_on or "event_id"
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(salt_buckets)))
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.collect_set("event_type").alias("__types"),
        F.sum("value").alias("__sum"),
    )
    return (
        phase1.groupBy(*key_cols)
        .agg(
            F.sum("__n").cast("bigint").alias("n_rows"),
            F.size(F.array_distinct(F.flatten(F.collect_list("__types")))).cast("bigint").alias(
                "n_distinct_types"
            ),
            F.sum("__sum").alias("total_value"),
        )
    )
