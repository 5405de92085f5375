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


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Skew-spread large-large equi-join: salt the fact side with a
    deterministic hash of ``salt_on`` (a high-cardinality fact column),
    replicate the dim side once per salt bucket, and join on
    (key, salt) — each hot key's rows land on ``salt_buckets`` reducers
    instead of one.

    This is the MANUAL form of what AQE's skewedJoin rewrite does to
    sort-merge joins at runtime; it exists for the cases AQE can't
    reach (a skewed key feeding a downstream stateful op, a
    broadcast-disabled environment, deterministic partition sizing for
    a capacity plan). Cost: the dim side is duplicated ×salt_buckets —
    use only when dim is far smaller than fact but too big (or not
    allowed) to broadcast. Exact result: every fact row meets every
    matching dim row exactly once, because the dim replica set covers
    all salt values and the join key includes the salt equality.
    """
    if salt_on is None:
        raise ValueError("salt_on must name a high-cardinality fact column")
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_buckets))
    )
    replicated_dim = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(salt_buckets).select(
                F.col("id").cast("long").alias("__salt")
            )
        )
    )
    # hint the dim side to a shuffle join: without it, a test-scale dim
    # auto-broadcasts and the salt never spreads anything — the operator
    # exists precisely for the not-broadcastable case, so pin that path
    joined = salted_fact.join(
        replicated_dim.hint("shuffle_hash"),
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["__salt"] == replicated_dim["__salt"]),
    )
    return joined.drop("__salt")
