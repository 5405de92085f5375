"""Snapshot diff: row-level change classification between two versions
of a keyed table (the CDC/audit op behind incremental loads, replication
validation, and "what changed since yesterday" warehouse questions —
the reference's pipeline re-loads whole tables and has no diff surface;
this is the engine-layer capability).

Scale: ONE full-outer null-safe equi-join on the key — both sides
shuffle once, partition-wise compare, no broadcast assumption, no
driver materialization. The compare predicate uses null-safe struct
equality so NULL→value and value→NULL edits classify as changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Classify every key as added / removed / changed / unchanged.

    Returns one row per key present in either snapshot:
    ``(*key_cols, status)``.  Keys must be unique per snapshot (assert
    upstream); comparison is null-safe on ``compare_cols``.
    """
    o = old.select(
        *[F.col(c).alias(f"__ok_{c}") for c in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__oval"),
    )
    n = new.select(
        *[F.col(c).alias(f"__nk_{c}") for c in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("__nval"),
    )
    cond = None
    for c in key_cols:
        eq = F.col(f"__ok_{c}").eqNullSafe(F.col(f"__nk_{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("__oval").isNotNull()
    in_new = F.col("__nval").isNotNull()
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(F.col("__oval").eqNullSafe(F.col("__nval")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    keys = [
        F.coalesce(F.col(f"__ok_{c}"), F.col(f"__nk_{c}")).alias(c)
        for c in key_cols
    ]
    return joined.select(*keys, status.alias("status"))
