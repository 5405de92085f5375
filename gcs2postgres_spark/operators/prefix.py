"""Two-phase global order primitives: the exclusive per-partition
prefix fold.

The repo's standard pattern for global ranks / running sums without a
single-task global window (part_pareto_abc, equidepth deciles, weighted
median, gini, KS, Mann-Whitney, watermark late-drop): range-partition
on the total order, do the per-partition pass in parallel, then add
back each partition's offset = the fold of all EARLIER partitions'
totals.

This module computes those offsets on the DRIVER from one aggregate
row per partition. The bound is spark.sql.shuffle.partitions — config,
not data (the same driver-side cardinality Spark's own RangePartitioner
samples to plan the exchange) — so this is not a driver-materialization
hazard; it replaces what used to be a 32-row single-task window + a
broadcast join per instantiation (one "No Partition Defined for Window"
warning per branch execution, r7 verdict hygiene item, fixed first in
events_watermark_late_drop and factored here for the other five
instantiations).

PRECONDITION (same as the window form it replaces): ``ranged`` must be
materialized (``localCheckpoint(eager=True)``) before its ``pid``
column is read by ANY branch — a re-executed range exchange re-samples
bounds and re-coalesces under AQE, so spark_partition_id() would mean
different ranges in the offsets pass vs the final plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def driver_prefix_sums(
    ranged: DataFrame, val_cols: list[str], pid_col: str = "pid"
) -> tuple[dict[str, Column], dict[str, int]]:
    """Exclusive per-partition prefix sums + grand totals.

    One ``groupBy(pid).sum`` row per partition is collected (the
    config-sized bound above), the exclusive prefix sum per value
    column is folded in Python, and each comes back as a DENSE literal
    array indexed by pid — ``F.get`` is an O(1) positional read per
    row, unlike a ``create_map`` literal whose lookup scans all
    entries (linear in the partition count — a real per-row cost on a
    2000-partition cluster). Missing pids (empty range partitions)
    read 0. Returns ``(prefix_cols, totals)`` where ``totals[c]`` is
    the grand sum as a Python int — use ``F.lit(totals[c])`` instead
    of a second global-window pass. NULL sums (all-NULL partitions)
    fold as 0, matching the ``coalesce(sum(...) OVER (... PRECEDING),
    0)`` they replace."""
    aggs = [F.sum(c).alias(c) for c in val_cols]
    rows = sorted(
        ranged.groupBy(pid_col).agg(*aggs).collect(), key=lambda r: r[pid_col]
    )
    n_slots = (max(r[pid_col] for r in rows) + 1) if rows else 0
    prefix_cols: dict[str, Column] = {}
    totals: dict[str, int] = {}
    for c in val_cols:
        acc = 0
        dense = [0] * n_slots
        for r in rows:
            dense[r[pid_col]] = acc
            v = r[c]
            if v is None:
                continue
            if not isinstance(v, int) or isinstance(v, bool):
                # int()/cast('long') would silently truncate a double or
                # decimal subtotal — wrong prefix sums with no error.
                # Integer-exact inputs (counts, cents, weights) are the
                # house pattern; anything else must be converted by the
                # caller deliberately.
                raise TypeError(
                    f"driver_prefix_sums needs integer-exact columns; "
                    f"{c!r} collected {type(v).__name__} — convert to "
                    "cents/counts first (see house determinism patterns)"
                )
            acc += v
        totals[c] = acc
        if dense:
            arr = F.array(*[F.lit(v).cast("long") for v in dense])
            # F.get: 0-based, NULL out-of-bounds (never raises in ANSI)
            prefix_cols[c] = F.coalesce(
                F.get(arr, F.col(pid_col)), F.lit(0).cast("long")
            )
        else:
            prefix_cols[c] = F.lit(0).cast("long")
    return prefix_cols, totals


def driver_prefix_max(
    ranged: DataFrame, val_col: str, dtype: str, pid_col: str = "pid"
) -> Column:
    """Exclusive per-partition prefix MAX — the running-max twin of
    ``driver_prefix_sums`` (same bound, same precondition). NULL
    subtotals (all-NULL partitions) are skipped, matching
    ``max(...) OVER (... PRECEDING)`` window semantics; partitions with
    no earlier non-NULL value read NULL. ``dtype`` is the literal cast
    for the value slots (e.g. ``"timestamp"`` — collected Python values
    round-trip through ``F.lit`` only with an explicit type)."""
    rows = sorted(
        ranged.groupBy(pid_col).agg(F.max(val_col).alias("m")).collect(),
        key=lambda r: r[pid_col],
    )
    n_slots = (max(r[pid_col] for r in rows) + 1) if rows else 0
    if not n_slots:
        return F.lit(None).cast(dtype)
    dense: list = [None] * n_slots
    acc = None
    for r in rows:
        dense[r[pid_col]] = acc
        if r["m"] is not None and (acc is None or r["m"] > acc):
            acc = r["m"]
    arr = F.array(*[F.lit(v).cast(dtype) for v in dense])
    return F.get(arr, F.col(pid_col))  # NULL out-of-bounds
