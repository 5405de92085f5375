"""Join operators beyond Spark's built-ins: as-of join, range join,
per-group top-k (SURVEY.md §2.6 "Joins" row).

The reference has no joins at all (its single query is ``SELECT *`` —
reference src/db/db.go:59); these are engine-layer capabilities
delegated to BigQuery there and rebuilt natively here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the payload of the latest right
    row with ``right_time <= left_time`` (backward; inclusive) for the same
    key. Left rows with no match keep NULL payload (left-outer semantics).

    Scale design: the naive plan (equi-join on key + time filter + window)
    explodes to |left_key| × |right_key| rows per key before filtering. This
    implementation instead UNIONs both sides, tagged, into one relation and
    runs a single window ``last(payload, ignorenulls)`` ordered by
    (time, side) per key — one shuffle + sort, zero row explosion,
    O(|left| + |right|) state. This is the standard distributed as-of
    pattern (same shape as sort-merge as-of in kdb/pandas merge_asof, but
    expressed as a Catalyst window so it scales with partitions).

    Build rows sort before probe rows at equal timestamps (side 0 < 1), so
    an exactly-equal timestamp matches (inclusive bound).

    ``direction="forward"`` attaches the EARLIEST right row with
    ``right_time >= left_time`` instead — same single-shuffle union
    plan, with the window frame flipped to currentRow..unboundedFollowing
    and ``first(ignorenulls)`` (probe rows sort before build rows at
    equal timestamps so the inclusive bound still matches).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # backward: left probes sort AFTER right builds at equal t (side 1 > 0),
    # lookback frame + last().  forward: left probes sort BEFORE right
    # builds at equal t, lookahead frame + first().
    probe_side = 1 if direction == "backward" else 0
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        F.col(left_on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(probe_side).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in right_payload],
    )
    r_tagged = right.select(
        F.col(right_on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(1 - probe_side).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in right_payload],
    )
    unioned = l_tagged.unionByName(r_tagged)
    base = Window.partitionBy("__key").orderBy(
        F.col("__t").asc(), F.col("__side").asc()
    )
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = lambda c: F.last(f"__p_{c}", ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = lambda c: F.first(f"__p_{c}", ignorenulls=True).over(w)  # noqa: E731
    filled = unioned.select(
        *lcols,
        F.col("__side"),
        *[fill(c).alias(c) for c in right_payload],
    )
    return filled.filter(F.col("__side") == probe_side).drop("__side")


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value: str | Column,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Band/range join: match each fact row to band rows with
    ``lo <= value < hi``. The band table is broadcast (it is small by
    construction), so this is a broadcast-nested-loop with a range
    predicate — no shuffle of the fact side, which is what survives at
    100 TB. For large-large range joins, bucketize the range key first
    and equi-join on the bucket."""
    v = F.col(value) if isinstance(value, str) else value
    return fact.join(F.broadcast(bands), (v >= F.col(lo)) & (v < F.col(hi)), how)


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via row_number over a window — partial top-k is
    pushed map-side by Spark's WindowGroupLimit optimization (rank-limit
    pushdown), so each partition prunes to k before the shuffle."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    block_cols: list[tuple[str, str]],
    max_dist: int = 2,
    how: str = "inner",
) -> DataFrame:
    """Entity-resolution join: equality blocking + Levenshtein verify.

    The scale-true shape of approximate string matching: a raw fuzzy
    join is a cartesian product (O(n·m) edit-distance calls — dead at
    100 TB), so candidates are first generated by an EQUI-join on
    blocking keys (``block_cols``: (left_col, right_col) pairs — e.g.
    brand + container + first name token), then verified with the exact
    JVM-side ``levenshtein`` only within blocks.  Cost is
    sum(block_a × block_b) edit distances; pick blocking keys so block
    sizes stay O(1)-ish relative to table growth (adding a name-prefix
    token does this for product catalogs).  Blocking recall is a
    modeling choice (same as MinHash banding): a true match outside
    every shared block is missed — standard ER practice is multiple
    blocking passes unioned, which composes here by unioning calls.

    No broadcast assumption: both sides may be huge; the equi-join
    shuffles on the block key like any other key-partitioned join.

    Both sides are explicitly hash-repartitioned on their block keys
    first. This is the canonical ER plan at scale (both sides big →
    key-partitioned join), and at bench scale it fixes a measured
    parallelism trap: a compact scan yields few partitions (part at
    sf3 scans as 2), the planner broadcasts the dirty side, and the
    ENTIRE block_a×block_b levenshtein verify then runs on those 2
    probe tasks — 55.3M candidate verifies on 2 of 32 cores (sf3
    measurement behind the r7 166 s record). The explicit exchange of
    the 600k-row inputs is noise next to the verify it spreads."""
    target = left.sparkSession.sparkContext.defaultParallelism
    left = left.repartition(target, *[lc for lc, _ in block_cols])
    right = right.repartition(target, *[rc for _, rc in block_cols])
    cond = None
    for lc, rc in block_cols:
        c = left[lc].eqNullSafe(right[rc])
        cond = c if cond is None else (cond & c)
    # Measured (r6, sf1 interleaved A/B): the "obvious" optimizations
    # LOSE here — a |len(a)-len(b)| <= max_dist pre-filter plus Spark's
    # thresholded three-arg levenshtein benched 29 s vs 24 s for this
    # plain form. On short attribute strings the full DP is already
    # cheap and codegen-friendly; the extra length arithmetic and the
    # thresholded variant's bookkeeping cost more than they save. For
    # LONG text columns the thresholded form would win — re-measure
    # before flipping, don't guess.
    pred = F.levenshtein(left[left_text], right[right_text]) <= max_dist
    return left.join(right, cond & pred, how)


def blocked_fuzzy_join_topk(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    block_cols: list[tuple[str, str]],
    left_key: str,
    right_order: list[str],
    max_dist: int = 2,
    k: int = 1,
) -> DataFrame:
    """Entity-resolution join with GRACEFUL DEGRADATION: blocked fuzzy
    join capped to the k best matches per left row.

    ``blocked_fuzzy_join`` is Ω(output): on duplicate-heavy data one
    pathological block (30 same-name replicas each side → 900 pairs per
    entity) dominates the run — measured 166 s at sf3 where the match
    output itself grew ~9× quadratically. Real ER pipelines don't want
    the full bipartite match set anyway; they want the best candidate(s)
    per entity. This variant keeps candidate generation identical
    (equi-join on blocking keys, JVM levenshtein verify) and then keeps
    ``row_number() <= k`` per left key ordered by
    (distance, *right_order) — deterministic under ties.

    Scale shape: output is bounded by k·|left| regardless of block
    pathology, and Spark's rank-limit pushdown (WindowGroupLimit,
    pinned in tests/test_plan_shapes.py) prunes each map partition to k
    rows per key BEFORE the window shuffle, so a hot block's candidate
    pairs never all cross the wire. The returned frame carries a
    ``dist`` column (the verified edit distance).

    Sides are hash-repartitioned on the block keys before the join —
    same parallelism rationale as ``blocked_fuzzy_join`` (a broadcast
    plan over a few-partition scan serializes the whole verify onto
    the scan's task count; measured 2 of 32 cores at sf3).
    """
    target = left.sparkSession.sparkContext.defaultParallelism
    left = left.repartition(target, *[lc for lc, _ in block_cols])
    right = right.repartition(target, *[rc for _, rc in block_cols])
    cond = None
    for lc, rc in block_cols:
        c = left[lc].eqNullSafe(right[rc])
        cond = c if cond is None else (cond & c)
    # frame-qualified references throughout: left_text/right_text (and
    # left_key vs right_order names) may collide across the two sides —
    # the canonical ER case joins two tables sharing a 'name' column,
    # and bare F.col would raise AMBIGUOUS_REFERENCE
    pred = F.levenshtein(left[left_text], right[right_text]) <= max_dist
    cand = left.join(right, cond & pred, "inner").withColumn(
        "dist", F.levenshtein(left[left_text], right[right_text])
    )
    w = Window.partitionBy(left[left_key]).orderBy(
        F.col("dist").asc(), *[right[c].asc() for c in right_order]
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
