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


# A band row is a few tens of bytes; 1M rows ≈ 30-60 MB broadcast —
# comfortably under executor/driver headroom, far past any sane
# dimension-band table. Beyond it the bucketized equi-join wins anyway.
RANGE_JOIN_MAX_BROADCAST_ROWS = 1_000_000


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value: str | Column,
    lo: str = "lo",
    hi: str = "hi",
    how: str = "inner",
    strategy: str = "auto",
    max_broadcast_rows: int = RANGE_JOIN_MAX_BROADCAST_ROWS,
    bucket_width: float | None = None,
) -> DataFrame:
    """Band/range join: match each fact row to band rows with
    ``lo <= value < hi``.

    Two physical strategies, picked by ``strategy``:

    - ``"broadcast"``: broadcast-nested-loop with the range predicate —
      no shuffle of the fact side. Right for dimension-sized band
      tables, which is the common case.
    - ``"bucketize"``: the large-band degradation path. One metadata-
      sized aggregate computes the max band width W; each band explodes
      to the ≤2 buckets of width W it overlaps (``sequence(floor(lo/W),
      floor(hi/W))``), the fact side computes ``floor(value/W)``, and
      the match becomes an EQUI-join on the bucket plus the residual
      range predicate — shuffle-partitioned on the bucket key, no
      broadcast, no nested loop. Bounded ≤2× expansion of the band side
      only. Pass ``bucket_width`` to override W (smaller buckets = more
      band replication but tighter probe selectivity).
    - ``"auto"`` (default): bucketize when a parquet-footer probe of the
      band side proves ≥ ``max_broadcast_rows`` input rows; broadcast
      otherwise. An UNKNOWN size (in-memory frames, non-parquet sources)
      broadcasts: a local relation is driver-materialized already, so
      broadcast adds no new OOM exposure — while a file-backed band
      table big enough to matter reports its footer count and degrades.
      Callers that build large band tables from non-parquet sources
      should pass ``strategy="bucketize"`` explicitly.

    ``bucketize`` supports inner/left/left_semi/left_anti (each fact row
    lands in exactly one bucket, so outer-left semantics are exact);
    right/full outer would duplicate unmatched exploded band rows —
    refused, use broadcast for those."""
    v = F.col(value) if isinstance(value, str) else value
    if strategy not in ("auto", "broadcast", "bucketize"):
        raise ValueError(f"strategy must be auto|broadcast|bucketize, got {strategy!r}")
    if strategy == "auto":
        from gcs2postgres_spark.operators.caching import scan_rows_upper_bound

        rows = scan_rows_upper_bound(bands)
        strategy = (
            "bucketize" if rows is not None and rows >= max_broadcast_rows else "broadcast"
        )
    if strategy == "broadcast":
        return fact.join(F.broadcast(bands), (v >= F.col(lo)) & (v < F.col(hi)), how)

    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"bucketized range join cannot express how={how!r} without "
            "duplicating exploded band rows; use strategy='broadcast'"
        )
    if bucket_width is not None:
        width = float(bucket_width)
    else:
        # one small aggregate over the band side: max band width. W >=
        # every band span means each band overlaps at most 2 buckets.
        row = bands.agg(F.max(F.col(hi).cast("double") - F.col(lo).cast("double"))).first()
        width = float(row[0]) if row[0] is not None else 0.0
    if width <= 0:
        width = 1.0  # degenerate (empty/point bands): any width is exact
    b = bands.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo).cast("double") / width).cast("long"),
                F.floor(F.col(hi).cast("double") / width).cast("long"),
            )
        ),
    )
    f = fact.withColumn("__bkt", F.floor(v.cast("double") / width).cast("long"))
    joined = f.join(
        b,
        (f["__bkt"] == b["__bkt"]) & (v >= F.col(lo)) & (v < F.col(hi)),
        how,
    )
    return joined.drop("__bkt")  # name-based: drops both sides' bucket cols


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


def _spread_on_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Hash-repartition ``df`` on its blocking keys UNLESS the frame
    already yields at least the session's default parallelism in
    partitions (ADVICE r8, joins.py repartition-skip). The explicit
    exchange exists to fix one measured trap — a compact scan yielding
    2 partitions, the planner broadcasting the other side, and the
    whole block_a×block_b levenshtein verify serializing onto those 2
    tasks (sf3, r7). A side that already has >= target partitions
    cannot hit that trap under ANY join strategy the planner picks:
    broadcast keeps the wide scan's task count, and a shuffled join
    re-exchanges on the join keys itself. So the repartition is pure
    cost there — skipped. getNumPartitions is planning-time only (no
    job)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols)


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
    the 600k-row inputs is noise next to the verify it spreads; a side
    that already scans wide skips it (_spread_on_keys)."""
    left = _spread_on_keys(left, [lc for lc, _ in block_cols])
    right = _spread_on_keys(right, [rc for _, rc in block_cols])
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
    the scan's task count; measured 2 of 32 cores at sf3), and the
    same already-wide skip (_spread_on_keys).
    """
    left = _spread_on_keys(left, [lc for lc, _ in block_cols])
    right = _spread_on_keys(right, [rc for _, rc in block_cols])
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
