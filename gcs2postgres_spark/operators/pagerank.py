"""Deterministic PageRank by fixed-iteration power method (the
iteration count is a literal unroll, exactly how the DuckDB oracle
replays the recurrence; each round is materialized via localCheckpoint
so round k never re-executes rounds 1..k-1 — the iterative-DataFrame
lineage trap, same cut as operators/graph.connected_components).

Scale shape per iteration: edges ⋈ ranks on src (key-partitioned SMJ —
the out-degree travels WITH the rank vector, so there is no separate
degree join and, critically, no broadcast of a node-cardinality frame),
groupBy dst with map-side partial sums, one join back to the node list
to re-seed zero-in-degree nodes, plus one scalar aggregate for the
dangling mass — the standard distributed PageRank round. Dangling
(zero-out-degree) nodes redistribute their rank uniformly:
``rank' = (1-d)/N + d*(in_mass + dangling_mass/N)``, which keeps the
rank vector a probability distribution at every iteration.

The only broadcasts in the plan are single-row scalar aggregates
(node count, per-round dangling mass) — bounded at any graph size.
A billion-node graph shuffles edges and ranks on the same key per
round; nothing node-sized ever transits the driver or a broadcast.

Reference parity: no graph surface exists in the reference (523 LoC of
Go COPY plumbing); this extends the beyond-reference analytics tier
next to connected components (operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Return (node, rank) after ``n_iters`` power iterations from the
    uniform start 1/N, with dangling-mass redistribution. ``edges`` is
    directed, deduplicated upstream; nodes = src ∪ dst.

    ``checkpoint=False`` skips the per-round materialization and returns
    the fully declarative unrolled plan — used by the plan-shape tests
    to pin the per-round join strategy (the checkpointed path truncates
    explain output at the last RDD scan)."""
    _cp = (lambda df: df.localCheckpoint(eager=True)) if checkpoint else (lambda df: df)
    # Materialize the (expensive) edge build ONCE — everything below
    # derives from the checkpointed frame, so no later broadcast or
    # scalar aggregate can re-execute the upstream join/distinct. Then
    # checkpoint per round to cut the iterative lineage (the classic
    # iterative-DataFrame trap; same cut as
    # operators/graph.connected_components). The unrolled recurrence
    # the oracle replays is unchanged — only the physical reuse is.
    e = _cp(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct())
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Fold out-degree into the node frame ONCE (plain shuffled join —
    # both sides node-sized, neither broadcast); every iteration then
    # carries deg alongside rank for free.
    nd = _cp(nodes.join(deg.withColumnRenamed("src", "node"), "node", "left"))
    n_total = nd.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nd.crossJoin(F.broadcast(n_total)).select(
        "node", "deg", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    ranks = _cp(ranks)
    for _ in range(n_iters):
        # Scalar (1-row) aggregate: total rank parked on dangling nodes.
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass")
        )
        contrib = (
            e.join(
                ranks.select(F.col("node").alias("src"), "rank", "deg"), "src"
            )
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nd.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_total))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "deg",
                (
                    (1 - damping) / F.col("n_nodes")
                    + damping
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("dangling_mass") / F.col("n_nodes")
                    )
                ).alias("rank"),
            )
        )
        ranks = _cp(ranks)
    return ranks.select("node", "rank")


def ppr_fixed(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    n_iters: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Personalized PageRank: identical power iteration to
    ``pagerank_fixed`` except the restart distribution is concentrated
    on the seed set (s(v) = 1/|S| for seeds, else 0) — both the
    (1−d) teleport and the dangling-mass redistribution land on seeds
    only, so rank measures proximity TO the seed set ('related
    accounts', contamination blast radius with damping).

    Scale shape per round: same as pagerank_fixed — edges ⋈ ranks on
    src (degree travels with the rank vector), groupBy dst partial
    sums, scalar dangling aggregate; the seed indicator is one extra
    column on the node frame. Nothing node-sized is broadcast.

    Seeds must intersect the graph's node set: seeds absent from the
    edge list carry no restart mass (they are dropped by the node
    join), and an empty intersection raises ``ValueError`` rather than
    letting the 1/|S| restart column turn 0/0 → NULL and silently null
    every rank. The check is one scalar aggregate over the node frame
    (already materialized for the iteration), not a node-sized collect.
    """
    _cp = (lambda df: df.localCheckpoint(eager=True)) if checkpoint else (lambda df: df)
    e = _cp(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct())
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    s = seeds.select(F.col(node_col).alias("node")).distinct().withColumn(
        "is_seed", F.lit(1)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nd = _cp(
        nodes.join(deg.withColumnRenamed("src", "node"), "node", "left")
        .join(s, "node", "left")
    )
    n_seeds = (
        nd.agg(F.sum(F.coalesce("is_seed", F.lit(0))).alias("n_seeds")).first()[
            "n_seeds"
        ]
        or 0
    )
    if n_seeds == 0:
        raise ValueError(
            "ppr_fixed: seed set does not intersect the graph's nodes — "
            "no restart distribution exists (seeds must appear as an "
            "edge endpoint)"
        )
    # restart mass: 1/|S| on seeds, 0 elsewhere
    ranks = _cp(
        nd.select(
            "node",
            "deg",
            (
                F.coalesce("is_seed", F.lit(0)).cast("double") / F.lit(n_seeds)
            ).alias("s"),
        ).withColumn("rank", F.col("s"))
    )
    for _ in range(n_iters):
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass")
        )
        contrib = (
            e.join(ranks.select(F.col("node").alias("src"), "rank", "deg"), "src")
            .select(
                F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c")
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            ranks.select("node", "deg", "s")
            .join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "deg",
                "s",
                (
                    (1 - damping) * F.col("s")
                    + damping
                    * (
                        F.coalesce(F.col("in_mass"), F.lit(0.0))
                        + F.col("dangling_mass") * F.col("s")
                    )
                ).alias("rank"),
            )
        )
        ranks = _cp(ranks)
    return ranks.select("node", "rank")
