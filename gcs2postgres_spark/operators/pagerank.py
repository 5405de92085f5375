"""Deterministic PageRank by fixed-iteration power method, expressed as
one declarative DataFrame plan (no driver loop state — the iteration
count is a literal unroll, exactly how the DuckDB oracle replays it).

Scale shape per iteration: edges ⋈ ranks on src (key-partitioned),
groupBy dst with map-side partial sums, one join back to the node list
to re-seed zero-in-degree nodes — the standard distributed PageRank
round. Damping mass from dangling nodes is dropped (the
fixed-iteration, oracle-replayable variant; production PageRank adds a
dangling-mass redistribution term — one extra scalar aggregate per
round, same plan shape).

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
) -> DataFrame:
    """Return (node, rank) after ``n_iters`` power iterations from the
    uniform start 1/N. ``edges`` is directed, deduplicated upstream;
    nodes = src ∪ dst."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_total = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.crossJoin(F.broadcast(n_total)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(n_iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(F.broadcast(deg), "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_total))
            .select(
                "node",
                (
                    (1 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
