"""Distributed connected components over a DataFrame edge list.

Why it exists: near-dup detection (MinHash-LSH / SimHash, reference
parity: the dedup stage any 100 TB pretraining pipeline runs after
candidate-pair generation) emits PAIRS; collapsing pairs into duplicate
CLUSTERS — so one canonical document survives per cluster — is a
transitive-closure problem, i.e. connected components on the pair graph.

Spark-first design: iterative min-label propagation expressed entirely
as DataFrame joins/aggregations (no RDDs, no GraphX dependency —
GraphX has no Python API).  Each round every node adopts the minimum
component label among itself and its neighbors:

    comp[v]  <-  min(comp[v], min_{u in N(v)} comp[u])

which converges in O(graph diameter) rounds.  Duplicate-cluster graphs
are near-cliques (every member pairs with most others), so diameter is
tiny — 2-3 rounds in practice, and the simple recurrence is replayable
as a recursive-CTE oracle.  For adversarially long path graphs the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) converges in O(log n) rounds with
the same per-round join shape — implemented in ``_star_contract`` and
engaged automatically (``algorithm="auto"``) when min-label fails to
converge within ``max_iter``; both produce the identical min-id
labeling (property-tested against each other on random graphs).

Scale notes (100 TB):
- per round: ONE shuffle join (edges ⋈ labels on dst) producing
  neighbor messages, then labels ∪ messages through ONE partial
  (map-side) min aggregation — all key-partitioned on node id, no
  broadcast of anything unbounded (the r17 form aggregated messages
  and LEFT-JOINED them back onto labels: same fixpoint, one extra
  node-keyed exchange per round — r18 A/B 3.62 → 3.00 s sf0.1,
  7.75 → 6.78 s sf1);
- `localCheckpoint` after every round cuts the lineage chain so round k
  does not re-execute rounds 1..k-1 (the classic iterative-DataFrame
  trap) and keeps the plan size constant;
- convergence is detected with a scalar aggregate (sum of labels —
  strictly decreasing under min-propagation until fixpoint), not a
  driver-side collect of node labels;
- the symmetrized edge list is persisted once and reused every round.

Reference parity: the reference engine has no graph operator (its 523
LoC delegate SQL to BigQuery, src/db/db.go:59); this is part of the
beyond-reference LLM-pipeline tier the task brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_contract(und: DataFrame, max_iter: int = 50) -> DataFrame:
    """Large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): O(log n) rounds on
    ANY graph, including adversarial-diameter paths where min-label
    propagation needs O(diameter) rounds.

    ``und`` is a self-loop-free edge list in ANY orientation (raw,
    symmetrized, duplicated — the canonicalizing distinct below
    normalizes all of them identically, so star-only callers skip the
    symmetrize+distinct+persist pass ``connected_components`` builds
    for min-label propagation). Per round the edge set contracts toward
    a star forest (every component one star centered at its minimum
    node):

    - **large-star** (per node u over its full neighborhood Γ(u)):
      connect every strictly LARGER neighbor to m = min(Γ(u) ∪ {u});
    - **small-star** (per node u over its smaller neighbors):
      connect u and every smaller neighbor to that minimum.

    Both are ONE groupBy(min) + ONE key join per round — the identical
    shuffle shape as min-label propagation, just with an edge set that
    halves component depth each alternation. Convergence = the oriented
    edge set's (count, hash-sum) checksum is unchanged (exact at
    fixpoint: a star forest maps to itself under both operations).
    Returns ``(node, comp)`` labels with comp = component minimum."""
    # canonical orientation (big, small); large-star output keeps it
    E = (
        und.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev: tuple | None = None
    for _ in range(max_iter):
        # large-star over full neighborhoods
        sym = E.union(E.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select("a", F.least("mb", "a").alias("m"))
        )
        # No distinct and no self-loop filter here: m = min(Γ(u) ∪ {u})
        # ≤ u < b makes (b, m) loop-free by construction, and the
        # duplicates different u's emit for the same (b, m) are
        # absorbed downstream — map-side partial min in mins2, the
        # small-star join fans out only to be collapsed by its
        # distinct. A distinct here would spend a full extra shuffle
        # per round to dedup rows the next two operators handle free
        # (measured sf1: ~20% off the round loop).
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        # NOT materialized per round, deliberately (guide §1.1): the
        # small-star side reads ``large`` twice (min aggregation +
        # join), but an r18 eager localCheckpoint of it measured FLAT
        # to slightly worse at sf1 AND sf3 (10.34 → 10.88 s, 27.8 →
        # 29.2 s medians) — the double sym⋈mins evaluation over the
        # already-checkpointed E is cheaper than materializing the
        # join output every round. Decision recorded so it isn't
        # re-tried.
        # small-star over the (big, small)-oriented result
        mins2 = large.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            large.join(mins2, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        E = small
        chk = E.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.xxhash64("a", "b")).alias("h")
        ).first()
        cur = (chk["n"], chk["h"])
        if cur == prev:
            # star forest: a = leaf, b = center (= component min)
            return (
                E.select(F.col("a").alias("node"), F.col("b").alias("comp"))
                .union(E.select(F.col("b").alias("node"), F.col("b").alias("comp")))
                .distinct()
            )
        prev = cur
    raise RuntimeError(
        f"large-star/small-star did not converge in {max_iter} rounds "
        "(needs O(log n)) — pathological input"
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    algorithm: str = "auto",
) -> DataFrame:
    """Return ``(node, comp)`` where ``comp`` is the minimum node id in
    the node's connected component (deterministic canonical label).

    ``edges`` is treated as undirected; isolated nodes (absent from
    ``edges``) are simply absent from the output — callers keep them by
    left-joining and coalescing to the node's own id.

    ``algorithm``:
    - ``"min-label"`` — O(diameter) min-label propagation only; raises
      ``RuntimeError`` past ``max_iter`` rounds (replayable as the
      recursive-CTE oracle; the right pick for near-clique dedup graphs
      whose diameter is 2-3);
    - ``"star"`` — large-star/small-star (O(log n) rounds on any
      graph shape, see ``_star_contract``);
    - ``"auto"`` (default) — min-label first; if the diameter exceeds
      ``max_iter`` (adversarial path-shaped graphs), falls back to
      large-star/small-star instead of failing. Both produce the
      identical min-id labeling, so the fallback is invisible to
      callers.
    """
    if algorithm not in ("auto", "min-label", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if algorithm == "star":
        # star canonicalizes + checkpoints internally; building the
        # symmetrized persisted frame here would double the rows only
        # to have _star_contract's distinct collapse them again
        return _star_contract(e)
    und = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    try:
        # Fused initialization: comp₀[v] = min(v, min(Γ(v))) — the identity
        # labeling with the FIRST propagation round applied, as ONE
        # aggregation over the symmetrized edges. The unfused form
        # (distinct node list + identity labels, then a join round) paid a
        # distinct shuffle plus a full join+agg+checkpoint round for the
        # same state; min-label converges to the same fixpoint from any
        # state between identity and the final labeling. On near-clique
        # dedup graphs (diameter 1-2) this removes one of the 2-3 rounds
        # outright (r17 A/B: dedup_cluster_canonical sf0.1, see
        # OPTIMIZATION_r17.md).
        labels = (
            und.groupBy("a")
            .agg(F.least(F.min("b"), F.col("a")).alias("comp"))
            .select(F.col("a").alias("node"), "comp")
        )
        labels = labels.localCheckpoint(eager=True)
        prev_sum = labels.agg(F.sum("comp")).first()[0]
        if prev_sum is None:  # empty edge list
            return labels

        for _ in range(max_iter):
            # One round = neighbor messages ∪ own labels → ONE keyed min
            # aggregation (map-side partials), the same shape as
            # sssp_bounded's relaxation. The r17 form aggregated the
            # messages first and LEFT-JOINED them back onto labels —
            # same fixpoint, one extra node-keyed exchange per round
            # (guide §2.4; r18 A/B 3.62 → 3.00 s sf0.1, 7.75 → 6.78 s
            # sf1 on dedup_cluster_canonical — nodes absent from the
            # messages survive here as their own ``labels`` row, exactly
            # what the old join's null-coalesce branch encoded).
            msgs = und.join(
                labels.select(F.col("node").alias("b"), F.col("comp").alias("c")),
                "b",
            ).select(F.col("a").alias("node"), "c")
            labels = (
                labels.select("node", F.col("comp").alias("c"))
                .unionByName(msgs)
                .groupBy("node")
                .agg(F.min("c").alias("comp"))
                .localCheckpoint(eager=True)
            )
            new_sum = labels.agg(F.sum("comp")).first()[0]
            if new_sum == prev_sum:  # min-propagation fixpoint
                return labels
            prev_sum = new_sum
        if algorithm == "auto":
            return _star_contract(und)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "graph diameter exceeds max_iter — raise max_iter or use "
            "algorithm='star' for O(log n) convergence"
        )
    finally:
        und.unpersist()


def duplicate_clusters(
    all_ids: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Collapse near-dup PAIRS into CLUSTERS over the full id universe.

    Returns one row per id in ``all_ids``: ``(id_col, cluster_id,
    cluster_size, canonical)`` where ``cluster_id`` is the min id in the
    connected component (singletons cluster with themselves) and
    ``canonical`` marks the one row per cluster a dedup pipeline keeps.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    from pyspark.sql import Window

    out = (
        all_ids.select(F.col(id_col))
        .join(comp, all_ids[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .withColumn("canonical", F.col(id_col) == F.col("cluster_id"))
    )
    return out


def bfs_layers(
    und: DataFrame,
    seeds: DataFrame,
    n_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Bounded-depth BFS: (node, dist) for every node within ``n_hops``
    of the seed set over the UNDIRECTED edge frame ``und`` (callers
    symmetrize directed edges first). The hop count is a literal unroll
    — exactly how the oracle replays it with chained EXCEPT CTEs.

    Scale shape per hop: one key-partitioned equi-join (frontier ⋈ edges
    on the frontier key), distinct on the new frontier, one anti-join
    against the visited set — all shuffles on the node key, nothing
    node-sized broadcast or collected. Each frontier is localCheckpointed
    so hop k never re-executes hops 1..k-1 (the iterative-DataFrame
    lineage trap; same cut as connected_components /
    pagerank_fixed). Frontier size is bounded by the node count, and the
    per-hop work by |edges touching the frontier| — the textbook
    distributed BFS shape.
    """
    from gcs2postgres_spark.operators.caching import maybe_persist

    _cp = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    # Cache the edge frame ONCE: every hop joins the frontier against
    # ``e``, and without this each hop's eager frontier checkpoint
    # re-derives the edge build (typically a fact-fact join + distinct)
    # from the base tables — n_hops full re-reads of the input for zero
    # new information (guide §2.4; the same cut pagerank_fixed applies
    # to its edge frame). A columnar persist, not a localCheckpoint:
    # the checkpoint stores deserialized rows and its eager
    # materialization of a fact-sized edge list measured SLOWER than
    # the recompute it saves at sf3 (the sssp twin regressed 27.8 →
    # 32.8 s with an eager checkpoint; compressed cache wins instead).
    e = maybe_persist(und.select(F.col(src).alias("a"), F.col(dst).alias("b")), min_rows=0)
    frontier = _cp(seeds.select(F.col(node_col).alias("node")).distinct())
    visited = frontier.withColumn("dist", F.lit(0))
    for k in range(1, n_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        frontier = _cp(nxt)
        visited = _cp(visited.unionByName(frontier.withColumn("dist", F.lit(k))))
    return visited


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 3,
    src: str = "a",
    dst: str = "b",
    weight: str = "w",
    node_col: str = "node",
    checkpoint: bool = True,
) -> DataFrame:
    """Bounded-round single-source(-set) shortest paths by min-plus
    relaxation (distributed Bellman-Ford): after ``n_rounds`` rounds the
    result is exact for every path of ≤ n_rounds edges — (node, dist)
    with dist = min total weight from the seed set. Callers symmetrize
    directed edges first; weights must be non-negative for the bounded
    unroll to be monotone.

    Scale shape per round: ONE key-partitioned equi-join (tentative
    distances ⋈ edges on the source endpoint) and ONE key-partitioned
    min-aggregation — the same shuffle key back-to-back, so AQE reuses
    the exchange; nothing node-sized is broadcast or collected, and
    each round is localCheckpointed so round k never replays rounds
    1..k-1 (the iterative-lineage trap, cf. connected_components).
    This is the min-plus analogue of bfs_layers and unrolls to the
    oracle's chained relaxation CTEs verbatim. ``checkpoint=False``
    keeps the full lineage visible for plan-shape tests.
    """
    _cp = (
        (lambda df: df.localCheckpoint(eager=True)) if checkpoint else (lambda df: df)
    )  # noqa: E731
    # Cache the edge frame ONCE: each relaxation round joins ``dist``
    # against ``e``, and without this every round's eager checkpoint
    # re-executes the caller's edge build (join + aggregate over the
    # base tables) from scratch — n_rounds full re-reads for zero new
    # information (guide §2.4; same cut as pagerank_fixed and
    # bfs_layers). Columnar persist, NOT localCheckpoint: an eager
    # checkpoint of the fact-sized weighted edge list measured slower
    # than the recompute it saved (sf3 A/B 27.8 → 32.8 s — deserialized
    # row storage); the compressed cache build is cheap and every round
    # reads it. Skipped on the checkpoint=False plan-inspection path so
    # the relaxation lineage stays visible.
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"), F.col(weight).alias("w")
    )
    if checkpoint:
        from gcs2postgres_spark.operators.caching import maybe_persist

        e = maybe_persist(e, min_rows=0)
    dist = _cp(
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    for _ in range(n_rounds):
        relaxed = (
            e.join(dist.withColumnRenamed("node", "a"), "a")
            .select(F.col("b").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = _cp(
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist
