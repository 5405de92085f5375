"""connected_components equals a driver-side union-find on random graphs."""

from __future__ import annotations

import random

from gcs2postgres_spark.operators.graph import connected_components, duplicate_clusters


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp_min: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n_nodes)}


def test_cc_matches_union_find_random(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(40 + trial * 30)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        expected = _union_find_components(n, edges)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
        # operator omits isolated nodes; compare on covered nodes only
        covered = {v for e in edges for v in e}
        assert got == {v: expected[v] for v in covered}


def test_cc_path_graph_converges(spark):
    # worst case for min-label propagation: a path 0-1-2-...-k needs
    # ~k rounds; keep k under max_iter and check the single component
    k = 12
    df = spark.createDataFrame([(i, i + 1) for i in range(k)], ["src", "dst"])
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == {v: 0 for v in range(k + 1)}


def test_duplicate_clusters_keeps_singletons(spark):
    ids = spark.range(10).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"])
    rows = duplicate_clusters(ids, pairs, "doc_id").collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 10
    assert by_id[3]["cluster_id"] == 1 and by_id[3]["cluster_size"] == 3
    assert by_id[8]["cluster_id"] == 7 and by_id[8]["cluster_size"] == 2
    assert by_id[0]["cluster_id"] == 0 and by_id[0]["cluster_size"] == 1
    assert by_id[1]["canonical"] and not by_id[2]["canonical"]


def test_star_matches_min_label_random(spark):
    # property: large-star/small-star produces the IDENTICAL min-id
    # labeling as min-label propagation on random graphs
    rng = random.Random(7)
    for trial in range(3):
        n = 50
        edges = sorted(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(30 + trial * 25)}
        )
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, ["src", "dst"])
        via_star = {
            r["node"]: r["comp"]
            for r in connected_components(df, algorithm="star").collect()
        }
        via_minlabel = {
            r["node"]: r["comp"]
            for r in connected_components(df, algorithm="min-label").collect()
        }
        assert via_star == via_minlabel


def test_cc_deep_path_auto_falls_back_to_star(spark):
    # a path 0-1-...-40 has diameter 40 > max_iter=25: min-label alone
    # raises, algorithm='auto' silently switches to large-star/small-star
    # (O(log n) rounds) and still returns the exact min-id labeling
    import pytest as _pytest

    k = 40
    df = spark.createDataFrame([(i, i + 1) for i in range(k)], ["src", "dst"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, algorithm="min-label", max_iter=25).collect()
    got = {r["node"]: r["comp"] for r in connected_components(df, max_iter=25).collect()}
    assert got == {v: 0 for v in range(k + 1)}


def test_star_two_node_and_empty(spark):
    df = spark.createDataFrame([(5, 9)], ["src", "dst"])
    got = {r["node"]: r["comp"] for r in connected_components(df, algorithm="star").collect()}
    assert got == {5: 5, 9: 5}
    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert connected_components(empty, algorithm="star").collect() == []
