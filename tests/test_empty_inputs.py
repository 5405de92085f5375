"""Degenerate-input sweep: the round-4 operators must not crash (or
silently mis-answer) on empty frames — the partition-gets-no-rows case
every 100 TB job hits constantly."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_cc_empty_edges(spark):
    from gcs2postgres_spark.operators.graph import connected_components

    edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(edges).count() == 0


def test_duplicate_clusters_no_pairs(spark):
    from gcs2postgres_spark.operators.graph import duplicate_clusters

    ids = spark.range(5).withColumnRenamed("id", "doc_id")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    rows = duplicate_clusters(ids, pairs, "doc_id").collect()
    assert len(rows) == 5
    assert all(r["cluster_size"] == 1 and r["canonical"] for r in rows)


def test_latest_wins_empty(spark):
    from gcs2postgres_spark.streaming.cdc_apply import latest_wins

    df = spark.createDataFrame([], "k long, seq long, v string")
    assert latest_wins(df, ["k"], ["seq"]).count() == 0


def test_snapshot_diff_one_side_empty(spark):
    from gcs2postgres_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    new = spark.createDataFrame([], "k long, v string")
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {1: "removed", 2: "removed"}


def test_fuzzy_join_empty_right(spark):
    from gcs2postgres_spark.operators.joins import blocked_fuzzy_join

    left = spark.createDataFrame([(1, "abc", "g")], "id long, name string, grp string")
    right = spark.createDataFrame([], "rid long, rname string, rgrp string")
    out = blocked_fuzzy_join(left, right, "name", "rname", [("grp", "rgrp")])
    assert out.count() == 0


def test_pq_handles_short_corpus(spark):
    # corpus smaller than k_codes: Lloyd init takes all available
    # vectors; search still returns a full ranking
    from gcs2postgres_spark.operators.similarity import pq_adc_topk

    emb = spark.createDataFrame(
        [(i, [float(i), float(-i), 1.0, 2.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    rows = pq_adc_topk(emb, m_subspaces=2, k_codes=4, n_queries=2, topk=5).collect()
    assert {r["q_id"] for r in rows} == {0, 1}


def test_prefix_jaccard_empty_docs(spark):
    from gcs2postgres_spark.operators.dedup import prefix_jaccard_pairs

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert prefix_jaccard_pairs(docs, "doc_id", "text").count() == 0


def test_bfs_empty_seeds(spark):
    from gcs2postgres_spark.operators.graph import bfs_layers

    und = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    seeds = spark.createDataFrame([], "node long")
    assert bfs_layers(und, seeds, n_hops=2).count() == 0


def test_bfs_empty_edges(spark):
    from gcs2postgres_spark.operators.graph import bfs_layers

    und = spark.createDataFrame([], "src long, dst long")
    seeds = spark.createDataFrame([(7,)], "node long")
    rows = bfs_layers(und, seeds, n_hops=2).collect()
    # the seed itself survives at dist 0; no frontier ever grows
    assert {(r.node, r.dist) for r in rows} == {(7, 0)}


def test_sssp_empty_edges_keeps_seeds_at_zero(spark):
    from gcs2postgres_spark.operators.graph import sssp_bounded

    e = spark.createDataFrame([], "a long, b long, w long")
    seeds = spark.range(3).withColumnRenamed("id", "node")
    rows = sssp_bounded(e, seeds, n_rounds=3).collect()
    assert {(r.node, r.dist) for r in rows} == {(0, 0), (1, 0), (2, 0)}


def test_sssp_empty_seeds_empty_result(spark):
    from gcs2postgres_spark.operators.graph import sssp_bounded

    e = spark.createDataFrame([(1, 2, 5)], "a long, b long, w long")
    seeds = spark.createDataFrame([], "node long")
    assert sssp_bounded(e, seeds, n_rounds=2).count() == 0


def test_clustered_cosine_pairs_empty_and_degenerate(spark):
    from gcs2postgres_spark.operators.similarity import clustered_cosine_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert clustered_cosine_pairs(empty, n_clusters=4).count() == 0
    # all-zero-norm corpus: every vector excluded, no NaN, no crash
    zeros = spark.createDataFrame(
        [(i, [0.0, 0.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    assert clustered_cosine_pairs(zeros, n_clusters=4).count() == 0
    # fewer vectors than clusters
    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = clustered_cosine_pairs(tiny, threshold=0.9, n_clusters=8).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}


def test_blocked_cosine_pairs_empty_and_tiny(spark):
    from gcs2postgres_spark.operators.similarity import blocked_cosine_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert blocked_cosine_pairs(empty, threshold=0.5).count() == 0
    # fewer vectors than blocks: every block pair must still resolve
    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = blocked_cosine_pairs(tiny, threshold=0.9, nblocks=8).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}
