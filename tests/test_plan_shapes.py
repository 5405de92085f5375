"""Physical-plan shape assertions — the 100 TB design contract.

Correctness tests prove the small-SF answer; these prove the *plan*
is the one that survives a 1000-executor cluster: filters reach the
parquet scan, column pruning reaches the reader, small dims broadcast
instead of shuffling the fact side, per-group top-k prunes map-side
(WindowGroupLimit), and hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gcs2postgres_spark.catalog import load_table
from gcs2postgres_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_spans,
)
from gcs2postgres_spark.queries import REGISTRY


def _plan(spark, sf_dir, name):
    return formatted_plan(REGISTRY[name].fn(spark, sf_dir))


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    # the shipdate predicate must reach the parquet reader
    assert any("l_shipdate" in f for f in pushed_filters(df)), plan
    # column pruning: ReadSchema carries only the 7 referenced columns,
    # not the full 11-column lineitem schema
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert set(read_cols) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }, read_cols


def test_q1_partial_aggregation(spark, sf_dir):
    # partial (map-side) + final HashAggregate: the shuffle carries one
    # row per (returnflag, linestatus) per partition, not raw lineitem
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_sum" in plan, plan


def test_q3_broadcasts_customer_dim(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan, plan
    # the big fact (lineitem) side must NOT be broadcast
    assert not re.search(r"BroadcastExchange[\s\S]{0,400}lineitem", plan), plan


def test_q5_all_dim_joins_broadcast(spark, sf_dir):
    # region/nation/supplier/customer are dims; only order×lineitem may
    # shuffle — count shuffle-side joins
    plan = _plan(spark, sf_dir, "q5_local_supplier")
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_q14_broadcasts_part(spark, sf_dir):
    df = REGISTRY["q14_promo_revenue"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_topk_per_group_window_limit_pushdown(spark, sf_dir):
    # WindowGroupLimit prunes each partition to k rows BEFORE the
    # shuffle — without it, per-group top-k ships every row
    plan = _plan(spark, sf_dir, "topk_per_group")
    assert "WindowGroupLimit" in plan, plan


def test_fuzzy_topk_window_limit_pushdown(spark, sf_dir):
    # graceful-degradation fuzzy ER: the k-per-left-row cap must compile
    # to WindowGroupLimit (map-side prune to k before the window
    # shuffle) and candidates must come from an equi-join on blocking
    # keys, never a cartesian
    plan = _plan(spark, sf_dir, "fuzzy_join_topk_per_entity")
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_fuzzy_join_probe_is_block_key_repartitioned(spark, sf_dir):
    # the verify join's PROBE side must sit on a block-key hash
    # exchange: without it a broadcast plan runs the whole
    # block_a×block_b levenshtein verify on the probe SCAN's partition
    # count (measured 55.3M verifies on 2 of 32 cores at sf3 — the r7
    # 166 s record). Broadcasting the build side is fine; the exchange
    # pins the verify's parallelism to the cluster, not the file
    # layout. REPARTITION_BY_COL is the marker the explicit
    # df.repartition(n, cols) leaves in the plan.
    for q in ("fuzzy_join_entity_match", "fuzzy_join_topk_per_entity"):
        plan = _plan(spark, sf_dir, q)
        assert "REPARTITION_BY" in plan, (q, plan)
        assert "hashpartitioning(p_brand" in plan, (q, plan)


def test_topk_global_takeordered(spark, sf_dir):
    # global ORDER BY + LIMIT k must compile to TakeOrderedAndProject
    # (per-partition heap of k), never a full global sort
    plan = _plan(spark, sf_dir, "topk_global")
    assert "TakeOrderedAndProject" in plan, plan


def test_asof_join_single_shuffle_no_explosion(spark, sf_dir):
    # union+window as-of: no join node at all — one Exchange for the
    # window partitionBy, zero row explosion
    plan = _plan(spark, sf_dir, "asof_join_events_orders")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan or "Window" in plan


def test_filter_queries_stay_in_codegen(spark, sf_dir):
    # scan→filter→project→agg pipelines must fuse into codegen stages
    # (AQE reports codegen subtrees only once stages are materialized, so
    # execute first)
    for name in ["filter_in_like", "q6_revenue_forecast", "agg_stats_basic"]:
        df = REGISTRY[name].fn(spark, sf_dir)
        df.collect()
        assert wholestage_codegen_spans(df) >= 1, name


def test_reconcile_prunes_at_scan(spark, sf_dir):
    # target-driven projection: unreferenced source columns must not be
    # read (Catalyst pushes the select into ReadSchema)
    from gcs2postgres_spark.reconcile import reconcile_to_target

    li = load_table(spark, sf_dir, "lineitem")
    out = reconcile_to_target(li, [("l_orderkey", "int8"), ("l_quantity", "float8")])
    plan = formatted_plan(out)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "l_orderkey", "l_quantity",
    }, plan


def test_deterministic_sample_pushes_predicate(spark, sf_dir):
    # o_orderkey % 20 = 0 can't be a parquet PushedFilter, but the filter
    # must run before any shuffle (smaller operator id = earlier in the
    # dataflow; ids are assigned leaf-first)
    from gcs2postgres_spark.plans.inspect import node_id

    plan = _plan(spark, sf_dir, "sample_deterministic_mod")
    f_id, ex_id = node_id(plan, "Filter"), node_id(plan, "Exchange")
    assert f_id is not None, plan
    assert ex_id is None or f_id < ex_id, plan


def test_srp_lsh_no_cartesian(spark, sf_dir):
    # the LSH bucket join must be an equi-join (hash/broadcast), never a
    # cross product of query × corpus
    plan = _plan(spark, sf_dir, "similarity_srp_lsh_topk")
    assert "CartesianProduct" not in plan, plan


def test_cosine_dedup_no_cartesian(spark, sf_dir):
    # round-1 verdict: the registered embedding near-dup must be the
    # SRP-bucketed pipeline, not the capped all-pairs crossJoin — no
    # cartesian anywhere in its plan
    plan = _plan(spark, sf_dir, "dedup_cosine_embeddings")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_clustered_cosine_pairs_no_cartesian(spark, sf_dir):
    # the retained-pair replication must be two broadcast EQUI-joins
    # (an OR-condition join would plan a BroadcastNestedLoopJoin and
    # scale as corpus x pairs)
    from gcs2postgres_spark.operators.similarity import clustered_cosine_pairs

    e = load_table(spark, sf_dir, "embeddings")
    plan = formatted_plan(clustered_cosine_pairs(e, threshold=0.8, n_clusters=8))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "collect_list" not in plan, plan


def test_minhash_band_join_no_cartesian(spark, sf_dir):
    # banding exists precisely to avoid all-pairs: the candidate join must
    # be an equi-join on (band_id, band_hash)
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q8_single_fact_shuffle(spark, sf_dir):
    # 7-table join: every dim side broadcasts; only lineitem↔orders may
    # sort-merge. Count the join strategies.
    plan = _plan(spark, sf_dir, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "CartesianProduct" not in plan, plan


def test_q9_dims_broadcast_fact_not(spark, sf_dir):
    # part/supplier/nation broadcast; the only permissible shuffle join
    # is lineitem×orders (fact-fact)
    plan = _plan(spark, sf_dir, "q9_product_profit")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # the streamed (leftmost, never-exchanged) leaf of the join chain is
    # the lineitem fact: node (1) in formatted output is the first scan
    m = re.search(r"\(1\) Scan parquet[\s\S]{0,600}?Location:[^\n]*", plan)
    assert m and "lineitem" in m.group(0), plan


def test_q17_decorrelated_avg_broadcasts(spark, sf_dir):
    # the per-part avg relation (≤|part| rows) must broadcast back onto
    # lineitem — if it shuffle-joins, the decorrelation bought nothing
    plan = _plan(spark, sf_dir, "q17_small_qty_revenue")
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_q21_single_lineitem_agg_shuffle(spark, sf_dir):
    # the EXISTS/NOT-EXISTS decorrelation must NOT re-scan lineitem per
    # subquery: exactly one per-order aggregate over the joined fact,
    # supplier broadcast, no cartesian anywhere
    plan = _plan(spark, sf_dir, "q21_waiting_supplier")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q20_semi_joins_not_inner(spark, sf_dir):
    # IN-subqueries must compile to semi joins (stop at first match, no
    # row duplication), with the filtered part keys broadcast
    plan = _plan(spark, sf_dir, "q20_promotion_suppliers")
    assert "LeftSemi" in plan, plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_supplier_cnt_by_part")
    assert "LeftAnti" in plan, plan


def test_lateral_decorrelates_to_window_limit(spark, sf_dir):
    # LATERAL (... ORDER BY ... LIMIT k) must NOT re-execute per outer
    # row: Spark rewrites it to a partitioned window with map-side
    # WindowGroupLimit pruning + one join
    plan = _plan(spark, sf_dir, "lateral_topk_suppliers")
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bloom_prune_never_shuffles_fact(spark, sf_dir):
    # the bloom probe must ride the scan stage: no Exchange between the
    # lineitem scan and the bit-test filter, and no join of the fact side
    from gcs2postgres_spark.operators.bloom import bloom_build, bloom_prune

    sup = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    li = load_table(spark, sf_dir, "lineitem")
    pruned = bloom_prune(li, bloom_build(sup, "s_suppkey"), "l_suppkey")
    plan = formatted_plan(pruned)
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    # broadcast of the 1-row bitmap is the ONLY join allowed
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_funnel_single_shuffle(spark, sf_dir):
    # both range windows share (user_id, uts) partitioning+sort: one
    # exchange total for the whole pattern match
    plan = _plan(spark, sf_dir, "events_funnel_3step")
    pre_agg = plan.split("HashAggregate")[0] if "HashAggregate" in plan else plan
    assert pre_agg.count("Exchange hashpartitioning(user_id") <= 1, plan


def test_pq_adc_no_corpus_shuffle_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "similarity_pq_topk")
    assert "CartesianProduct" not in plan, plan


def test_cc_round_is_one_key_join(spark):
    # one propagation round = edges⋈labels on the node key + a partial
    # (map-side) min — build the round's plan exactly as the operator
    # does and pin: no CartesianProduct, partial aggregation present
    edges = spark.range(200).selectExpr("id as a", "(id + 1) % 200 as b")
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    nbr_min = (
        edges.join(
            labels.select(F.col("node").alias("b"), F.col("comp").alias("nbr_comp")),
            "b",
        )
        .groupBy("a")
        .agg(F.min("nbr_comp").alias("nbr_comp"))
    )
    plan = formatted_plan(nbr_min)
    assert "CartesianProduct" not in plan, plan
    assert "partial_min" in plan, plan


def test_bm25_prunes_postings_before_shuffle(spark, sf_dir):
    # the IN-filter on query terms must sit below the (doc, term)
    # aggregation, so only matching postings are shuffled
    plan = _plan(spark, sf_dir, "corpus_bm25_search")
    assert "CartesianProduct" not in plan, plan
    assert re.search(r"tok#\d+ IN \(", plan) or "tok IN" in plan.replace("'", ""), plan


def test_salted_skew_join_spreads_hot_keys(spark, sf_dir):
    # the join must run on (key, salt) WITHOUT broadcasting the dim —
    # each hot key's rows hash to salt_buckets different reducers
    plan = _plan(spark, sf_dir, "join_salted_skew")
    join_part = plan.split("HashAggregate")[0]
    assert "__salt" in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan


def _pagerank_declarative_plan(spark, sf_dir):
    # checkpoint=False: the per-round plan stays visible in explain
    # (the production path materializes each round, so its final plan
    # is just an RDD scan)
    from gcs2postgres_spark.operators.pagerank import pagerank_fixed

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return formatted_plan(pagerank_fixed(edges, n_iters=3, checkpoint=False))


def test_pagerank_round_no_cartesian_partial_sums(spark, sf_dir):
    plan = _pagerank_declarative_plan(spark, sf_dir)
    assert "CartesianProduct" not in plan, plan
    assert "partial_sum" in plan, plan


def test_lifecycle_single_user_shuffle(spark, sf_dir):
    # dedupe + lag window + aggregate: the user_id partitioning is set
    # once and reused; no cartesian, partial aggregation present
    plan = _plan(spark, sf_dir, "events_user_lifecycle")
    assert "CartesianProduct" not in plan, plan
    assert "partial_" in plan, plan


def test_pagerank_no_node_sized_broadcast(spark, sf_dir):
    # the rank/degree vectors are node-cardinality — unbounded at scale.
    # With auto-broadcast disabled, any BroadcastHashJoin left in the
    # plan would mean an explicit broadcast hint on a node-sized frame
    # (the bug this pins against: F.broadcast(deg)). The only broadcasts
    # allowed are the single-row scalar aggregates (node count, per-round
    # dangling mass), which appear as BroadcastNestedLoopJoin.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _pagerank_declarative_plan(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_pareto_two_phase_cumsum_no_global_window_over_parts(spark, sf_dir):
    # the per-part running sum must be partitioned by the range-partition
    # id (two-phase cumsum) — an order-only window over rev_c would pull
    # every part into ONE task, the exact wall this pins against. The
    # only unpartitioned windows allowed are over the per-partition
    # totals (ptotal), a partition-count-sized frame.
    plan = _plan(spark, sf_dir, "part_pareto_abc")
    assert re.search(r"sum\(rev_c#\d+L?\) windowspecdefinition\(pid#\d+,", plan), plan
    assert not re.search(r"sum\(rev_c#\d+L?\) windowspecdefinition\(rev_c", plan), plan


def test_ivf_pruned_scan_partition_filters(spark, sf_dir):
    # the cell-partitioned IVF layout must prune at the SCAN: the probe
    # filter lands as PartitionFilters (planning-time, zero I/O for
    # unprobed cells), not as a post-scan Filter over all cells
    plan = _plan(spark, sf_dir, "similarity_ivf_pruned_topk")
    m = re.search(r"PartitionFilters: \[[^\]]*cell#\d+ IN", plan)
    assert m, plan


def test_prefix_jaccard_no_cartesian(spark, sf_dir):
    # PPJoin candidate generation must stay an equi-join on the prefix
    # token — the whole point of prefix filtering is to never go
    # quadratic on the corpus
    plan = _plan(spark, sf_dir, "dedup_jaccard_prefix_filter")
    assert "CartesianProduct" not in plan, plan


def test_equidepth_two_phase_rank_no_global_window(spark, sf_dir):
    # the global rank must be partitioned by the range-partition id
    # (two-phase, parallel); an order-only row_number over value would
    # put every event in ONE task — same contract as part_pareto_abc
    plan = _plan(spark, sf_dir, "events_equidepth_deciles")
    assert re.search(r"row_number\(\) windowspecdefinition\(pid#\d+,", plan), plan
    assert not re.search(r"row_number\(\) windowspecdefinition\(value", plan), plan


def test_bfs_hop_no_cartesian_no_node_broadcast(spark, sf_dir):
    # each BFS hop is a key-partitioned equi-join; nothing node-sized
    # may broadcast (the frontier is unbounded at graph scale)
    from gcs2postgres_spark.operators.graph import bfs_layers

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    und = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seeds = e.select(F.col("src").alias("node")).limit(5)
    # one declarative hop (no checkpoint): frontier ⋈ edges then anti-join
    frontier = seeds.distinct()
    nxt = (
        und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(frontier.withColumnRenamed("node", "a"), "a")
        .select(F.col("b").alias("node"))
        .distinct()
        .join(frontier, "node", "left_anti")
    )
    plan = formatted_plan(nxt)
    assert "CartesianProduct" not in plan, plan


def test_weighted_median_two_phase_no_global_window(spark, sf_dir):
    # same contract as equidepth/pareto: the cumulative weight must be
    # partitioned by the range-partition id, never an order-only window
    # over the fact
    plan = _plan(spark, sf_dir, "lineitem_weighted_median")
    assert re.search(r"sum\(wt#\d+L?\) windowspecdefinition\(pid#\d+,", plan), plan
    assert not re.search(r"sum\(wt#\d+L?\) windowspecdefinition\(price", plan), plan


def test_interleave_no_global_window(spark, sf_dir):
    # the global training order is a FORMULA (rank*D + dom_idx): the only
    # row_number windows may partition by source (per-domain) or run over
    # the |domains|-sized distinct frame — never order-only over doc_id
    plan = _plan(spark, sf_dir, "dataset_interleave_domains")
    assert re.search(r"row_number\(\) windowspecdefinition\(source#\d+,", plan), plan
    assert not re.search(r"row_number\(\) windowspecdefinition\(doc_id", plan), plan


def test_pca_power_no_cartesian_dimension_sized_aggregate(spark, sf_dir):
    # every CROSS JOIN in the PCA plan must be a broadcast of a 1-row /
    # 64-row frame (BroadcastNestedLoopJoin), never a real cartesian; the
    # w_j aggregate must carry a partial_sum (map-side combine) so the
    # shuffle is dimension-sized
    plan = _plan(spark, sf_dir, "embedding_pca_power")
    assert "CartesianProduct" not in plan, plan
    assert "partial_sum" in plan, plan


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_incremental_batch")
    assert "CartesianProduct" not in plan, plan


def test_watermark_two_phase_running_max_no_global_window(spark, sf_dir):
    # the exclusive running max must be partitioned by the range-partition
    # id — an order-only window over arrival would serialize the ingest
    # log through one task
    plan = _plan(spark, sf_dir, "events_watermark_late_drop")
    assert re.search(r"max\(ts#\d+\) windowspecdefinition\(pid#\d+,", plan), plan
    assert not re.search(r"max\(ts#\d+\) windowspecdefinition\(event_id", plan), plan


def test_two_phase_queries_deterministic_across_runs(spark, sf_dir):
    # regression guard for the pid-misalignment flake class: every
    # two-phase query must return IDENTICAL rows on repeated execution
    # (pre-fix, events_watermark_late_drop varied run to run)
    for name in [
        "events_watermark_late_drop",
        "events_equidepth_deciles",
        "lineitem_weighted_median",
        "part_pareto_abc",
    ]:
        fn = REGISTRY[name].fn
        a = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        b = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        assert a == b, name


def test_gini_two_phase_rank_no_global_window(spark, sf_dir):
    # the global revenue rank must be partitioned by the range-partition
    # id (two-phase, cf. part_pareto_abc) — an order-only row_number
    # over xc would pull every customer into ONE task. The only
    # unpartitioned window allowed is over the per-partition counts
    # (pcount), a partition-count-sized frame.
    plan = _plan(spark, sf_dir, "customer_revenue_gini")
    assert re.search(r"row_number\(\) windowspecdefinition\(pid#\d+,", plan), plan
    assert not re.search(r"row_number\(\) windowspecdefinition\(xc", plan), plan


def test_oov_vocab_membership_join_broadcasts(spark, sf_dir):
    # the top-1000 vocab is rank-bounded: the token⋈vocab membership
    # join must broadcast the vocab side, never shuffle the exploded
    # token stream by token (a |tokens|-sized exchange at 100 TB).
    plan = _plan(spark, sf_dir, "corpus_oov_rate")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_autocorr_daily_series_broadcast_no_cartesian(spark, sf_dir):
    # the daily series is date-bounded; the lag self-join must be a
    # broadcast equi-join on the shifted day, not a cartesian.
    plan = _plan(spark, sf_dir, "events_autocorr_lags")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_sssp_no_node_sized_broadcast(spark, sf_dir):
    # tentative distances are node-cardinality — with auto-broadcast
    # disabled, any BroadcastHashJoin left in the relaxation plan would
    # mean an explicit hint on a node-sized frame (the r4 PageRank
    # lesson, pinned here from birth for the min-plus twin).
    from gcs2postgres_spark.operators.graph import sssp_bounded

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pair = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("o_custkey").cast("string").alias("ca"),
            F.col("l_suppkey").cast("string").alias("sb"),
        )
        .agg(F.lit(1).alias("w"))
    )
    e = pair.select(F.col("ca").alias("a"), F.col("sb").alias("b"), "w")
    seeds = pair.select(F.col("ca").alias("node")).distinct().limit(10)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = formatted_plan(sssp_bounded(e, seeds, n_rounds=2, checkpoint=False))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_daily_value_bands_percentile_partial_agg(spark, sf_dir):
    # exact grouped percentiles must aggregate partial+final
    # (ObjectHashAggregate with partial_percentile), never collect a
    # group to one node outside the agg framework.
    plan = _plan(spark, sf_dir, "orders_daily_value_bands")
    assert "partial_percentile" in plan, plan
    assert "ObjectHashAggregate" in plan, plan


def test_join_cardinality_histograms_partial_agg(spark, sf_dir):
    # the estimator's value is computing sizes WITHOUT the join: both
    # key histograms must show map-side partial counts, and the top-1
    # contributor must be a TakeOrdered, not a global sort.
    plan = _plan(spark, sf_dir, "profile_join_cardinality")
    assert "partial_count" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_aqe_skew_join_runtime_split(spark, sf_dir):
    # SCALE.md's runtime-replan claim, executed: a crafted skewed join
    # under AQE must show skew=true in the FINAL adaptive plan — the
    # fat partition was split at runtime without any manual salting
    # (the automatic counterpart of operators/skew.salted_skew_join).
    saved = {
        k: spark.conf.get(k, None)
        for k in [
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        ]
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 100_000).select(
            F.when(F.col("id") % 5 == 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        b = spark.range(0, 1000).select(F.col("id").alias("k"))
        j = a.join(b, "k").agg(F.count(F.lit(1)).alias("n"))
        assert j.collect()[0].n == 100_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_merge_match_and_replacement_plans_equi_join(spark, tmp_path):
    """The MERGE committers' two join shapes — the identity-tagged
    match scan (semi/inner on keys) and the conditional replacement
    selection (left join + struct comparison) — must plan as equi-joins
    (hash or sort-merge), never a cartesian/nested-loop: at 100 TB the
    match set is target-scan × CDC-batch, and anything but a keyed join
    is quadratic."""
    from pyspark.sql import functions as F  # noqa: F811

    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta

    table = str(tmp_path / "mplan")
    df = spark.range(200).selectExpr(
        "CAST(id AS INT) AS k", "CAST(id AS INT) AS seq", "concat('n', id) AS name"
    )
    write_delta(df, table, "overwrite", timestamp_ms=1_700_000_000_000)
    src = spark.range(50).selectExpr(
        "CAST(id * 3 AS INT) AS k", "CAST(id + 1000 AS INT) AS seq",
        "concat('s', id) AS name",
    )

    # unconditional match set (merge_delta's matcher shape)
    tagged = read_delta_py(spark, table, _keep_identity=True)
    matched = tagged.join(src.select("k").distinct(), on=["k"], how="left_semi")
    plan = formatted_plan(matched)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan

    # conditional (latest-wins) match + replacement shapes
    src_cmp = src.select("k", F.struct("seq").alias("__src_seq"))
    cond_match = (
        tagged.join(src_cmp, on=["k"], how="inner")
        .filter(F.struct("seq") < F.col("__src_seq"))
    )
    plan = formatted_plan(cond_match)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan

    live = read_delta_py(spark, table)
    tgt_cmp = live.select("k", F.struct("seq").alias("__tgt_seq"))
    replacement = (
        src.join(tgt_cmp, on=["k"], how="left")
        .filter(F.col("__tgt_seq").isNull() | (F.struct("seq") > F.col("__tgt_seq")))
    )
    plan = formatted_plan(replacement)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_transform_partition_routing_broadcasts_pid_map(spark, tmp_path):
    """Hidden-partitioning row routing (_stage_v2_data_files): the
    tuple->pid map join must be a BROADCAST join on the TRANSFORMED
    columns — never a cartesian/BNLJ and never a shuffle of the data
    side (the map is one row per live partition; the data side is the
    100 TB side)."""
    from pyspark.sql import types as T

    from gcs2postgres_spark.sources.iceberg_transforms import transform_expr

    df = spark.range(2000).selectExpr(
        "CAST(id AS INT) AS k",
        "date_add(DATE'2024-01-01', CAST(id % 90 AS INT)) AS d",
    )
    # reproduce the committer's routing join shape
    ptcols = ["__pt_0", "__pt_1"]
    with_pt = df.select(
        "*",
        transform_expr("month", "d", df.schema["d"].dataType).alias("__pt_0"),
        transform_expr("bucket[4]", "k", df.schema["k"].dataType).alias("__pt_1"),
    )
    tuples = [tuple(r) + (i,) for i, r in enumerate(
        with_pt.select(*ptcols).distinct().collect()
    )]
    map_df = spark.createDataFrame(
        tuples,
        T.StructType([
            T.StructField("__pm_0", T.IntegerType(), True),
            T.StructField("__pm_1", T.IntegerType(), True),
            T.StructField("__pid", T.IntegerType(), False),
        ]),
    )
    cond = with_pt["__pt_0"].eqNullSafe(map_df["__pm_0"]) & with_pt[
        "__pt_1"
    ].eqNullSafe(map_df["__pm_1"])
    routed = with_pt.join(F.broadcast(map_df), cond)
    plan = formatted_plan(routed)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the big side must not be exchanged for the routing join
    big_side = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in big_side, plan


def test_facade_select_keeps_pushdown(spark, tmp_path, sf_dir):
    """A facade SELECT over a jar-less Delta read plans exactly like a
    direct reader call: the statement filter reaches the parquet scan
    (PushedFilters) and only the referenced columns are read."""
    from gcs2postgres_spark.sources.delta_py import write_delta
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    t = str(tmp_path / "d")
    write_delta(
        load_table(spark, sf_dir, "nation"), t, "overwrite",
        timestamp_ms=1_700_000_000_000,
    )
    df = lakehouse_sql(
        spark,
        f"SELECT n_name FROM delta.`{t}` WHERE n_regionkey = 2",
    )
    plan = formatted_plan(df)
    assert re.search(r"PushedFilters:.*n_regionkey", plan), plan
    m = re.search(r"ReadSchema:[^\n]*", plan)
    assert m and "n_name" in m.group(0), plan
    assert "n_comment" not in m.group(0), plan
