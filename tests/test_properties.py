"""Property-based checks (SURVEY.md §5.2(4)): relational-algebra
identities, dedup idempotency, and parquet round-trips on small random
frames. hypothesis drives the inputs; examples are capped small so each
case is one fast local job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),
        st.sampled_from(["a", "b", "c", None]),
    ),
    min_size=0,
    max_size=12,
)

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _key(t):
    return tuple((x is None, str(x)) for x in t)


@given(a=ROWS, b=ROWS)
@SLOW
def test_union_minus_intersect_is_symmetric_difference(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    sa = {tuple(r) for r in a}
    sb = {tuple(r) for r in b}
    union = {tuple(r) for r in da.union(db).distinct().collect()}
    inter = {tuple(r) for r in da.intersect(db).collect()}
    # subtract = EXCEPT DISTINCT (set semantics). exceptAll would keep
    # multiplicity (a=[x,x], b=[x] leaves one x) and is NOT set difference.
    exc = {tuple(r) for r in da.subtract(db).collect()}
    assert union == sa | sb
    assert inter == sa & sb
    assert exc == sa - sb


@given(a=ROWS)
@SLOW
def test_distinct_idempotent(spark, a):
    da = _df(spark, a)
    once = sorted(map(tuple, da.distinct().collect()), key=_key)
    twice = sorted(map(tuple, da.distinct().distinct().collect()), key=_key)
    assert once == twice == sorted({tuple(r) for r in a}, key=_key)


@given(a=ROWS)
@SLOW
def test_dropduplicates_subset_keeps_one_per_key(spark, a):
    da = _df(spark, a)
    out = da.dropDuplicates(["k"]).collect()
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys)) == len({r[0] for r in a})


@given(a=ROWS)
@SLOW
def test_parquet_round_trip(spark, a, tmp_path_factory):
    import tempfile

    da = _df(spark, a)
    with tempfile.TemporaryDirectory(prefix="prop_rt_") as d:
        da.write.mode("overwrite").parquet(d)
        back = spark.read.parquet(d)
        assert sorted(map(tuple, back.collect()), key=_key) == sorted(
            map(tuple, da.collect()), key=_key
        )
        assert back.schema == da.schema


@given(a=ROWS)
@SLOW
def test_filter_complement_partitions_rows(spark, a):
    da = _df(spark, a)
    pred = F.col("k") > 0
    n_pos = da.filter(pred).count()
    n_neg = da.filter(~pred | F.col("k").isNull()).count()
    assert n_pos + n_neg == len(a)


ASOF_LEFT = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=20),  # time
    ),
    min_size=1,
    max_size=10,
)
ASOF_RIGHT = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=-100, max_value=100),  # payload
    ),
    min_size=0,
    max_size=10,
)


@given(left=ASOF_LEFT, right=ASOF_RIGHT, direction=st.sampled_from(["backward", "forward"]))
@SLOW
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction):
    import pandas as pd

    from gcs2postgres_spark.operators.joins import asof_join

    # dedupe right per (key, t): with duplicate timestamps the matched
    # payload is implementation-defined in both engines (same contract as
    # the registered asof queries, which pre-aggregate one row per (key, t))
    rdd = {}
    for k, t, p in right:
        rdd[(k, t)] = max(p, rdd.get((k, t), -(10**9)))
    right_u = [(k, t, p) for (k, t), p in sorted(rdd.items())]

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid int, k int, t int"
    )
    rdf = spark.createDataFrame(right_u, "rk int, rt int, payload int") if right_u else (
        spark.createDataFrame([], "rk int, rt int, payload int")
    )
    got = {
        r.lid: r.payload
        for r in asof_join(
            ldf, rdf,
            left_on="k", right_on="rk", left_time="t", right_time="rt",
            right_payload=["payload"], direction=direction,
        ).collect()
    }

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], columns=["lid", "k", "t"]
    ).sort_values("t", kind="stable")
    rp = (
        pd.DataFrame(right_u, columns=["k", "t", "payload"], dtype="int64")
        .sort_values("t", kind="stable")
    )
    want_df = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction, allow_exact_matches=True
    )
    want = {
        int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
        for r in want_df.itertuples()
    }
    assert got == want


# --- round-5 operator properties -------------------------------------------

DOCS = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=20),
    min_size=0,
    max_size=8,
)


@given(texts=DOCS)
@SLOW
def test_prefix_jaccard_matches_bruteforce(spark, texts):
    # prefix filtering must be COMPLETE: exactly the brute-force pairs
    # with token-set Jaccard >= 3/5 survive, never fewer (the filter may
    # not drop a qualifying pair) and never more (verify is exact)
    from gcs2postgres_spark.operators.dedup import prefix_jaccard_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in prefix_jaccard_pairs(df, "doc_id", "text").collect()
    }
    import re as _re

    # mirror the ENGINE tokenization (split on \s+ keeps the empty
    # token for an empty/whitespace doc — two empty docs are exact
    # duplicates, Jaccard 1): Python's no-arg split() would drop it
    toks = {i: set(_re.split(r"\s+", t.strip().lower())) for i, t in rows}
    want = set()
    for i in toks:
        for j in toks:
            if i < j:
                inter = len(toks[i] & toks[j])
                union = len(toks[i] | toks[j])
                if union and 5 * inter >= 3 * union:
                    want.add((i, j))
    assert got == want


EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)
    ),
    min_size=0,
    max_size=15,
)


@given(edges=EDGES, n_hops=st.integers(min_value=1, max_value=3))
@SLOW
def test_bfs_layers_match_python_bfs(spark, edges, n_hops):
    from gcs2postgres_spark.operators.graph import bfs_layers

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    und = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "src int, dst int"
    )
    seed_nodes = sorted({a for a, _ in edges})[:2]
    seeds = spark.createDataFrame([(s,) for s in seed_nodes], "node int")
    got = {(r.node, r.dist) for r in bfs_layers(und, seeds, n_hops=n_hops).collect()}
    # reference BFS on the adjacency dict
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seed_nodes}
    frontier = set(seed_nodes)
    for k in range(1, n_hops + 1):
        nxt = set()
        for u in frontier:
            nxt |= adj.get(u, set())
        nxt -= dist.keys()
        for v in nxt:
            dist[v] = k
        frontier = nxt
    assert got == set(dist.items())


@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=30
    )
)
@SLOW
def test_equidepth_two_phase_rank_equals_naive(spark, vals):
    # the two-phase rank must reproduce row_number() OVER (ORDER BY ...)
    # exactly — pure plumbing identity, independent of partition count
    from pyspark.sql import Window

    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "value double, event_id long")
    n_parts = 5
    ranged = df.repartitionByRange(n_parts, F.asc("value"), F.asc("event_id")).withColumn(
        "pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("pid").orderBy("value", "event_id")
    ranged = ranged.withColumn("rn_in", F.row_number().over(w_in))
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("c"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off")
    )
    two_phase = {
        (r.event_id, r.rn_in + r.off)
        for r in ranged.join(offsets, "pid").collect()
    }
    naive = {
        (r.event_id, r.rn)
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("value", "event_id"))
        ).collect()
    }
    assert two_phase == naive


@given(seed=st.integers(min_value=0, max_value=10_000))
@SLOW
def test_checksum_partition_order_invariant(spark, seed):
    # XOR-folded bucket checksums must be identical under any
    # repartitioning — the property that makes them a cross-system
    # integrity check rather than an artifact of execution order
    from gcs2postgres_spark.operators.dedup import portable_hash60

    rows = [(i, f"v{(i * seed) % 97}") for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v string")

    def checksums(frame):
        out = (
            frame.select(
                (F.col("k") % 4).alias("bucket"),
                portable_hash60(F.concat_ws("|", F.col("k").cast("string"), "v")).alias("h"),
            )
            .groupBy("bucket")
            .agg(F.bit_xor("h").alias("x"), F.count(F.lit(1)).alias("n"))
        )
        return {(r.bucket, r.x, r.n) for r in out.collect()}

    assert checksums(df) == checksums(df.repartition(7)) == checksums(df.repartition(1))


@given(
    n=st.integers(min_value=50, max_value=1500),
    seed=st.integers(min_value=0, max_value=10_000),
)
@SLOW
def test_portable_hll_error_bound_and_merge_law(spark, n, seed):
    # the m=256 HLL estimate must land within the textbook error band
    # (~1.04/sqrt(m) ≈ 6.5% std; assert a generous 5-sigma bound), and
    # max-merging two half-sketches must reproduce the direct registers
    # EXACTLY — the property that makes the sketch shippable between
    # rollup stages
    from gcs2postgres_spark.operators.dedup import portable_hash60

    keys = [(seed * 1_000_003 + i,) for i in range(n)]
    df = spark.createDataFrame(keys, "k long")
    h = df.select(
        portable_hash60(F.concat(F.lit("hllp|"), F.col("k").cast("string"))).alias("h"),
        (F.col("k") % 2).alias("half"),
    ).distinct()
    rem = F.col("h").bitwiseAND(F.lit((1 << 52) - 1))
    rr = h.select(
        F.shiftright("h", 52).alias("idx"),
        F.when(rem == 0, 53).otherwise(53 - F.length(F.bin(rem))).alias("rho"),
        "half",
    )
    direct = {(r.idx, r.m) for r in rr.groupBy("idx").agg(F.max("rho").alias("m")).collect()}
    halves = rr.groupBy("half", "idx").agg(F.max("rho").alias("m"))
    merged = {
        (r.idx, r.m)
        for r in halves.groupBy("idx").agg(F.max("m").alias("m")).collect()
    }
    assert merged == direct  # merge law, register-exact

    import math

    m = 256
    z = sum(2.0 ** -v for _, v in direct) + (m - len(direct))
    v0 = m - len(direct)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / z
    est = m * math.log(m / v0) if (raw <= 2.5 * m and v0 > 0) else raw
    assert abs(est - n) / n < 5 * 1.04 / math.sqrt(m), (est, n)


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=4),
    seed=st.integers(min_value=0, max_value=1000),
)
@SLOW
def test_interleave_positions_unique_and_rotating(spark, sizes, seed):
    # the formula pos = rank*D + dom_idx must be injective (a valid
    # global order) and round-robin: within any prefix of the position
    # order, consecutive same-domain picks can only occur after every
    # other domain with rows remaining has been visited
    from pyspark.sql import Window

    from gcs2postgres_spark.operators.dedup import portable_hash60

    rows = []
    i = 0
    for d, n in enumerate(sizes):
        for _ in range(n):
            rows.append((i + seed * 1000, f"dom{d}"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    doms = (
        df.select("source").distinct()
        .select(
            "source",
            (F.row_number().over(Window.orderBy("source")) - 1).alias("dom_idx"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n_domains"),
        )
    )
    wk = Window.partitionBy("source").orderBy(
        portable_hash60(F.concat(F.lit("il1|"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    out = (
        df.select("doc_id", "source", (F.row_number().over(wk) - 1).alias("rnk"))
        .join(doms, "source")
        .select(
            "source",
            (F.col("rnk") * F.col("n_domains") + F.col("dom_idx")).alias("pos"),
        )
        .collect()
    )
    poss = [r.pos for r in out]
    assert len(poss) == len(set(poss))  # injective: a real global order
    ordered = [r.source for r in sorted(out, key=lambda r: r.pos)]
    # round-robin law: between two picks of the same domain, every domain
    # that still has rows left must appear exactly once
    last_seen: dict[str, int] = {}
    remaining = {f"dom{d}": n for d, n in enumerate(sizes)}
    for idx, s in enumerate(ordered):
        if s in last_seen:
            between = set(ordered[last_seen[s] + 1 : idx])
            needed = {d for d, n in remaining.items() if n > 0 and d != s}
            assert needed <= between | {s}, (ordered, s, idx)
        last_seen[s] = idx
        remaining[s] -= 1


WEIGHTED_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=20),
    ),
    min_size=0,
    max_size=15,
)


@given(edges=WEIGHTED_EDGES, n_rounds=st.integers(min_value=1, max_value=3))
@SLOW
def test_sssp_bounded_matches_python_bellman_ford(spark, edges, n_rounds):
    from gcs2postgres_spark.operators.graph import sssp_bounded

    edges = [(a, b, w) for a, b, w in edges if a != b]
    if not edges:
        return
    e = spark.createDataFrame(
        edges + [(b, a, w) for a, b, w in edges], "a int, b int, w int"
    )
    seed_nodes = sorted({a for a, _, _ in edges})[:2]
    seeds = spark.createDataFrame([(s,) for s in seed_nodes], "node int")
    got = {(r.node, r.dist) for r in sssp_bounded(e, seeds, n_rounds=n_rounds).collect()}
    # reference: bounded Bellman-Ford relaxation — exact min over paths
    # of <= n_rounds edges, the operator's documented contract
    adj = edges + [(b, a, w) for a, b, w in edges]
    dist = {s: 0 for s in seed_nodes}
    for _ in range(n_rounds):
        nxt = dict(dist)
        for a, b, w in adj:
            if a in dist and dist[a] + w < nxt.get(b, float("inf")):
                nxt[b] = dist[a] + w
        dist = nxt
    assert got == set(dist.items())


@given(texts=DOCS)
@SLOW
def test_containment_pairs_match_bruteforce(spark, texts):
    from gcs2postgres_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): (r.n_a, r.n_inter)
        for r in containment_pairs(
            docs, "doc_id", "text", threshold_num=1, threshold_den=2, shingle_n=1
        ).collect()
    }
    # brute force over unigram token sets (shingle_n=1 semantics:
    # word_shingles falls back to nothing special at n=1 — distinct toks)
    sets = {
        i: set((t or "").lower().strip().split()) if (t or "").strip() else {""}
        for i, t in enumerate(texts)
    }
    # word_shingles(n=1) on empty/whitespace text yields [""] (the
    # whole-text fallback); mirror that
    want = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if 2 * inter >= len(sa):
                want[(a, b)] = (len(sa), inter)
    assert got == want


def test_partition_invariance_of_float_rounding(spark, sf_dir):
    # the knife-edge class the RFM fix closed, pinned structurally: a
    # query whose rounded floats depend on partial-aggregation order
    # would differ across shuffle-partition counts. Representative
    # float-heavy queries must produce bit-identical canonical rows at
    # two partitionings (the full 19-query probe lives in
    # scripts/partition_invariance.py — run it after adding any
    # round(<float agg>) query).
    from gcs2postgres_spark.queries import REGISTRY

    names = [
        "events_user_entropy",
        "agg_jackknife_se",
        "customer_revenue_gini",
        "events_mann_whitney_u",
    ]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n_parts in ("5", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n_parts)
            for name in names:
                rows = REGISTRY[name].fn(spark, sf_dir).collect()
                canon = sorted(tuple(sorted(r.asDict().items())) for r in rows)
                results.setdefault(name, []).append(canon)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for name, (a, b) in results.items():
        assert a == b, f"{name} differs across partition counts"


@given(
    sigs=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 2**60 - 1)),
        min_size=0,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
    max_h=st.integers(1, 3),
)
@SLOW
def test_simhash_banding_pigeonhole_complete(spark, sigs, max_h):
    """Completeness property of the SimHash band join: with 4 bands over
    60 bits, EVERY pair at hamming ≤ 3 shares at least one identical
    band (pigeonhole), so the candidate join must recover exactly the
    pairs the brute-force bit_count(xor) filter admits — no misses, and
    the verify step kills any extra candidates."""
    from gcs2postgres_spark.operators.dedup import simhash_near_pairs

    fps = spark.createDataFrame(sigs, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(
            fps, "doc_id", max_hamming=max_h, bits=60, bands=4
        ).collect()
    }
    want = set()
    for i, (ida, ha) in enumerate(sigs):
        for idb, hb in sigs[i + 1 :]:
            if bin(ha ^ hb).count("1") <= max_h:
                want.add((min(ida, idb), max(ida, idb)))
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(-50, 50),
            st.integers(0, 9),
        ),
        min_size=0,
        max_size=20,
    ),
    k=st.integers(1, 4),
)
@SLOW
def test_topk_per_group_matches_naive_sort(spark, rows, k):
    """topk_per_group (WindowGroupLimit plan) == per-group python sort
    cut, including duplicate sort keys resolved by the explicit
    tiebreaker column."""
    from gcs2postgres_spark.operators.joins import topk_per_group

    df = spark.createDataFrame(rows, "g string, v int, t int")
    got = sorted(
        (r.g, r.v, r.t)
        for r in topk_per_group(
            df, ["g"], [F.col("v").desc(), F.col("t").asc()], k
        ).collect()
    )
    want = []
    by_g: dict = {}
    for g, v, t in rows:
        by_g.setdefault(g, []).append((v, t))
    for g, vs in by_g.items():
        for v, t in sorted(vs, key=lambda p: (-p[0], p[1]))[:k]:
            want.append((g, v, t))
    assert got == sorted(want)


@given(
    names=st.lists(
        st.sampled_from(["abcd", "abce", "abzz", "xyzw", "xyz", "q"]),
        min_size=0,
        max_size=10,
    ),
    max_dist=st.integers(0, 2),
)
@SLOW
def test_blocked_fuzzy_join_matches_bruteforce_within_blocks(
    spark, names, max_dist
):
    """blocked_fuzzy_join == python-side levenshtein over the same
    blocked candidates (block key = first char here) — verifying the
    join's predicate assembly, null-safe blocking, and distance edge
    at exactly max_dist."""
    from gcs2postgres_spark.operators.joins import blocked_fuzzy_join

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    rows = [(i, n, n[:1]) for i, n in enumerate(names)]
    left = spark.createDataFrame(rows, "lid long, lname string, lblk string")
    right = spark.createDataFrame(rows, "rid long, rname string, rblk string")
    got = {
        (r.lid, r.rid)
        for r in blocked_fuzzy_join(
            left, right, "lname", "rname", [("lblk", "rblk")], max_dist=max_dist
        ).collect()
    }
    want = {
        (i, j)
        for i, a, ab in rows
        for j, b, bb in rows
        if ab == bb and lev(a, b) <= max_dist
    }
    assert got == want


@given(
    names=st.lists(
        st.sampled_from(["abcd", "abce", "abzz", "xyzw", "xyz", "q"]),
        min_size=0,
        max_size=10,
    ),
    k=st.integers(1, 3),
)
@SLOW
def test_blocked_fuzzy_join_topk_is_capped_best_matches(spark, names, k):
    """blocked_fuzzy_join_topk == python-side 'sort candidates by
    (dist, rid), keep first k per lid' over the same blocked brute-force
    candidate set — the graceful-degradation contract: never more than
    k rows per left key, and exactly the (dist, rid)-minimal ones."""
    from gcs2postgres_spark.operators.joins import blocked_fuzzy_join_topk

    rows = [(i, n, n[:1]) for i, n in enumerate(names)]
    left = spark.createDataFrame(rows, "lid long, lname string, lblk string")
    right = spark.createDataFrame(rows, "rid long, rname string, rblk string")
    got_rows = blocked_fuzzy_join_topk(
        left,
        right,
        "lname",
        "rname",
        [("lblk", "rblk")],
        left_key="lid",
        right_order=["rid"],
        max_dist=2,
        k=k,
    ).collect()
    got = {(r.lid, r.rid, r.dist) for r in got_rows}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    by_left: dict[int, list[tuple[int, int]]] = {}
    for i, a, ab in rows:
        for j, b, bb in rows:
            if ab == bb and lev(a, b) <= 2:
                by_left.setdefault(i, []).append((lev(a, b), j))
    want = {
        (i, j, d)
        for i, cands in by_left.items()
        for d, j in sorted(cands)[:k]
    }
    assert got == want
    for i in {r[0] for r in got}:
        assert sum(1 for r in got if r[0] == i) <= k


def test_blocked_fuzzy_join_topk_same_column_names(spark):
    """The canonical ER call joins two tables sharing column names
    ('name', 'blk') — every internal reference must be frame-qualified
    or the post-join dist/window expressions raise AMBIGUOUS_REFERENCE
    (regression: r8 review finding)."""
    from gcs2postgres_spark.operators.joins import blocked_fuzzy_join_topk

    rows = [(1, "abcd", "a"), (2, "abce", "a"), (3, "xyz", "x")]
    left = spark.createDataFrame(rows, "key long, name string, blk string")
    right = spark.createDataFrame(rows, "key long, name string, blk string")
    got = blocked_fuzzy_join_topk(
        left,
        right,
        "name",
        "name",
        [("blk", "blk")],
        left_key="key",
        right_order=["key"],
        max_dist=2,
        k=1,
    ).collect()
    # best match per left key is itself (dist 0, smallest right key)
    assert sorted((r["dist"]) for r in got) == [0, 0, 0]


# ---------------------------------------------------------------- iceberg DML

# A DML op: ("delete", pred) or ("overwrite", pred) where pred is a
# (kind, param) pair evaluable both as a Spark SQL string and in the
# python model. Overwrite replaces matched rows with (v+1000, grp).
_DML_PREDS = st.tuples(
    st.sampled_from(["grp_eq", "mod7_eq", "v_lt"]),
    st.integers(min_value=0, max_value=6),
)
_DML_OPS = st.lists(
    st.tuples(st.sampled_from(["delete", "overwrite"]), _DML_PREDS),
    min_size=1,
    max_size=4,
)


def _dml_sql(pred):
    kind, p = pred
    return {
        "grp_eq": f"grp = {p % 5}",
        "mod7_eq": f"v % 7 = {p}",
        "v_lt": f"v < {p * 3}",
    }[kind]


def _dml_match(pred, v, grp):
    kind, p = pred
    if kind == "grp_eq":
        return grp == p % 5
    if kind == "mod7_eq":
        return v % 7 == p
    return v < p * 3


@given(ops=_DML_OPS)
@SLOW
def test_iceberg_dml_sequence_matches_model(spark, ops, tmp_path_factory):
    """Random sequences of delete_where/overwrite_where commits read
    back exactly like a python set-model of merge-on-read semantics:
    delete removes live matching rows; overwrite removes live matching
    rows AND appends its replacement rows (which later commits may
    delete again). Certifies sequence-number stacking, live-row
    matching, and replacement survival across arbitrary commit chains —
    shapes the fixed roundtrip query can't enumerate."""
    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        overwrite_where,
        read_iceberg_py,
        write_iceberg_v2_fixture,
    )

    table = str(tmp_path_factory.mktemp("dmlprop") / "t")
    base = [(v, v % 5) for v in range(30)]
    df = spark.createDataFrame(base, "v long, grp int")
    write_iceberg_v2_fixture(df.repartition(2), table, sort_col="v")

    model = list(base)
    for op, pred in ops:
        sql = _dml_sql(pred)
        if op == "delete":
            delete_where(spark, table, sql)
            model = [(v, g) for v, g in model if not _dml_match(pred, v, g)]
        else:
            matched = [(v, g) for v, g in model if _dml_match(pred, v, g)]
            repl = [(v + 1000, g) for v, g in matched]
            repl_df = spark.createDataFrame(repl or [], "v long, grp int")
            overwrite_where(spark, table, sql, repl_df)
            model = [t for t in model if t not in matched] + repl

    got = sorted(
        (r["v"], r["grp"]) for r in read_iceberg_py(spark, table).collect()
    )
    assert got == sorted(model)


@given(ops=_DML_OPS)
@SLOW
def test_iceberg_partitioned_dml_sequence_matches_model(spark, ops, tmp_path_factory):
    """The same random commit chains as
    test_iceberg_dml_sequence_matches_model, over an identity-PARTITIONED
    v2 table: partition-scoped delete manifests, cross-partition
    predicates, and replacement routing into (possibly new) partitions
    must all read back exactly like the python merge-on-read model."""
    from gcs2postgres_spark.sources.iceberg_py import (
        delete_where,
        overwrite_where,
        read_iceberg_py,
        write_iceberg_v2_partitioned_fixture,
    )

    table = str(tmp_path_factory.mktemp("dmlpartprop") / "t")
    base = [(v, v % 5) for v in range(30)]
    df = spark.createDataFrame(base, "v long, grp int")
    write_iceberg_v2_partitioned_fixture(df.repartition(2), table, "grp")

    model = list(base)
    for op, pred in ops:
        sql = _dml_sql(pred)
        if op == "delete":
            delete_where(spark, table, sql)
            model = [(v, g) for v, g in model if not _dml_match(pred, v, g)]
        else:
            matched = [(v, g) for v, g in model if _dml_match(pred, v, g)]
            repl = [(v + 1000, g) for v, g in matched]
            repl_df = spark.createDataFrame(repl or [], "v long, grp int")
            overwrite_where(spark, table, sql, repl_df)
            model = [t for t in model if t not in matched] + repl

    got = sorted(
        (r["v"], r["grp"]) for r in read_iceberg_py(spark, table).collect()
    )
    assert got == sorted(model)


@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
        ),
        min_size=0,
        max_size=40,
    ),
    n_parts=st.integers(min_value=1, max_value=6),
)
@SLOW
def test_driver_prefix_fold_matches_window_form(spark, vals, n_parts):
    """driver_prefix_sums / driver_prefix_max == the exclusive
    pid-ordered window aggregates they replaced (coalesce(sum OVER
    PRECEDING, 0) / max OVER PRECEDING), on random frames including
    NULLs and empty partitions — pins the shared primitive to the
    certified window semantics for every current and future caller."""
    from pyspark.sql import Window

    from gcs2postgres_spark.operators.prefix import (
        driver_prefix_max,
        driver_prefix_sums,
    )

    df = spark.createDataFrame(
        [(i, k, w) for i, (k, w) in enumerate(vals)], "rid long, k long, w long"
    )
    ranged = (
        df.repartitionByRange(n_parts, F.asc("k"), F.asc("rid"))
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    per_pid = ranged.groupBy("pid").agg(
        F.sum("w").alias("s"), F.max("w").alias("m")
    )
    want = {
        r["pid"]: (r["off_s"], r["off_m"])
        for r in per_pid.select(
            "pid",
            F.coalesce(F.sum("s").over(w_off), F.lit(0)).alias("off_s"),
            F.max("m").over(w_off).alias("off_m"),
        ).collect()
    }
    pref, totals = driver_prefix_sums(ranged, ["w"])
    got = {
        r["pid"]: (r["ps"], r["pm"])
        for r in ranged.select(
            "pid",
            pref["w"].alias("ps"),
            driver_prefix_max(ranged, "w", "long").alias("pm"),
        )
        .distinct()
        .collect()
    }
    for pid, (ws, wm) in got.items():
        assert (ws, wm) == want[pid], (pid, got, want)
    assert totals["w"] == sum(w for _, w in vals if w is not None)


# ------------------------------------------------------- delta DV codec

# Spark-free pure-python properties: the roaring/Z85 codec must be
# exact for any position set before the reader's anti-join can be.


@given(
    positions=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=2**20),  # dense low range
            st.integers(min_value=0, max_value=2**40),  # cross high words
        ),
        min_size=0,
        max_size=300,
    )
)
@settings(deadline=None, max_examples=60)
def test_roaring_array_roundtrip(positions):
    from gcs2postgres_spark.sources.dv_roaring import (
        roaring_array_decode,
        roaring_array_encode,
    )

    assert roaring_array_decode(roaring_array_encode(positions)) == sorted(
        set(positions)
    )


def test_roaring_bitmap_container_roundtrip():
    """>4096 values in one 16-bit bucket forces the bitmap-container
    encoding branch; decode must invert it exactly."""
    from gcs2postgres_spark.sources.dv_roaring import (
        roaring_array_decode,
        roaring_array_encode,
    )

    vals = list(range(0, 20000, 3))  # 6667 values in buckets 0..1
    assert roaring_array_decode(roaring_array_encode(vals)) == vals


def test_roaring_run_container_decode():
    """Real writers emit RUN containers for contiguous deletes; our
    encoder never does, so decode one crafted by hand against the
    format spec (cookie 12347, run-flag bitset, (start, len-1) pairs)."""
    import struct

    from gcs2postgres_spark.sources.dv_roaring import roaring_array_decode

    # one container, run flag set, two runs: [5..9] and [100..100]
    blob = struct.pack("<I", 12347 | (0 << 16))  # cookie, size-1=0
    blob += bytes([0b1])  # run flag for container 0
    blob += struct.pack("<HH", 0, 6 - 1)  # key 0, cardinality 6
    blob += struct.pack("<H", 2)  # numRuns
    blob += struct.pack("<HH", 5, 4)  # 5..9
    blob += struct.pack("<HH", 100, 0)  # 100
    data = struct.pack("<iq", 1681511377, 1) + struct.pack("<i", 0) + blob
    assert roaring_array_decode(data) == [5, 6, 7, 8, 9, 100]


@given(payload=st.binary(min_size=0, max_size=64).filter(lambda b: len(b) % 4 == 0))
@settings(deadline=None, max_examples=60)
def test_z85_roundtrip(payload):
    from gcs2postgres_spark.sources.dv_roaring import z85_decode, z85_encode

    assert z85_decode(z85_encode(payload)) == payload


@given(ops=st.lists(_DML_PREDS, min_size=1, max_size=3))
@SLOW
def test_delta_dv_delete_sequence_matches_model(spark, ops, tmp_path_factory):
    """Random chains of delete_where_delta commits read back exactly
    like a python set-model: each commit hides the LIVE rows matching
    its predicate (already-hidden rows never re-match), merged per-file
    vectors supersede correctly, and version-0 time travel always
    resurrects the full table — the Delta twin of the Iceberg DML
    property test."""
    from gcs2postgres_spark.sources.delta_py import (
        delete_where_delta,
        read_delta_py,
        write_delta_fixture,
    )

    table = str(tmp_path_factory.mktemp("dvprop") / "t")
    base = [(v, v % 5) for v in range(30)]
    df = spark.createDataFrame(base, "v long, grp int")
    write_delta_fixture(df.coalesce(2), table)

    model = list(base)
    ts = 1_700_000_000_000
    for pred in ops:
        ts += 1000
        matched = [(v, g) for v, g in model if _dml_match(pred, v, g)]
        ver = delete_where_delta(spark, table, _dml_sql(pred), timestamp_ms=ts)
        assert (ver is None) == (not matched)
        model = [t for t in model if t not in matched]

    got = sorted((r["v"], r["grp"]) for r in read_delta_py(spark, table).collect())
    assert got == sorted(model)
    assert read_delta_py(spark, table, version_as_of=0).count() == 30
