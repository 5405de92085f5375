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
