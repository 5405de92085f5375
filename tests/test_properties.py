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
