"""Iceberg hidden-partitioning transforms (round 12).

Real Iceberg tables are overwhelmingly partitioned with non-identity
transforms (``days(ts)``, ``bucket(n, id)``, ``truncate``); the spec
pins their exact semantics, including the murmur3_x86_32 hash for
``bucket`` (spec Appendix B). These tests pin:

- the hash against the spec's published test vectors,
- driver-side ``apply_transform`` == executor-side ``transform_expr``
  on every supported (transform, type) pair (the two faces the pruning
  and routing paths rely on agreeing),
- manifest-level FILE SKIPPING through transforms (unreadable-file
  proof, the same discipline as the identity-partition DML test),
- row-level DML routing rewritten rows to their transformed partitions.
"""

import datetime as dt
import os

import pytest

from gcs2postgres_spark.sources.iceberg_transforms import (
    apply_transform,
    murmur3_32,
    parse_transform,
    result_avro_type,
    transform_expr,
)


def test_murmur3_spec_vectors():
    """Spec Appendix B 'Hash requirements' published test values."""
    def hash_long(v: int) -> int:
        return murmur3_32((v & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))

    assert hash_long(34) == 2017239379  # int AND long 34 (widened)
    assert hash_long(17486) == -653330422  # date 2017-11-16
    assert hash_long(1510871468000000) == -2047944441  # ts 2017-11-16T22:31:08
    assert murmur3_32(b"iceberg") == 1210000089  # string
    assert murmur3_32(b"") == 0
    assert murmur3_32(b"abc") != murmur3_32(b"acb")  # tail bytes matter


def test_apply_transform_semantics():
    # truncate: floor semantics for negatives (spec: W * floor(v/W))
    assert apply_transform("truncate[10]", -1, "int") == -10
    assert apply_transform("truncate[10]", -10, "long") == -10
    assert apply_transform("truncate[10]", 7, "int") == 0
    assert apply_transform("truncate[3]", "iceberg", "string") == "ice"
    # calendar transforms floor in UTC
    d = dt.date(2017, 11, 16)
    assert apply_transform("day", d, "date") == 17486
    assert apply_transform("year", d, "date") == 47
    assert apply_transform("month", d, "date") == 47 * 12 + 10
    ts = dt.datetime(2017, 11, 16, 22, 31, 8)
    assert apply_transform("hour", ts, "timestamp") == 1510871468000000 // 3_600_000_000
    assert apply_transform("day", ts, "timestamptz") == 17486
    # pre-epoch floors DOWN (not toward zero)
    assert apply_transform("day", dt.date(1969, 12, 31), "date") == -1
    assert apply_transform("month", dt.date(1969, 12, 31), "date") == -1
    # nulls propagate; identity passes through; void voids
    assert apply_transform("bucket[4]", None, "int") is None
    assert apply_transform("identity", 5, "int") == 5
    assert apply_transform("void", 5, "int") is None
    with pytest.raises(ValueError, match="unknown"):
        parse_transform("bucket(16)")  # java toString form is not spec JSON
    with pytest.raises(NotImplementedError, match="invalid on a date"):
        apply_transform("hour", d, "date")
    assert result_avro_type("bucket[8]", "long") == "int"
    assert result_avro_type("truncate[4]", "string") == "string"
    assert result_avro_type("day", "int") == "int"


def test_transform_expr_matches_python(spark):
    """The executor-side expressions (routing) and the driver-side
    Python (pruning) MUST agree on every value — a disagreement routes
    a row into a partition the pruner then skips, i.e. silent row loss.
    Covers int/long/string bucket, truncate, and all calendar
    transforms over date / timestamp_ntz / timestamptz, nulls included.
    """
    df = spark.range(500).selectExpr(
        "CASE WHEN id % 97 = 0 THEN NULL ELSE CAST(id * 7919 - 1000000 AS INT) END AS i",
        "CAST(id * 982451653 - 50000000000 AS LONG) AS l",
        "CASE WHEN id % 89 = 0 THEN NULL ELSE concat('s_', id, '_', repeat('x', CAST(id % 7 AS INT))) END AS s",
        "date_add(DATE'1969-06-01', CAST(id * 13 AS INT)) AS d",
        "timestamp_ntz'1969-11-20 03:04:05' + make_interval(0,0,0,0,CAST(id*11 AS INT),7,0.5) AS tn",
        "CAST(timestamp_ntz'1970-02-03 00:00:00' + make_interval(0,0,0,0,CAST(id*17 AS INT),0,0) AS TIMESTAMP) AS tz",
    )
    cases = [
        ("bucket[16]", "i", "int"),
        ("bucket[7]", "l", "long"),
        ("bucket[32]", "s", "string"),
        ("bucket[5]", "d", "date"),
        ("bucket[5]", "tn", "timestamp"),
        ("truncate[100]", "i", "int"),
        ("truncate[1000]", "l", "long"),
        ("truncate[4]", "s", "string"),
        ("year", "d", "date"),
        ("month", "d", "date"),
        ("day", "d", "date"),
        ("year", "tn", "timestamp"),
        ("month", "tn", "timestamp"),
        ("day", "tn", "timestamp"),
        ("hour", "tn", "timestamp"),
        ("identity", "i", "int"),
    ]
    sel = [
        transform_expr(tr, col, df.schema[col].dataType).alias(f"t{i}")
        for i, (tr, col, _) in enumerate(cases)
    ]
    rows = df.select("*", *sel).collect()
    for r in rows:
        for i, (tr, col, ityp) in enumerate(cases):
            expect = apply_transform(tr, r[col], ityp)
            assert r[f"t{i}"] == expect, (tr, col, r[col], r[f"t{i}"], expect)
    # timestamptz: compare via UTC-normalized python datetimes
    tz_rows = df.select(
        "tz",
        transform_expr("day", "tz", df.schema["tz"].dataType).alias("tzd"),
        transform_expr("hour", "tz", df.schema["tz"].dataType).alias("tzh"),
        transform_expr("month", "tz", df.schema["tz"].dataType).alias("tzm"),
        transform_expr("bucket[9]", "tz", df.schema["tz"].dataType).alias("tzb"),
    ).collect()
    for r in tz_rows:
        # Row timestamps come back session-local-naive; re-read as UTC
        # through the micros the expressions actually saw is not
        # possible from the Row alone, so assert internal consistency:
        # hour // 24 == day, and day -> month roundtrip via date math
        assert r["tzh"] // 24 == r["tzd"], r
        d = dt.date(1970, 1, 1) + dt.timedelta(days=r["tzd"])
        assert r["tzm"] == (d.year - 1970) * 12 + d.month - 1, r
        assert 0 <= r["tzb"] < 9


def _mk_df(spark):
    return spark.range(120).selectExpr(
        "CAST(id AS INT) AS k",
        "concat('N_', id) AS name",
        "date_add(DATE'2024-01-01', CAST((id * 3) % 200 AS INT)) AS d",
    )


def test_create_append_prune_transform_partitioned(spark, tmp_path):
    """create (no snapshot) → append routes by month(d)+bucket[4](k) →
    read back exact → partition_filter SKIPS other partitions' files,
    proven by making them unreadable during the filtered scan."""
    from gcs2postgres_spark.sources.iceberg_py import (
        append_iceberg_v2,
        create_iceberg_v2_table,
        read_iceberg_py,
        read_iceberg_meta,
    )

    df = _mk_df(spark)
    table = str(tmp_path / "t")
    create_iceberg_v2_table(df.schema, table, [("d", "month"), ("k", "bucket[4]")])
    # empty created table reads as empty, not an error
    assert read_iceberg_py(spark, table).count() == 0
    sid = append_iceberg_v2(spark, table, df, snapshot_ts_ms=1_700_000_000_000)
    assert sid == 1
    back = read_iceberg_py(spark, table)
    assert sorted(r["k"] for r in back.collect()) == list(range(120))

    # manifest partition tuples carry the TRANSFORMED values
    files = read_iceberg_meta(spark, table, "files").collect()
    parts = {f["partition"] for f in files}
    assert any('"d_month": 648' in p for p in parts)  # 2024-01 = (2024-1970)*12+0

    # prune to January 2024 by SOURCE value; corrupt everything else
    jan = {r["k"] for r in back.filter("d < DATE'2024-02-01'").collect()}
    keep = {
        os.path.basename(f["file_path"])
        for f in files
        if '"d_month": 648' in f["partition"]
    }
    assert keep and len(keep) < len(files)
    saved = {}
    for root, _dirs, fs in os.walk(os.path.join(table, "data")):
        for f in fs:
            p = os.path.join(root, f)
            if f.endswith(".parquet") and f not in keep:
                saved[p] = open(p, "rb").read()
                open(p, "wb").write(b"GARBAGE")
    pruned = read_iceberg_py(
        spark, table, partition_filter={"d": {dt.date(2024, 1, 15)}}
    ).filter("d < DATE'2024-02-01'")
    assert {r["k"] for r in pruned.collect()} == jan
    for p, b in saved.items():
        open(p, "wb").write(b)


def test_dml_on_transform_partitioned(spark, tmp_path):
    """DELETE / UPDATE / MERGE route delete files and rewritten rows by
    the transformed partition tuple; an UPDATE that moves a row across
    months lands it in the new month's partition (visible to pruning)."""
    from gcs2postgres_spark.sources.iceberg_py import (
        append_iceberg_v2,
        create_iceberg_v2_table,
        delete_where,
        merge_into,
        read_iceberg_py,
        update_where,
    )

    df = _mk_df(spark)
    table = str(tmp_path / "t")
    create_iceberg_v2_table(df.schema, table, [("d", "month"), ("k", "bucket[4]")])
    append_iceberg_v2(spark, table, df, snapshot_ts_ms=1_700_000_000_000)

    assert delete_where(spark, table, "k < 10", snapshot_ts_ms=1_700_000_001_000)
    assert read_iceberg_py(spark, table).count() == 110

    # UPDATE moves k=50 to June 2031: new transformed partition tuple
    assert update_where(
        spark, table, "k = 50", {"d": "DATE'2031-06-15'"},
        snapshot_ts_ms=1_700_000_002_000,
    )
    moved = read_iceberg_py(
        spark, table, partition_filter={"d": {dt.date(2031, 6, 1)}}
    ).filter("d >= DATE'2031-06-01'")
    assert [r["k"] for r in moved.collect()] == [50]

    src = spark.createDataFrame(
        [(60, "UPD", dt.date(2024, 2, 2)), (900, "NEW", dt.date(2024, 3, 3))],
        "k int, name string, d date",
    )
    assert merge_into(spark, table, src, ["k"], snapshot_ts_ms=1_700_000_003_000)
    out = {r["k"]: r["name"] for r in read_iceberg_py(spark, table).collect()}
    assert out[60] == "UPD" and out[900] == "NEW"
    assert read_iceberg_py(spark, table).count() == 111

    # partition-filter-pruned DML on a transform table
    assert delete_where(
        spark, table, "d >= DATE'2031-06-01' AND d < DATE'2031-07-01'",
        snapshot_ts_ms=1_700_000_004_000,
        partition_filter={"d": {dt.date(2031, 6, 1)}},
    )
    assert read_iceberg_py(spark, table).filter("k = 50").count() == 0


def test_create_table_refusals(spark, tmp_path):
    from gcs2postgres_spark.sources.iceberg_py import (
        _v2_table_context,
        append_iceberg_v2,
        create_iceberg_v2_table,
    )

    df = _mk_df(spark)
    with pytest.raises(ValueError, match="unknown iceberg partition transform"):
        create_iceberg_v2_table(df.schema, str(tmp_path / "a"), [("k", "buckets[4]")])
    with pytest.raises(ValueError, match="not in schema"):
        create_iceberg_v2_table(df.schema, str(tmp_path / "b"), [("zz", "identity")])
    # hour on a date source is invalid per spec: caught at first use
    t = str(tmp_path / "c")
    create_iceberg_v2_table(df.schema, t, [("d", "hour")])
    with pytest.raises(NotImplementedError, match="hour partition on iceberg type 'date'"):
        append_iceberg_v2(spark, t, df)
    # truncate on a date source is invalid per spec
    t2 = str(tmp_path / "d")
    create_iceberg_v2_table(df.schema, t2, [("d", "truncate[3]")])
    with pytest.raises(NotImplementedError, match="truncate\\[3\\] partition"):
        _v2_table_context(t2, "append")


def test_identity_partition_on_temporal_sources(spark, tmp_path):
    """Identity partitioning on date/timestamp sources stores the
    underlying int days / long micros in the manifest partition struct
    (spec encoding) — routing, pruning (by SOURCE date value), and DML
    all line up through the storage transform."""
    import datetime as dt

    from gcs2postgres_spark.sources.iceberg_py import (
        append_iceberg_v2,
        create_iceberg_v2_table,
        delete_where,
        read_iceberg_meta,
        read_iceberg_py,
    )

    df = spark.range(12).selectExpr(
        "CAST(id AS INT) AS k",
        "date_add(DATE'2024-01-01', CAST(id % 3 AS INT)) AS d",
        "timestamp_ntz'2024-03-01 00:00:00' + make_interval(0,0,0,CAST(id % 2 AS INT),0,0,0) AS ts",
    )
    t = str(tmp_path / "t")
    create_iceberg_v2_table(df.schema, t, [("d", "identity"), ("ts", "identity")])
    append_iceberg_v2(spark, t, df, snapshot_ts_ms=1_700_000_000_000)
    back = read_iceberg_py(spark, t)
    assert back.count() == 12
    # manifest stores int days / long micros
    files = read_iceberg_meta(spark, t, "files").collect()
    assert any('"d": 19723' in f["partition"] for f in files)  # 2024-01-01
    # prune by SOURCE date value: only the matching partition survives
    pr = read_iceberg_py(spark, t, partition_filter={"d": {dt.date(2024, 1, 2)}})
    assert sorted(r["k"] for r in pr.collect()) == [1, 4, 7, 10]
    # DML with a temporal-identity partition filter
    assert delete_where(
        spark, t, "d = DATE'2024-01-02'", snapshot_ts_ms=1_700_000_001_000,
        partition_filter={"d": {dt.date(2024, 1, 2)}},
    )
    assert read_iceberg_py(spark, t).count() == 8


def test_transform_properties_hypothesis():
    """Property-pinned transform laws (driver-side face; the expr face
    is pinned equal to it in test_transform_expr_matches_python):
    bucket ranges, truncate idempotence/monotonicity, calendar
    consistency (month//12 == year floor; hour//24 == day)."""
    import datetime as dt

    from hypothesis import given, strategies as st

    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1),
           st.integers(min_value=1, max_value=1 << 20))
    def bucket_in_range(v, n):
        b = apply_transform(f"bucket[{n}]", v, "long")
        assert 0 <= b < n

    bucket_in_range()

    @given(st.text(max_size=40), st.integers(min_value=1, max_value=1000))
    def bucket_str_in_range(s, n):
        assert 0 <= apply_transform(f"bucket[{n}]", s, "string") < n

    bucket_str_in_range()

    @given(st.integers(min_value=-(10**15), max_value=10**15),
           st.integers(min_value=1, max_value=10**6))
    def truncate_laws(v, w):
        t = apply_transform(f"truncate[{w}]", v, "long")
        assert t <= v < t + w  # floor bucket contains v
        # idempotent
        assert apply_transform(f"truncate[{w}]", t, "long") == t

    truncate_laws()

    @given(st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 31)))
    def calendar_consistency(d):
        y = apply_transform("year", d, "date")
        m = apply_transform("month", d, "date")
        # floor semantics on both: month ordinal floor-divides to year
        assert m // 12 == y
        assert apply_transform("day", d, "date") == (d - dt.date(1970, 1, 1)).days

    calendar_consistency()

    @given(st.datetimes(min_value=dt.datetime(1, 1, 1),
                        max_value=dt.datetime(9999, 12, 28)))
    def hour_day_consistency(ts):
        h = apply_transform("hour", ts, "timestamp")
        day = apply_transform("day", ts, "timestamp")
        assert h // 24 == day

    hour_day_consistency()
