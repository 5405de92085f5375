"""Z-order layout: per-file min/max really tightens on BOTH interleaved
dimensions (the property that makes footer pruning work), and the
Morton key itself is a correct bit interleave."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from gcs2postgres_spark.layout import zorder_key
from gcs2postgres_spark.queries.zorder_q import zordered_lineitem_path
from tests.conftest import SF_ORACLE as SF


def test_zorder_key_interleaves(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(3, 5)], ["a", "b"])
    # a=0b011, b=0b101 -> interleave (a bit i at 2i, b bit i at 2i+1):
    # bits: a0=1,b0=1,a1=1,b1=0,a2=0,b2=1 -> 0b100111 = 39
    got = df.select(zorder_key([F.col("a"), F.col("b")], bits=3).alias("z")).first()["z"]
    assert got == 39


def test_zorder_files_prune_both_dims(spark):
    path = zordered_lineitem_path(spark, SF, n_files=16)
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 8

    date_hit, disc_hit = 0, 0
    for f in files:
        meta = pq.read_metadata(f)
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in ("l_shipdate", "l_discount") or not col.is_stats_set:
                    continue
                st = col.statistics
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        # q6 predicate windows
        import datetime

        lo_d, hi_d = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
        if mins["l_shipdate"] < hi_d and maxs["l_shipdate"] >= lo_d:
            date_hit += 1
        if mins["l_discount"] <= 0.07 and maxs["l_discount"] >= 0.03:
            disc_hit += 1

    n = len(files)
    # the curve must make SOME files skippable on each dimension —
    # a plain unsorted write leaves every file covering the full range
    # of both columns (verified: all files hit on both dims)
    assert date_hit < n, f"no date pruning: {date_hit}/{n} files hit"
    assert disc_hit < n, f"no discount pruning: {disc_hit}/{n} files hit"
