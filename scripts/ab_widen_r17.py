#!/usr/bin/env python
"""Counterbalanced single-session A/B for the r17 widen_doc_scan
additions (text_token_stats, text_lang_id): the same aggregation is
built over the raw documents scan vs the widened scan, ABBA order in
one warm JVM, noop sink. Equivalence asserted first.

Usage: python scripts/ab_widen_r17.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gcs2postgres_spark.catalog import load_table
    from gcs2postgres_spark.functions.text import (
        bpe_ish_token_count,
        lang_id_heuristic,
        token_count,
    )
    from gcs2postgres_spark.operators.caching import widen_doc_scan
    from gcs2postgres_spark.session import get_spark, local_shuffle_to_shm, tune_local_fast

    local_shuffle_to_shm()
    spark = get_spark("ab-widen")
    tune_local_fast(spark, args.sf)

    def stats_q(widen: bool):
        d = load_table(spark, args.sf, "documents")
        if widen:
            d = widen_doc_scan(d, "doc_id")
        return (
            d.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
                F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
                F.sum(bpe_ish_token_count(F.col("text"))).cast("bigint").alias("total_bpe_tokens"),
            )
            .orderBy("lang")
        )

    def langid_q(widen: bool):
        d = load_table(spark, args.sf, "documents")
        if widen:
            d = widen_doc_scan(d, "doc_id")
        return (
            d.select(lang_id_heuristic(F.col("text")).alias("predicted"), F.col("lang").alias("actual"))
            .groupBy("predicted", "actual")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("predicted", "actual")
        )

    for q in (stats_q, langid_q):
        assert [tuple(r) for r in q(False).collect()] == [tuple(r) for r in q(True).collect()]

    arms = {
        "stats_narrow": lambda: stats_q(False),
        "stats_widen": lambda: stats_q(True),
        "langid_narrow": lambda: langid_q(False),
        "langid_widen": lambda: langid_q(True),
    }
    for fn in arms.values():  # codegen warm-up, unmeasured
        fn().write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {k: [] for k in arms}
    order = list(arms)
    for rep in range(args.reps):
        seq = order if rep % 2 == 0 else order[::-1]
        for name in seq:
            t0 = time.perf_counter()
            arms[name]().write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 4))

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    print(json.dumps({
        "sf": args.sf,
        "medians": {k: round(med(v), 4) for k, v in samples.items()},
        "samples": samples,
    }))


if __name__ == "__main__":
    main()
