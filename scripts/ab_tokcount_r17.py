#!/usr/bin/env python
"""Counterbalanced single-session A/B for the r17 token-count expression
change (functions/text.py, operators/training.py:186): count-only
token counts moved from size(split(...)) / size(regexp_extract_all(...))
to regexp_count, which never materializes the token/match array.

Two shapes per query, ABBA order, one warm JVM, noop sink. Both shapes
are verified to return identical aggregates first (hard assert), so this
is a pure plan A/B.

Usage: python scripts/ab_tokcount_r17.py [--sf DIR] [--reps N]
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
    from gcs2postgres_spark.functions.text import BPE_ISH_PATTERN
    from gcs2postgres_spark.session import get_spark, local_shuffle_to_shm, tune_local_fast

    local_shuffle_to_shm()
    spark = get_spark("ab-tokcount")
    tune_local_fast(spark, args.sf)

    d = load_table(spark, args.sf, "documents")

    def tok_old(col):
        return F.size(F.split(F.trim(col), r"\s+")).cast("bigint")

    def tok_new(col):
        return (F.regexp_count(F.trim(col), F.lit(r"\s+")) + F.lit(1)).cast("bigint")

    def bpe_old(col):
        return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_PATTERN), F.lit(0))).cast("bigint")

    def bpe_new(col):
        return F.regexp_count(F.lower(col), F.lit(BPE_ISH_PATTERN)).cast("bigint")

    def stats_q(tok, bpe):
        return (
            d.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(tok(F.col("text"))).cast("bigint").alias("total_tokens"),
                F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
                F.sum(bpe(F.col("text"))).cast("bigint").alias("total_bpe_tokens"),
            )
            .orderBy("lang")
        )

    # equivalence gate: identical rows or the A/B is meaningless
    rows_old = [tuple(r) for r in stats_q(tok_old, bpe_old).collect()]
    rows_new = [tuple(r) for r in stats_q(tok_new, bpe_new).collect()]
    assert rows_old == rows_new, "regexp_count shape changed results!"

    arms = {
        "old_size_split": lambda: stats_q(tok_old, bpe_old),
        "new_regexp_count": lambda: stats_q(tok_new, bpe_new),
    }
    # warm-up both shapes once (codegen), unmeasured
    for fn in arms.values():
        fn().write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {k: [] for k in arms}
    order = ["old_size_split", "new_regexp_count", "new_regexp_count", "old_size_split"]
    for rep in range(args.reps):
        for name in order if rep % 2 == 0 else order[::-1]:
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
