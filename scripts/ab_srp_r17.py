#!/usr/bin/env python
"""Single-session counterbalanced A/B for the r17 SRP near-dup candidate
generation: bucket group-by + HOF pair expansion (bucket_pair_expand)
vs the pre-r17 bucket SELF-JOIN. Times dedup_cosine_embeddings with
each shape by monkeypatching operators.dedup.bucket_pair_expand, same
session, ABBA order.

Usage: python scripts/ab_srp_r17.py [--sf DIR] [--reps N]
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import gcs2postgres_spark.operators.dedup as D
    from gcs2postgres_spark.operators.caching import release_transient_caches
    from gcs2postgres_spark.queries import REGISTRY
    from gcs2postgres_spark.session import get_spark, local_shuffle_to_shm, tune_local_fast

    local_shuffle_to_shm()
    spark = get_spark("ab-srp-r17")
    tune_local_fast(spark, args.sf)

    expand = D.bucket_pair_expand

    def join_pair_expand(df, bucket_keys, id_col, carry=()):
        # pre-r17 shape: bucket self-join (no carry needed at this site)
        a = df.select(F.col(id_col).alias("id_a"), *bucket_keys)
        b = df.select(
            F.col(id_col).alias("id_b"), *[F.col(k).alias(f"{k}_b") for k in bucket_keys]
        )
        cond = F.col("id_a") < F.col("id_b")
        for k in bucket_keys:
            cond = cond & (F.col(k) == F.col(f"{k}_b"))
        return a.join(b, cond).select("id_a", "id_b").dropDuplicates(["id_a", "id_b"])

    def run(use_expand: bool) -> float:
        D.bucket_pair_expand = expand if use_expand else join_pair_expand
        try:
            spark.sparkContext.setJobDescription(f"ab-srp:{'expand' if use_expand else 'join'}")
            t0 = time.perf_counter()
            REGISTRY["dedup_cosine_embeddings"].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
        finally:
            D.bucket_pair_expand = expand
        release_transient_caches()
        spark.catalog.clearCache()
        return round(dt, 3)

    run(True)
    run(False)

    on: list[float] = []
    off: list[float] = []
    for _ in range(args.reps):
        on.append(run(True))
        off.append(run(False))
        off.append(run(False))
        on.append(run(True))

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    print(json.dumps({
        "sf": args.sf,
        "expand": {"median": med(on), "samples": on},
        "self_join": {"median": med(off), "samples": off},
    }))


if __name__ == "__main__":
    main()
