#!/usr/bin/env python
"""Time individual registry queries under the bench session profile
(noop sink, warm session, median of N reps) — the per-query isolation
tool for optimization A/Bs. Prints one JSON line.

Usage: python scripts/time_queries.py [--sf DIR] [--reps N] name ...
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
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from gcs2postgres_spark.operators.caching import release_transient_caches
    from gcs2postgres_spark.queries import REGISTRY
    from gcs2postgres_spark.session import (
        get_spark,
        local_shuffle_to_shm,
        tune_local_fast,
    )

    local_shuffle_to_shm()
    spark = get_spark("time-queries")
    tune_local_fast(spark, args.sf)
    # warm-up (JVM/codegen), not measured
    REGISTRY["q1_pricing_summary"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in args.names:
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
            release_transient_caches()
            spark.catalog.clearCache()
        s = sorted(samples)
        out[name] = {"median": s[len(s) // 2] if len(s) % 2 else (s[len(s)//2-1]+s[len(s)//2])/2,
                     "min": s[0], "samples": samples}
    print(json.dumps({"sf": args.sf, "queries": out}))


if __name__ == "__main__":
    main()
