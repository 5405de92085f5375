#!/usr/bin/env python
"""Per-query wall-clock sweep of the FULL registry at a given scale dir
— the round-5b instrument that caught five scale walls the sf0.1 tests
could not see (cosine near-dup 904 s, winnowing >500 s, trigram
novelty 70 s, multi-distinct+HLL 161 s, fuzzy-ER blocking 78 s; all
fixed, see BASELINE.md).

Run it after adding operators, at a scale at least 10× the pytest SF:
correctness gates prove ANSWERS; only timing at scale proves SHAPES.

Usage:
    python scripts/sweep_sf1.py [--sf DIR] [--out FILE] [name ...]

Writes one line per query to --out (default /tmp/sweep_sf1.log) as it
goes (crash-safe), then a JSON summary to stdout with the slowest 10.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.benchdata/sf1")
    ap.add_argument("--out", default="/tmp/sweep_sf1.log")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
    from gcs2postgres_spark.queries import REGISTRY
    from gcs2postgres_spark.session import (
        get_spark,
        local_shuffle_to_shm,
        tune_local_fast,
    )

    local_shuffle_to_shm()
    spark = get_spark("sweep-sf1")
    tune_local_fast(spark, args.sf)
    names = args.names or list(REGISTRY)
    # warm-up (JVM + codegen), not recorded
    REGISTRY["q1_pricing_summary"].fn(spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, object] = {}
    with open(args.out, "w") as log:
        for i, name in enumerate(names):
            t0 = time.time()
            try:
                REGISTRY[name].fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[name] = round(time.time() - t0, 2)
            except Exception as e:  # noqa: BLE001 — sweep must finish
                out[name] = f"ERR {str(e)[:120]}"
            log.write(f"{name} {out[name]}\n")
            log.flush()
            # single-session hygiene: without this, 200+ queries of
            # accumulated cache entries and localCheckpoint blocks
            # exhaust the heap (the r6 sf3 full sweep died at query 230
            # with GCLocker alloc failures). release_transient_caches
            # drains the maybe_persist registry (clearCache alone leaves
            # its Python-side DataFrame refs pinned for the session);
            # clearCache drops persisted frames; the periodic driver-side
            # gc lets ContextCleaner actually release checkpoint RDD
            # blocks whose Python refs are long gone.
            from gcs2postgres_spark.operators.caching import release_transient_caches

            release_transient_caches()
            spark.catalog.clearCache()
            if (i + 1) % 20 == 0:
                spark.sparkContext._jvm.System.gc()
    timed = {k: v for k, v in out.items() if isinstance(v, float)}
    slowest = sorted(timed.items(), key=lambda kv: -kv[1])[:10]
    print(
        json.dumps(
            {
                "sf": args.sf,
                "n_queries": len(out),
                "n_errors": len(out) - len(timed),
                "total_sec": round(sum(timed.values()), 1),
                "slowest": slowest,
            }
        )
    )


if __name__ == "__main__":
    main()
