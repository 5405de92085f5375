#!/usr/bin/env python
"""Same-session warm A/B of the r8 star-contraction distinct-removal
(round-8 task 7 / round-9 verdict item 7): old = large-star emits a
distinct-ed, self-loop-filtered edge set each round; new (shipped) =
no distinct, duplicates absorbed by the next round's map-side partial
min + small-star distinct.

Counterbalanced interleave (N,O,O,N,N,O) of the full
``dedup_cluster_canonical`` pipeline at a given scale dir, one warm
session, caches released between runs — the same protocol that
certified the size-conditional persists in r9 (operators/caching.py
docstring). Prints one JSON line with per-run times and medians.

Usage:
    python scripts/ab_starcc_sf3.py [--sf DIR] [--reps-per-arm N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _star_contract_old(und: DataFrame, max_iter: int = 50) -> DataFrame:
    """The PRE-r8 round body: identical to
    operators/graph.py::_star_contract except the large-star stage pays
    a distinct + self-loop filter per round (the extra shuffle r8
    removed). Kept verbatim-shaped so the A/B isolates exactly that."""
    E = (
        und.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev: tuple | None = None
    for _ in range(max_iter):
        sym = E.union(E.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select("a", F.least("mb", "a").alias("m"))
        )
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))  # OLD: per-round
            .distinct()                        # OLD: extra shuffle
        )
        mins2 = large.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            large.join(mins2, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        E = small
        chk = E.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.xxhash64("a", "b")).alias("h")
        ).first()
        cur = (chk["n"], chk["h"])
        if cur == prev:
            return (
                E.select(F.col("a").alias("node"), F.col("b").alias("comp"))
                .union(E.select(F.col("b").alias("node"), F.col("b").alias("comp")))
                .distinct()
            )
        prev = cur
    raise RuntimeError("old star contraction did not converge")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.benchdata/sf3")
    ap.add_argument("--reps-per-arm", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "16")
    from gcs2postgres_spark.operators import graph
    from gcs2postgres_spark.operators.caching import release_transient_caches
    from gcs2postgres_spark.queries import REGISTRY
    from gcs2postgres_spark.session import (
        get_spark,
        local_shuffle_to_shm,
        tune_local_fast,
    )

    local_shuffle_to_shm()
    spark = get_spark("ab-starcc")
    tune_local_fast(spark, args.sf)
    new_impl = graph._star_contract

    def run_once() -> float:
        t0 = time.perf_counter()
        REGISTRY["dedup_cluster_canonical"].fn(spark, args.sf).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_transient_caches()
        spark.catalog.clearCache()
        return dt

    run_once()  # warm-up (JVM + codegen), not recorded
    order = (["new", "old", "old", "new", "new", "old"] * 10)[: 2 * args.reps_per_arm]
    times: dict[str, list[float]] = {"new": [], "old": []}
    for arm in order:
        graph._star_contract = new_impl if arm == "new" else _star_contract_old
        times[arm].append(round(run_once(), 2))
    graph._star_contract = new_impl

    def med(xs):
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 2)

    print(
        json.dumps(
            {
                "sf": args.sf,
                "order": order,
                "new_runs": times["new"],
                "old_runs": times["old"],
                "new_median": med(times["new"]),
                "old_median": med(times["old"]),
                "loadavg": os.getloadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
