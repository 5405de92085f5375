#!/usr/bin/env python
"""Single-session counterbalanced A/B for the r17 connected-components
fused initialization: comp0[v] = min(v, min(Gamma(v))) as one aggregation
over the symmetrized edges (fused) vs the identity labeling from a
distinct node list (unfused, pre-r17) — identical fixpoint, the fused
form starts one propagation round ahead and skips the distinct shuffle.

Times the full dedup_cluster_canonical pipeline with each init, same
session, ABBA order. Also prints the round count each init needs.

Usage: python scripts/ab_ccinit_r17.py [--sf DIR] [--reps N]
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

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from gcs2postgres_spark.operators.caching import release_transient_caches
    from gcs2postgres_spark.queries import REGISTRY
    from gcs2postgres_spark.session import get_spark, local_shuffle_to_shm, tune_local_fast

    local_shuffle_to_shm()
    spark = get_spark("ab-ccinit-r17")
    tune_local_fast(spark, args.sf)

    rounds = {"fused": 0, "unfused": 0}

    def cc(edges: DataFrame, src: str, dst: str, fused: bool, max_iter: int = 25) -> DataFrame:
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        und = (
            e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .persist()
        )
        try:
            if fused:
                labels = (
                    und.groupBy("a")
                    .agg(F.least(F.min("b"), F.col("a")).alias("comp"))
                    .select(F.col("a").alias("node"), "comp")
                )
            else:
                labels = und.select(F.col("a").alias("node")).distinct().withColumn(
                    "comp", F.col("node")
                )
            labels = labels.localCheckpoint(eager=True)
            prev_sum = labels.agg(F.sum("comp")).first()[0]
            if prev_sum is None:
                return labels
            for i in range(max_iter):
                nbr_min = (
                    und.join(
                        labels.select(F.col("node").alias("b"), F.col("comp").alias("nbr_comp")),
                        "b",
                    )
                    .groupBy("a")
                    .agg(F.min("nbr_comp").alias("nbr_comp"))
                )
                labels = (
                    labels.join(nbr_min, labels["node"] == nbr_min["a"], "left")
                    .select(
                        "node",
                        F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
                    )
                    .localCheckpoint(eager=True)
                )
                new_sum = labels.agg(F.sum("comp")).first()[0]
                if new_sum == prev_sum:
                    rounds["fused" if fused else "unfused"] = i + 1
                    return labels
                prev_sum = new_sum
            raise RuntimeError("no convergence")
        finally:
            und.unpersist()

    def run(fused: bool) -> float:
        import gcs2postgres_spark.operators.graph as G

        orig = G.connected_components

        def patched(edges, src="src", dst="dst", max_iter=25, algorithm="auto"):
            return cc(edges, src, dst, fused, max_iter)

        G.connected_components = patched
        try:
            spark.sparkContext.setJobDescription(f"ab-ccinit:{'fused' if fused else 'unfused'}")
            t0 = time.perf_counter()
            REGISTRY["dedup_cluster_canonical"].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
        finally:
            G.connected_components = orig
        release_transient_caches()
        spark.catalog.clearCache()
        return round(dt, 3)

    run(True)
    run(False)  # warm both shapes

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
        "fused": {"median": med(on), "samples": on},
        "unfused": {"median": med(off), "samples": off},
        "rounds_to_converge": rounds,
    }))


if __name__ == "__main__":
    main()
