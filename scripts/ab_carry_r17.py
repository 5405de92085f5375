#!/usr/bin/env python
"""Single-session counterbalanced A/B for the r17 carry-sizes change:
the minhash-LSH verify pipeline with sizes carried through the band join
(with_size=True, carry=("n",)) vs recomputed by two standalone shingler
branches (with_size=False, carry=()). Same session, alternating order
(ABBA BAAB ...), so JIT/codegen warmth and co-tenant load hit both arms
equally. Prints per-arm samples and medians.

Usage: python scripts/ab_carry_r17.py [--sf DIR] [--reps N]
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
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gcs2postgres_spark.catalog import load_table
    from gcs2postgres_spark.operators.caching import release_transient_caches
    from gcs2postgres_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_docs,
    )
    from gcs2postgres_spark.operators.caching import maybe_persist
    from gcs2postgres_spark.session import get_spark, local_shuffle_to_shm, tune_local_fast

    local_shuffle_to_shm()
    spark = get_spark("ab-carry-r17")
    tune_local_fast(spark, args.sf)

    def pipeline(carried: bool):
        d = load_table(spark, args.sf, "documents")
        shingled = maybe_persist(shingle_docs(d, "doc_id", "text", shingle_n=3))
        sigs = minhash_signatures(
            d, "doc_id", "text", num_perm=32, shingle_n=3, shingled=shingled,
            with_size=carried,
        )
        cands = lsh_candidate_pairs(
            sigs, "doc_id", num_perm=32, bands=8, carry=(("n",) if carried else ())
        )
        verified = jaccard_pairs(
            d, "doc_id", "text", shingle_n=3, candidates=cands, shingled=shingled
        )
        return verified.filter(F.col("jaccard") >= 0.4).orderBy("id_a", "id_b")

    def run(carried: bool) -> float:
        spark.sparkContext.setJobDescription(f"ab-carry:{'on' if carried else 'off'}")
        t0 = time.perf_counter()
        pipeline(carried).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_transient_caches()
        spark.catalog.clearCache()
        return round(dt, 3)

    # warm both arms once (codegen for both plan shapes), unmeasured
    run(True)
    run(False)

    on: list[float] = []
    off: list[float] = []
    # counterbalanced: ABBA repeated
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
        "carry_on": {"median": med(on), "samples": on},
        "carry_off": {"median": med(off), "samples": off},
    }))


if __name__ == "__main__":
    main()
