#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is measured with the noop sink (full plan runs, nothing is
collected to the driver — the same discipline the engine keeps at scale).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_forecast",
    "q9_product_profit",
    "q12_priority_caseagg",
    "q18_large_orders",
    "q21_waiting_supplier",
    "agg_rollup",
    "window_running",
    "topk_per_group",
    "json_extract_agg",
    "events_sessionize",
    "asof_join_events_orders",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_cluster_canonical",
    "events_funnel_3step",
    "similarity_cosine_topk",
    "text_token_stats",
    "multimodal_join",
]

# Driver-visible SCALE TIER (r17 verdict item 3): the headline set had
# drifted away from the engine's optimization surface — every large r17
# win (span dedup 5.2×, decontamination 8.6×, PII scrub ~9×, BPE/corpus
# 2-8× at sf1+) lived in queries the bench never timed. These five are
# now timed with the SAME methodology (3 interleaved passes, noop sink,
# per-query median, interleaved DuckDB oracle) and ADDED to "queries"
# / "queries_min" / "duckdb_queries". Additions only: the 21-query
# HEADLINE list above is untouched, and the cross-round numbers
# ("value", "value_calibrated", "interleaved_ratio") are still computed
# over HEADLINE alone so r1-r17 comparisons stay like-for-like; the
# tier's own sum is emitted separately as "value_scale_tier".
SCALE_TIER = [
    "dedup_exact_substring",
    "decontaminate_ngram13_audit",
    "pii_redact_scrub",
    "corpus_bpe_encode_docs",
    "text_top_word_ratio",
]

# Physical-layout demos (bucketed warehouse, z-ordered lineitem): same
# SQL semantics as their plain twin, different layout. OUT of the
# default headline set as of round 8 — four consecutive driver benches
# (r4–r7) timed them slower than the plain twins at sf0.1, where a
# 100 MB working set makes broadcast-hash plans beat shuffle-free
# sort-merge over 32 bucket files; the layout's win is a SCALE story
# (BASELINE.md "Bucketed-warehouse lever": controlled A/Bs show ~1.3×
# at sf1 with warm layouts, and at cluster scale bucketing removes the
# fact-fact shuffle entirely). They remain registered, oracled, and
# benchable via `bench.py --layout-variants`.
LAYOUT_VARIANTS = [
    "q3_shipping_priority_bucketed",
    "q6_revenue_zorder",
    "q12_priority_caseagg_bucketed",
    "q18_large_orders_bucketed",
    "q21_waiting_supplier_bucketed",
]

# Plain twin per layout variant. An EXPLICIT map, not suffix-stripping:
# "q6_revenue_zorder"[: -len("_zorder")] is "q6_revenue", which never
# matches the twin "q6_revenue_forecast" — the r8 review caught the
# zorder pair silently dropping out of every best-plan row and the
# extra paired pass.
VARIANT_BASE = {
    "q3_shipping_priority_bucketed": "q3_shipping_priority",
    "q6_revenue_zorder": "q6_revenue_forecast",
    "q12_priority_caseagg_bucketed": "q12_priority_caseagg",
    "q18_large_orders_bucketed": "q18_large_orders",
    "q21_waiting_supplier_bucketed": "q21_waiting_supplier",
}


def parse_args(argv: list[str]) -> tuple[str, bool]:
    """--sf DIR beats $SPARK_GRAFT_SF_DIR beats the sf0.1 default;
    unknown args are a hard error (symmetric with scripts/bench_duckdb.py
    so the documented reproduce commands can't silently bench the wrong
    scale). --layout-variants appends the bucketed/zorder layout demos
    to the timed set."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    variants = False
    args = list(argv[1:])
    while args:
        a = args.pop(0)
        if a == "--sf":
            if not args:
                sys.exit("--sf requires a directory argument")
            sf_dir = args.pop(0)
        elif a == "--layout-variants":
            variants = True
        else:
            sys.exit(
                f"unknown argument {a!r}; usage: bench.py [--sf DIR] [--layout-variants]"
            )
    if not os.path.isdir(sf_dir):
        sys.exit(f"scale-factor directory not found: {sf_dir!r}")
    return sf_dir, variants


def _loadavg() -> list[float] | None:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return None


LOADAVG_START = _loadavg()

# Fixed calibration reference: the probe's best-of-3 on this box in the
# round-5 bench (BENCH_r05.json calibration_count_sum_1e7_sec). All
# value_calibrated numbers are comparable to each other and to r5.
CALIB_REF_SEC = 0.088


def _cpu_probe(spark) -> float:
    """Fixed calibration query — count+sum over a 10^7-row in-memory
    range, no I/O, best-of-3 after one unmeasured warm-up run (the
    first probe of a session pays range-query codegen: measured 0.21 s
    first vs 0.06 s steady, which inflated every start-of-suite probe)
    — whose time moves with machine contention, not with any repo
    change."""
    best = None
    for i in range(4):
        t0 = time.perf_counter()
        spark.range(10_000_000).selectExpr(
            "count(id) as n", "sum(id % 97) as s"
        ).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i == 0:
            continue
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    sf_dir, with_variants = parse_args(sys.argv)
    # Size the shuffle-partition default to BOTH the data and the core
    # count (r17 verdict item 2: the former literal 8 made the driver's
    # 8-vs-32-core comparison structurally flat — the knob was honored
    # by the session layer but the bench profile made core count
    # irrelevant). Data term: ~24 MB of input per reduce partition (at
    # sf0.1's ~110 MB that yields the same 8 the r1-r17 benches ran, so
    # cross-round numbers stay comparable; r18 A/B at sf0.1/32 cores:
    # a flat 32-partition pin measured 6.6% slower raw, ratio 5.05 vs
    # 4.77). Core term: never more reducers than cores at bench scale —
    # at an SF big enough to need them (sf1+: >1 GB input) the default
    # now widens to the full core count, so the scaling probe measures
    # parallelism instead of the pin. A cluster run sizes this to 2-3×
    # total cores and lets AQE coalesce.
    import glob as _glob
    import math as _math

    _mb = sum(
        os.path.getsize(p) for p in _glob.glob(os.path.join(sf_dir, "*.parquet"))
    ) // 2**20
    _cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    os.environ.setdefault(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS",
        str(max(8, min(_cpus, _math.ceil(_mb / 24)))),
    )
    from gcs2postgres_spark.operators.caching import release_transient_caches
    from gcs2postgres_spark.queries import REGISTRY
    from gcs2postgres_spark.session import (
        get_spark,
        local_shuffle_to_shm,
        tune_local_fast,
    )

    local_shuffle_to_shm()
    spark = get_spark("gcs2postgres_spark-bench")
    tune_local_fast(spark, sf_dir)

    # warm-up: JVM/codegen spin on the flagship query (not measured)
    REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    if with_variants:
        # Pre-build the lazily-materialized physical layouts (bucketed
        # warehouse, z-ordered lineitem) BEFORE timing: the session
        # catalog is in-memory, so a fresh bench process rebuilds them
        # inside the first timed run otherwise — at 32 buckets that
        # build dwarfs the query and best-of-2 can't always absorb it
        # (r6: q21_bucketed benched 1.44 s cold vs 0.83 s med
        # warmed/interleaved). Ingest is a once-per-warehouse cost,
        # not query cost.
        from gcs2postgres_spark.queries.bucketed_q import bucketed_fact_tables
        from gcs2postgres_spark.queries.zorder_q import zordered_lineitem_path

        bucketed_fact_tables(spark, sf_dir)
        zordered_lineitem_path(spark, sf_dir)

    # Noise-robust protocol (r8 verdict: the single-phase min-of-2 +
    # one-shot probe read as a +28% raw / 64% calibrated regression that
    # interleaved re-runs disproved):
    #   1. THREE interleaved passes over the suite; per-query MEDIAN is
    #      the headline number ("queries"), per-query MIN is kept as
    #      "queries_min" for comparability with the r1-r8 min-of-2
    #      semantics. Interleaving (not back-to-back repeats) means a
    #      co-tenant CPU spike hits one pass, and the median sheds it.
    #   2. The CPU probe runs BEFORE and AFTER the timed suite (both
    #      emitted). Start probes are JIT-inflated on a fresh JVM and
    #      only comparable to other rounds' start probes; the end probe
    #      (steady-state, the r1-r8 semantics) drives value_calibrated.
    #   3. Each query's DuckDB oracle runs IN THE SAME PASS right after
    #      the Spark run ("duckdb_queries", median-of-3), so the
    #      artifact carries a load-cancelling interleaved ratio
    #      ("interleaved_ratio" = Spark/DuckDB over oracle-bearing
    #      queries) — the cross-round number co-tenant noise cannot
    #      fake. Bucketed/zorder variants share the twin's oracle and
    #      are excluded from the DuckDB pass (layout is Spark-side).
    names = HEADLINE + SCALE_TIER + (LAYOUT_VARIANTS if with_variants else [])
    present = [n for n in names if n in REGISTRY]
    headline_present = [n for n in HEADLINE if n in REGISTRY]
    paired: set[str] = set()
    for v, base in VARIANT_BASE.items():
        if v in present and base in present:
            paired.add(v)
            paired.add(base)

    import duckdb

    from gcs2postgres_spark.catalog import TABLES

    con = duckdb.connect()
    # size DuckDB from the same knob as the Spark side (ADVICE r9): a
    # 32-thread oracle vs an 8-core-capped Spark session wouldn't be the
    # like-for-like ratio the artifact claims
    con.sql(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    duck_names = [
        n
        for n in present
        if n not in VARIANT_BASE and REGISTRY[n].oracle is not None
    ]

    calib_start = _cpu_probe(spark)

    spark_runs: dict[str, list[float]] = {n: [] for n in present}
    duck_runs: dict[str, list[float]] = {n: [] for n in duck_names}

    def one_pass(names: list[str]) -> None:
        for name in names:
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark_runs[name].append(time.perf_counter() - t0)
            release_transient_caches()
            spark.catalog.clearCache()  # per-query persists don't leak
            if name in duck_runs:
                t0 = time.perf_counter()
                con.sql(REGISTRY[name].oracle).fetchall()
                duck_runs[name].append(time.perf_counter() - t0)

    one_pass(present)
    one_pass(present)
    one_pass(present)
    # one extra pass for the physical-layout pairs so plain vs
    # _bucketed/_zorder comparisons get a 4th sample each
    one_pass([n for n in present if n in paired])

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    # adaptive re-sample: a query whose three samples spread more than
    # 25% around the median caught a co-tenant spike in at least one
    # pass; two extra samples tighten its median at negligible suite
    # cost (back-to-back A/A runs showed only sub-second queries with
    # ~20% medians drift, always wide-spread ones)
    respample = [
        n
        for n in present
        if (max(spark_runs[n]) - min(spark_runs[n])) > 0.25 * median(spark_runs[n])
    ]
    one_pass(respample)
    one_pass(respample)

    timings = {n: round(median(spark_runs[n]), 3) for n in present}
    # min over the FIRST TWO passes only: r1-r8 recorded min-of-2, and a
    # min over 3-6 samples (passes + pair pass + resamples) is biased
    # lower, silently flattering newer rounds on cross-round min deltas
    # (ADVICE r9, bench.py:263)
    timings_min = {n: round(min(spark_runs[n][:2]), 3) for n in present}
    duck_timings = {n: round(median(duck_runs[n]), 3) for n in duck_names}
    # cross-round aggregates stay over the r1-r17 HEADLINE set only —
    # the scale tier is additive and must not move "value" /
    # "interleaved_ratio" semantics (see the SCALE_TIER comment)
    ratio_names = [n for n in duck_names if n in set(headline_present)]
    spark_oracle_sum = sum(timings[n] for n in ratio_names)
    duck_sum = sum(duck_timings[n] for n in ratio_names)

    # calibrate on the END probe: the old (r1-r8) protocol ran its one
    # probe after the suite, and a probe-decay sweep showed the JVM
    # needs far more than a few warm-up runs to reach C2 steady state
    # (0.94 -> ~0.2 s over ten runs on a fresh session vs ~0.06-0.09 s
    # after the suite) — so only the end probe is comparable to
    # CALIB_REF_SEC. The start probe is emitted for start-to-start
    # cross-round comparison (both fresh-JVM) and as the load marker
    # for the suite's first pass.
    calib_end = _cpu_probe(spark)
    calib_best = calib_end
    loadavg_end = _loadavg()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = (
            {
                "metric": "headline_suite_wall_clock",
                "value": round(sum(timings[n] for n in headline_present), 3),
                # the added scale tier's own sum (r18; additions-only —
                # absent from "value" so r1-r17 totals stay comparable)
                "value_scale_tier": round(
                    sum(timings[n] for n in SCALE_TIER if n in timings), 3
                ),
                "scale_tier": [n for n in SCALE_TIER if n in timings],
                # "value" changed semantics at r9: sum of per-query
                # MEDIANS (3 interleaved passes). r1-r8 summed min-of-2;
                # cross-round deltas against r1-r8 should read
                # queries_min, which preserves min-of-first-2 exactly.
                "value_semantics": "sum_of_medians over the 21-query HEADLINE set only (r1-r8: sum of min-of-2; use queries_min; the r18 scale tier is in value_scale_tier)",
                "unit": "sec",
                "queries": timings,
                "queries_min": timings_min,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "loadavg_start": LOADAVG_START,
                "loadavg_end": loadavg_end,
                # per-query interleaved DuckDB oracle medians and the
                # load-cancelling suite ratio (Spark medians / DuckDB
                # medians over the oracle-bearing headline queries).
                # Known asymmetry (ADVICE r9, disclosed not hidden):
                # Spark writes to the noop sink while DuckDB pays
                # fetchall() materialization to Python — so the ratio
                # slightly FLATTERS DuckDB (overstates the Spark/DuckDB
                # quotient) and is a load-cancelling cross-round signal,
                # not a pure engine benchmark. Thread counts come from
                # the same SPARK_GRAFT_CPUS knob on both sides.
                "duckdb_queries": duck_timings,
                "interleaved_ratio": round(spark_oracle_sum / duck_sum, 3)
                if duck_sum
                else None,
                # dual CPU probe: a large start/end spread means the box
                # shifted under the suite and value_calibrated should
                # not be trusted for cross-round comparison
                "calibration_probe_start_sec": round(calib_start, 3),
                "calibration_probe_end_sec": round(calib_end, 3),
                "calibration_count_sum_1e7_sec": round(calib_best, 3),
                # contention-normalized suite number: cross-round deltas
                # should be read on value_calibrated, which divides out
                # machine load via the fixed CPU probe. The reference
                # probe time (0.088 s) is the round-5 recording on this
                # box — the first round the probe existed.
                "calibration_ref_sec": CALIB_REF_SEC,
                "value_calibrated": round(
                    sum(timings[n] for n in headline_present)
                    * (CALIB_REF_SEC / calib_best),
                    3,
                ),
            }
    )
    # The driver keeps only the LAST ~2 KB of stdout and json-parses it
    # (every BENCH_r{N}.json through r11 has "parsed": null because the
    # full payload line overflowed that buffer). So: full payload goes
    # to a sidecar file + stderr, and the SOLE final stdout line is a
    # compact summary guaranteed to fit the tail window.
    full_line = json.dumps(payload)
    try:
        with open(Path(__file__).resolve().parent / "BENCH_FULL.json", "w") as f:
            f.write(full_line + "\n")
    except OSError:
        pass  # read-only checkout: stderr still carries the payload
    print(full_line, file=sys.stderr)
    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "value_scale_tier": payload["value_scale_tier"],
        "unit": payload["unit"],
        "queries": payload["queries"],
        "sf": payload["sf"],
        "interleaved_ratio": payload["interleaved_ratio"],
        "value_calibrated": payload["value_calibrated"],
        "full": "BENCH_FULL.json",
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # belt-and-braces: never overflow the tail buffer
        compact.pop("queries")
        line = json.dumps(compact)
    sys.stdout.flush()
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
