"""Size-conditional transient caching for multi-consumer intermediates.

Several dedup/corpus pipelines build an intermediate frame that two or
more downstream branches read (banded MinHash signatures, SimHash
fingerprints, token/prefix relations, tf / bigram explodes). Persisting
those frames avoids recomputing an expensive pandas-UDF / explode stage
per consumer — a measured 20-40% win at sf1+ — but at small scale the
cache build itself dominates: an interleaved on/off A/B at sf0.1
(5k docs, 3 reps, one session, loadavg ~2) showed persist-ON 15-35%
SLOWER on every such pipeline (minhash 2.29 vs 1.85 s median, simhash
3.57 vs 2.81, tfidf 1.73 vs 1.11, cms 0.78 vs 0.58, bigram 1.65 vs
1.46, ppjoin 4.48 vs 4.09). So the persist is conditional on the
input's parquet-footer row count: below ``MIN_PERSIST_INPUT_ROWS`` the
recompute is cheaper than the cache.

Lifecycle: these operators return LAZY DataFrames, so they cannot
unpersist after the (caller-driven) action. Persisted frames are
tracked here; long-lived sessions running many pipelines must call
:func:`release_transient_caches` between pipelines — it is the ONLY
path that both unpersists the blocks and drains the module-global
``_TRANSIENT`` registry. ``spark.catalog.clearCache()`` alone drops the
storage blocks but leaves the Python-side DataFrame references
accumulating unboundedly (ADVICE r9), and a later release call would
then unpersist frames a different pipeline re-cached. The registry is
global and unscoped (not per-pipeline, not thread-safe): one logical
pipeline at a time per session, release between pipelines — exactly how
bench.py, scripts/driver_sim.py and scripts/sweep_sf1.py drive it.
Without any release, MEMORY_AND_DISK blocks rely on Spark's LRU
eviction for the memory tier and accumulate on the disk tier until the
session ends (the r8 advisor's leak note).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Below this many input rows the cache build costs more than the
# recompute it saves (sf0.1 = 5k docs skips; sf1 = 50k persists).
MIN_PERSIST_INPUT_ROWS = 20_000

_TRANSIENT: list[DataFrame] = []


def scan_rows_upper_bound(df: DataFrame) -> int | None:
    """Parquet-footer row count of the frame's file scan, or None when
    unknown (streaming, non-parquet, remote scheme, probe failure).

    An UPPER bound when the frame carries filters — fine for both
    consumers: repartition width errs toward idle tasks, and the
    persist decision errs toward caching (the at-scale-safe default)."""
    if df.isStreaming:
        return None
    try:
        files = [re.sub(r"^file:(//)?", "", u) for u in df.inputFiles()]
        if files and all(
            f.endswith(".parquet") and not re.match(r"^[a-z][a-z0-9+.-]*://", f)
            for f in files
        ):
            import pyarrow.parquet as pq

            return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:  # noqa: BLE001 — ANY probe failure degrades to
        # "unknown"; the probe is an optimization and must never crash
        # the query (pyarrow raises ArrowInvalid, not OSError, for URIs
        # it can't open)
        pass
    return None


def maybe_persist(df: DataFrame, min_rows: int = MIN_PERSIST_INPUT_ROWS) -> DataFrame:
    """Persist ``df`` unless it is streaming or its scan input is
    smaller than ``min_rows`` — below that, rebuilding the frame per
    consumer beats building the cache. Unknown input size persists —
    at scale that is the safe default, and derived frames over parquet
    scans still report their input files.

    ``min_rows`` is a PER-SITE threshold because the crossover depends
    on recompute cost × consumer count, not input size alone. The
    counterbalanced sf0.1 A/B (4 reps per arm, alternating order so
    second-run warmth cancels; loadavg ~1.5-2.2) showed:
    skip-wins sites (default threshold) — MinHash banded signatures
    1.97 s cond vs 2.35 s forced, tf-idf term counts 1.27 vs 1.42;
    persist-wins sites (``min_rows=0``) — SimHash fingerprints 3.52
    forced vs 4.60 cond (60 lane sums re-aggregated), PPJoin
    token/prefix frames 4.83 vs 7.41 (five consumers re-tokenize),
    bigram explode 1.38 vs 1.56."""
    if df.isStreaming:
        return df
    if min_rows > 0:
        rows = scan_rows_upper_bound(df)
        if rows is not None and rows < min_rows:
            return df
    df = df.persist()
    _TRANSIENT.append(df)
    return df


def widen_doc_scan(df: DataFrame, key_col: str, rows_per_task: int = 2000) -> DataFrame:
    """Hash-repartition a compact document scan to data-proportional
    width BEFORE per-doc-heavy work (tokenize/explode/regex/gram-build).

    The trap (guide §2.5 "input skew"): text tables compress hard, so a
    parquet scan of the whole corpus often yields far fewer partitions
    than cores (documents at sf1 is 5.7 MiB compressed → 2 scan tasks on
    a 32-core box), and every downstream map-side explode/regex stage
    inherits that width — the single biggest fixed cost measured in the
    r17 sweep (decontaminate_ngram13_audit sf1: 54-65 s at 2-way vs
    6-12 s widened). The width is DATA-PROPORTIONAL (parquet-footer row
    count / ``rows_per_task``, capped at defaultParallelism), not
    blindly defaultParallelism: at sf0.1 a 32-way repartition's task
    overhead exceeded the work it spread (r8 bench). On a real cluster
    a large corpus already scans wider than the cap, making this a
    no-op — the guard only fires on compact scans.

    The repartition hashes ``key_col`` (any stable column; the doc id
    where available). The doc shuffle it pays is tiny next to the
    per-doc work it spreads, and partitioning cannot change any
    aggregate's result — every consumer is partitioning-invariant
    (pinned by scripts/partition_invariance.py and the exact-hash
    oracles)."""
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    rows = scan_rows_upper_bound(df)
    width = target if rows is None else max(1, min(target, rows // rows_per_task))
    if df.isStreaming or df.rdd.getNumPartitions() < width:
        from pyspark.sql import functions as F

        df = df.repartition(width, F.col(key_col))
    return df


def release_transient_caches() -> int:
    """Unpersist every frame cached via :func:`maybe_persist` since the
    last release; returns the number released. Safe to call any time —
    consumers that already ran keep their computed results."""
    n = 0
    while _TRANSIENT:
        df = _TRANSIENT.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — a stopped session must not
            # turn cleanup into a crash
            pass
    return n
