"""Portable Bloom-filter semi-join pruning.

The runtime-filter pattern Spark applies internally (InjectRuntimeFilter
builds a bloom from the filtered dim side and pushes `might_contain`
into the fact scan), implemented explicitly and PORTABLY: hashes are
md5-derived (operators/dedup.portable_hash60), so an external SQL engine
recomputes the identical bitmap and the identical pass/reject decision
bit-for-bit — which is what lets the driver's oracle certify a
probabilistic structure exactly.

Scale: the build side aggregates to <= n_bits/64 rows (bit_or partials —
map-side combine), ships to every executor as one broadcast map row, and
the fact side is pruned in the scan stage with pure bit arithmetic — no
shuffle of the fact table, no join. False positives are bounded by
(1 - e^(-kn/m))^k; bloom_semi_prune reports them so callers can size m.

Variable-distance bit shifts go through F.expr: the PySpark DSL wrappers
(shiftleft/shiftright) accept only literal ints for numBits, while the
underlying SQL functions take arbitrary int expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcs2postgres_spark.operators.dedup import portable_hash60


def bloom_build(
    keys: DataFrame, key_col: str, n_bits: int = 1024, n_hashes: int = 3
) -> DataFrame:
    """Aggregate a key set into a Bloom bitmap: one row
    ``(bitmap: map<int, bigint>)`` of word-index → 64-bit word. Hash j
    of key k is ``portable_hash60(str(k) || '#' || j) % n_bits``."""
    js = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("j")
    hashed = (
        keys.select(F.col(key_col).cast("string").alias("k"))
        .distinct()
        .select("k", js)
    )
    h = portable_hash60(
        F.concat(F.col("k"), F.lit("#"), F.col("j").cast("string"))
    ) % n_bits
    words = (
        hashed.select(
            (h / 64).cast("int").alias("w"),
            (h % 64).cast("int").alias("b"),
        )
        .select("w", F.expr("shiftleft(CAST(1 AS BIGINT), b)").alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("m"))
    )
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("w", "m")))
        ).alias("bitmap")
    )


def bloom_prune(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_bits: int = 1024,
    n_hashes: int = 3,
    flag_col: str | None = None,
) -> DataFrame:
    """Probe ``fact[key_col]`` against a broadcast bloom_build result.

    With ``flag_col`` set, returns fact + a boolean column; otherwise
    returns only the rows that might be in the key set (the pruned
    scan). Bit tests run JVM-side inside the scan stage."""
    out = fact.crossJoin(F.broadcast(bloom))
    k = F.col(key_col).cast("string")
    pred = None
    for j in range(n_hashes):
        h = portable_hash60(F.concat(k, F.lit(f"#{j}"))) % n_bits
        out = out.withColumn(f"__bf_h{j}", h)
        hit = F.expr(
            f"coalesce((shiftright(element_at(bitmap, CAST(__bf_h{j} DIV 64 AS INT)),"
            f" CAST(__bf_h{j} % 64 AS INT)) & 1) = 1, false)"
        )
        pred = hit if pred is None else (pred & hit)
    drop = ["bitmap"] + [f"__bf_h{j}" for j in range(n_hashes)]
    if flag_col is not None:
        return out.withColumn(flag_col, pred).drop(*drop)
    return out.filter(pred).drop(*drop)
