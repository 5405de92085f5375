"""Training-data pipeline operators: deterministic dataset splits,
repetition/boilerplate quality stats, and token-budget sequence packing.

These are the ops a 100 TB pretraining-data pipeline runs after dedup
and before tokenizer sharding. All three are deterministic functions of
the data (no RNG state), which is what makes them (a) reproducible
across reruns/engines and (b) exactly verifiable by a SQL oracle.

Scale shapes:
- hash split: pure Catalyst expression, zero shuffles — the split
  column costs the same as any projection.
- repetition stats: higher-order array functions, JVM-side, no shuffle.
- sequence packing: ONE shuffle (repartition by shard), then a linear
  per-shard greedy inside applyInPandas. Shard count bounds both task
  parallelism and pack quality loss (packing is per-shard, so ~one
  partially-filled tail sequence per shard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gcs2postgres_spark.operators.dedup import portable_hash60

_SPLIT_BUCKETS = 10_000


def hash_split_column(id_col: Column, weights: dict[str, float], seed: str) -> Column:
    """Deterministic split assignment: bucket = portable md5-derived hash
    of (seed, id) mod 10000, mapped to named splits by cumulative weight.
    Portable (portable_hash60, operators/dedup.py) so any SQL engine
    reproduces the assignment bit-identically — the property that lets a
    team re-derive *which* split a document landed in years later from
    the id alone, no stored assignment table needed."""
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    bucket = F.pmod(
        portable_hash60(F.concat(F.lit(seed + "|"), id_col.cast("string"))),
        F.lit(_SPLIT_BUCKETS),
    )
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        cond = bucket < int(round(acc * _SPLIT_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(list(weights)[-1])


def hash_split_oracle_bucket_sql(id_expr: str, seed: str) -> str:
    """DuckDB expression computing the identical bucket (same md5 15-hex
    prefix parse as portable_hash60)."""
    return (
        f"(('0x' || substr(md5('{seed}|' || CAST({id_expr} AS VARCHAR)), 1, 15))::BIGINT"
        f" % {_SPLIT_BUCKETS})"
    )


def repetition_stats(text: Column) -> dict[str, Column]:
    """Word-level repetition/boilerplate signals, all Catalyst HOFs:
    n_words, n_distinct_words, repetition_ratio = 1 − distinct/total
    (0 = no repeats, →1 = highly repetitive), top_word_ratio = frequency
    of the most common word / total (boilerplate pages repeat one
    token). The standard cheap quality gate before expensive near-dup."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # most-frequent-word count via aggregate over the distinct words:
    # max over d of count(t == d). O(n·distinct) worst case but pure
    # JVM; real boilerplate has few distinct words, which is exactly
    # when it matters.
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda t: t == d)),
        )
    )
    return {
        "n_words": n.cast("long"),
        "n_distinct_words": n_distinct.cast("long"),
        "repetition_ratio": (1.0 - n_distinct.cast("double") / n).alias("repetition_ratio"),
        "top_word_ratio": (top_cnt.cast("double") / n).alias("top_word_ratio"),
    }


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 128,
    n_shards: int = 8,
) -> DataFrame:
    """Greedy token-budget sequence packing (the LLM-pretraining batching
    op): shard documents by hash of id, order each shard by id, and run
    the classic greedy pack — a sequence closes when the next document
    would exceed ``budget`` whitespace tokens; an oversized document gets
    a sequence of its own.

    Returns one row per document: (id, shard, seq_id globally unique,
    n_tokens, seq_local). Deterministic: shard assignment and in-shard
    order are pure functions of the id, so the packing is reproducible
    run-to-run and engine-to-engine (oracle: per-shard recursive CTE
    replaying the same greedy recurrence).

    Scale: one shuffle (groupBy shard), then linear work per shard in
    Arrow batches. n_shards trades parallelism against tail waste (one
    underfilled final sequence per shard). At 100 TB, shard by
    (source, hash) so packing locality follows data locality."""
    import pandas as pd

    with_meta = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).cast("long").alias("n_tokens"),
    )

    out_schema = "doc_id long, shard long, seq_id long, n_tokens long, seq_local long"

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq = 0
        acc = 0
        seqs = []
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            if acc > 0 and acc + tok > budget:
                seq += 1
                acc = tok
            else:
                acc += tok
            seqs.append(seq)
        pdf["seq_local"] = seqs
        pdf["seq_id"] = pdf["shard"] * 1_000_000 + pdf["seq_local"]
        return pdf[["doc_id", "shard", "seq_id", "n_tokens", "seq_local"]]

    return with_meta.groupBy("shard").applyInPandas(pack_shard, schema=out_schema)
