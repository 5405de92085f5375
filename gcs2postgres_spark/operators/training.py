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
- sequence packing: ONE shuffle (repartition by shard + in-partition
  sort), then a linear greedy over streamed Arrow batches inside
  mapInPandas — memory-bounded by one batch, not one shard. Shard count
  bounds both task parallelism and pack quality loss (packing is
  per-shard, so ~one partially-filled tail sequence per shard).
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
    # most-frequent-word count = max run length over the SORTED token
    # array, one linear F.aggregate pass carrying (prev, run, best). The
    # lambda touches only its own arguments, so nothing outer is inlined
    # per element — the nested transform×filter alternative re-evaluates
    # the split() per distinct word (quadratic on long documents).
    run_of = lambda acc, x: (  # noqa: E731 — shared by the run and best fields
        F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1).cast("long"))
    )
    top_cnt = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_of(acc, x).alias("run"),
            F.greatest(acc["best"], run_of(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return {
        "n_words": n.cast("long"),
        "n_distinct_words": n_distinct.cast("long"),
        "repetition_ratio": (1.0 - n_distinct.cast("double") / n).alias("repetition_ratio"),
        "top_word_count": top_cnt,
        "top_word_ratio": (top_cnt.cast("double") / n).alias("top_word_ratio"),
    }


def shuffle_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the 'shuffle the
    corpus before training' op, done as a pure function of (seed, id) so
    the epoch order is reproducible on any engine with md5 (no stored
    permutation table, no RNG state). A new epoch is a new seed.

    Each row gets sort_key = portable_hash60(seed|id) — effectively a
    uniform draw — then shard = sort_key mod n_shards and
    pos = rank of sort_key within the shard. (shard, pos) is the exact
    byte order a sequential trainer reading shard files would see.

    Returns (id, shard, pos, sort_key).

    Scale: ONE shuffle (the per-shard window). Each shard sorts in one
    task, so choose n_shards ≈ a few × cluster cores at 100 TB (tens of
    thousands) — shards stay ~GB-sized and the sorts are parallel and
    spillable. The hash is uniform, so shard skew is binomial-bounded;
    no hot keys by construction."""
    from pyspark.sql import Window

    key = portable_hash60(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        df.select(F.col(id_col), key.alias("sort_key"))
        .withColumn("shard", F.pmod(F.col("sort_key"), F.lit(n_shards)).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos", "sort_key")
    )


SEQ_SHARD_SHIFT = 40  # seq_id = (shard << 40) + seq_local


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 128,
    n_shards: int = 8,
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Greedy token-budget sequence packing (the LLM-pretraining batching
    op): shard documents, order each shard by id, and run the classic
    greedy pack — a sequence closes when the next document would exceed
    ``budget`` whitespace tokens; an oversized document gets a sequence
    of its own.

    Sharding: by default ``pmod(id, n_shards)``; pass ``shard_cols``
    (e.g. ``["source"]``) to shard by the portable hash of those columns
    instead, so packing locality follows data locality at scale.

    Returns one row per document: (id, shard, seq_id, n_tokens,
    seq_local). ``seq_id = (shard << 40) + seq_local`` — globally unique
    while seq_local < 2^40 and shard < 2^23, both asserted per row (the
    old ``shard*1e6`` form silently collided past 1M sequences/shard).
    Deterministic: shard assignment and in-shard order are pure functions
    of the row, so the packing is reproducible run-to-run and
    engine-to-engine (oracle: per-shard recursive CTE replaying the same
    greedy recurrence).

    Scale/memory: ONE shuffle (repartition by shard + in-partition sort),
    then ``mapInPandas`` streams Arrow batches in (shard, id) order with
    the greedy accumulator carried across batches in a per-shard dict.
    Peak per-task memory is one Arrow batch
    (``spark.sql.execution.arrow.maxRecordsPerBatch``, default 10k rows)
    — NOT one whole shard, so a shard larger than executor memory still
    packs. n_shards bounds task parallelism and tail waste (one
    underfilled final sequence per shard)."""
    if shard_cols:
        from gcs2postgres_spark.operators.dedup import portable_hash60

        shard_expr = F.pmod(
            portable_hash60(F.concat_ws("|", *[F.col(c).cast("string") for c in shard_cols])),
            F.lit(n_shards),
        )
    else:
        shard_expr = F.pmod(F.col(id_col), F.lit(n_shards))
    # parallelism guard (guide §2.5, r17): the per-doc tokenize below
    # runs BEFORE the shard shuffle, i.e. at the compact scan's width;
    # widening spreads it, and the shard repartition afterwards only
    # carries (id, shard, n_tokens)
    from gcs2postgres_spark.operators.caching import widen_doc_scan

    docs = widen_doc_scan(docs, id_col)
    with_meta = docs.select(
        F.col(id_col).alias("doc_id"),
        shard_expr.cast("long").alias("shard"),
        F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).cast("long").alias("n_tokens"),
    )

    out_schema = "doc_id long, shard long, seq_id long, n_tokens long, seq_local long"
    # capture as a local so the worker-side closure has no reference to
    # this module (executors don't have the repo on sys.path)
    shift = SEQ_SHARD_SHIFT

    def pack_stream(batches):
        # All rows of a shard hash to one partition and arrive sorted by
        # (shard, doc_id); the dict carries (acc_tokens, seq_local)
        # across Arrow batches so no batch boundary resets a sequence.
        state: dict[int, tuple[int, int]] = {}
        for pdf in batches:
            seq_locals = []
            seq_ids = []
            for shard, tok in zip(pdf["shard"], pdf["n_tokens"]):
                shard, tok = int(shard), int(tok)
                acc, seq = state.get(shard, (0, 0))
                if acc > 0 and acc + tok > budget:
                    seq += 1
                    acc = tok
                else:
                    acc += tok
                state[shard] = (acc, seq)
                if seq >= (1 << shift) or not 0 <= shard < (1 << (63 - shift)):
                    raise ValueError(f"seq_id fields overflow: shard={shard} seq_local={seq}")
                seq_locals.append(seq)
                seq_ids.append((shard << shift) + seq)
            out = pdf[["doc_id", "shard", "n_tokens"]].copy()
            out["seq_id"] = seq_ids
            out["seq_local"] = seq_locals
            yield out[["doc_id", "shard", "seq_id", "n_tokens", "seq_local"]]

    return (
        with_meta.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
        .mapInPandas(pack_stream, schema=out_schema)
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    min_matches: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Eval-set DECONTAMINATION: drop every corpus document sharing at
    least ``min_matches`` distinct word ``n``-grams with the benchmark
    (the published pretraining-report recipe — 13-gram overlap is the
    standard; short benchmark entries fall back to their whole-text
    token sequence so they are never silently unmatched).

    Returns ``(clean, flagged)``: the surviving corpus rows, and one
    row per contaminated document with its distinct-match count (the
    audit trail a data card wants).

    Scale shape (100 TB): both sides explode to (ngram-hash) keys and
    meet in ONE equi-join on the hash — the benchmark side is distinct
    n-grams of an EVAL SET (small by nature), so Catalyst/AQE
    broadcasts it and the corpus is never shuffled; the flagged-id set
    joins back as a left-anti, also on the id key. No tokenized text
    moves — only 64-bit hashes. Tokenization is the dedup module's
    portable lower/whitespace normalization, so the SQL oracle can
    reproduce it exactly.
    """
    from pyspark.sql.types import LongType

    from gcs2postgres_spark.operators.caching import widen_doc_scan

    def grams(df: DataFrame, col: str, keep):
        # parallelism guard (guide §2.5; same trap as shingle_docs): the
        # n-gram build + per-gram md5 is the dominant compute, and a
        # compact corpus scan yields far fewer partitions than cores
        # (documents sf1 = 5.7 MiB compressed → 2 scan tasks). Measured
        # sf1: 54-65 s at 2-way vs 6-12 s widened, identical output.
        df = widen_doc_scan(df, keep[0] if keep else col)
        toks = F.split(F.lower(F.trim(F.col(col))), r"\s+")
        # n-grams as token slices; whole-text fallback below n tokens
        ng = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
        return df.select(
            *keep, F.explode(F.array_distinct(ng)).alias("__ng")
        ).withColumn("__ngh", portable_hash60(F.col("__ng")).cast(LongType()))

    bench_grams = grams(benchmark, bench_text_col, []).select("__ngh").distinct()
    corpus_grams = grams(corpus, text_col, [id_col])
    flagged = (
        # benchmark grams are small-by-contract (an eval set): broadcast
        # explicitly so the corpus side is never shuffled by the probe
        corpus_grams.join(F.broadcast(bench_grams), "__ngh", "inner")
        .groupBy(id_col)
        .agg(F.countDistinct("__ngh").alias("n_matching_ngrams"))
        .filter(F.col("n_matching_ngrams") >= min_matches)
    )
    clean = corpus.join(flagged.select(id_col), id_col, "left_anti")
    return clean, flagged
