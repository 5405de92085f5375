"""Physical data layout for scale: bucketing (co-located joins) and
partitioned writes (partition-pruned scans).

At 100 TB the cheapest shuffle is the one you never run:

- **Bucketing**: write both join sides bucketed by the join key into
  the warehouse; an equi-join on the bucket key then requires NO
  Exchange on either side (each bucket pair joins locally). This is
  the Spark equivalent of co-located / co-partitioned tables in MPP
  warehouses. Worth it for fact-fact joins repeated across many
  queries; pointless for one-shot joins (you pay the shuffle once
  either way).
- **Partitioned writes**: directory-partition by a low-cardinality,
  frequently-filtered column (event date, language, source); filters
  on it prune whole directories at planning time (PartitionFilters in
  the scan, zero I/O for pruned partitions).

Both are write-path decisions — the read-path operators in this repo
work unchanged on top of either layout (catalog.load_table is the
seam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) table.
    Sorting within buckets additionally removes the Sort from sort-merge
    joins — scan → join directly.

    The pre-write ``repartition(n_buckets, bucket_col)`` makes each task
    hold exactly one bucket, so every bucket is ONE file: without it each
    upstream task writes a file per bucket (tasks×buckets small files),
    and a multi-file bucket forces the read side to re-Sort before a
    sort-merge join even when sort_col is set — one sorted file per
    bucket is what lets the SMJ consume the scan directly. Bucket count
    also caps scan parallelism (one task per bucket), so size it to the
    cluster: ~total-cores × small-multiple, with 128-512 MB per bucket."""
    w = df.repartition(n_buckets, bucket_col).write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path is not None:
        # external table: pins storage to an explicit location instead of
        # cwd/spark-warehouse (the caller's cwd may not be writable)
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_equijoin(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key. With matching
    bucket counts Spark plans a SortMergeJoin with NO Exchange on either
    side — verified by tests/test_layout.py."""
    return spark.table(left_table).join(spark.table(right_table), on)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet write. Filters on partition_cols
    become PartitionFilters (planning-time pruning, no file I/O for
    pruned values)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def zorder_key(cols, bits: int = 16):
    """Z-order (Morton) key over pre-normalized integer rank columns.

    ``cols`` are Columns already mapped to non-negative ints < 2**bits
    (days-since-epoch, price*100, bucketized rank, ...). Interleaves one
    bit per dimension per level, JVM-side (a fixed bit-twiddle
    expression — whole-stage-codegen'd, no UDF).

    Why: sorting by (a, b) clusters ONLY a; a range filter on b alone
    touches every file. The Morton curve interleaves both dimensions, so
    parquet min/max footers prune files for predicates on EITHER (or
    both) dimensions — the same reason Delta/Iceberg OPTIMIZE ZORDER
    exists, here as a plain write-time transform any engine can read.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + d))
    return z


def zorder_rank_columns(df, cols: list[str], bits: int = 8):
    """Equi-depth rank normalization for OPTIMIZE ZORDER BY over
    arbitrary numeric / date / timestamp columns: one
    ``percentile_approx`` aggregation computes 2**bits - 1 quantile
    boundaries per column (the driver receives only those scalars), and
    each value maps to its bucket with a codegen'd balanced
    binary-search CASE tree of ``v >= literal`` comparisons (depth
    ceil(log2(n_bounds+1)), no UDF, no interpreted lambdas — see the
    ``_rank_tree`` comment below for the measured win over the earlier
    higher-order-function fold). Equi-depth beats equal-width under
    skew: every bucket
    holds ~the same row count, so the Morton curve discriminates on
    both axes no matter how lopsided the raw distributions are (the
    same reason engines use range-ids, not min/max scaling). NULLs map
    to bucket 0 (they sort first, clustering together). Returns the
    normalized Columns, ready for zorder_key(..., bits=bits).

    Strings are refused: byte-prefix z-ordering needs collation
    machinery this helper doesn't carry, and string range predicates
    rarely prune anyway — cluster on a numeric surrogate instead."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # The CASE tree materializes ~2·2**bits expression nodes per column
    # (each internal node re-embeds the source expression), so analysis/
    # codegen cost grows exponentially in ``bits``: 8 → ~500 nodes
    # (measured fine), 16 → ~131k nodes (minutes of analysis, codegen
    # fallback). The old array fold degraded gracefully there; the tree
    # does not, so refuse early with the fix spelled out.
    if bits > 12:
        raise ValueError(
            f"zorder_rank_columns bits={bits}: the binary-search CASE "
            "tree is practical up to bits=12 (~8k expression nodes per "
            "column); beyond that, rank into coarser buckets — file-"
            "level min/max pruning gains nothing past ~2**12 ranks"
        )
    n_bounds = (1 << bits) - 1
    exprs = []
    for c in cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.DateType,)):
            exprs.append(F.datediff(F.col(c), F.lit("1970-01-01")).cast("double"))
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            exprs.append(F.unix_timestamp(F.col(c)).cast("double"))
        elif isinstance(dt, T.NumericType):
            exprs.append(F.col(c).cast("double"))
        else:
            raise NotImplementedError(
                f"zorder on {dt.simpleString()} column {c!r}: use a numeric, "
                "date, or timestamp column (or a numeric surrogate)"
            )
    fracs = [i / (n_bounds + 1) for i in range(1, n_bounds + 1)]
    bounds_row = df.agg(
        *[
            F.percentile_approx(e, fracs, 10_000).alias(f"__b{i}")
            for i, e in enumerate(exprs)
        ]
    ).first()
    ranked = []
    for i, e in enumerate(exprs):
        bounds = sorted(set(b for b in (bounds_row[f"__b{i}"] or []) if b is not None))
        if not bounds:  # constant or all-NULL column: rank 0 everywhere
            ranked.append(F.lit(0).cast("long"))
            continue
        # rank(v) = count(b in bounds with v >= b) = the insertion point
        # of v in the sorted unique bounds — computed as a BALANCED
        # BINARY-SEARCH CASE tree, not an array fold. Higher-order
        # F.filter lambdas execute INTERPRETED per element (no
        # whole-stage codegen inside the lambda), so even the r15
        # two-level O(2*sqrt(n)) fold paid ~124 interpreted lambda evals
        # per row at 255 boundaries — measured as the dominant per-row
        # cost of every z-order rewrite (r17 counterbalanced A/B, 6M-row
        # sf1 rank projection over a 255-bound date + 11-bound double:
        # 4.14 s fold → 1.48 s tree, 0 rank mismatches). The tree is
        # depth ceil(log2(n+1)) of plain `v >=
        # literal` comparisons — codegen'd ifs, O(n) total expression
        # nodes, 8 comparisons/row at 255 bounds. NULL v fails every
        # comparison and descends to the leftmost leaf = rank 0, the
        # same bucket the fold's null-as-false filter produced.
        def _rank_tree(lo: int, hi: int):
            # rank within bounds[lo:hi) given bounds[:lo] <= v < bounds[hi:]
            if lo == hi:
                return F.lit(lo)
            mid = (lo + hi) // 2
            return F.when(e >= F.lit(float(bounds[mid])), _rank_tree(mid + 1, hi)).otherwise(
                _rank_tree(lo, mid)
            )

        rank = _rank_tree(0, len(bounds)).cast("long")
        # low-cardinality columns dedupe to few boundaries, leaving the
        # rank in the LOW bits only — the other dimension's high bits
        # would then fully dominate the curve. Rescale each rank to span
        # the whole 0..2**bits-1 range so every column contributes high
        # bits to the interleave (comparable bit widths, same reason
        # zorder_q hand-normalizes both dims to 8 bits).
        scale = n_bounds / len(bounds)
        ranked.append(
            F.least(F.round(rank * F.lit(scale)).cast("long"), F.lit(n_bounds))
        )
    return ranked


def cluster_for_rewrite(
    df,
    n_files: int,
    part_cols: list[str],
    zorder_by: list[str] | None,
    bits: int = 8,
    caches: list | None = None,
):
    """Physical re-bin for an OPTIMIZE/rewrite commit (shared by the
    Delta and Iceberg compaction committers). Without ``zorder_by``:
    plain repartition (hashing on the partition columns so each task
    owns whole partitions — ~1 compacted file per partition under
    partitionBy). With it: cluster along the Morton curve —
    unpartitioned tables range-partition on the z-key so each file owns
    one contiguous curve segment; Hive/identity-partitioned tables keep
    the partition routing and z-sort WITHIN each partition (the curve
    then tightens min/max footers inside every partition directory,
    the same shape OPTIMIZE ZORDER BY produces).

    Persist placement, MEASURED (guide §1.1): the bounds pass
    (percentile_approx) deliberately re-scans the SOURCE, not a cache —
    it reads only the z-order columns, so that scan is column-pruned
    and cheap, while an r18 attempt to persist the raw rewrite input
    ahead of it (so all three passes share one materialization) forced
    a FULL-WIDTH cache build where a 2-column scan used to suffice and
    regressed sf3 1.6× (optimize-zorder 27.7 → 43.8 s, liquid 44.5 →
    68.9 s; sf1 a wash). Kept shape: z-keyed frame persisted only where
    n_files > 1 plans a range-sample job (r17 A/B: 29.8 → 14.2 s).

    The cache registers in the transient registry the bench/sweep
    harnesses release per query; committers that own the write action
    should pass ``caches`` (a list the persisted frame is appended to)
    and unpersist after staging data files — otherwise a long-lived
    session accumulates a table-sized MEMORY_AND_DISK block per
    compaction (r17 ADVICE)."""
    from pyspark.sql import functions as F

    if not zorder_by:
        return df.repartition(n_files, *part_cols) if part_cols else df.repartition(n_files)
    zkey = zorder_key(zorder_rank_columns(df, zorder_by, bits), bits=bits)
    dfz = df.withColumn("__z", zkey)
    if part_cols:
        # hash repartition samples nothing — the z tree runs once
        out = dfz.repartition(n_files, *part_cols).sortWithinPartitions(*part_cols, "__z")
    else:
        # repartitionByRange SAMPLES its child to pick range bounds, so
        # the scan + equi-depth rank (the dominant per-row cost of a
        # z-order rewrite) would run TWICE — once for the sample job,
        # once for the real shuffle. Persist the z-keyed frame so both
        # passes read one materialization (r17 counterbalanced A/B at
        # sf1, 6M rows, n_files=2: 29.8 → 14.2 s old fold / 20.3 →
        # 12.1 s rank tree). Size-conditional (operators.caching):
        # tiny rewrites skip the cache. n_files == 1 plans a single
        # range partition with no sample job — nothing to share.
        if n_files > 1:
            from gcs2postgres_spark.operators.caching import maybe_persist

            cached = maybe_persist(dfz)
            if caches is not None and cached is not dfz:
                caches.append(cached)
            dfz = cached
        out = dfz.repartitionByRange(n_files, F.col("__z")).sortWithinPartitions("__z")
    return out.drop("__z")


def write_zordered(df, path: str, zcol, n_files: int = 8, mode: str = "overwrite") -> None:
    """Write parquet clustered along the space-filling curve:
    repartitionByRange on the z-key makes each output file own one
    contiguous curve segment (tight per-file min/max on every interleaved
    dimension), and sortWithinPartitions keeps row groups tight inside
    each file. Cost: one range shuffle at ingest, same as any sorted
    write; the payoff is multiplicative file-level pruning on
    multi-dimension predicates at read time."""
    from pyspark.sql import functions as F

    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def list_data_files(spark, path: str, suffix: str = ".parquet") -> list[tuple[str, int]]:
    """Recursive ``(path, size)`` listing through the Hadoop FileSystem
    API — ONE ``listFiles(recursive=true)`` call, the same metadata
    round-trip every Spark scan planner makes. Works on any scheme the
    Hadoop conf knows (``file://``, ``gs://``, ``s3a://``, ``hdfs://``);
    on object stores this is a bulk LIST, not a per-file stat crawl —
    the difference between O(1) requests and 10⁵ sequential GETs on a
    large table. Hidden dirs (``_delta_log``, ``_staging*``, dotfiles)
    are skipped."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    out: list[tuple[str, int]] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        rel = p.split("/")
        if any(seg.startswith(("_", ".")) for seg in rel[:-1]):
            continue
        if p.endswith(suffix):
            out.append((p, int(st.getLen())))
    return out


def compact_parquet(
    spark, src_path: str, dest_path: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_bytes) files and return the new file
    count. The classic warehouse maintenance pass — thousands of
    micro-batch/streaming output files per partition destroy scan
    throughput (a footer read per file, no intra-file parallelism left)
    and inflate driver listing cost; compacting to 128-512 MB restores both.
    Sizing reads FILE METADATA via one Hadoop FileSystem listFiles call
    (object-store safe), never the data; the rewrite itself is one
    narrow repartition job."""
    import math

    files = list_data_files(spark, src_path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {src_path!r}")
    total = sum(size for _p, size in files)
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_path).repartition(n_out).write.mode("overwrite").parquet(
        dest_path
    )
    return len(list_data_files(spark, dest_path))


def compact_delta(spark, table_path: str, target_bytes: int = 128 * 1024 * 1024) -> int:
    """OPTIMIZE + VACUUM convenience for the jar-less Delta table:
    delegates the rewrite to the protocol-level committer
    (``sources.delta_py.compact_delta`` — a ``dataChange: false``
    remove+add commit that purges deletion vectors, stays silent in the
    change feed, and sizes from the log's ``add.size`` metadata), then
    vacuums the tombstoned originals. Readers see an atomic switch;
    time travel to pre-compaction versions is traded away by the
    vacuum, exactly like OPTIMIZE + VACUUM. Returns the number of live
    data files after compaction. Keep the two steps separate (use the
    source-level committer directly) when time travel must survive."""
    import math

    from gcs2postgres_spark.sources.delta_py import (
        compact_delta as _optimize,
        replay_head_state,
        vacuum_delta,
    )

    _optimize(spark, table_path, target_file_mb=max(1, math.ceil(target_bytes / 2**20)))
    vacuum_delta(table_path)
    live_after, _meta = replay_head_state(spark, table_path)
    return len(live_after)
