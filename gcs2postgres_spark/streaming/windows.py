"""Structured Streaming twins of the batch event queries (SURVEY.md §2.7).

The reference has no streaming — its "stream" is an in-process Go
channel (reference src/db/db.go:193). These operators are the
engine-layer streaming surface: tumbling/sliding windows, session
windows, watermark + late-data drop, stateful dedup, stream-static
join. Each mirrors a batch query in queries/events_q.py so the DuckDB
oracle validates the semantics; tests run these to completion on the
same parquet via processAllAvailable and check stream==batch.

Scale notes: watermarks bound state; state lives in the state store
partitioned by grouping key, so these scale exactly like the
equivalent batch shuffles. Output mode "append" emits a window only
once its watermark passes — the production-safe default.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# schema of events.parquet with ts as long nanos (see catalog.load_table)
EVENTS_NS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _events_schema(spark: SparkSession, sf_dir: str) -> StructType:
    """Probe the actual parquet schema with a batch read: the generated
    events table has shipped as both TIMESTAMP(NANOS) (reads as long
    under nanosAsLong) and TIMESTAMP(MICROS) (reads as timestamp_ntz);
    readStream needs an explicit schema, so it must match what the file
    really contains."""
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Same ts normalization as catalog.load_table, for stream frames."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch here; in production this is Kafka/files-on-arrival).

    Spark's FileStreamSource requires a *directory* (it watches for new
    files and pins basePath to the path given), so the single testdata
    file is staged into a temp directory via symlink — the same shape a
    production landing zone has.
    """
    import tempfile

    stage = Path(tempfile.mkdtemp(prefix="events_stream_"))
    link = stage / "events.parquet"
    if not link.exists():
        link.symlink_to(f"{sf_dir}/events.parquet")
    raw = spark.readStream.schema(_events_schema(spark, sf_dir)).parquet(str(stage))
    return _normalize_ts(raw)


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of events_tumbling_window: 1h tumbling window with
    watermark-bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of events_sliding_window (2h window, 1h slide)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows with a 30-minute gap (streaming twin of
    events_sessionize's lag-gap logic)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful dedup within the watermark (streaming twin of
    events_dedup_first; state evicts once the watermark passes)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["user_id", "event_type"])


def stream_static_join(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: each micro-batch joins against the static
    dimension (broadcast — no stream-side state)."""
    return events.join(
        F.broadcast(customers.select("c_custkey", "c_mktsegment")),
        events.user_id == F.col("c_custkey"),
        "inner",
    ).select("event_id", "ts", "user_id", "event_type", "value", "c_mktsegment")


def read_events_stream_batched(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """Multi-micro-batch variant: splits the events table into n_files
    parquet files in a temp landing dir and streams with
    maxFilesPerTrigger=1, so watermark advancement / state eviction /
    late-data handling run across several real micro-batches instead of
    one. Files are split by event_id range (stable), NOT time-ordered —
    so batches genuinely interleave event times, exercising out-of-order
    arrival."""
    import tempfile

    stage = Path(tempfile.mkdtemp(prefix="events_stream_batched_"))
    schema = _events_schema(spark, sf_dir)
    raw = spark.read.schema(schema).parquet(f"{sf_dir}/events.parquet")
    # round-robin split → exactly n_files files (hash-partitioning n keys
    # into n partitions collides and leaves some files empty)
    raw.repartition(n_files).write.mode("overwrite").parquet(str(stage))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    return _normalize_ts(stream)


USER_STATS_STATE_SCHEMA = "n_events long, total_value double, max_ts timestamp"
USER_STATS_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, max_ts timestamp"
)


def user_running_stats_stateful(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum(value), max(ts)) maintained in the state store
    across micro-batches, emitting the updated row for every user seen in
    a batch.

    This is the escape hatch for aggregations Spark's built-in windowed
    aggs can't express (per-key custom state machines); state is
    partitioned by the grouping key so it scales exactly like a shuffle,
    and the GroupStateTimeout ties state lifetime to the watermark."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total, max_ts = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
        state.update((n, total, max_ts))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_ts": [max_ts]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=USER_STATS_OUTPUT_SCHEMA,
            stateStructType=USER_STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_running_stats_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Same per-user running (count, sum(value), max(ts)) as
    ``user_running_stats_stateful``, expressed with Spark 4's
    ``transformWithStateInPandas`` — the typed-state successor to
    applyInPandasWithState (SPARK-49045 / the transformWithState API):
    named ValueState handles instead of a single opaque state tuple,
    explicit init/close lifecycle, RocksDB-backed state store
    (transformWithState requires the RocksDB provider; the conf below
    is runtime-settable and scoped to queries started afterwards).

    State is partitioned by the grouping key exactly like a shuffle —
    same scale story as the applyInPandasWithState twin; equality of
    the two implementations across real micro-batches is pinned in
    tests/test_streaming.py (skipped where the dependency below is
    absent).

    Dependency boundary: transformWithState's Python runner speaks
    protobuf to the JVM (state requests are proto messages), so it
    needs the ``protobuf`` package — probed here with a clear error
    instead of a mid-query worker crash (this sandbox ships no
    protobuf; applyInPandasWithState needs none and remains the
    default stateful operator)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas needs the protobuf package for "
            "its state-server protocol (pip install protobuf); use "
            "user_running_stats_stateful (applyInPandasWithState) where "
            "it is unavailable"
        ) from e
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    # defined inside the factory so cloudpickle ships the class BY VALUE
    # (a module-level class pickles by reference and breaks when the
    # executor worker's sys.path lacks the repo — the driver-sim cwd
    # gotcha)
    class _Stats(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState("stats", USER_STATS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            if self._state.exists():
                n, total, max_ts = self._state.get()
            else:
                n, total, max_ts = 0, 0.0, None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
            self._state.update((n, total, max_ts))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "max_ts": [max_ts],
                }
            )

        def close(self):
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_Stats(),
            outputStructType=USER_STATS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def run_to_memory(df: DataFrame, name: str, mode: str = "complete") -> None:
    """Drive a streaming DataFrame to completion synchronously into an
    in-memory table (test harness; production uses real sinks +
    checkpoints). mode="complete" for aggregations; joins and other
    non-aggregating streams require "append"."""
    q = df.writeStream.outputMode(mode).format(
        "memory"
    ).queryName(name).start()
    q.processAllAvailable()
    q.stop()


def stream_stream_interval_join(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Stream-stream inner join with a time-interval condition — the
    streaming twin of queries/events_q.py::events_click_purchase_attr.

    Both sides are watermarked: the interval condition plus watermarks
    lets Spark bound the state store (a click older than
    watermark+horizon can never match a future purchase, so its state
    is evicted). Without the interval bound the state would grow
    forever — the thing that actually kills long-running stream-stream
    joins in production."""
    c = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        "click_id", "purchase_id", "user_id",
        "click_ts", "purchase_ts", "purchase_value",
    )


def stream_stream_interval_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "leftOuter",
) -> DataFrame:
    """Stream-stream OUTER join with a time-interval condition — the
    remaining standard streaming join shapes (inner is
    stream_stream_interval_join above; ``how`` is "leftOuter" or
    "fullOuter"). A click with no purchase in
    [click_ts, click_ts+horizon] is emitted null-extended, but only
    once the WATERMARK has passed click_ts+horizon — before that a
    matching purchase could still arrive, so the engine must hold the
    click in state and stay silent. That watermark-gated emission is
    exactly the state-eviction contract: the null-extended output and
    the state cleanup are the same event. fullOuter additionally
    emits purchases that no click preceded (the interval lower bound
    closes their match window at purchase_ts itself, so their
    eviction is governed by the same watermark). Spark requires
    watermarks on both inputs plus the event-time range condition for
    outer stream-stream joins; without them unmatched state could
    never be finalized."""
    c = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    if how not in ("leftOuter", "fullOuter"):
        raise ValueError(f"how must be leftOuter or fullOuter, got {how!r}")
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    ).select(
        "click_id",
        "purchase_id",
        # fullOuter: user_id is null on purchase-only rows — coalesce to
        # the side that exists so the output key is always populated
        F.coalesce("user_id", "p_user_id").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def read_events_stream_time_ordered(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """Time-ordered multi-micro-batch events stream: the table is split
    into ``n_files`` contiguous TIME RANGES, staged as sequentially
    named/written files, and streamed with maxFilesPerTrigger=1. Unlike
    read_events_stream_batched (round-robin, deliberately out-of-order),
    here the watermark advances monotonically with no late drops — the
    shape outer-join tests need, where null-extended emission depends
    only on the watermark passing each row's horizon, not on late-data
    policy."""
    import shutil
    import tempfile

    stage = Path(tempfile.mkdtemp(prefix="events_stream_ordered_"))
    schema = _events_schema(spark, sf_dir)
    raw = _normalize_ts(spark.read.schema(schema).parquet(f"{sf_dir}/events.parquet"))
    bounds = raw.selectExpr(
        *[
            f"percentile_approx(ts, {i / n_files}, 10000) AS p{i}"
            for i in range(1, n_files)
        ]
    ).first()
    cuts = [bounds[f"p{i}"] for i in range(1, n_files)]
    scratch = Path(tempfile.mkdtemp(prefix="events_stream_ordered_tmp_"))
    for i in range(n_files):
        part = raw
        if i > 0:
            part = part.filter(F.col("ts") >= F.lit(cuts[i - 1]))
        if i < n_files - 1:
            part = part.filter(F.col("ts") < F.lit(cuts[i]))
        out = scratch / f"b{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(out))
        src = next(out.glob("part-*.parquet"))
        # sequential rename: lexicographic name order == arrival order ==
        # time order, whatever listing order the file source uses
        shutil.move(str(src), str(stage / f"{i:03d}.parquet"))
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage))
    )
    return stream


def binned_value_counts(events: DataFrame, bin_width: float = 100.0) -> DataFrame:
    """Mergeable fixed-width value histogram per event_type — the
    STREAMING-compatible variant of queries/insights_q.py::
    agg_binned_quantiles: fixed bin edges (no global min/max, which a
    stream cannot know) make the histogram a plain keyed count, so
    partial aggregates merge by addition across micro-batches and
    stream==batch by construction. The batch twin pins the equality in
    tests/test_streaming.py."""
    return (
        events.withColumn(
            "bin", F.floor(F.col("value") / F.lit(bin_width)).cast("int")
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
