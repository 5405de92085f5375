"""Streaming CDC apply: maintain a latest-wins keyed table from a
stream, committed per micro-batch to a (jar-less) Delta table.

The MERGE-INTO-from-a-stream shape (SURVEY §2.7 + the reference's
append-only load loop, reference src/db/db.go:149-180, upgraded to
upserts): each micro-batch unions with the current table state and
keeps the max-sequence row per key, then commits one new Delta version
via sources/delta_py.write_delta — so readers always see an atomic
snapshot (a version is visible only once its JSON commit lands), and
time travel preserves every intermediate state.

Scale notes: latest-wins is associative, so per-batch folding equals
the global answer regardless of how rows split across micro-batches
(the test pins stream==batch). The per-batch merge is one shuffle on
the key; the rewrite cost is the current table size per batch — the
no-table-format trade-off. With a real lakehouse writer the same
foreachBatch body becomes a MERGE INTO (only changed files rewritten);
the operator's surface and semantics stay identical, which is why
foreachBatch is the production pattern for stream upserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame, key_cols: list[str], seq_cols: list[str]
) -> DataFrame:
    """One row per key: the row with the greatest (seq_cols) tuple —
    deterministic when the tuple is unique per key (pass tie-breakers)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in seq_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_upsert_delta(
    stream: DataFrame,
    table_path: str,
    key_cols: list[str],
    seq_cols: list[str],
    checkpoint_dir: str,
):
    """Start a foreachBatch query folding the stream into a latest-wins
    Delta table at ``table_path``. Returns the StreamingQuery."""
    from gcs2postgres_spark.sources.delta_py import read_delta_py, write_delta

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            current = read_delta_py(spark, table_path)
            merged_src = current.unionByName(batch.select(*current.columns))
        except FileNotFoundError:
            merged_src = batch
        merged = latest_wins(merged_src, key_cols, seq_cols)
        write_delta(merged, table_path, "overwrite")

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
