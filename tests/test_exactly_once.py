"""Exactly-once streaming apply (round 12).

The streaming CDC sinks stamp a transaction watermark into every
commit — Delta: the protocol's ``txn`` action (appId + version =
batchId, the same mechanism delta-spark's txnAppId/txnVersion
implement); Iceberg: ``app-id``/``batch-id`` snapshot summary
properties (Flink's sink records its checkpoint id the same way) —
and skip any micro-batch at or below the recorded watermark. This
upgrades the round-11 sinks' documented at-least-once idempotence to
true exactly-once, including the equality-upsert sink, which was NOT
content-idempotent (a replayed batch stacked an extra snapshot).
"""

import json
import os

import pytest


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "k int, name string, seq int")


def test_delta_txn_watermark(spark, tmp_path):
    from gcs2postgres_spark.sources.delta_py import (
        last_txn_version,
        merge_delta,
        read_delta_py,
        write_delta,
    )

    t = str(tmp_path / "d")
    write_delta(_rows(spark, [(1, "a", 0), (2, "b", 0)]).coalesce(1), t,
                "overwrite", timestamp_ms=1_700_000_000_000,
                txn={"appId": "app1", "version": 0})
    assert last_txn_version(spark, t, "app1") == 0
    assert last_txn_version(spark, t, "other") == -1

    merge_delta(spark, t, _rows(spark, [(1, "a2", 1)]), ["k"],
                latest_wins_on=["seq"], timestamp_ms=1_700_000_001_000,
                txn={"appId": "app1", "version": 1})
    assert last_txn_version(spark, t, "app1") == 1
    assert {r["name"] for r in read_delta_py(spark, t).collect()} == {"a2", "b"}
    # the sink's guard: batch 1 redelivered -> skipped before any work
    assert 1 <= last_txn_version(spark, t, "app1")


def test_delta_txn_survives_checkpoint(spark, tmp_path):
    """The txn watermark must survive log compaction: checkpoints carry
    txn rows (protocol), so exactly-once holds across a cleaned log."""
    from gcs2postgres_spark.sources.delta_py import (
        last_txn_version,
        write_delta,
    )

    t = str(tmp_path / "d")
    write_delta(_rows(spark, [(0, "x", 0)]).coalesce(1), t, "overwrite",
                timestamp_ms=1_700_000_000_000,
                txn={"appId": "appX", "version": 7})
    for i in range(1, 11):  # crosses the every-10 auto checkpoint
        write_delta(_rows(spark, [(i, f"r{i}", 0)]).coalesce(1), t, "append",
                    timestamp_ms=1_700_000_000_000 + i * 1000)
    log_dir = os.path.join(t, "_delta_log")
    cp = json.loads(open(os.path.join(log_dir, "_last_checkpoint")).read())
    for v in range(cp["version"] + 1):
        p = os.path.join(log_dir, f"{v:020d}.json")
        if os.path.exists(p):
            os.remove(p)
    assert last_txn_version(spark, t, "appX") == 7


def test_iceberg_txn_snapshot_properties(spark, tmp_path):
    from gcs2postgres_spark.sources.iceberg_py import (
        append_iceberg_v2,
        create_iceberg_v2_table,
        last_txn_version_iceberg,
        read_iceberg_py,
        upsert_equality,
    )

    t = str(tmp_path / "i")
    df = _rows(spark, [(1, "a", 0), (2, "b", 0)])
    create_iceberg_v2_table(df.schema, t)
    append_iceberg_v2(spark, t, df, snapshot_ts_ms=1_700_000_000_000,
                      txn=("appI", 0))
    assert last_txn_version_iceberg(t, "appI") == 0
    assert last_txn_version_iceberg(t, "nope") == -1
    upsert_equality(spark, t, _rows(spark, [(1, "a2", 1)]), ["k"],
                    snapshot_ts_ms=1_700_000_001_000, txn=("appI", 1))
    assert last_txn_version_iceberg(t, "appI") == 1
    assert {r["name"] for r in read_iceberg_py(spark, t).collect()} == {"a2", "b"}


@pytest.mark.parametrize("sink", ["equality_iceberg", "merge_delta"])
def test_stream_replay_is_exactly_once(spark, sf_dir, tmp_path, sink):
    """END-TO-END redelivery: run the sink over a multi-batch file
    stream, then force Spark to REPLAY the final micro-batch by
    deleting its checkpoint commit marker and restarting. The replayed
    batch must be SKIPPED: zero new table versions/snapshots and the
    data unchanged — exactly-once, not just idempotent-by-luck."""
    import pyspark.sql.functions as F

    from gcs2postgres_spark.streaming.cdc_apply import (
        stream_equality_upsert_iceberg,
        stream_merge_delta,
    )

    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    # stage the source ONCE: a restart from the same checkpoint must
    # see the same files (the shared stream-staging helper creates a
    # fresh temp dir per call, which a restarted query would trip over)
    from gcs2postgres_spark.streaming.windows import _events_schema

    schema = _events_schema(spark, sf_dir)
    stage = str(tmp_path / "stage")
    (
        spark.read.schema(schema).parquet(f"{sf_dir}/events.parquet")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(stage)
    )

    def run_once():
        from gcs2postgres_spark.streaming.windows import _normalize_ts

        stream = _normalize_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        ).select("user_id", "ts", "event_id", "value")
        if sink == "equality_iceberg":
            q = stream_equality_upsert_iceberg(
                stream, target, key_cols=["user_id"],
                seq_cols=["ts", "event_id"], checkpoint_dir=ckpt,
                compact_every=0,
            )
        else:
            q = stream_merge_delta(
                stream, target, key_cols=["user_id"],
                seq_cols=["ts", "event_id"], checkpoint_dir=ckpt,
            )
        q.processAllAvailable()
        q.stop()

    def table_state():
        if sink == "equality_iceberg":
            from gcs2postgres_spark.sources.iceberg_py import (
                latest_metadata_file,
                read_iceberg_py,
            )

            meta = json.loads(open(latest_metadata_file(target)).read())
            n_commits = len(meta.get("snapshots") or [])
            df = read_iceberg_py(spark, target)
        else:
            from gcs2postgres_spark.sources.delta_py import (
                _list_commits,
                read_delta_py,
            )

            n_commits = max(_list_commits(os.path.join(target, "_delta_log")))
            df = read_delta_py(spark, target)
        rows = sorted(
            (r["user_id"], r["event_id"]) for r in df.select("user_id", "event_id").collect()
        )
        return n_commits, rows

    run_once()
    before = table_state()
    if sink == "merge_delta":
        # the conditional-merge sink is ORDER-INDEPENDENT: final state
        # must equal the one-shot latest-wins answer (the equality sink
        # documents an in-order-batches contract instead, covered by
        # test_streaming's quartile-staged test — here only the
        # exactly-once property is under test)
        expect = sorted(
            tuple(r)
            for r in spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
            .collect()
        )
        assert before[1] == expect

    # force redelivery of the last batch: drop its commit marker (and
    # the checksum sidecar — a stale .crc makes the restarted query's
    # commit rename fail as a phantom concurrent writer)
    commits_dir = os.path.join(ckpt, "commits")
    last = max(int(f) for f in os.listdir(commits_dir) if f.isdigit())
    os.remove(os.path.join(commits_dir, str(last)))
    crc = os.path.join(commits_dir, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()
    after = table_state()
    assert after == before  # zero new versions/snapshots, data unchanged
