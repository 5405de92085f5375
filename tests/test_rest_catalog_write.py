"""r17: Iceberg REST catalog WRITE path — create/commit/drop/rename +
OAuth2 — driven against the in-package in-process catalog server
(``rest_catalog_server``, the FakeObjectStore pattern over real HTTP).
The catalog is the single commit authority: commits POST
requirements/updates, a 409 triggers the client's refresh-and-rebase
retry, and the server's metadata files keep path-addressed readers
coherent with the catalog pointer."""

from __future__ import annotations

import json
import os
import urllib.error

import pytest

from gcs2postgres_spark.sources.iceberg_py import (
    CommitConflictError,
    append_iceberg_v2,
    read_iceberg_py,
)
from gcs2postgres_spark.sources.rest_catalog import (
    IcebergRestCatalog,
    oauth2_token_provider,
    register_catalog,
)
from gcs2postgres_spark.sources.rest_catalog_server import (
    start_catalog_server,
)


@pytest.fixture
def server(tmp_path):
    endpoint, srv, state = start_catalog_server(str(tmp_path / "wh"))
    yield endpoint, state
    srv.shutdown()


@pytest.fixture
def auth_server(tmp_path):
    endpoint, srv, state = start_catalog_server(
        str(tmp_path / "wh"), client_id="cid", client_secret="sec"
    )
    yield endpoint, state
    srv.shutdown()


def _kv(spark, a, b):
    return spark.range(a, b).selectExpr("id AS k", "concat('n', id) AS v")


def test_oauth2_client_credentials_flow(spark, auth_server):
    endpoint, state = auth_server
    # wrong secret: the token endpoint 401s
    bad = oauth2_token_provider(endpoint, "cid", "wrong")
    with pytest.raises(urllib.error.HTTPError):
        bad()
    tp = oauth2_token_provider(endpoint, "cid", "sec")
    tok = tp()
    assert tok and tp() == tok  # cached until expiry
    cat = IcebergRestCatalog(endpoint, token_provider=tp)
    cat.create_namespace("ns1")
    assert cat.list_namespaces() == [("ns1",)]
    # an UNauthenticated client is rejected on the protected surface
    anon = IcebergRestCatalog(endpoint)
    with pytest.raises(urllib.error.HTTPError):
        anon.list_namespaces()


def test_namespace_crud(server):
    endpoint, _state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_namespace("a")
    cat.create_namespace("b")
    assert cat.list_namespaces() == [("a",), ("b",)]
    with pytest.raises(FileExistsError):
        cat.create_namespace("a")
    cat.drop_namespace("b")
    assert cat.list_namespaces() == [("a",)]
    with pytest.raises(FileNotFoundError):
        cat.drop_namespace("b")


def test_create_table_and_catalog_append(spark, server):
    endpoint, state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_namespace("analytics")
    result = cat.create_table(
        "analytics", "t1", _kv(spark, 0, 0).schema
    )
    loc = result["metadata"]["location"]
    # catalog-assigned location under the warehouse; real-catalog
    # metadata naming (NNNNN-<uuid>.metadata.json)
    assert "/wh/analytics/t1" in loc.replace(os.sep, "/")
    assert result["metadata-location"].endswith(".metadata.json")
    assert os.path.basename(result["metadata-location"])[:5] == "00001"
    with pytest.raises(FileExistsError):
        cat.create_table("analytics", "t1", _kv(spark, 0, 0).schema)
    sid = cat.append(spark, "analytics", "t1", _kv(spark, 0, 10))
    assert sid == 1 and state.commit_count == 1
    got = sorted(tuple(r) for r in cat.read(spark, "analytics", "t1").collect())
    assert got == [(i, f"n{i}") for i in range(10)]
    # PATH-addressed read of the same location sees the same state: the
    # server's metadata files keep both addressing modes coherent
    assert read_iceberg_py(spark, loc).count() == 10


def test_partitioned_create_routes_rows(spark, server):
    endpoint, _state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_table(
        "ns", "tp", _kv(spark, 0, 0).schema,
        partition_spec=[("k", "bucket[4]")],
    )
    cat.append(spark, "ns", "tp", _kv(spark, 0, 40))
    df = cat.read(spark, "ns", "tp")
    assert df.count() == 40
    meta = cat.load_table("ns", "tp")["metadata"]
    spec = meta["partition-specs"][0]["fields"]
    assert spec and spec[0]["transform"] == "bucket[4]"


def test_conflicting_commit_rebase_retry(spark, server):
    """The optimistic-concurrency core: a writer whose base snapshot
    went stale (another commit landed between its load and its POST)
    gets a 409, refreshes FROM THE CATALOG, restacks its manifests on
    the new head, and succeeds — both writers' rows survive."""
    endpoint, state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_table("ns", "race", _kv(spark, 0, 0).schema)
    cat.append(spark, "ns", "race", _kv(spark, 0, 5))
    # loser captures its base BEFORE the winner commits
    table_path, stale_ctx, _meta = cat._table_ctx("ns", "race", "append")
    cat.append(spark, "ns", "race", _kv(spark, 100, 105))  # winner
    commits_before = state.commit_count
    sid = append_iceberg_v2(
        spark, table_path, _kv(spark, 200, 203),
        _ctx=stale_ctx, _catalog_ctx=(cat, "ns", "race"),
    )
    # one failed POST + one successful retry
    assert state.commit_count == commits_before + 1
    assert sid == 3
    got = sorted(r["k"] for r in cat.read(spark, "ns", "race").collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 102, 103, 104, 200, 201, 202]


def test_forced_409_append_retries_dml_raises(spark, server):
    endpoint, state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_table("ns", "f", _kv(spark, 0, 0).schema)
    cat.append(spark, "ns", "f", _kv(spark, 0, 6))
    state.fail_next_commits = 1
    sid = cat.append(spark, "ns", "f", _kv(spark, 10, 12))  # retried
    assert sid == 2 and cat.read(spark, "ns", "f").count() == 8
    # DML must NOT silently retry: its matched-file inventory is stale
    state.fail_next_commits = 1
    with pytest.raises(CommitConflictError):
        cat.delete_where(spark, "ns", "f", "k = 0")
    state.fail_next_commits = 0
    cat.delete_where(spark, "ns", "f", "k = 0")
    assert cat.read(spark, "ns", "f").count() == 7


def test_catalog_dml_update_delete(spark, server):
    endpoint, _state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_table("ns", "d", _kv(spark, 0, 0).schema)
    cat.append(spark, "ns", "d", _kv(spark, 0, 8))
    assert cat.delete_where(spark, "ns", "d", "k >= 6") == 2
    assert cat.update_where(spark, "ns", "d", "k = 0", {"v": "'zero'"}) == 3
    got = sorted(tuple(r) for r in cat.read(spark, "ns", "d").collect())
    assert got == [(0, "zero")] + [(i, f"n{i}") for i in range(1, 6)]
    # repeated predicate is a no-op (no commit)
    assert cat.delete_where(spark, "ns", "d", "k >= 6") is None


def test_rename_and_drop_table(spark, server):
    endpoint, _state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_table("ns", "r1", _kv(spark, 0, 0).schema)
    cat.append(spark, "ns", "r1", _kv(spark, 0, 4))
    cat.rename_table("ns", "r1", "ns2", "r2")
    assert cat.list_tables("ns") == []
    assert cat.list_tables("ns2") == ["r2"]
    assert cat.read(spark, "ns2", "r2").count() == 4
    with pytest.raises(FileNotFoundError):
        cat.rename_table("ns", "r1", "ns", "x")
    loc = cat.load_table("ns2", "r2")["metadata"]["location"]
    cat.drop_table("ns2", "r2", purge=True)
    assert cat.list_tables("ns2") == []
    assert not os.path.exists(loc)  # purge removed the files
    # drop_namespace 409s while tables remain
    cat.create_table("full", "t", _kv(spark, 0, 0).schema)
    with pytest.raises(FileExistsError):
        cat.drop_namespace("full")


def test_facade_catalog_ddl_dml(spark, server):
    from gcs2postgres_spark.sources import rest_catalog
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    endpoint, _state = server
    cat = IcebergRestCatalog(endpoint)
    register_catalog("wcat", cat)
    try:
        lakehouse_sql(spark, "CREATE NAMESPACE iceberg.wcat.sales")
        lakehouse_sql(
            spark,
            "CREATE TABLE iceberg.wcat.sales.orders (k BIGINT, v STRING) "
            "PARTITIONED BY (bucket(4, k))",
        )
        lakehouse_sql(
            spark,
            "INSERT INTO iceberg.wcat.sales.orders VALUES (1, 'a'), (2, 'b')",
        )
        lakehouse_sql(
            spark,
            "INSERT INTO iceberg.wcat.sales.orders "
            "SELECT 10 AS k, 'c' AS v",
        )
        n = lakehouse_sql(
            spark, "SELECT count(*) AS n FROM iceberg.wcat.sales.orders"
        ).collect()[0]["n"]
        assert n == 3
        lakehouse_sql(
            spark, "DELETE FROM iceberg.wcat.sales.orders WHERE k = 1"
        )
        lakehouse_sql(
            spark, "UPDATE iceberg.wcat.sales.orders SET v = 'B' WHERE k = 2"
        )
        rows = sorted(
            tuple(r)
            for r in lakehouse_sql(
                spark, "SELECT * FROM iceberg.wcat.sales.orders"
            ).collect()
        )
        assert rows == [(2, "B"), (10, "c")]
        lakehouse_sql(
            spark, "ALTER TABLE iceberg.wcat.sales.orders RENAME TO orders2"
        )
        assert cat.list_tables("sales") == ["orders2"]
        assert (
            lakehouse_sql(
                spark, "SELECT count(*) AS n FROM iceberg.wcat.sales.orders2"
            ).collect()[0]["n"]
            == 2
        )
        lakehouse_sql(spark, "DROP TABLE iceberg.wcat.sales.orders2 PURGE")
        assert cat.list_tables("sales") == []
        lakehouse_sql(spark, "DROP NAMESPACE iceberg.wcat.sales")
        assert ("sales",) not in cat.list_namespaces()
    finally:
        rest_catalog._CATALOGS.pop("wcat", None)


def test_facade_catalog_ctas_and_merge(spark, server):
    from gcs2postgres_spark.sources import rest_catalog
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    endpoint, _state = server
    cat = IcebergRestCatalog(endpoint)
    register_catalog("mcat", cat)
    try:
        _kv(spark, 0, 6).createOrReplaceTempView("__ctas_src")
        lakehouse_sql(
            spark,
            "CREATE TABLE iceberg.mcat.s.t PARTITIONED BY (bucket(2, k)) "
            "AS SELECT * FROM __ctas_src",
        )
        assert (
            lakehouse_sql(
                spark, "SELECT count(*) AS n FROM iceberg.mcat.s.t"
            ).collect()[0]["n"]
            == 6
        )
        spark.sql(
            "SELECT 2 AS k, 'X' AS v UNION ALL SELECT 99, 'Y'"
        ).createOrReplaceTempView("__m_src")
        sid = lakehouse_sql(
            spark,
            "MERGE INTO iceberg.mcat.s.t t USING __m_src s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT *",
        )
        assert sid == 2
        rows = sorted(
            tuple(r)
            for r in lakehouse_sql(
                spark, "SELECT k, v FROM iceberg.mcat.s.t"
            ).collect()
        )
        assert rows == [
            (0, "n0"), (1, "n1"), (2, "X"), (3, "n3"), (4, "n4"),
            (5, "n5"), (99, "Y"),
        ]
        # MERGE loses a race -> surfaced, never silently retried
        _state.fail_next_commits = 1
        with pytest.raises(CommitConflictError):
            lakehouse_sql(
                spark,
                "MERGE INTO iceberg.mcat.s.t t USING __m_src s ON t.k = s.k "
                "WHEN MATCHED THEN DELETE",
            )
        _state.fail_next_commits = 0
    finally:
        rest_catalog._CATALOGS.pop("mcat", None)


def test_catalog_append_txn_watermark(spark, server):
    from gcs2postgres_spark.sources.iceberg_py import (
        last_txn_version_iceberg,
    )

    endpoint, _state = server
    cat = IcebergRestCatalog(endpoint)
    res = cat.create_table("ns", "tx", _kv(spark, 0, 0).schema)
    cat.append(spark, "ns", "tx", _kv(spark, 0, 3), txn=("app1", 7))
    loc = res["metadata"]["location"]
    # the exactly-once watermark rides the snapshot summary through the
    # catalog commit exactly as through the file path
    assert last_txn_version_iceberg(loc, "app1") == 7
    assert last_txn_version_iceberg(loc, "other") == -1


def test_catalog_optimize_compacts_through_catalog(spark, server):
    from gcs2postgres_spark.sources import rest_catalog
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    endpoint, state = server
    cat = IcebergRestCatalog(endpoint)
    register_catalog("ocat", cat)
    try:
        cat.create_table("ns", "o", _kv(spark, 0, 0).schema)
        cat.append(spark, "ns", "o", _kv(spark, 0, 20))
        cat.append(spark, "ns", "o", _kv(spark, 20, 40))
        cat.delete_where(spark, "ns", "o", "k % 10 = 0")
        before = cat.load_table("ns", "o")["metadata"]
        sid = lakehouse_sql(spark, "OPTIMIZE iceberg.ocat.ns.o")
        meta = cat.load_table("ns", "o")["metadata"]
        assert meta["current-snapshot-id"] == sid
        snap = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == sid
        )
        assert snap["summary"]["operation"] == "replace"
        assert len(meta["snapshots"]) == len(before["snapshots"]) + 1
        got = sorted(r["k"] for r in cat.read(spark, "ns", "o").collect())
        assert got == [k for k in range(40) if k % 10 != 0]
        # a racing compactor loses cleanly (replace never auto-rebases)
        state.fail_next_commits = 1
        with pytest.raises(CommitConflictError):
            cat.rewrite_data_files(spark, "ns", "o")
        state.fail_next_commits = 0
    finally:
        rest_catalog._CATALOGS.pop("ocat", None)


def test_commit_rejects_unknown_update_and_bad_requirement(spark, server):
    endpoint, _state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_table("ns", "u", _kv(spark, 0, 0).schema)
    # unknown update action: 400, surfaced as HTTPError (never dropped)
    with pytest.raises(urllib.error.HTTPError):
        cat.commit_table(
            "ns", "u", requirements=[],
            updates=[{"action": "no-such-action"}],
        )
    # set-properties via commit works and survives a reload
    cat.commit_table(
        "ns", "u", requirements=[],
        updates=[{"action": "set-properties", "updates": {"owner": "r17"}}],
    )
    meta = cat.load_table("ns", "u")["metadata"]
    assert meta["properties"]["owner"] == "r17"
    cat.commit_table(
        "ns", "u", requirements=[],
        updates=[{"action": "remove-properties", "removals": ["owner"]}],
    )
    assert "owner" not in cat.load_table("ns", "u")["metadata"]["properties"]


def test_stream_append_catalog_exactly_once(spark, server, tmp_path):
    """Streaming appends land THROUGH the catalog with the txn
    watermark read from the LoadTableResult: a restart from the same
    checkpoint (at-least-once redelivery) adds no rows and no
    snapshots."""
    from gcs2postgres_spark.streaming.cdc_apply import (
        stream_append_catalog,
    )

    endpoint, state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_table("ns", "st", _kv(spark, 0, 0).schema)
    stage = str(tmp_path / "stage")
    _kv(spark, 0, 30).repartition(3).write.mode("overwrite").parquet(stage)
    ckpt = str(tmp_path / "ckpt")
    schema = _kv(spark, 0, 0).schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = stream_append_catalog(stream, cat, "ns", "st", ckpt)
        q.processAllAvailable()
        q.stop()

    run_once()
    n_commits = state.commit_count
    meta1 = cat.load_table("ns", "st")["metadata"]
    got = sorted(r["k"] for r in cat.read(spark, "ns", "st").collect())
    assert got == list(range(30))
    # restart from the same checkpoint: watermark skips every batch
    run_once()
    meta2 = cat.load_table("ns", "st")["metadata"]
    assert state.commit_count == n_commits
    assert len(meta2["snapshots"]) == len(meta1["snapshots"])
    assert cat.read(spark, "ns", "st").count() == 30


def test_server_metadata_versions_advance(spark, server):
    endpoint, _state = server
    cat = IcebergRestCatalog(endpoint)
    cat.create_table("ns", "vv", _kv(spark, 0, 0).schema)
    cat.append(spark, "ns", "vv", _kv(spark, 0, 3))
    cat.append(spark, "ns", "vv", _kv(spark, 3, 6))
    mloc = cat.load_table("ns", "vv")["metadata-location"]
    assert os.path.basename(mloc)[:5] == "00003"  # create + 2 commits
    meta = json.loads(open(mloc).read())
    assert meta["current-snapshot-id"] == 2
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [1, 2]
