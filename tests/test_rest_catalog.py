"""Iceberg REST catalog client (r16): tables resolve BY NAME through
the public REST catalog API surface instead of by path — driven against
an in-process fake server (the repo's FakeObjectStore pattern: prove
the PROTOCOL through real HTTP, no network). The LoadTableResult's
``metadata`` is consumed directly (no version-hint walk) — the catalog
is the commit pointer, per the spec."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from gcs2postgres_spark.sources.iceberg_py import (
    append_iceberg_v2,
    create_iceberg_v2_table,
    latest_metadata_file,
    read_iceberg_py,
)
from gcs2postgres_spark.sources.rest_catalog import (
    IcebergRestCatalog,
    get_catalog,
    register_catalog,
)


class _FakeRest(BaseHTTPRequestHandler):
    """Serves /v1/config and the namespaces/tables read surface from a
    {(namespace, table): table_path} dict; table metadata is read from
    the real on-disk table at request time (so re-syncs are visible —
    catalog-as-commit-pointer semantics)."""

    tables: dict[tuple[str, str], str] = {}
    prefix = "main"
    seen_auth: list[str] = []

    def log_message(self, *a):
        pass

    def _json(self, obj, code=200):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        self.seen_auth.append(self.headers.get("Authorization", ""))
        parsed = urllib.parse.urlparse(self.path)
        qs = urllib.parse.parse_qs(parsed.query)
        parts = [urllib.parse.unquote(p) for p in parsed.path.split("/") if p]
        if parts == ["v1", "config"]:
            self._json({"defaults": {"prefix": self.prefix}, "overrides": {}})
            return
        if parts[:2] != ["v1", self.prefix]:
            self._json({"error": "unknown prefix"}, 404)
            return
        rest = parts[2:]
        if rest == ["namespaces"]:
            self._json(
                {"namespaces": sorted({(k[0],) for k in self.tables})}
            )
            return
        if len(rest) == 3 and rest[0] == "namespaces" and rest[2] == "tables":
            # PAGED at one identifier per page (spec next-page-token) —
            # a client reading only the first page truncates the list
            ns = rest[1]
            idents = [
                {"namespace": [n], "name": t}
                for (n, t) in sorted(self.tables)
                if n == ns
            ]
            start = int(qs.get("pageToken", ["0"])[0])
            out = {"identifiers": idents[start : start + 1]}
            if start + 1 < len(idents):
                out["next-page-token"] = str(start + 1)
            self._json(out)
            return
        if len(rest) == 4 and rest[0] == "namespaces" and rest[2] == "tables":
            key = (rest[1], rest[3])
            path = self.tables.get(key)
            if path is None:
                self._json({"error": "no such table"}, 404)
                return
            # entries are either a table DIR (resolve its head) or a
            # REGISTERED metadata-location (serve it verbatim)
            mloc = path if path.endswith(".metadata.json") else (
                latest_metadata_file(path)
            )
            self._json(
                {
                    "metadata-location": mloc,
                    "metadata": json.loads(open(mloc).read()),
                    "config": {},
                }
            )
            return
        self._json({"error": "bad route"}, 404)

    def do_POST(self):
        parts = [urllib.parse.unquote(p) for p in self.path.split("/") if p]
        body = json.loads(
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            or b"{}"
        )
        if (
            len(parts) == 5
            and parts[:2] == ["v1", self.prefix]
            and parts[2] == "namespaces"
            and parts[4] == "register"
        ):
            key = (parts[3], body["name"])
            if key in self.tables:
                self._json({"error": "already exists"}, 409)
                return
            self.tables[key] = body["metadata-location"]
            self._json(
                {
                    "metadata-location": body["metadata-location"],
                    "metadata": json.loads(
                        open(body["metadata-location"]).read()
                    ),
                    "config": {},
                }
            )
            return
        self._json({"error": "bad route"}, 404)


@pytest.fixture
def fake_rest():
    _FakeRest.tables = {}
    _FakeRest.seen_auth = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeRest)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _FakeRest
    srv.shutdown()


def _fixture_table(spark, tmp_path, name="t"):
    t = str(tmp_path / name)
    df = spark.range(0, 12).selectExpr("id AS k", "id * 3 AS v")
    create_iceberg_v2_table(df.schema, t)
    append_iceberg_v2(spark, t, df, snapshot_ts_ms=1_700_000_000_000)
    return t


def test_rest_catalog_list_and_load(spark, tmp_path, fake_rest):
    endpoint, state = fake_rest
    t = _fixture_table(spark, tmp_path)
    state.tables[("analytics", "events")] = t
    cat = IcebergRestCatalog(endpoint, token_provider=lambda: "tok-1")
    assert cat.prefix == "main"  # discovered via /v1/config
    assert cat.list_namespaces() == [("analytics",)]
    assert cat.list_tables("analytics") == ["events"]
    result = cat.load_table("analytics", "events")
    assert result["metadata"]["location"]
    assert any(a == "Bearer tok-1" for a in state.seen_auth)
    with pytest.raises(FileNotFoundError):
        cat.load_table("analytics", "nope")


def test_rest_catalog_read_matches_direct(spark, tmp_path, fake_rest):
    endpoint, state = fake_rest
    t = _fixture_table(spark, tmp_path)
    state.tables[("analytics", "events")] = t
    cat = IcebergRestCatalog(endpoint)
    got = sorted(tuple(r) for r in cat.read(spark, "analytics", "events").collect())
    ref = sorted(tuple(r) for r in read_iceberg_py(spark, t).collect())
    assert got == ref and len(got) == 12
    # catalog-as-commit-pointer: a new append is visible on next load
    append_iceberg_v2(
        spark, t,
        spark.range(100, 103).selectExpr("id AS k", "id * 3 AS v"),
        snapshot_ts_ms=1_700_000_001_000,
    )
    assert cat.read(spark, "analytics", "events").count() == 15
    # time travel through the catalog (snapshot ids ride the metadata)
    first_sid = min(
        s["snapshot-id"]
        for s in cat.load_table("analytics", "events")["metadata"]["snapshots"]
    )
    assert cat.read(
        spark, "analytics", "events", snapshot_id=first_sid
    ).count() == 12


def test_facade_accepts_catalog_identifiers(spark, tmp_path, fake_rest):
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    endpoint, state = fake_rest
    t = _fixture_table(spark, tmp_path)
    state.tables[("analytics", "events")] = t
    register_catalog("main", IcebergRestCatalog(endpoint))
    assert get_catalog("main") is not None
    out = lakehouse_sql(
        spark,
        "SELECT count(*) AS n, sum(v) AS sv "
        "FROM iceberg.main.analytics.events WHERE k >= 6",
    ).collect()[0]
    assert (out["n"], out["sv"]) == (6, sum(i * 3 for i in range(6, 12)))
    # joins between a catalog table and a path table still plan
    out2 = lakehouse_sql(
        spark,
        "SELECT count(*) AS n FROM iceberg.main.analytics.events a "
        f"JOIN iceberg.`{t}` b ON a.k = b.k",
    ).collect()[0]
    assert out2["n"] == 12
    # r17 (ADVICE): an UNREGISTERED catalog name falls through to Spark
    # verbatim (no facade rewrite, no mid-rewrite raise) — Spark reports
    # its own resolution error for the untouched identifier
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        lakehouse_sql(
            spark, "SELECT * FROM iceberg.nocat.analytics.events"
        )


def test_facade_show_tables_and_namespaces(spark, tmp_path, fake_rest):
    from gcs2postgres_spark.sources.lakehouse_sql import lakehouse_sql

    endpoint, state = fake_rest
    t = _fixture_table(spark, tmp_path, "t_show")
    state.tables[("analytics", "events")] = t
    state.tables[("analytics", "users")] = t
    register_catalog("main", IcebergRestCatalog(endpoint))
    rows = lakehouse_sql(spark, "SHOW TABLES IN iceberg.main.analytics").collect()
    assert [(r["namespace"], r["table_name"]) for r in rows] == [
        ("analytics", "events"), ("analytics", "users"),
    ]
    ns = lakehouse_sql(spark, "SHOW NAMESPACES IN iceberg.main").collect()
    assert [r["namespace"] for r in ns] == ["analytics"]


def test_register_table_then_read_by_name(spark, tmp_path, fake_rest):
    """RegisterTableRequest: an existing path-addressed table onboards
    into the catalog by its metadata location (no data movement) and is
    then readable BY NAME; a second register of the same name 409s."""
    endpoint, state = fake_rest
    t = _fixture_table(spark, tmp_path, "t_reg")
    cat = IcebergRestCatalog(endpoint)
    result = cat.register_table(
        "analytics", "registered", latest_metadata_file(t)
    )
    assert result["metadata"]["location"]
    assert cat.list_tables("analytics") == ["registered"]
    got = sorted(tuple(r) for r in
                 cat.read(spark, "analytics", "registered").collect())
    ref = sorted(tuple(r) for r in read_iceberg_py(spark, t).collect())
    assert got == ref and len(got) == 12
    with pytest.raises(FileExistsError):
        cat.register_table("analytics", "registered", latest_metadata_file(t))
