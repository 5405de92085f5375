"""In-process Iceberg REST catalog SERVER — a minimal, spec-conformant
implementation of the catalog side of the REST Catalog OpenAPI surface
(iceberg.apache.org/rest-catalog-spec) over a local warehouse
directory, in the same spirit as ``logstore.FakeObjectStore``: prove
the PROTOCOL through real HTTP against real on-disk tables, no network
dependency. Tests and registry queries drive the client
(``rest_catalog.IcebergRestCatalog``) against this server; a production
deployment swaps the endpoint for a real catalog (Polaris, Lakekeeper,
Nessie, Tabular) — the client speaks only the public spec.

Server responsibilities implemented (the commit authority):

- ``GET /v1/config`` (prefix advertisement), namespace + table listing
  and loading, ``POST .../register`` (RegisterTableRequest).
- ``POST /v1/oauth/tokens``: OAuth2 client-credentials — issues bearer
  tokens and 401s unauthenticated requests when credentials are
  configured.
- ``POST .../namespaces`` / ``DELETE .../namespaces/{ns}`` (409 when
  non-empty — the spec's NamespaceNotEmpty).
- ``POST .../tables`` (CreateTableRequest): mints the table — assigns
  a location under the warehouse when none is requested, writes the
  initial metadata JSON, records the pointer.
- ``POST .../tables/{t}`` (CommitTableRequest): validates every
  ``requirement`` against the CURRENT metadata under a per-table lock
  (assert-table-uuid, assert-ref-snapshot-id), 409s on any mismatch
  (the optimistic-concurrency loss the client retries on), applies the
  ``updates`` (add-snapshot, set-snapshot-ref, set-properties,
  remove-properties), and writes the new metadata file with the real
  catalogs' ``NNNNN-<uuid>.metadata.json`` naming — which
  ``iceberg_py.latest_metadata_file`` also resolves, so path-addressed
  readers stay coherent with the catalog pointer.
- ``DELETE .../tables/{t}`` (+ purgeRequested), ``POST /tables/rename``.

Unknown update actions are REJECTED with 400 (never silently dropped —
a client asking for a schema evolution this server can't apply must
hear about it).
"""

from __future__ import annotations

import json
import os
import threading
import urllib.parse
import uuid as _uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _CatalogState:
    """Authoritative state: namespaces, table pointers, per-table locks."""

    def __init__(self, warehouse: str, prefix: str = "main",
                 client_id: str | None = None,
                 client_secret: str | None = None) -> None:
        self.warehouse = warehouse
        self.prefix = prefix
        self.client_id = client_id
        self.client_secret = client_secret
        self.namespaces: dict[tuple, dict] = {}
        # (ns tuple, name) -> current metadata-location
        self.tables: dict[tuple, str] = {}
        self.tokens: set[str] = set()
        self.lock = threading.RLock()
        self.commit_count = 0
        # test hook: respond 409 to the next N commits (simulated lost
        # races — exercises the client's refresh-and-retry path even
        # without a real interleaved writer)
        self.fail_next_commits = 0

    # ------------------------------------------------------------ metadata

    def load_meta(self, key: tuple) -> tuple[dict, str]:
        mloc = self.tables[key]
        with open(mloc) as f:
            return json.load(f), mloc

    def write_meta(self, key: tuple, meta: dict, prev_loc: str | None) -> str:
        loc = meta["location"]
        mdir = os.path.join(loc, "metadata")
        os.makedirs(mdir, exist_ok=True)
        v = 0
        if prev_loc:
            base = os.path.basename(prev_loc)
            head = base.split("-", 1)[0].lstrip("v")
            try:
                v = int(head)
            except ValueError:
                v = 0
        new = os.path.join(
            mdir, f"{v + 1:05d}-{_uuid.uuid4().hex[:12]}.metadata.json"
        )
        with open(new, "x") as f:
            json.dump(meta, f)
        self.tables[key] = new
        return new


def _check_requirement(meta: dict, r: dict) -> str | None:
    """None when satisfied, else a human-readable failure."""
    t = r.get("type")
    if t == "assert-table-uuid":
        if meta.get("table-uuid") != r.get("uuid"):
            return f"table-uuid is {meta.get('table-uuid')!r}"
        return None
    if t == "assert-ref-snapshot-id":
        ref = r.get("ref", "main")
        cur = None
        bref = (meta.get("refs") or {}).get(ref)
        if bref is not None:
            cur = int(bref["snapshot-id"])
        elif ref == "main":
            cur = meta.get("current-snapshot-id")
            if cur == -1:
                cur = None
        want = r.get("snapshot-id")
        if cur != want:
            return f"ref {ref!r} is at {cur}, requirement asserts {want}"
        return None
    if t == "assert-create":
        # table existence was already checked at route level
        return None
    return f"unsupported requirement type {t!r}"


def _apply_update(meta: dict, u: dict) -> None:
    a = u.get("action")
    if a == "add-snapshot":
        snap = u["snapshot"]
        meta["snapshots"] = list(meta.get("snapshots") or []) + [snap]
        meta["last-sequence-number"] = max(
            int(meta.get("last-sequence-number", 0)),
            int(snap.get("sequence-number", 0)),
        )
        meta["last-updated-ms"] = int(snap.get("timestamp-ms", 0))
        if int(meta.get("format-version", 1)) >= 3:
            # v3 row lineage: advance the row-id watermark past this
            # snapshot's block (added-records rides the summary, as
            # real writers stamp it)
            first = snap.get("first-row-id")
            added = int((snap.get("summary") or {}).get("added-records", 0))
            if first is not None:
                meta["next-row-id"] = int(first) + added
        return
    if a == "set-snapshot-ref":
        name = u["ref-name"]
        refs = dict(meta.get("refs") or {})
        refs[name] = {
            "snapshot-id": int(u["snapshot-id"]),
            "type": u.get("type", "branch"),
        }
        meta["refs"] = refs
        if name == "main":
            meta["current-snapshot-id"] = int(u["snapshot-id"])
        return
    if a == "set-properties":
        props = dict(meta.get("properties") or {})
        props.update(u.get("updates") or {})
        meta["properties"] = props
        return
    if a == "remove-properties":
        props = dict(meta.get("properties") or {})
        for k in u.get("removals") or []:
            props.pop(k, None)
        meta["properties"] = props
        return
    raise ValueError(f"unsupported update action {a!r}")


class _Handler(BaseHTTPRequestHandler):
    state: _CatalogState  # set by start_catalog_server

    def log_message(self, *a):  # quiet
        pass

    # ------------------------------------------------------------- helpers

    def _json(self, obj, code: int = 200) -> None:
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _err(self, code: int, msg: str) -> None:
        self._json({"error": {"message": msg, "code": code}}, code)

    def _body(self) -> bytes:
        return self.rfile.read(int(self.headers.get("Content-Length", 0)))

    def _authed(self) -> bool:
        st = self.state
        if st.client_id is None:
            return True
        auth = self.headers.get("Authorization", "")
        return auth.startswith("Bearer ") and auth[7:] in st.tokens

    @staticmethod
    def _ns_of(seg: str) -> tuple:
        return tuple(urllib.parse.unquote(seg).split("\x1f"))

    def _route(self):
        parsed = urllib.parse.urlparse(self.path)
        parts = [p for p in parsed.path.split("/") if p]
        qs = urllib.parse.parse_qs(parsed.query)
        return parts, qs

    # --------------------------------------------------------------- verbs

    def do_GET(self):
        st = self.state
        parts, _qs = self._route()
        if parts == ["v1", "config"]:
            self._json({"defaults": {"prefix": st.prefix}, "overrides": {}})
            return
        if not self._authed():
            self._err(401, "missing or invalid bearer token")
            return
        if parts[:2] != ["v1", st.prefix]:
            self._err(404, "unknown prefix")
            return
        rest = parts[2:]
        if rest == ["namespaces"]:
            self._json(
                {"namespaces": sorted(list(n) for n in st.namespaces)}
            )
            return
        if len(rest) == 2 and rest[0] == "namespaces":
            ns = self._ns_of(rest[1])
            if ns not in st.namespaces:
                self._err(404, "no such namespace")
                return
            self._json(
                {"namespace": list(ns), "properties": st.namespaces[ns]}
            )
            return
        if len(rest) == 3 and rest[0] == "namespaces" and rest[2] == "tables":
            ns = self._ns_of(rest[1])
            self._json(
                {
                    "identifiers": [
                        {"namespace": list(k[0]), "name": k[1]}
                        for k in sorted(st.tables)
                        if k[0] == ns
                    ]
                }
            )
            return
        if len(rest) == 4 and rest[0] == "namespaces" and rest[2] == "tables":
            key = (self._ns_of(rest[1]), urllib.parse.unquote(rest[3]))
            if key not in st.tables:
                self._err(404, "no such table")
                return
            meta, mloc = st.load_meta(key)
            self._json(
                {"metadata-location": mloc, "metadata": meta, "config": {}}
            )
            return
        self._err(404, "bad route")

    def do_POST(self):
        st = self.state
        parts, _qs = self._route()
        if parts == ["v1", "oauth", "tokens"]:
            form = urllib.parse.parse_qs(self._body().decode())
            if (
                form.get("grant_type") != ["client_credentials"]
                or st.client_id is None
                or form.get("client_id") != [st.client_id]
                or form.get("client_secret") != [st.client_secret]
            ):
                self._err(401, "invalid client credentials")
                return
            tok = _uuid.uuid4().hex
            st.tokens.add(tok)
            self._json(
                {
                    "access_token": tok,
                    "token_type": "bearer",
                    "expires_in": 3600,
                }
            )
            return
        if not self._authed():
            self._err(401, "missing or invalid bearer token")
            return
        if parts[:2] != ["v1", st.prefix]:
            self._err(404, "unknown prefix")
            return
        rest = parts[2:]
        body = json.loads(self._body() or b"{}")
        if rest == ["namespaces"]:
            ns = tuple(body["namespace"])
            with st.lock:
                if ns in st.namespaces:
                    self._err(409, "namespace exists")
                    return
                st.namespaces[ns] = dict(body.get("properties") or {})
            self._json(
                {"namespace": list(ns), "properties": st.namespaces[ns]}
            )
            return
        if len(rest) == 3 and rest[0] == "namespaces" and rest[2] == "register":
            ns = self._ns_of(rest[1])
            key = (ns, body["name"])
            with st.lock:
                if key in st.tables:
                    self._err(409, "table exists")
                    return
                st.namespaces.setdefault(ns, {})
                st.tables[key] = body["metadata-location"]
            meta, mloc = st.load_meta(key)
            self._json(
                {"metadata-location": mloc, "metadata": meta, "config": {}}
            )
            return
        if len(rest) == 3 and rest[0] == "namespaces" and rest[2] == "tables":
            # CreateTableRequest: the catalog mints the table
            from gcs2postgres_spark.sources.iceberg_py import (
                new_table_metadata_json,
            )

            ns = self._ns_of(rest[1])
            key = (ns, body["name"])
            loc = body.get("location") or os.path.join(
                st.warehouse, *ns, body["name"]
            )
            spec_fields = (body.get("partition-spec") or {}).get("fields") or []
            with st.lock:
                if key in st.tables:
                    self._err(409, "table exists")
                    return
                st.namespaces.setdefault(ns, {})
                meta = new_table_metadata_json(
                    body["schema"],
                    os.path.abspath(loc),
                    spec_fields,
                    table_uuid=str(_uuid.uuid4()),
                    properties=dict(body.get("properties") or {}),
                )
                mloc = st.write_meta(key, meta, None)
            self._json(
                {"metadata-location": mloc, "metadata": meta, "config": {}}
            )
            return
        if rest == ["tables", "rename"]:
            src = (
                tuple(body["source"]["namespace"]), body["source"]["name"]
            )
            dst = (
                tuple(body["destination"]["namespace"]),
                body["destination"]["name"],
            )
            with st.lock:
                if src not in st.tables:
                    self._err(404, "no such table")
                    return
                if dst in st.tables:
                    self._err(409, "destination exists")
                    return
                st.namespaces.setdefault(dst[0], {})
                st.tables[dst] = st.tables.pop(src)
            self._json({})
            return
        if len(rest) == 4 and rest[0] == "namespaces" and rest[2] == "tables":
            # CommitTableRequest — the optimistic-concurrency core
            key = (self._ns_of(rest[1]), urllib.parse.unquote(rest[3]))
            with st.lock:
                if key not in st.tables:
                    self._err(404, "no such table")
                    return
                if st.fail_next_commits > 0:
                    st.fail_next_commits -= 1
                    self._err(409, "simulated concurrent commit")
                    return
                meta, prev_loc = st.load_meta(key)
                for r in body.get("requirements") or []:
                    fail = _check_requirement(meta, r)
                    if fail is not None:
                        self._err(409, f"requirement failed: {fail}")
                        return
                try:
                    for u in body.get("updates") or []:
                        _apply_update(meta, u)
                except ValueError as e:
                    self._err(400, str(e))
                    return
                mloc = st.write_meta(key, meta, prev_loc)
                st.commit_count += 1
            self._json({"metadata-location": mloc, "metadata": meta})
            return
        self._err(404, "bad route")

    def do_DELETE(self):
        st = self.state
        parts, qs = self._route()
        if not self._authed():
            self._err(401, "missing or invalid bearer token")
            return
        if parts[:2] != ["v1", st.prefix]:
            self._err(404, "unknown prefix")
            return
        rest = parts[2:]
        if len(rest) == 2 and rest[0] == "namespaces":
            ns = self._ns_of(rest[1])
            with st.lock:
                if ns not in st.namespaces:
                    self._err(404, "no such namespace")
                    return
                if any(k[0] == ns for k in st.tables):
                    self._err(409, "namespace not empty")
                    return
                del st.namespaces[ns]
            self._no_content()
            return
        if len(rest) == 4 and rest[0] == "namespaces" and rest[2] == "tables":
            key = (self._ns_of(rest[1]), urllib.parse.unquote(rest[3]))
            with st.lock:
                if key not in st.tables:
                    self._err(404, "no such table")
                    return
                meta, _loc = st.load_meta(key)
                del st.tables[key]
            if qs.get("purgeRequested") == ["true"]:
                import shutil

                shutil.rmtree(meta.get("location", ""), ignore_errors=True)
            self._no_content()
            return
        self._err(404, "bad route")

    def _no_content(self) -> None:
        self.send_response(204)
        self.send_header("Content-Length", "0")
        self.end_headers()


def start_catalog_server(
    warehouse: str,
    prefix: str = "main",
    client_id: str | None = None,
    client_secret: str | None = None,
) -> tuple[str, ThreadingHTTPServer, _CatalogState]:
    """Start the in-process catalog on an ephemeral port. Returns
    (endpoint URL, server — call ``.shutdown()`` when done, state —
    inspect/seed ``namespaces``/``tables``/``fail_next_commits``)."""
    state = _CatalogState(warehouse, prefix, client_id, client_secret)

    class Bound(_Handler):
        pass

    Bound.state = state
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Bound)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return f"http://127.0.0.1:{srv.server_address[1]}", srv, state
