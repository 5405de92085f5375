"""Jar-less Iceberg REST catalog client — the READ path of the public
REST Catalog OpenAPI surface (iceberg.apache.org/rest-catalog-spec:
``GET /v1/config``, ``/v1/{prefix}/namespaces``,
``/v1/{prefix}/namespaces/{ns}/tables``,
``/v1/{prefix}/namespaces/{ns}/tables/{table}``).

Why: every other table in this repo is PATH-addressed
(``iceberg.`/p```), which matches the HadoopTables layout but not how
real Iceberg deployments resolve tables — they go through a catalog,
and the REST catalog is the spec's interoperable one. This client lets
tables resolve BY NAME: ``load_table`` returns the LoadTableResult
whose ``metadata`` IS the table's current metadata JSON, so the read
path (read_iceberg_py ``_preloaded_meta``) skips the version-hint walk
entirely — the catalog is the commit pointer, exactly the contract the
spec defines (reference src/db/db.go:22-43 is the same shape: an
external-catalog registration loop).

Implementation mirrors the repo's LogStore HTTP pattern: stdlib urllib,
bounded timeouts, ``token_provider`` for a bearer token per request, an
in-process fake server in tests (no network in CI). Multi-level
namespaces join with the spec's 0x1F unit separator in URLs.

Scope honesty: the READ surface (config/list/load) plus
``register_table`` (the spec's RegisterTableRequest — onboarding an
EXISTING table by its metadata location, no data movement; the twin of
``add_files``/``CONVERT TO DELTA`` at the catalog layer). Incremental
catalog COMMITS (``POST .../tables/{t}`` with requirements/updates)
stay with the file-layout committers.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

_HTTP_TIMEOUT_S = 30

# facade registry: name -> client, resolved by lakehouse_sql's
# ``iceberg.<catalog>.<namespace>.<table>`` identifiers
_CATALOGS: dict[str, "IcebergRestCatalog"] = {}


def register_catalog(name: str, client: "IcebergRestCatalog") -> None:
    _CATALOGS[name.lower()] = client


def has_catalog(name: str) -> bool:
    """True iff a catalog is registered under ``name`` — lets the SQL
    facade fall through on iceberg.<w>.<w>.<w> text that does NOT name
    a registered catalog instead of raising mid-rewrite."""
    return name.lower() in _CATALOGS


def get_catalog(name: str) -> "IcebergRestCatalog":
    c = _CATALOGS.get(name.lower())
    if c is None:
        raise ValueError(
            f"no REST catalog registered as {name!r} (register one with "
            "gcs2postgres_spark.sources.rest_catalog.register_catalog)"
        )
    return c


class IcebergRestCatalog:
    """Client for one REST catalog endpoint. ``prefix`` defaults to the
    value the server's ``/v1/config`` advertises (the spec's
    ``overrides``/``defaults`` merge), falling back to none."""

    def __init__(self, endpoint: str, token_provider=None,
                 prefix: str | None = None) -> None:
        self.endpoint = endpoint.rstrip("/")
        self._token_provider = token_provider or (lambda: "")
        if prefix is None:
            try:
                cfg = self.config()
                prefix = {
                    **(cfg.get("defaults") or {}),
                    **(cfg.get("overrides") or {}),
                }.get("prefix")
            except (urllib.error.URLError, OSError, ValueError):
                prefix = None
        self.prefix = (prefix or "").strip("/")

    # ----------------------------------------------------------- transport

    def _call(self, path: str, body: dict | None = None) -> dict:
        data = None if body is None else json.dumps(body).encode("utf-8")
        req = urllib.request.Request(
            f"{self.endpoint}{path}", data=data,
            method="GET" if data is None else "POST",
            headers={} if data is None else {"Content-Type": "application/json"},
        )
        token = self._token_provider()
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        try:
            with urllib.request.urlopen(req, timeout=_HTTP_TIMEOUT_S) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise FileNotFoundError(
                    f"REST catalog: {path!r} not found"
                ) from None
            if e.code == 409:
                raise FileExistsError(
                    f"REST catalog: {path!r} already exists"
                ) from None
            raise

    def _get(self, path: str) -> dict:
        return self._call(path)

    def _base(self) -> str:
        return f"/v1/{self.prefix}" if self.prefix else "/v1"

    @staticmethod
    def _ns_path(ns: str | tuple | list) -> str:
        # multi-level namespaces join with the unit separator (spec:
        # "multipart namespace parts are separated by %1F")
        parts = [ns] if isinstance(ns, str) else list(ns)
        return urllib.parse.quote("\x1f".join(parts), safe="")

    # ------------------------------------------------------------- surface

    def config(self) -> dict:
        return self._get("/v1/config")

    def _paged(self, path: str, key: str) -> list:
        # the spec pages list endpoints via next-page-token; a client
        # that reads only the first page silently truncates a large
        # catalog's listing
        out: list = []
        token: str | None = None
        while True:
            q = (
                f"?pageToken={urllib.parse.quote(token, safe='')}"
                if token else ""
            )
            r = self._get(path + q)
            out.extend(r.get(key) or [])
            token = r.get("next-page-token")
            if not token:
                return out

    def list_namespaces(self) -> list[tuple[str, ...]]:
        return [
            tuple(ns)
            for ns in self._paged(f"{self._base()}/namespaces", "namespaces")
        ]

    def list_tables(self, ns: str | tuple | list) -> list[str]:
        return [
            i["name"]
            for i in self._paged(
                f"{self._base()}/namespaces/{self._ns_path(ns)}/tables",
                "identifiers",
            )
        ]

    def load_table(self, ns: str | tuple | list, name: str) -> dict:
        """The spec's LoadTableResult: {"metadata-location", "metadata",
        "config"} — ``metadata`` is the table's full current metadata
        JSON (the catalog's commit pointer)."""
        return self._get(
            f"{self._base()}/namespaces/{self._ns_path(ns)}/tables/"
            f"{urllib.parse.quote(name, safe='')}"
        )

    def register_table(
        self, ns: str | tuple | list, name: str, metadata_location: str
    ) -> dict:
        """Onboard an EXISTING Iceberg table into the catalog by its
        current metadata file (spec RegisterTableRequest,
        ``POST /v1/{prefix}/namespaces/{ns}/register``) — no data or
        metadata movement; the catalog records the pointer and becomes
        the commit authority from then on. 409 -> FileExistsError
        (the name is taken)."""
        return self._call(
            f"{self._base()}/namespaces/{self._ns_path(ns)}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def read(self, spark, ns: str | tuple | list, name: str, **read_kwargs):
        """Resolve ``ns.name`` through the catalog and return its
        DataFrame via the jar-less scan — metadata comes from the
        LoadTableResult (no version-hint walk; the catalog IS the
        commit pointer). ``read_kwargs`` pass through to
        ``read_iceberg_py`` (snapshot_id / as_of_ms / ref /
        partition_filter / stats_filter)."""
        from gcs2postgres_spark.sources.iceberg_py import read_iceberg_py

        result = self.load_table(ns, name)
        meta = result.get("metadata")
        if not meta:
            loc = result.get("metadata-location")
            if not loc:
                raise ValueError(
                    "LoadTableResult carries neither metadata nor "
                    "metadata-location"
                )
            from gcs2postgres_spark.sources import fsio

            meta = json.loads(fsio.read_text(loc))
        table_path = meta.get("location")
        if not table_path:
            raise ValueError("table metadata has no location")
        return read_iceberg_py(
            spark, table_path, _preloaded_meta=meta, **read_kwargs
        )
