"""Config loading + secret resolution (parity layer, OP-11/OP-12).

Same YAML shape as the reference's config.yaml (reference
src/utils/utils.go:18-39: postgres{host,port,user,database,
secret_name}, gcs{bucket_name,concurrent_jobs,dataset,files[]},
bq{dataset,tables[]}) so an existing config ports unchanged. The
reference's duplicate dead loader (src/config/config.go:42-53) is
intentionally not reproduced.

Secret resolution (reference src/utils/utils.go:70-87 fetches the
Postgres password from Google Secret Manager) is pluggable: an env
var ``SECRET_<name>`` or a file under ``secrets_dir`` — network secret
managers slot in behind the same one-function seam.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

try:
    import yaml
except ImportError:  # pragma: no cover - pyyaml is in the base image
    yaml = None


@dataclass
class PostgresConfig:
    host: str = "localhost"
    port: int = 5432
    user: str = "postgres"
    database: str = "postgres"
    secret_name: str = ""
    # reference utils.go:24 parses sslmode into the pgx conn string
    # (utils.go:91); pgJDBC accepts the same parameter name
    sslmode: str = ""

    def jdbc_url(self) -> str:
        base = f"jdbc:postgresql://{self.host}:{self.port}/{self.database}"
        return f"{base}?sslmode={self.sslmode}" if self.sslmode else base


@dataclass
class FileSpec:
    name: str  # file path (reference: gcs.files[].name)
    table: str  # target table (reference: gcs.files[].table)


@dataclass
class TableSpec:
    name: str  # source table name (reference: bq.tables[].name)
    table: str  # target table


@dataclass
class GCSConfig:
    bucket_name: str = ""
    project_id: str = ""  # reference utils.go GCS ProjectID
    concurrent_jobs: int = 1
    dataset: str = ""
    files: list[FileSpec] = field(default_factory=list)


@dataclass
class BQConfig:
    dataset: str = ""
    project_id: str = ""  # reference utils.go BQ ProjectID (parentProject)
    tables: list[TableSpec] = field(default_factory=list)


@dataclass
class Config:
    postgres: PostgresConfig = field(default_factory=PostgresConfig)
    gcs: GCSConfig = field(default_factory=GCSConfig)
    bq: BQConfig = field(default_factory=BQConfig)


def load_config(path: str) -> Config:
    """YAML → Config (reference LoadConfig, src/utils/utils.go:52-67)."""
    if yaml is None:
        raise RuntimeError("pyyaml not available")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    pg = raw.get("postgres", {}) or {}
    gcs = raw.get("gcs", {}) or {}
    bq = raw.get("bq", {}) or {}
    return Config(
        postgres=PostgresConfig(
            host=pg.get("host", "localhost"),
            port=int(pg.get("port", 5432)),
            user=pg.get("user", "postgres"),
            database=pg.get("database", pg.get("dbname", "postgres")),
            secret_name=pg.get("secret_name", ""),
            sslmode=pg.get("sslmode", ""),
        ),
        gcs=GCSConfig(
            bucket_name=gcs.get("bucket_name", ""),
            project_id=gcs.get("project_id", ""),
            concurrent_jobs=int(gcs.get("concurrent_jobs", 1)),
            dataset=gcs.get("dataset", ""),
            files=[FileSpec(f["name"], f["table"]) for f in gcs.get("files", []) or []],
        ),
        bq=BQConfig(
            dataset=bq.get("dataset", ""),
            project_id=bq.get("project_id", ""),
            tables=[TableSpec(t["name"], t["table"]) for t in bq.get("tables", []) or []],
        ),
    )


def gsm_resource_name(secret_name: str, project_id: str | None = None) -> str:
    """Canonical Secret Manager version resource for a config-level
    secret name. The reference passes the full resource path in
    config.yaml's ``secret_name`` and accesses it directly (reference
    src/utils/utils.go:70-87, AccessSecretVersion); a bare name is
    expanded to ``projects/{project}/secrets/{name}/versions/latest``
    the way the GSM docs specify."""
    if secret_name.startswith("projects/"):
        return (
            secret_name
            if "/versions/" in secret_name
            else secret_name.rstrip("/") + "/versions/latest"
        )
    if not project_id:
        raise ValueError(
            f"bare secret name {secret_name!r} needs project_id to build "
            "a Secret Manager resource path"
        )
    return f"projects/{project_id}/secrets/{secret_name}/versions/latest"


def fetch_secret_gsm(
    secret_name: str,
    project_id: str | None = None,
    client=None,
) -> str:
    """Google Secret Manager backend (reference FetchSecret,
    src/utils/utils.go:70-87: AccessSecretVersion → payload.data).
    ``client`` is the injection seam for tests; by default the
    google-cloud-secret-manager package is imported lazily and a clear
    error names it when absent (this sandbox is offline)."""
    name = gsm_resource_name(secret_name, project_id)
    if client is None:
        try:
            from google.cloud import secretmanager  # type: ignore
        except ImportError as e:  # pragma: no cover - not in this image
            raise RuntimeError(
                "Secret Manager resolution needs the "
                "google-cloud-secret-manager package (pip install "
                "google-cloud-secret-manager); not bundled in this "
                "environment — use the env/file resolver or pass a client"
            ) from e
        client = secretmanager.SecretManagerServiceClient()
    resp = client.access_secret_version(name=name)
    return resp.payload.data.decode("utf-8")


def fetch_secret(
    secret_name: str,
    secrets_dir: str | None = None,
    project_id: str | None = None,
    gsm_client=None,
) -> str:
    """Pluggable secret fetch (reference FetchSecret,
    src/utils/utils.go:70-87). Resolution order: env var
    ``SECRET_<NAME>`` → file ``{secrets_dir}/{name}`` → Google Secret
    Manager (resource-path names, or bare names with ``project_id``)
    → error. The GSM hop runs only when the name plausibly targets it
    (resource path, or an explicit project/client), so offline env/file
    deployments never import the cloud client."""
    env_key = "SECRET_" + secret_name.replace("-", "_").replace("/", "_").upper()
    if env_key in os.environ:
        return os.environ[env_key]
    if secrets_dir:
        p = os.path.join(secrets_dir, secret_name)
        if os.path.exists(p):
            with open(p) as f:
                return f.read().strip()
    if gsm_client is not None or project_id or secret_name.startswith("projects/"):
        return fetch_secret_gsm(secret_name, project_id, client=gsm_client)
    raise KeyError(f"secret {secret_name!r} not found (env {env_key} or file)")
