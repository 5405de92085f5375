"""GCS + BigQuery production connector configuration (parity layer,
OP-1/OP-2 deployment surface).

The reference's core identity is reading ``gs://`` objects and
BigQuery-native tables (reference src/db/db.go:22-43 registers
``gs://{bucket}/{file}`` external tables via ``SourceURIs`` at :28;
:95-147 scans native tables). In this repo every URI path already
routes through the Hadoop FileSystem seam (sources/fsio.py) and
``format="bigquery"`` through read_source — but a real deployment also
needs the CONNECTOR WIRING: jar coordinates and auth/project
properties for ``gcs-connector-hadoop3`` and
``spark-bigquery-connector``. This module assembles exactly that
config, from public Maven coordinates and the connectors' documented
property names, as plain dicts a caller applies to a SparkSession
builder (or spark-submit --conf). Everything here is offline-testable:
it builds configuration, it does not touch the network.

Apply at session build time::

    builder = SparkSession.builder.appName(...)
    for k, v in gcs_connector_conf(keyfile="/secrets/sa.json",
                                   project_id="my-proj").items():
        builder = builder.config(k, v)
"""

from __future__ import annotations

# Public Maven coordinates (Google's hadoop-connectors releases).
GCS_CONNECTOR_COORD = "com.google.cloud.bigdataoss:gcs-connector:hadoop3-2.2.21"
# Public Maven coordinates (GoogleCloudDataproc/spark-bigquery-connector);
# the with-dependencies artifact is Scala-version-suffixed.
BIGQUERY_CONNECTOR_COORD = (
    "com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.42.0"
)


def gcs_connector_conf(
    keyfile: str | None = None,
    project_id: str | None = None,
    include_jar: bool = True,
) -> dict[str, str]:
    """Spark conf for the Hadoop GCS connector (``gs://`` scheme).

    ``keyfile`` is a service-account JSON path; omit it to use
    Application Default Credentials (the connector's documented
    default — workload identity / metadata server on GCP). With a
    keyfile, explicit service-account auth is enabled the way the
    connector's docs specify (``google.cloud.auth.service.account.*``
    under the ``spark.hadoop.`` prefix so it lands in the Hadoop conf
    the filesystem reads).
    """
    conf: dict[str, str] = {
        "spark.hadoop.fs.gs.impl": (
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
        ),
        "spark.hadoop.fs.AbstractFileSystem.gs.impl": (
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS"
        ),
    }
    if include_jar:
        conf["spark.jars.packages"] = GCS_CONNECTOR_COORD
    if project_id:
        conf["spark.hadoop.fs.gs.project.id"] = project_id
    if keyfile:
        conf["spark.hadoop.google.cloud.auth.service.account.enable"] = "true"
        conf["spark.hadoop.google.cloud.auth.service.account.json.keyfile"] = keyfile
    return conf


def gcs_uri(bucket: str, name: str) -> str:
    """``gs://{bucket}/{file}`` — the reference's SourceURIs shape
    (src/db/db.go:28)."""
    if not bucket:
        raise ValueError("gcs bucket name is empty")
    return f"gs://{bucket}/{name.lstrip('/')}"


def bigquery_read_options(
    table: str,
    dataset: str | None = None,
    parent_project: str | None = None,
    materialization_dataset: str | None = None,
    credentials_file: str | None = None,
) -> dict[str, str]:
    """Options for ``spark.read.format("bigquery")`` (the OP-2 native
    scan, reference src/db/db.go:95-147), using the connector's
    documented option names. ``table`` may be bare (combined with
    ``dataset``) or fully qualified ``project.dataset.table``."""
    if dataset and "." not in table:
        table = f"{dataset}.{table}"
    opts = {"table": table}
    if parent_project:
        opts["parentProject"] = parent_project
    if materialization_dataset:
        # required by the connector when reading the result of a SQL
        # query rather than a plain table scan
        opts["materializationDataset"] = materialization_dataset
    if credentials_file:
        opts["credentialsFile"] = credentials_file
    return opts
