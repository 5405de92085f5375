"""SparkSession factory.

Pinned semantics (SURVEY.md §4.2):
- ``spark.sql.session.timeZone=UTC`` — DuckDB-oracle comparison needs
  naive-UTC timestamps on both sides.
- ``spark.sql.ansi.enabled=false`` — the reference's casts are lenient
  (truncating int64→int32, stringify fallback — reference
  src/utils/utils.go:136-166); ANSI mode would raise instead.
- AQE on with coalesce + skew-join: at 100 TB the static partition
  count is always wrong somewhere; AQE re-plans at runtime.

Shuffle partitions default to the local core count (override with
``SPARK_GRAFT_SHUFFLE_PARTITIONS``); on a real cluster this would be
~2-3× total executor cores, and AQE coalesces the excess.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "gcs2postgres_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    cpus = _cpus()
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.ts is parquet TIMESTAMP(NANOS); Spark timestamps
        # are µs — read nanos as long, catalog converts to timestamp
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable semantics to an externally-created session.

    The driver's verify harness constructs its own SparkSession; the
    query registry calls this defensively so pinned semantics
    (timezone, ANSI mode) hold regardless of who built the session.
    Static configs (AQE, memory) can't be changed post-start and are
    left alone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for k, v in [
        ("spark.sql.ansi.enabled", "false"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static in some deployments; lenient-cast tests gate on it
    return spark
