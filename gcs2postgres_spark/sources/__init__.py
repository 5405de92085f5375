"""Parity-layer sources: multi-format readers (reference src/db/db.go:17-92
registers GCS files as BigQuery external tables; here each format maps to a
native Spark reader)."""

from gcs2postgres_spark.sources.readers import read_source, SUPPORTED_FORMATS  # noqa: F401
