"""gcs2postgres_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of TFMV/GCS2Postgres
(reference at /root/reference, a ~523-LoC Go BigQuery→Postgres ETL
tool) as an idiomatic PySpark engine with two layers:

1. **Parity layer** — the reference's actual surface: multi-format
   file sources (reference: src/db/db.go:17-92), schema
   reconciliation against a target schema with case-insensitive name
   matching + NULL padding (reference: src/utils/utils.go:96-166),
   and partition-wise bulk sinks (reference: src/db/db.go:149-186).
2. **Engine layer** — the relational / streaming / LLM-data-pipeline
   operators the reference delegates to BigQuery (its only query is
   ``SELECT *`` — src/db/db.go:59), rebuilt natively on
   DataFrame/SQL/Catalyst/Structured Streaming and designed for
   100 TB scale (no driver-side materialization, broadcast-aware
   joins, partial aggregation, AQE).
"""

__version__ = "0.1.0"

from gcs2postgres_spark.session import get_spark  # noqa: F401
from gcs2postgres_spark.catalog import load_table, TABLES  # noqa: F401
