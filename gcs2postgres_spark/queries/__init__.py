"""Query registry — every implemented operator from SURVEY.md §2 registers
one named query (Spark fn) and, when SQL-expressible, a DuckDB oracle SQL.

Import side effects populate REGISTRY.
"""

from gcs2postgres_spark.queries.registry import REGISTRY, QuerySpec, register  # noqa: F401

# Populate the registry (order matters only for readability of listings).
from gcs2postgres_spark.queries import advanced  # noqa: E402,F401
from gcs2postgres_spark.queries import relational  # noqa: E402,F401
from gcs2postgres_spark.queries import joins  # noqa: E402,F401
from gcs2postgres_spark.queries import tpch_rest  # noqa: E402,F401
from gcs2postgres_spark.queries import misc_sql  # noqa: E402,F401
from gcs2postgres_spark.queries import windows  # noqa: E402,F401
from gcs2postgres_spark.queries import events_q  # noqa: E402,F401
from gcs2postgres_spark.queries import llm  # noqa: E402,F401
