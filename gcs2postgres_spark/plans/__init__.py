"""Plan inspection utilities — explain-based assertions that pushdown,
broadcast, and codegen actually happened (used by tests and M5 tuning)."""

from gcs2postgres_spark.plans.inspect import (  # noqa: F401
    formatted_plan,
    pushed_filters,
    has_broadcast_join,
    wholestage_codegen_spans,
)
