"""Engine-layer operators that Spark lacks as single built-ins.

Each is a composition of DataFrame ops (preferred — stays in Catalyst
/ whole-stage codegen) or a Pandas-UDF-backed plan where semantics
require it (SURVEY.md §2.6/§2.8).
"""

from gcs2postgres_spark.operators.joins import asof_join, range_join, topk_per_group  # noqa: F401
