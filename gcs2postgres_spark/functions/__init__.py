"""Column-level function library (JVM-side expressions preferred;
Pandas UDFs only where built-ins can't express the semantics)."""

from gcs2postgres_spark.functions.text import (  # noqa: F401
    token_count,
    bpe_ish_token_count,
    quality_score_cols,
    lang_id_heuristic,
    fingerprint,
)
from gcs2postgres_spark.functions.vectors import cosine_similarity, l2_norm, dot  # noqa: F401
