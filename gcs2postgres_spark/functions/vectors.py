"""Vector (array<float/double>) column functions — cosine similarity,
norms, dot products — as pure Catalyst higher-order functions
(zip_with + aggregate). No UDF: stays JVM-side and codegen'd, which is
the difference between feasible and not at 100 TB of embeddings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns, computed in double precision
    (cast arrays to array<double> upstream for cross-engine agreement)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
