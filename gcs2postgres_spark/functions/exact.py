"""Exact integer division helpers for the house 6-dp determinism rule.

The "exact integer floor division at 6 dp" pattern (ratios of integer
aggregates published as ``floor(numer*1e6 / denom) / 1e6``) must
produce bit-identical results on Spark and DuckDB. Spark's
``floor(decimalA / decimalB)`` is NOT exact for that purpose: decimal
division rounds HALF_UP to the result scale (6) BEFORE the floor, so
when the true quotient lies within 5e-7 below an integer the rounded
quotient crosses it and the floor comes out one too high — e.g.
``floor(1999999 / 2000000)`` = 1 on Spark vs DuckDB's exact
``1999999 // 2000000`` = 0. Possible whenever the denominator exceeds
~2e6 (HHI's t², RFM segment counts at large SF).

The fix here avoids the pre-floor rounding entirely: compute the exact
remainder first (decimal ``%`` is exact), subtract it, and only then
divide — the division is evenly divisible, so the scale-6 HALF_UP
rounding is a no-op. ``(n - n % d) / d`` truncates toward zero for
negative operands, matching both Spark's integral ``div`` operator and
DuckDB's ``//`` (verified: -7 div 2 = -3 on both engines).

Column-level (no ``F.expr``) so callers can pass arbitrary expressions,
not just named columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["exact_intdiv", "ratio_6dp"]


def exact_intdiv(numer: Column, denom: Column) -> Column:
    """Exact integer quotient of two integral expressions.

    Equivalent to Spark SQL's ``numer div denom`` / DuckDB's
    ``numer // denom`` (truncation toward zero), but built from Column
    objects. Operands are computed in decimal(38,0); both engines'
    decimal ``%`` is an exact remainder, and the subsequent division
    divides evenly, so no rounding step can perturb the result.
    Returns decimal(38,0); NULL when ``denom`` is 0 (ANSI off).
    """
    n = numer.cast("decimal(38,0)")
    d = denom.cast("decimal(38,0)")
    return ((n - n % d) / d).cast("decimal(38,0)")


def ratio_6dp(numer: Column, denom: Column) -> Column:
    """``numer / denom`` truncated to exactly 6 decimal places, as the
    double ``(numer*1_000_000 div denom) / 1e6`` — the house pattern for
    publishing ratios of integer aggregates without a float knife edge.
    DuckDB twin: ``CAST((numer * 1000000) // denom AS BIGINT) / 1e6``.
    The scaled quotient must stay below 2^53 for the final double
    rescale to be exact (ratios up to ~9e9 — far past any rate/HHI/
    Fano value this library publishes).
    """
    scaled = numer.cast("decimal(38,0)") * 1_000_000
    return exact_intdiv(scaled, denom).cast("long") / 1e6
