"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet tables, sort columns by
name and rows by value, and compare with FP tolerance."""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from gcs2postgres_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        return round(v, 6) if math.isfinite(v) else v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:  # Decimal / numpy scalars
        if hasattr(v, "item"):
            return _norm(v.item())
    except Exception:
        pass
    return v


def rows_sorted(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    projected = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(projected, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare_query(spark, sf_dir: str, fn, oracle: str, rel_tol: float = 1e-5) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    res = con.sql(oracle)
    d_cols = list(res.columns)
    d_rows = res.fetchall()

    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
        return problems

    s_sorted = rows_sorted(s_cols, s_rows)
    d_sorted = rows_sorted(d_cols, d_rows)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if sv is None and dv is None:
                continue
            if isinstance(sv, float) and isinstance(dv, float):
                if not math.isclose(sv, dv, rel_tol=rel_tol, abs_tol=1e-6):
                    problems.append(f"row {i} col {j}: {sv!r} != {dv!r}")
            elif sv != dv:
                problems.append(f"row {i} col {j}: {sv!r} != {dv!r}")
        if len(problems) > 8:
            problems.append("... (truncated)")
            break
    return problems
