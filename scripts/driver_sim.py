#!/usr/bin/env python
"""Simulate the external driver's CORRECTNESS check, exactly.

The driver (per CORRECTNESS_r01.json evidence) runs each registry query
on Spark and its oracle SQL on DuckDB over the same parquet views, then
canonicalizes each result to a pandas frame — columns sorted by name,
rows sorted by value — and compares row-count, schema, and an exact
value hash (NO float tolerance, unlike tests/oracle_utils.py).

This script reproduces that pipeline so float-quantization and
unhashable-cell problems are caught locally before the driver runs.

Usage:
    python scripts/driver_sim.py [--sf DIR] [--first N] [name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import traceback
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gcs2postgres_spark.catalog import TABLES  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: cols sorted by name, rows sorted.

    Raises TypeError on unhashable cells (lists/dicts) just like the
    driver's pandas sort_values does — that surfaces queries that would
    get an `err` row instead of a verdict.
    """
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _norm_cell(v):
    """Temporal normalization mirroring the real driver's observed
    verdicts: date-typed Spark results vs DuckDB's pandas Timestamps
    (date column through .df()) have been hash-green since round 1
    (q3/q10/q18 CAST AS DATE), so a date and a midnight Timestamp must
    compare equal here too."""
    import datetime as _dt

    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return _dt.datetime(v.year, v.month, v.day)
    return v


def compare_exact(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> dict:
    out = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
    s = _canon(spark_df)
    o = _canon(oracle_df)
    out["rows_match"] = len(s) == len(o)
    out["schema_match"] = list(s.columns) == list(o.columns)
    if not (out["rows_match"] and out["schema_match"]):
        out["hash_match"] = False
        return out
    # exact cell-by-cell equality (NaN==NaN allowed); no tolerance
    mismatches = []
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            a_na = (a is None) or (not isinstance(a, (list, tuple, dict)) and pd.isna(a))
            b_na = (b is None) or (not isinstance(b, (list, tuple, dict)) and pd.isna(b))
            if a_na and b_na:
                continue
            a, b = _norm_cell(a), _norm_cell(b)
            if a_na != b_na or a != b:
                mismatches.append((col, i, a, b))
                if len(mismatches) >= 5:
                    break
        if len(mismatches) >= 5:
            break
    out["hash_match"] = not mismatches
    if mismatches:
        out["err"] = "; ".join(f"{c}[{i}]: spark={a!r} oracle={b!r}" for c, i, a, b in mismatches)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=None, help="check the first N registry entries")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from gcs2postgres_spark.queries import REGISTRY
    from gcs2postgres_spark.session import get_spark

    spark = get_spark("driver-sim")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = args.names or list(REGISTRY.keys())
    if args.first is not None:
        names = list(REGISTRY.keys())[: args.first]

    from gcs2postgres_spark.operators.caching import release_transient_caches

    failures = 0
    for name in names:
        spec = REGISTRY[name]
        try:
            sdf = spec.fn(spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL {name}: spark err\n{traceback.format_exc()}")
            failures += 1
            continue
        finally:
            # per-query cache hygiene (same as bench.py): without it a
            # multi-hundred-query session pins every maybe_persist frame
            # (the _TRANSIENT registry) plus Spark's own cache entries
            # for the whole run
            release_transient_caches()
            spark.catalog.clearCache()
        if spec.oracle is None:
            print(f"ERR  {name}: no_oracle (spark rows={len(sdf)})")
            failures += 1
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception:
            print(f"FAIL {name}: oracle err\n{traceback.format_exc()}")
            failures += 1
            continue
        try:
            res = compare_exact(sdf, odf)
        except TypeError:
            print(f"FAIL {name}: driver-crash (unhashable cell)\n{traceback.format_exc(limit=2)}")
            failures += 1
            continue
        ok = res["rows_match"] and res["schema_match"] and res["hash_match"]
        if ok:
            print(f"PASS {name} ({len(sdf)} rows)")
        else:
            failures += 1
            print(f"FAIL {name}: {json.dumps(res, default=str)}")
    print(f"\n{len(names) - failures}/{len(names)} pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
