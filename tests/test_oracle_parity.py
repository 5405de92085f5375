"""Mirror of the driver's t2 gate: every registry query with an oracle
must value-match DuckDB; rows-only queries must run and return rows."""

from __future__ import annotations

import pytest

from gcs2postgres_spark.queries import REGISTRY
from tests.oracle_utils import compare_query

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    spec = REGISTRY[name]
    problems = compare_query(spark, sf_dir, spec.fn, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems[:10])


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    rows = df.collect()
    assert df.columns, f"{name}: no columns"
    assert rows is not None
