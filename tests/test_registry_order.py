"""The external driver verifies the first 50 registry entries; the
round-2 rotation must put exactly the unverified + fixed-red names
there. Guard the invariants so a refactor can't silently shrink the
verification window."""

from gcs2postgres_spark.queries import REGISTRY, VERIFY_DEFERRED, VERIFY_FRONT


def test_front_window_is_exactly_50_known_names():
    assert len(VERIFY_FRONT) == 50
    assert len(set(VERIFY_FRONT)) == 50
    missing = [n for n in VERIFY_FRONT if n not in REGISTRY]
    assert not missing, f"front-window names not in registry: {missing}"


def test_no_overlap_front_vs_deferred():
    assert not set(VERIFY_FRONT) & set(VERIFY_DEFERRED)


def test_registry_iteration_order_starts_with_front_window():
    assert list(REGISTRY)[:50] == VERIFY_FRONT


def test_registry_complete():
    # every registered query is accounted for exactly once
    assert len(REGISTRY) >= 109
    assert sorted(set(REGISTRY)) == sorted(REGISTRY)


def test_materialize_ctes_transformer():
    from gcs2postgres_spark.queries.registry import materialize_ctes

    # plain CTEs get the hint
    assert (
        materialize_ctes("WITH a AS (SELECT 1), b AS (SELECT * FROM a) SELECT * FROM b")
        == "WITH a AS MATERIALIZED (SELECT 1), b AS MATERIALIZED (SELECT * FROM a) SELECT * FROM b"
    )
    # recursive member untouched, siblings hinted
    out = materialize_ctes(
        "WITH RECURSIVE r AS (SELECT 1 UNION SELECT x+1 FROM r), s AS (SELECT * FROM r) SELECT * FROM s"
    )
    assert "r AS (SELECT 1" in out and "s AS MATERIALIZED (" in out
    # already-hinted CTEs not double-hinted
    assert materialize_ctes("WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a").count("MATERIALIZED") == 1
    # quoted parens must not break the scanner; WINDOW clause untouched
    out = materialize_ctes(
        "WITH a AS (SELECT '(' AS lit) SELECT * FROM a WINDOW w AS (ORDER BY 1)"
    )
    assert "a AS MATERIALIZED (" in out and "WINDOW w AS (ORDER BY 1)" in out
    # no WITH: identity
    assert materialize_ctes("SELECT 1") == "SELECT 1"


def test_every_oracle_has_no_unmaterialized_hot_cte():
    # the registration transformer must leave no top-level non-recursive
    # CTE without the MATERIALIZED hint (DuckDB inlining re-evaluates
    # multiply-referenced CTEs; see registry.materialize_ctes docstring)
    import re

    from gcs2postgres_spark.queries import REGISTRY
    from gcs2postgres_spark.queries.registry import materialize_ctes

    for name, spec in REGISTRY.items():
        if spec.oracle:
            assert spec.oracle == materialize_ctes(spec.oracle), name
