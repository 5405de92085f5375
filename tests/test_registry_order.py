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
