"""Structural checks on the query registry / driver contract surface.

The driver verifies queries in registration order with a finite budget
(first 50), so the export order is part of the contract: evidence-thinnest
queries must come first, and the priority lists must stay in sync with what
is actually registered.
"""

from data_ingestion_pipeline_spark import registry


_ENV_GATED = {"stateful_event_type_counts_events"}  # registers only with protobuf


def test_priority_lists_cover_registry_names():
    names = set(registry._REGISTRY)
    for n in registry._NEVER_DRIVER_CHECKED:
        assert n in names or n in _ENV_GATED, f"priority list names unknown query {n!r}"
    assert len(registry._NEVER_DRIVER_CHECKED) == len(
        set(registry._NEVER_DRIVER_CHECKED)
    ), "duplicate priority entries"


def test_export_order_spends_driver_budget_on_thin_evidence():
    """Round-6 rotation contract (round-5 verdict item 1): the entire
    50-slot driver budget lands on never-driver-checked names — the r5
    spillover first, then round-5 additions, then round-6 additions —
    and the retired driver-green tiers follow strictly after."""
    ordered = list(registry.queries())
    assert set(ordered) == set(registry._REGISTRY)
    front = [n for n in registry._NEVER_DRIVER_CHECKED if n in registry._REGISTRY]
    assert ordered[: len(front)] == front
    assert len(front) >= 50, "budget would leak onto already-green queries"
    assert front[0] == "cusum_changepoint_daily", "r5 spillover lost its slot"
    # every round-5-green query sits outside the front tier
    for n in registry._ROUND5_PENDING:
        if n in registry._REGISTRY and n != "cusum_changepoint_daily":
            assert n not in front, f"driver-green {n!r} occupies a budget slot"


def test_env_gated_queries_stay_out_of_the_budget():
    # a query that cannot register in this sandbox must not be granted a
    # front-tier slot the driver would report as absent
    for n in registry._NEVER_DRIVER_CHECKED:
        assert n not in _ENV_GATED


def test_oracles_reference_registered_queries():
    qs = registry.queries()
    for name in registry.oracle_sql():
        assert name in qs
