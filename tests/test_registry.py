"""Structural checks on the query registry / driver contract surface.

The driver verifies queries in registration order with a finite budget
(first 50), so the export order is part of the contract: evidence-thinnest
queries must come first, and the priority lists must stay in sync with what
is actually registered.
"""

from data_ingestion_pipeline_spark import registry


def _priority_lists():
    return (
        registry._ROUND5_PENDING,
        registry._ROUND5_NEW,
    )


_ENV_GATED = {"stateful_event_type_counts_events"}  # registers only with protobuf


def test_priority_lists_cover_registry_names():
    names = set(registry._REGISTRY)
    all_priority = [n for lst in _priority_lists() for n in lst]
    for n in all_priority:
        assert n in names or n in _ENV_GATED, f"priority list names unknown query {n!r}"
    assert len(all_priority) == len(set(all_priority)), "duplicate priority entries"


def test_export_order_spends_driver_budget_on_thin_evidence():
    ordered = list(registry.queries())
    assert set(ordered) == set(registry._REGISTRY)
    budget = set(ordered[:50])
    # every query with no driver CORRECTNESS row yet must verify inside the
    # budget, except the single documented spillover (strongest local
    # evidence, deliberately parked at position 51 per the round-4 verdict)
    spillover = {"cusum_changepoint_daily"}
    for n in registry._ROUND5_PENDING:
        if n in registry._REGISTRY and n not in spillover:
            assert n in budget, f"{n!r} is evidence-thin but sits outside the budget"
    # and the priority tiers strictly precede the already-green remainder
    priority = [
        n for lst in _priority_lists() for n in lst if n in registry._REGISTRY
    ]
    assert ordered[: len(priority)] == priority


def test_env_gated_queries_stay_out_of_the_budget():
    # a query that cannot register in this sandbox must not be granted a
    # front-tier slot the driver would report as absent
    for lst in _priority_lists():
        for n in lst:
            assert n not in _ENV_GATED


def test_oracles_reference_registered_queries():
    qs = registry.queries()
    for name in registry.oracle_sql():
        assert name in qs
