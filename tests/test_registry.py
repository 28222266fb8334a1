"""Structural checks on the query registry / driver contract surface.

The driver verifies queries in registration order with a finite budget
(first 50), so the export order is part of the contract: evidence-thinnest
queries must come first, and the priority lists must stay in sync with what
is actually registered.
"""

from data_ingestion_pipeline_spark import registry


def _priority_lists():
    return (
        registry._UNVERIFIED,
        registry._ROUND3_NEW,
        registry._R1_GREEN_ONLY,
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
    # every query with no driver row yet — the r1-fixed batch and this
    # round's new operators — must verify inside the budget (entries may be
    # environment-gated, e.g. transformWithState without protobuf)
    for n in [*registry._UNVERIFIED, *registry._ROUND3_NEW]:
        if n in registry._REGISTRY:
            assert n in budget, f"{n!r} has no driver row but sits outside the budget"
    # and the priority tiers strictly precede the already-green remainder
    priority = [
        n for lst in _priority_lists() for n in lst if n in registry._REGISTRY
    ]
    assert ordered[: len(priority)] == priority


def test_oracles_reference_registered_queries():
    qs = registry.queries()
    for name in registry.oracle_sql():
        assert name in qs
