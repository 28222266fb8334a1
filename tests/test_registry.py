"""Structural checks on the query registry / driver contract surface.

The driver verifies queries in registration order with a finite budget
(round 1: first 50 only), so the export order is part of the contract:
evidence-thinnest queries must come first, and the priority lists must stay
in sync with what is actually registered.
"""

from data_ingestion_pipeline_spark import registry


def test_priority_lists_cover_registry_names():
    names = set(registry._REGISTRY)
    for n in registry._NEVER_VERIFIED + registry._ROUND1_FAILED:
        assert n in names, f"priority list names unknown query {n!r}"
    assert not set(registry._NEVER_VERIFIED) & set(registry._ROUND1_FAILED)


def test_export_order_spends_driver_budget_on_thin_evidence():
    ordered = list(registry.queries())
    assert set(ordered) == set(registry._REGISTRY)
    budget = set(ordered[:50])
    oracled = set(registry.oracle_sql())
    priority = (
        registry._ROUND1_FAILED
        + registry._NEVER_VERIFIED
        + registry._COVERED_BY_TWIN
    )
    # every oracle-hash-checked priority query verifies inside the budget;
    # only rows-only approximates (weak driver signal, pytest-bounded) may
    # overflow it
    twin_ok = set(registry._COVERED_BY_TWIN)
    for n in priority:
        if n in oracled and n not in twin_ok:
            assert n in budget, f"{n!r} is oracle-checked but outside the budget"
    # and the priority tier strictly precedes the already-green tier
    n_priority = len(priority)
    assert set(ordered[:n_priority]) == set(priority)


def test_oracles_reference_registered_queries():
    qs = registry.queries()
    for name in registry.oracle_sql():
        assert name in qs
