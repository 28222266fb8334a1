"""Property-based tests (hypothesis): invariants that hold for ALL inputs,
not just the fixtures — merge idempotence/last-wins against a Python model,
and normalization round-trips."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_pipeline_spark.functions.normalize import camel_to_snake

# --- camel_to_snake: pure function, no Spark needed --------------------------


@given(st.text(alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")), max_size=30))
def test_camel_to_snake_idempotent_and_lower(s):
    once = camel_to_snake(s)
    assert camel_to_snake(once) == once        # idempotent
    assert once == once.lower()                # never leaves uppercase


# --- dedupe_last_wins vs a Python model --------------------------------------

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),      # key
        st.integers(min_value=0, max_value=10),     # order column (ties likely)
        st.integers(min_value=-100, max_value=100), # payload
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_dedupe_last_wins_matches_model(spark, rows):
    from data_ingestion_pipeline_spark.plans.merge import dedupe_last_wins

    df = spark.createDataFrame(rows, "k long, ord long, payload long")
    got = {
        r.k: (r.ord, r.payload)
        for r in dedupe_last_wins(df, ["k"], "ord").collect()
    }
    # model: per key, max ord; ties broken by max payload (the struct
    # tiebreak over non-key columns, descending)
    model: dict[int, tuple[int, int]] = {}
    for k, o, p in rows:
        if k not in model or (o, p) > model[k]:
            model[k] = (o, p)
    assert got == model
    # exactly one survivor per key, and running twice changes nothing
    again = dedupe_last_wins(dedupe_last_wins(df, ["k"], "ord"), ["k"], "ord")
    assert sorted(map(tuple, again.collect())) == sorted(
        (k, o, p) for k, (o, p) in model.items()
    )
