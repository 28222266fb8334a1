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


# --- scd2_apply vs a Python model --------------------------------------------

_scd_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # key
            st.integers(min_value=0, max_value=3),   # attribute value
        ),
        min_size=0,
        max_size=6,
        unique_by=lambda t: t[0],                    # one image per key per batch
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_scd_batches)
def test_scd2_apply_matches_model(spark, batches):
    """Folding arbitrary change batches through scd2_apply equals a Python
    SCD2 model: per key, the version chain is the deduplicated sequence of
    attribute values, stamped with the batch timestamps where each run
    started/ended; exactly one open (is_current) version per key."""
    from pyspark.sql import functions as F

    from data_ingestion_pipeline_spark.plans.scd import scd2_apply

    t0 = "2023-01-01"
    stamps = [f"2023-02-0{i+1}" for i in range(len(batches))]

    dim = spark.createDataFrame([(0, 99)], "k long, attr long").select(
        "k",
        "attr",
        F.lit(t0).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # python model: key -> list of [attr, from, to] chains, last open
    model = {0: [[99, t0, None]]}
    for ts, batch in zip(stamps, batches):
        bdf = spark.createDataFrame(batch, "k long, attr long") if batch else (
            spark.createDataFrame([], "k long, attr long")
        )
        dim = scd2_apply(dim, bdf, "k", ["attr"], ts)
        for k, attr in batch:
            chain = model.setdefault(k, [])
            if chain and chain[-1][2] is None and chain[-1][0] == attr:
                continue  # unchanged image: no-op
            if chain and chain[-1][2] is None:
                chain[-1][2] = ts  # close current
            chain.append([attr, ts, None])

    got = sorted(
        (
            r.k,
            r.attr,
            r.valid_from.strftime("%Y-%m-%d"),
            r.valid_to.strftime("%Y-%m-%d") if r.valid_to else None,
            r.is_current,
        )
        for r in dim.collect()
    )
    want = sorted(
        (k, attr, vf, vt, vt is None)
        for k, chain in model.items()
        for attr, vf, vt in chain
    )
    assert got == want
