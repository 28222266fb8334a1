"""Semantics tests for round-3 operators: SCD2 history invariants, CDC
feed classes, delete-by-key audit trail, rollup losslessness, and
decontamination recall on planted leaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_pipeline_spark.operators import lakehouse_checks, llm_data
from data_ingestion_pipeline_spark.plans.scd import merge_changes, scd2_apply
from data_ingestion_pipeline_spark.plans.table import ManagedTable
from data_ingestion_pipeline_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_scd2_invariants(spark):
    out = lakehouse_checks.scd2_customer_dimension(spark, SF_SMOKE).cache()
    # exactly one current row per key
    per_key = out.filter("is_current").groupBy("c_custkey").count()
    assert per_key.filter("count != 1").count() == 0
    # closed rows have valid_to = successor's valid_from
    closed = out.filter(~F.col("is_current"))
    assert closed.filter(F.col("valid_to").isNull()).count() == 0
    succ = closed.alias("c").join(
        out.filter("is_current").alias("n"), "c_custkey"
    )
    assert succ.filter(F.col("c.valid_to") != F.col("n.valid_from")).count() == 0
    # unchanged re-sends are no-ops: keys %7==1 still have their bootstrap row
    unchanged = out.filter(
        (F.col("c_custkey") % 7 == 1)
        & (F.col("c_custkey") < 1000000)  # exclude planted new keys
        & F.col("is_current")
    )
    assert unchanged.filter(F.col("valid_from") != F.lit("2023-01-01").cast("timestamp")).count() == 0
    out.unpersist()


def test_scd2_second_batch_extends_history(spark):
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    dim = cust.select(
        "*",
        F.lit("2023-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    b1 = cust.filter("c_custkey % 5 = 0").withColumn("c_mktsegment", F.lit("A"))
    b2 = cust.filter("c_custkey % 5 = 0").withColumn("c_mktsegment", F.lit("B"))
    v1 = scd2_apply(dim, b1, "c_custkey", ["c_name", "c_mktsegment"], "2023-02-01")
    v2 = scd2_apply(v1, b2, "c_custkey", ["c_name", "c_mktsegment"], "2023-03-01")
    hist = v2.filter("c_custkey % 5 = 0").groupBy("c_custkey").count()
    # bootstrap + A + B = 3 versions per twice-changed key
    assert hist.filter("count != 3").count() == 0
    cur = v2.filter("c_custkey % 5 = 0 AND is_current")
    assert cur.filter("c_mktsegment != 'B'").count() == 0


def test_cdc_feed_classes(spark):
    feed = lakehouse_checks.merge_cdc_orders(spark, SF_SMOKE).cache()
    ops = {r["op"]: r["n"] for r in feed.groupBy("op").agg(F.count("*").alias("n")).collect()}
    assert set(ops) == {"insert", "update_preimage", "update_postimage"}
    assert ops["update_preimage"] == ops["update_postimage"]
    # unchanged re-sends (keys %7==1) emit nothing
    assert feed.filter("o_orderkey % 7 = 1 AND o_orderkey < 100000000").count() == 0
    feed.unpersist()


def test_delete_where_keeps_audit_versions(spark, tmp_path):
    table = ManagedTable(spark, str(tmp_path / "t"), keep_versions=3)
    events = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    table.overwrite(events)
    v_before = table.current_version()
    table.delete_where(F.col("user_id") % 17 == 0)
    # current version has no matching rows; the prior one still does
    assert table.read().filter("user_id % 17 = 0").count() == 0
    assert table.read(v_before).filter("user_id % 17 = 0").count() > 0


def test_rollup_from_hourly_equals_direct_daily(spark):
    events = load_table(spark, SF_SMOKE, "events")
    direct = (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.coalesce(F.col("value"), F.lit(0.0)).cast("decimal(18,6)")), 2
            ).cast("double").alias("total_value"),
        )
    )
    via_hourly = lakehouse_checks.daily_rollup_from_hourly_events(spark, SF_SMOKE)
    a = {tuple(r) for r in direct.collect()}
    b = {tuple(r) for r in via_hourly.collect()}
    assert a == b and len(a) > 0


def test_pq_topk_recall_vs_brute_force(spark):
    """ADC over 16×256 codebooks recovers most of the exact top-20
    (measured 0.7-0.8 across sf0.001-0.1; pinned with margin). The approx
    scores must also be sane: rank-1 is the query itself."""
    pq = llm_data.ann_pq_topk_embeddings(spark, SF_SMOKE).collect()
    exact = {r.vec_id for r in llm_data.cosine_topk_embeddings(spark, SF_SMOKE).collect()}
    got = {r.vec_id for r in pq}
    assert len(got & exact) / 20 >= 0.5
    best = max(pq, key=lambda r: r.approx_score)
    assert best.vec_id == 0


def test_hll_day_merge_equals_direct_week(spark):
    """Merging per-day HLL sketches must equal aggregating the week
    directly, and at fixture cardinality (sparse-exact mode) both equal
    the exact distinct count."""
    from data_ingestion_pipeline_spark.operators.relational import (
        hll_merge_users_weekly,
    )

    gated = {
        r.week: (r.n_users, r.within_bound)
        for r in hll_merge_users_weekly(spark, SF_SMOKE).collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    exact = {
        r.week: r.n
        for r in events.groupBy(F.weekofyear("ts").cast("int").alias("week"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n"))
        .collect()
    }
    assert {w: n for w, (n, _) in gated.items()} == exact
    assert all(ok for _, ok in gated.values())
    # the merged-sketch estimate itself (pre-gate) equals the direct-week
    # sketch estimate: day-merge loses nothing
    daily = events.groupBy(
        F.weekofyear("ts").cast("int").alias("week"), F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = {
        r.week: r.est
        for r in daily.groupBy("week")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("est"))
        .collect()
    }
    direct = {
        r.week: r.est
        for r in events.groupBy(F.weekofyear("ts").cast("int").alias("week"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint").alias("est"))
        .collect()
    }
    assert merged == direct


def test_zorder_skips_files_on_both_dimensions(spark):
    """Footer min/max proof: on the Morton layout, a selective 2-D box
    overlaps FEWER files than on a single-key (o_orderdate) sort, and
    single-dim pruning still works on both z-ordered columns."""
    import glob

    import pyarrow.parquet as pq

    from data_ingestion_pipeline_spark.operators.lakehouse_checks import (
        zorder_orders_path,
    )

    zpath = zorder_orders_path(spark, SF_SMOKE)
    orders = load_table(spark, SF_SMOKE, "orders")
    # single-key comparison layout: same file count, sorted by date only
    import tempfile

    sdir = tempfile.mkdtemp()
    orders.repartitionByRange(8, "o_orderdate").sortWithinPartitions(
        "o_orderdate"
    ).write.mode("overwrite").parquet(sdir)

    def overlaps(path, custkey_box, date_box):
        n = 0
        files = glob.glob(f"{path}/part-*.parquet")
        for f in files:
            md = pq.ParquetFile(f).metadata
            cmin = cmax = dmin = dmax = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    st = col.statistics
                    if st is None:
                        continue
                    name = col.path_in_schema
                    if name == "o_custkey":
                        cmin = st.min if cmin is None else min(cmin, st.min)
                        cmax = st.max if cmax is None else max(cmax, st.max)
                    if name == "o_orderdate":
                        dmin = st.min if dmin is None else min(dmin, st.min)
                        dmax = st.max if dmax is None else max(dmax, st.max)
            if cmin is None or dmin is None:
                n += 1  # no stats → must read
                continue
            c_over = cmax >= custkey_box[0] and cmin < custkey_box[1]
            d_over = str(dmax) >= date_box[0] and str(dmin) < date_box[1]
            if c_over and d_over:
                n += 1
        return n, len(files)

    box_c = (100, 200)
    box_d = ("1995-01-01", "1996-01-01")
    z_hit, z_total = overlaps(zpath, box_c, box_d)
    s_hit, s_total = overlaps(sdir, box_c, box_d)
    assert z_total == 8 and s_total == 8
    # the date-sorted layout prunes on date only → every date-overlapping
    # file also custkey-overlaps (custkey spans the full range per file);
    # the z-ordered layout must strictly beat it on the 2-D box
    assert z_hit < s_hit, f"zorder {z_hit}/{z_total} vs sorted {s_hit}/{s_total}"


def test_recursive_hierarchy_matches_closed_form(spark):
    """The recursive digit-chain walk equals the closed form: root = leading
    digit, chain_len = number of digits − 1."""
    from data_ingestion_pipeline_spark.operators.sql_surface import (
        recursive_orderkey_hierarchy,
    )

    got = {r["root_digit"]: r for r in recursive_orderkey_hierarchy(spark, SF_SMOKE).collect()}
    orders = load_table(spark, SF_SMOKE, "orders")
    closed = (
        orders.select(
            F.substring(F.col("o_orderkey").cast("string"), 1, 1).cast("bigint").alias("root_digit"),
            (F.length(F.col("o_orderkey").cast("string")) - 1).alias("chain_len"),
        )
        .groupBy("root_digit")
        .agg(F.count("*").cast("bigint").alias("n_orders"), F.max("chain_len").cast("int").alias("max_chain_len"))
    )
    for r in closed.collect():
        g = got[r["root_digit"]]
        assert g["n_orders"] == r["n_orders"]
        assert g["max_chain_len"] == r["max_chain_len"]


def test_transform_with_state_gated_on_protobuf(spark):
    """The transformWithStateInPandas check registers only where its
    protobuf runtime dependency exists; in this sandbox the gate must keep
    it OUT of the driver contract (an ERR row is worse than absence). Where
    protobuf IS present the streaming check itself runs."""
    import pytest

    from data_ingestion_pipeline_spark import registry
    from data_ingestion_pipeline_spark.streaming.stateful import (
        transform_with_state_available,
    )

    registered = "stateful_event_type_counts_events" in registry.queries()
    assert registered == transform_with_state_available()
    if not transform_with_state_available():
        pytest.skip("python-protobuf absent — transformWithState cannot run here")
    from data_ingestion_pipeline_spark.operators.streaming_checks import (
        stateful_event_type_counts_events,
    )

    out = stateful_event_type_counts_events(spark, SF_SMOKE)
    direct = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id", "event_type")
        .agg((2 * F.count("*")).cast("bigint").alias("n_events"))
    )
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in direct.collect()}


def test_decontamination_catches_all_planted_leaks(spark):
    out = llm_data.decontaminate_documents(spark, SF_SMOKE)
    rows = {r["doc_id"]: r for r in out.collect()}
    docs = load_table(spark, SF_SMOKE, "documents")
    bench_ids = [r["doc_id"] for r in docs.filter("doc_id % 97 = 0").collect()]
    for bid in bench_ids:
        leaked_id = bid + 2000000
        assert leaked_id in rows, f"planted leak {leaked_id} not flagged"
        # every window of an 80%-prefix copy comes from the benchmark doc
        assert rows[leaked_id]["contamination"] == 1.0
