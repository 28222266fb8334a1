"""Round-12 optimization contracts: the basket-pair build, the whitening
sample kernel, the bench final-line budget, and the per-stream state
partition defaults."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _load_li(spark):
    from data_ingestion_pipeline_spark.sources.catalog import load_table

    return load_table(spark, SF_SMOKE, "lineitem")


def test_basket_pairs_matches_self_join(spark):
    """basket_pairs (one groupBy + array expansion) must produce the exact
    pair MULTISET of the old distinct + self-join build — support counts,
    and therefore every graph query's edge set, depend on it."""
    from data_ingestion_pipeline_spark.functions.pairs import basket_pairs

    li = _load_li(spark)
    new = sorted(map(tuple, basket_pairs(li, "l_orderkey", "l_partkey").collect()))
    po = li.select("l_orderkey", "l_partkey").distinct()
    a = po.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = po.select("l_orderkey", F.col("l_partkey").alias("b"))
    old = sorted(
        map(
            tuple,
            a.join(b, "l_orderkey")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .collect(),
        )
    )
    assert new == old and len(new) > 0


def test_basket_pairs_single_exchange(spark):
    """The build's plan contract: one hash exchange (on the basket key),
    no join, no second exchange for the aggregate."""
    from data_ingestion_pipeline_spark.functions.pairs import basket_pairs

    df = basket_pairs(_load_li(spark), "l_orderkey", "l_partkey")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("Exchange") <= 2, plan  # 1 node (+1 ref in details)
    for join in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert join not in plan


def test_whiten_sample_kernel_matches_spark_path(spark):
    """The mapInArrow whitening kernel must replicate the old Spark-side
    centered/dot/projection chain bitwise: x = v − mu, dw =
    cast(sum(cast(x·w as decimal(38,20))) as double), xp = x − dw·w."""
    from data_ingestion_pipeline_spark.operators.mlprep_checks import (
        _pca_state,
        _whiten_sample_kernel,
    )
    from data_ingestion_pipeline_spark.sources.catalog import load_table

    _n, centered, _u, w, _nrm, mu_vals, wv = _pca_state(spark, SF_SMOKE)
    got = sorted(
        map(
            tuple,
            _whiten_sample_kernel(
                load_table(spark, SF_SMOKE, "embeddings").filter(
                    F.col("vec_id") % 37 == 0
                ),
                mu_vals,
                wv,
            ).collect(),
        )
    )
    sample = centered.filter(F.col("vec_id") % 37 == 0)
    sw = sample.join(F.broadcast(w.select(F.col("j").alias("d"), "w")), "d")
    dots = sw.groupBy("vec_id").agg(
        F.sum((F.col("x") * F.col("w")).cast("decimal(38,20)"))
        .cast("double")
        .alias("dw")
    )
    want = sorted(
        map(
            tuple,
            sw.join(dots, "vec_id")
            .select(
                "vec_id",
                "d",
                "x",
                (F.col("x") - F.col("dw") * F.col("w")).alias("xp"),
            )
            .collect(),
        )
    )
    assert len(got) == len(want) > 0
    assert got == want  # bitwise: tuples of Python floats compare exact


def test_bench_final_line_stays_within_capture_budget():
    """The driver parses the bench's final JSON line from a 2000-char
    stdout capture; the bounded queries map must keep the whole line
    under 1900 bytes while carrying the anchors and the slowest names."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    timings = {f"query_name_{i:03d}_with_a_long_suffix": i * 0.017 for i in range(450)}
    for a in bench._QUERIES_LINE_ANCHORS:
        timings[a] = 9.9
    final = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(timings),
        "slowest": dict(
            sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
        ),
        "detail": "BENCH_DETAIL.json",
    }
    base_len = len(json.dumps(final, separators=(",", ":")))
    final["queries"] = bench._bounded_queries_map(
        timings, budget=1880 - base_len - 12
    )
    line = json.dumps(final, separators=(",", ":"))
    assert len(line) <= 1900
    assert len(final["queries"]) >= 20
    for a in bench._QUERIES_LINE_ANCHORS:
        assert a in final["queries"]
    # deterministic: same inputs, same subset
    again = bench._bounded_queries_map(timings, budget=1880 - base_len - 12)
    assert again == final["queries"]


def test_stream_state_partitions_per_stream_default(spark):
    """Python-stateful streams pass their own default (8); the env var
    still overrides everything (the cluster contract)."""
    from data_ingestion_pipeline_spark.operators.streaming_checks import (
        _stream_state_partitions,
    )

    old = spark.conf.get("spark.sql.shuffle.partitions")
    env_backup = os.environ.pop("SPARK_GRAFT_STREAM_PARTS", None)
    try:
        with _stream_state_partitions(spark):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "4"
        with _stream_state_partitions(spark, default="8"):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
        os.environ["SPARK_GRAFT_STREAM_PARTS"] = "12"
        with _stream_state_partitions(spark, default="8"):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "12"
        assert spark.conf.get("spark.sql.shuffle.partitions") == old
    finally:
        os.environ.pop("SPARK_GRAFT_STREAM_PARTS", None)
        if env_backup is not None:
            os.environ["SPARK_GRAFT_STREAM_PARTS"] = env_backup
