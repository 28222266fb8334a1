"""Sustained streaming-ingest throughput (round-8 verdict ask #5).

Every streaming query in the registry is correctness-green, but bench.py
times ONE micro-batch each. This tool measures the foreachBatch-MERGE
ingest path (streaming/ingest.py::stream_orders_csv) under a SUSTAINED
load: N CSV micro-batches derived from the sf orders table drain through
one availableNow query with maxFilesPerTrigger=1, so each file is its own
micro-batch running the full dedup->anti-join->atomic-version-swap MERGE
into a ManagedTable.

Reports one JSON line: total rows ingested, wall seconds, rows/sec, and
the per-batch latency series (from StreamingQuery.recentProgress). The
latency TREND is the point: the MERGE sink is copy-on-write over the whole
table, so per-batch cost grows with accumulated table size — the series
shows where state growth bends the curve (BASELINE.md records the band).

Usage: python tools/stream_bench.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gen_batches(sf_dir: str, inbox: str, n_batches: int) -> int:
    """Slice the orders table into n_batches CSV files matching
    schemas.ORDERS_CSV_RAW. ~5% of each batch replays the previous batch's
    keys with a later dateTime, so the MERGE exercises its update path
    every micro-batch, not just inserts. Deterministic (ORDER BY key)."""
    import duckdb

    con = duckdb.connect()
    orders = os.path.join(sf_dir, "orders.parquet")
    total = 0
    for b in range(n_batches):
        # the replay slice: previous batch's first 5%, bumped one day later
        replay = (
            f"""
            UNION ALL
            SELECT * FROM (
                SELECT 'o' || o_orderkey AS "orderId",
                       'p' || (o_custkey % 100) AS "productId",
                       'SEK' AS currency,
                       (o_orderkey % 7 + 1) AS quantity,
                       0.0 AS "shippingCost",
                       ROUND(o_totalprice, 2) AS amount,
                       'direct' AS channel, 'direct' AS "channelGroup",
                       '' AS campaign,
                       strftime(o_orderdate + INTERVAL {b + 1} DAY,
                                '%Y-%m-%dT%H:%M:%SZ') AS "dateTime"
                FROM read_parquet('{orders}')
                WHERE o_orderkey % {n_batches} = {b - 1}
                ORDER BY o_orderkey LIMIT (
                    SELECT COUNT(*) // 20 FROM read_parquet('{orders}')
                    WHERE o_orderkey % {n_batches} = {b - 1})
            )
            """
            if b > 0
            else ""
        )
        con.execute(
            f"""
            COPY (
                SELECT 'o' || o_orderkey AS "orderId",
                       'p' || (o_custkey % 100) AS "productId",
                       'SEK' AS currency,
                       (o_orderkey % 7 + 1) AS quantity,
                       0.0 AS "shippingCost",
                       ROUND(o_totalprice, 2) AS amount,
                       'direct' AS channel, 'direct' AS "channelGroup",
                       '' AS campaign,
                       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS "dateTime"
                FROM read_parquet('{orders}')
                WHERE o_orderkey % {n_batches} = {b}
                {replay}
            ) TO '{inbox}/batch{b:03d}.csv' (HEADER)
            """
        )
        total += con.execute(
            f"SELECT COUNT(*) FROM read_csv_auto('{inbox}/batch{b:03d}.csv')"
        ).fetchone()[0]
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from data_ingestion_pipeline_spark.plans.table import ManagedTable
    from data_ingestion_pipeline_spark.session import get_spark
    from data_ingestion_pipeline_spark.streaming.ingest import (
        run_stream_to_completion,
        stream_orders_csv,
    )

    spark = get_spark("stream_bench")
    # recentProgress is a ring buffer (default 100): size it to the run so
    # a long sweep's EARLY batches — the baseline of the latency trend —
    # are not silently dropped (round-9 review finding)
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(n_batches + 16)
    )
    # same warmup contract as bench.py: measure the engine, not the JIT
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        inbox = os.path.join(work, "inbox")
        os.makedirs(inbox)
        total_rows = gen_batches(sf_dir, inbox, n_batches)

        table = ManagedTable(
            spark, os.path.join(work, "orders_tbl"), keep_versions=2
        )
        t0 = time.time()
        q = stream_orders_csv(
            spark,
            inbox,
            table,
            os.path.join(work, "ckpt"),
            max_files_per_trigger=1,
            available_now=True,
        )
        run_stream_to_completion(q, timeout_s=1800.0)
        wall = time.time() - t0

        batches = [
            {
                "batch": p["batchId"],
                "rows": p["numInputRows"],
                "sec": round(p["durationMs"]["triggerExecution"] / 1000.0, 3),
            }
            for p in (json.loads(str(j)) for j in q.recentProgress)
            if p["numInputRows"] > 0
        ]
        final_count = table.read().count()
        print(
            json.dumps(
                {
                    "metric": "stream_ingest_merge_sustained",
                    "sf_dir": sf_dir,
                    "n_batches": len(batches),
                    "total_rows": total_rows,
                    "table_rows": final_count,
                    "value": round(wall, 3),
                    "unit": "sec",
                    "rows_per_sec": round(total_rows / wall, 1),
                    "per_batch": batches,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
