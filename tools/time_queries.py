"""Quiet min-of-N timer for individual registered queries.

Usage: python tools/time_queries.py [sf_dir] [reps] query [query ...]
Prints one line per query: name, min, all reps. Times the bench's noop-sink
action (``df.write.format("noop")`` materializes EVERY column of every row;
``.count()`` lets Catalyst prune aggregate values and whole join subtrees —
measured 6x cheaper than the real query on 1-row stat outputs, so count
timings are NOT comparable with BENCH_DETAIL).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    reps = int(args.pop(0)) if args and args[0].isdigit() else 3
    spark = get_spark("time_queries")
    qs = entrymod.queries()
    # one warmup of a trivial query to absorb JVM/codegen startup
    qs["low_stock"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in args:
        fn = qs[name]
        times = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: min={min(times)} reps={times}", flush=True)


if __name__ == "__main__":
    main()
