"""Repo-wide physical-plan audit: build every registered query's executed
plan and flag structural scale-killers.

Hard failures (exit 1):
  - CartesianProduct anywhere (an unkeyed big×big join)
  - a query whose plan cannot be built at all

Informational (printed, not failing): BroadcastNestedLoopJoin counts —
legitimate when one side is a 1-row scalar aggregate (the repo's
crossJoin-a-scalar idiom), so they are reported for eyeballing rather
than asserted. Single-partition windows are audited separately at RUN
time by tools/warn_census.py (a plan string shows the window spec but not
whether Catalyst folded its key — the census catches what this can't).

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001; ~2 min)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__ as entrymod
    from data_ingestion_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    failures: dict[str, str] = {}
    bnlj: dict[str, int] = {}
    t0 = time.time()
    for name, fn in entrymod.queries().items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as ex:  # noqa: BLE001 — audit must keep going
            failures[name] = f"plan build failed: {type(ex).__name__}"
            continue
        if "CartesianProduct" in plan:
            failures[name] = "CartesianProduct"
        n = plan.count("BroadcastNestedLoopJoin")
        if n:
            bnlj[name] = n
    print(f"audited {len(entrymod.queries())} plans in {time.time() - t0:.0f}s")
    if bnlj:
        print(f"info: {len(bnlj)} queries use BroadcastNestedLoopJoin "
              "(scalar-broadcast crossJoins; verify the build side is 1-row):")
        for k, v in sorted(bnlj.items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {v:2d}  {k}")
    for k, v in failures.items():
        print(f"FAIL {k}: {v}")
    print(f"flagged: {len(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
