"""Dump .explain("formatted") for registered queries to plans/<dir>/.

Usage: python tools/explain_query.py <out_dir> <suffix> query [query ...]
Writes plans/<out_dir>/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from data_ingestion_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dest = os.path.join(REPO, "plans", out_dir)
    os.makedirs(dest, exist_ok=True)
    spark = get_spark("explain_query")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(dest, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)", flush=True)


if __name__ == "__main__":
    main()
