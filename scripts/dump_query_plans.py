"""Dump ``explain("formatted")`` for named queries to files.

    python scripts/dump_query_plans.py OUTDIR SUFFIX query [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query (sf0.01 by default —
plan SHAPE is scale-independent; override with SPARK_GRAFT_SF_DIR).
Used to commit the before/after plan evidence for optimization rounds
(plans/r10/). Queries that execute driver-side actions during
construction (equality proofs, ANALYZE readbacks) still work: the dump
captures the RETURNED relation's plan, and the construction cost is
irrelevant here.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from olist_lakehouse_2_0_spark import get_spark
    from olist_lakehouse_2_0_spark.queries import all_queries

    spark = get_spark(app_name="plan-dump")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
