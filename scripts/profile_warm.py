"""Noise-resistant per-query profiling: run every registered query
``--reps`` times (default 2) and record the MINIMUM timing per query —
the best observable wall time, free of first-run codegen and of the
bursty external host contention documented in BASELINE.md. Writes
``bench_warm.json`` next to the repo root and prints the slowest 15.

    python scripts/profile_warm.py            # sf0.1, 2 reps
    SPARK_GRAFT_SF_DIR=... python scripts/profile_warm.py 3
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql.functions import col, pandas_udf

    from olist_lakehouse_2_0_spark import get_spark
    from olist_lakehouse_2_0_spark.queries import all_queries

    spark = get_spark(app_name="olist-lakehouse-profile")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.asarray(s, dtype="int64"))

    spark.range(0, 1000, 1, 32).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    best: dict[str, float] = {}
    for name, fn in sorted(all_queries().items()):
        for _ in range(reps):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - start
            spark.catalog.clearCache()
            best[name] = min(best.get(name, float("inf")), took)
        print(f"  {name}: {best[name]:.3f}s", file=sys.stderr, flush=True)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_warm.json"), "w") as fh:
        json.dump({k: round(v, 3) for k, v in best.items()}, fh, indent=1, sort_keys=True)
    total = sum(best.values())
    print(f"warm total: {total:.1f}s over {len(best)} queries")
    for name, took in sorted(best.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {took:7.2f}  {name}")


if __name__ == "__main__":
    main()
