"""Min-of-N warm floors for a SUBSET of registered queries.

    python scripts/warm_subset.py [-rN] query [query ...]

Same methodology as profile_warm.py (noop sink, clearCache between,
minimum of N samples) but scoped to the named queries so an
optimization iteration doesn't pay a full-suite pass.
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if args and args[0].startswith("-r"):
        reps = int(args[0][2:])
        args = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql.functions import col, pandas_udf

    from olist_lakehouse_2_0_spark import get_spark
    from olist_lakehouse_2_0_spark.queries import all_queries

    spark = get_spark(app_name="olist-lakehouse-warm-subset")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.asarray(s, dtype="int64"))

    spark.range(0, 1000, 1, 32).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    queries = all_queries()
    best: dict[str, float] = {}
    for name in args:
        fn = queries[name]
        for _ in range(reps):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            took = time.perf_counter() - start
            spark.catalog.clearCache()
            best[name] = min(best.get(name, float("inf")), took)
        print(f"  {name}: {best[name]:.3f}s", flush=True)
    print(f"subset total: {sum(best.values()):.1f}s over {len(best)}")


if __name__ == "__main__":
    main()
