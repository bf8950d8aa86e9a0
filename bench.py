"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via a count-style action that forces full
execution without collecting rows to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from olist_lakehouse_2_0_spark import get_spark
    from olist_lakehouse_2_0_spark.queries import all_queries

    spark = get_spark(app_name="olist-lakehouse-bench")

    queries = all_queries()
    timings: dict[str, float] = {}
    # Warm the JVM + parquet footer caches with one tiny action so the
    # first measured query doesn't pay session startup, and spin up the
    # Python/Arrow worker pool so the first pandas-UDF query doesn't
    # absorb one-time worker launches.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        # touch numpy so each reused worker pays its import here, not
        # inside the first signature-computing query's timing
        import numpy as np

        return pd.Series(np.asarray(s, dtype="int64"))

    spark.range(0, 1000, 1, 32).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    for name, fn in sorted(queries.items()):
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        # Force full computation of every output row/column without
        # driver-side collection (noop write would also work; count on
        # the cached plan skips column evaluation, so use a cheap
        # aggregate over all columns instead).
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)
        # Drop any blocks a query persisted so later queries are timed
        # in isolation (the persist cost itself is inside the timing).
        spark.catalog.clearCache()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
