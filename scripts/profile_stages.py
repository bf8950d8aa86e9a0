"""Stage-level decomposition of one or more registered queries.

Runs each named query once (noop sink) inside a session with the JSON
event log enabled, then replays the log and prints, per query (job
group = query name):

- jobs: count and total wall (submission -> completion)
- stages: count, total task time, and the top stages by duration with
  their name/details so shuffle/scan/python stages are attributable
- gaps: wall time inside the query not covered by any running job —
  driver-side work (planning, py4j round trips, collect decode).

Usage::

    python scripts/profile_stages.py minhash_verified_dups [more ...]
    SPARK_GRAFT_SF_DIR=... python scripts/profile_stages.py name
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_stages.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import shutil

    log_dir = "/tmp/spark-events-profile"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    from pyspark.sql.functions import col, pandas_udf

    from olist_lakehouse_2_0_spark import get_spark
    from olist_lakehouse_2_0_spark.queries import all_queries

    spark = get_spark(
        app_name="olist-lakehouse-stage-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.asarray(s, dtype="int64"))

    spark.range(0, 1000, 1, 32).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    queries = all_queries()
    windows: dict[str, tuple[float, float]] = {}
    for name in names:
        fn = queries[name]
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        t0 = time.time() * 1000.0
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t1 = time.time() * 1000.0
        sc.setJobGroup("", "")
        spark.catalog.clearCache()
        windows[name] = (t0, t1)
        print(f"  {name}: {(t1 - t0) / 1000:.3f}s wall", file=sys.stderr)

    spark.stop()

    # --- replay the event log ---
    logs = [
        os.path.join(root, f)
        for root, _dirs, files in os.walk(log_dir)
        for f in files
        if not f.startswith("appstatus_")
    ]
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    for lf in logs:
        with open(lf) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "group": props.get("spark.jobGroup.id", ""),
                        "start": ev["Submission Time"],
                        "stages": [
                            s["Stage ID"] for s in ev.get("Stage Infos", [])
                        ],
                    }
                elif e == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"],
                        "details": (si.get("Details") or "")[:200],
                        "start": si.get("Submission Time"),
                        "end": si.get("Completion Time"),
                        "tasks": si.get("Number of Tasks"),
                    }

    for name in names:
        t0, t1 = windows[name]
        # Attribute by TIME WINDOW, not job group: streaming drains and
        # MLlib fits run jobs under their own thread-local groups.
        qjobs = {
            jid: j
            for jid, j in jobs.items()
            if "end" in j and j["start"] >= t0 - 50 and j["start"] <= t1
        }
        print(f"\n=== {name}: wall {(t1 - t0) / 1000:.3f}s, "
              f"{len(qjobs)} jobs ===")
        # job timeline + gap analysis
        iv = sorted((j["start"], j["end"]) for j in qjobs.values())
        covered = 0.0
        cur_s, cur_e = None, None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            covered += cur_e - cur_s
        print(f"  job-covered: {covered / 1000:.3f}s; "
              f"driver gaps: {(t1 - t0 - covered) / 1000:.3f}s")
        rows = []
        for jid, j in sorted(qjobs.items()):
            jdur = (j["end"] - j["start"]) / 1000
            rows.append((jdur, jid, j))
        for jdur, jid, j in sorted(rows, reverse=True)[:12]:
            sl = []
            for sid in j["stages"]:
                st = stages.get(sid)
                if st and st.get("start") and st.get("end"):
                    sl.append(
                        f"{st['name'].split(' at ')[0]}#{sid}"
                        f"({(st['end'] - st['start']) / 1000:.2f}s"
                        f",{st['tasks']}t)"
                    )
            print(f"  job {jid}: {jdur:.3f}s  stages: {'; '.join(sl)}")


if __name__ == "__main__":
    main()
