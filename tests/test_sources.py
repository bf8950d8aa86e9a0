"""JSON-lines and raw-text sources: same rescue + audit contract as the
CSV bronze source."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from olist_lakehouse_2_0_spark.sources.batch import (
    RESCUE_COL,
    read_jsonl,
    read_text,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def test_jsonl_reads_rescues_and_audits(spark, tmp_path):
    raw = str(tmp_path / "jsonl")
    os.makedirs(raw)
    with open(os.path.join(raw, "part0.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "hello world", "source": "web"}\n')
        # extra field: dropped by the pinned schema, not rescued
        f.write('{"doc_id": 2, "text": "ok", "source": "web", "extra": 1}\n')
        # malformed line: rescued, not fatal
        f.write('{"doc_id": 3, "text": unquoted}\n')
    df = read_jsonl(spark, raw, DOC_SCHEMA)
    rows = df.collect()
    assert len(rows) == 3
    rescued = [r for r in rows if r[RESCUE_COL] is not None]
    assert len(rescued) == 1 and "unquoted" in rescued[0][RESCUE_COL]
    ok = {r.doc_id for r in rows if r[RESCUE_COL] is None}
    assert ok == {1, 2}
    assert {"_source_file", "_file_modified_at", "_ingested_at"} <= set(df.columns)


def test_nanos_timestamp_parquet_loads_and_stays_readable(spark, tmp_path):
    """TIMESTAMP(NANOS) parquet (rejected by Spark's reader without the
    nanosAsLong legacy flag) must load via the events loader AND stay
    executable after the loader returns — Spark re-reads the flag when
    the physical scan is built, so the loader must leave it set."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from olist_lakehouse_2_0_spark.catalog import _load_nanos_ts

    base = 1_700_000_000_000_000_000  # epoch nanos
    table = pa.table(
        {
            "ts": pa.array([base, base + 1_500_000], type=pa.timestamp("ns")),
            "v": pa.array([1, 2], type=pa.int64()),
        }
    )
    path = str(tmp_path / "nanos.parquet")
    pq.write_table(table, path, version="2.6", coerce_timestamps=None)
    assert pq.read_schema(path).field("ts").type == pa.timestamp("ns")

    df = _load_nanos_ts(spark, path, "ts")
    # interleave an unrelated read, then execute the lazy plan
    spark.range(3).count()
    rows = {r["v"]: r["ts"] for r in df.collect()}
    assert rows[1] == dt.datetime.utcfromtimestamp(base / 1e9)
    # nano sub-microsecond flooring: +1.5ms lands on the exact micro
    assert (rows[2] - rows[1]).total_seconds() == 0.0015


def test_orc_roundtrip_with_pushdown(spark, sf_smoke, tmp_path):
    from olist_lakehouse_2_0_spark.catalog import load
    from olist_lakehouse_2_0_spark.sources.batch import read_orc

    li = load(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    path = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(path)

    back = read_orc(spark, path)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)

    filtered = back.filter(back.l_orderkey == 1)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    # predicate reaches the ORC scan, same as parquet
    assert "PushedFilters" in plan and "l_orderkey" in plan
    assert filtered.count() == li.filter(li.l_orderkey == 1).count()


def test_sql_entry_point_matches_dataframe_api(spark, sf_smoke):
    """spark.sql over registered views must give the same answer as
    the DataFrame formulation (same Catalyst plans underneath)."""
    from olist_lakehouse_2_0_spark.catalog import run_sql
    from olist_lakehouse_2_0_spark.queries.join_grouping import (
        CUSTOMER_ORDER_DISTRIBUTION_SQL,
        customer_order_distribution,
    )

    via_sql = run_sql(spark, sf_smoke, CUSTOMER_ORDER_DISTRIBUTION_SQL)
    via_df = customer_order_distribution(spark, sf_smoke)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    cols = sorted(via_sql.columns)
    assert sorted(map(tuple, via_sql.select(cols).collect())) == sorted(
        map(tuple, via_df.select(cols).collect())
    )


def test_text_line_and_whole_file_modes(spark, tmp_path):
    raw = str(tmp_path / "txt")
    os.makedirs(raw)
    for name, body in (("a.txt", "line one\nline two\n"), ("b.txt", "solo\n")):
        with open(os.path.join(raw, name), "w") as f:
            f.write(body)

    lines = read_text(spark, raw)
    assert sorted(r.value for r in lines.collect()) == [
        "line one",
        "line two",
        "solo",
    ]

    docs = read_text(spark, raw, whole_file=True)
    got = {os.path.basename(r._source_file): r.value for r in docs.collect()}
    assert got == {"a.txt": "line one\nline two\n", "b.txt": "solo\n"}
