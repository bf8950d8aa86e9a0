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
