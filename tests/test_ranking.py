"""distributed_row_number: the two-pass global rank must be
value-identical to the single-partition window on any total order."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olist_lakehouse_2_0_spark.operators.ranking import distributed_row_number


def _window_rank(df, order_by):
    return df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order_by))
    )


def test_matches_window_on_documents_lengths(spark, sf_correctness):
    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet").select(
        "doc_id", F.length("text").alias("n")
    )
    order = [F.col("n").desc(), F.col("doc_id")]
    got = {
        (r.doc_id, r.rn)
        for r in distributed_row_number(docs, order, num_partitions=8).collect()
    }
    want = {(r.doc_id, r.rn) for r in _window_rank(docs, order).collect()}
    assert got == want


def test_ranks_are_contiguous_and_partitioned(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("k")
    )
    order = [F.col("k"), F.col("id")]
    out = distributed_row_number(df, order, num_partitions=7)
    rns = [r.rn for r in out.orderBy("rn").collect()]
    assert rns == list(range(1, 1001))


def test_empty_frame(spark):
    df = spark.range(0).select(F.col("id"))
    assert distributed_row_number(df, [F.col("id")]).count() == 0


@pytest.mark.usefixtures("spark")
class TestRankingProperties:
    @given(
        rows=st.lists(
            st.integers(0, 5), min_size=0, max_size=30
        ),
        n_parts=st.integers(1, 5),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_window_any_collision_heavy_order(
        self, spark, rows, n_parts
    ):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(rows)] or [(0, 0)], "i long, v long"
        )
        if not rows:
            df = df.filter(F.lit(False))
        order = [F.col("v").desc(), F.col("i")]  # ties on v, i breaks them
        got = {
            (r.i, r.rn)
            for r in distributed_row_number(
                df, order, num_partitions=n_parts
            ).collect()
        }
        want = {(r.i, r.rn) for r in _window_rank(df, order).collect()}
        assert got == want
