"""Property-based invariants for MERGE and the change-data-feed diff:

- ``merge_frames`` equals a plain-Python merge reference for ANY
  target/source key multiplicity and clause-condition mix (not just the
  hand-picked unit cases in tests/test_merge.py);
- ``table_changes`` satisfies the CDF algebra: applying the diff to v1
  reconstructs v2 exactly as a multiset, for ANY pair of versions.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import Catalog
from olist_lakehouse_2_0_spark.operators.merge import merge_frames

# Tiny key/value domains force matched/unmatched overlap and duplicate
# row images far more often than uniform randomness would.
target_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 3)),  # (key, val)
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],  # target keys unique (table invariant)
)
source_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 3)),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],  # validated-unique source
)
rows_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 1)),  # collision-heavy
    min_size=0,
    max_size=8,
)


def _merge_expected(
    target: list[tuple[int, int]],
    source: list[tuple[int, int]],
    del_threshold: int,
    upd_threshold: int,
    insert_enabled: bool,
) -> set[tuple[int, int]]:
    src = dict(source)
    out = []
    for k, v in target:
        if k in src:
            sv = src[k]
            if sv >= del_threshold:
                continue  # matched delete
            if sv >= upd_threshold:
                out.append((k, sv))  # matched update
            else:
                out.append((k, v))  # matched, no clause fires
        else:
            out.append((k, v))  # not matched by source: kept
    if insert_enabled:
        tkeys = {k for k, _ in target}
        out.extend((k, v) for k, v in source if k not in tkeys)
    return set(out)


@pytest.mark.usefixtures("spark")
class TestMergeProperties:
    @given(
        target=target_strategy,
        source=source_strategy,
        del_threshold=st.integers(2, 4),
        upd_threshold=st.integers(0, 2),
        insert_enabled=st.booleans(),
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_merge_frames_equals_python_reference(
        self, spark, target, source, del_threshold, upd_threshold, insert_enabled
    ):
        t = spark.createDataFrame(
            [(k, v) for k, v in target] or [(None, None)], "k int, v int"
        )
        if not target:
            t = t.filter(F.lit(False))
        s = spark.createDataFrame(
            [(k, v) for k, v in source] or [(None, None)], "k int, v int"
        )
        if not source:
            s = s.filter(F.lit(False))
        got = {
            (r.k, r.v)
            for r in merge_frames(
                t,
                s,
                ["k"],
                matched_delete_condition=F.col("s.v") >= del_threshold,
                matched_update_condition=F.col("s.v") >= upd_threshold,
                update_set={"v": F.col("s.v")},
                insert_when_not_matched=insert_enabled,
            ).collect()
        }
        assert got == _merge_expected(
            target, source, del_threshold, upd_threshold, insert_enabled
        )

    @given(v1=rows_strategy, v2=rows_strategy)
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_table_changes_roundtrip_reconstructs_v2(
        self, spark, v1, v2, tmp_path_factory
    ):
        root = str(tmp_path_factory.mktemp("cdf_prop"))
        cat = Catalog(root=root)

        def frame(rows):
            df = spark.createDataFrame(rows or [(0, 0)], "a int, b int")
            return df.filter(F.lit(False)) if not rows else df

        cat.write_versioned(frame(v1), spark, "t")
        cat.write_versioned(frame(v2), spark, "t")
        changes = cat.table_changes(spark, "t", 1, 2).collect()
        # CDF algebra: v1 + inserts - deletes == v2 as multisets.
        acc = Counter(tuple(r) for r in v1)
        for r in changes:
            if r._change_type == "insert":
                acc[(r.a, r.b)] += 1
            else:
                acc[(r.a, r.b)] -= 1
        acc = +acc  # drop zero/negative entries
        assert acc == Counter(tuple(r) for r in v2)
        # And the diff is minimal: no row appears as both insert and
        # delete (unchanged rows never surface).
        ins = {(r.a, r.b) for r in changes if r._change_type == "insert"}
        dels = {(r.a, r.b) for r in changes if r._change_type == "delete"}
        assert not (ins & dels)
