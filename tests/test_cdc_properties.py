"""Property-based CDC invariants (hypothesis): for ANY event sequence —
random keys, operations, batch boundaries — the SCD engine must uphold:

1. SCD1 snapshot == last non-delete state per key, by sequence order.
2. SCD2: exactly one current row per live key, zero for deleted keys.
3. SCD2: no validity gaps — each version's __END_AT equals the next
   version's __START_AT (reference docs/CDC_GUIDE.md:303-308).
4. Incremental apply (events split across batches in arrival order)
   == single-batch rebuild, regardless of where the batch boundary
   falls.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.operators.cdc import (
    ChangeSpec,
    scd1_snapshot,
    scd2_apply,
    scd2_history,
    scd1_apply,
)

SPEC = ChangeSpec(
    keys=("k",),
    sequence_by=("seq",),
    operation_col="op",
    except_columns=(),
)

SCHEMA = "seq bigint, op string, k string, val string"

# A scenario: per-event (key_index, op_code, value_index); sequence
# numbers are the (unique, increasing) positions. Arrival order is
# shuffled relative to sequence by drawing a permutation seed.
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key index (few keys -> collisions)
        st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
        st.integers(min_value=0, max_value=5),  # value index
    ),
    min_size=1,
    max_size=12,
)


def _mk_rows(evts):
    return [
        (i + 1, op, f"k{ki}", f"v{vi}" if op != "DELETE" else None)
        for i, (ki, op, vi) in enumerate(evts)
    ]


def _expected_live(evts):
    """Reference model: replay in sequence order in plain Python."""
    state: dict[str, str | None] = {}
    for i, (ki, op, vi) in enumerate(evts):
        key = f"k{ki}"
        if op == "DELETE":
            state.pop(key, None)
        else:
            state[key] = f"v{vi}"
    return state


@pytest.mark.usefixtures("spark")
class TestCdcProperties:
    @given(evts=events_strategy)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_scd1_matches_python_replay(self, spark, evts):
        df = spark.createDataFrame(_mk_rows(evts), SCHEMA)
        snap = scd1_snapshot(df, SPEC)
        got = {r["k"]: r["val"] for r in snap.collect()}
        assert got == _expected_live(evts)

    @given(evts=events_strategy)
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_scd2_invariants_hold(self, spark, evts):
        df = spark.createDataFrame(_mk_rows(evts), SCHEMA)
        hist = scd2_history(df, SPEC)
        live = _expected_live(evts)

        current = hist.filter(F.col("__IS_CURRENT")).groupBy("k").count()
        got_current = {r["k"]: r["count"] for r in current.collect()}
        # exactly one current row per live key, none for deleted keys
        assert got_current == {k: 1 for k in live}

        # Versions are non-overlapping and contiguous, except that a
        # DELETE legitimately opens an absence gap: a version may start
        # after the previous one ended only if the previous version was
        # closed by a DELETE event (prev __END_AT == that delete's seq).
        from pyspark.sql import Window as W

        delete_seqs = {
            (f"k{ki}", i + 1)
            for i, (ki, op, _vi) in enumerate(evts)
            if op == "DELETE"
        }
        w = W.partitionBy("k").orderBy("__START_AT")
        pairs = (
            hist.withColumn("__prev_end", F.lag("__END_AT").over(w))
            .filter(F.col("__prev_end").isNotNull())
            .select("k", "__prev_end", "__START_AT")
            .collect()
        )
        for r in pairs:
            assert r["__prev_end"] <= r["__START_AT"]  # never overlap
            if r["__prev_end"] != r["__START_AT"]:
                assert (r["k"], r["__prev_end"]) in delete_seqs

    @given(evts=events_strategy, cut=st.integers(min_value=0, max_value=12))
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_incremental_equals_batch(self, spark, evts, cut):
        cut = min(cut, len(evts))
        rows = _mk_rows(evts)
        full = spark.createDataFrame(rows, SCHEMA)
        expected1 = scd1_snapshot(full, SPEC)
        expected2 = scd2_history(full, SPEC)

        t1 = t2 = None
        for part in (rows[:cut], rows[cut:]):
            if not part:
                continue
            batch = spark.createDataFrame(part, SCHEMA)
            t1 = scd1_apply(t1, batch, SPEC)
            t2 = scd2_apply(t2, batch, SPEC)
        if t1 is None:
            return

        assert t1.exceptAll(expected1).count() == 0
        assert expected1.exceptAll(t1).count() == 0
        assert t2.exceptAll(expected2).count() == 0
        assert expected2.exceptAll(t2).count() == 0
