"""CDC / SCD engine invariants (reference docs/CDC_GUIDE.md:279-308):
SCD1 one-row-per-live-key latest-by-sequence; SCD2 one current row per
live key, no validity gaps; incremental apply == batch rebuild."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.operators.cdc import (
    ChangeSpec,
    events_from_history,
    scd1_apply,
    scd1_snapshot,
    scd2_apply,
    scd2_history,
    validate_changes,
)

SPEC = ChangeSpec(
    keys=("customer_id",),
    sequence_by=("sequence_number",),
    operation_col="operation",
    except_columns=("change_timestamp",),
)

SCHEMA = (
    "sequence_number bigint, operation string, change_timestamp string, "
    "customer_id string, city string, state string"
)


@pytest.fixture(scope="module")
def batches(spark):
    """3 sequential CDC batches with out-of-order arrival inside a batch,
    multiple events per key in one batch, and DELETE then re-INSERT
    (FIXTURES.md §2 fixture requirements)."""
    b1 = spark.createDataFrame(
        [
            (10002, "UPDATE", "t2", "c1", "rio", "RJ"),       # out-of-order arrival
            (10001, "INSERT", "t1", "c1", "sao paulo", "SP"),
            (10003, "INSERT", "t3", "c2", "curitiba", "PR"),
        ],
        SCHEMA,
    )
    b2 = spark.createDataFrame(
        [
            (20001, "UPDATE", "t4", "c2", "porto alegre", "RS"),
            (20002, "DELETE", "t5", "c1", None, None),
            (20003, "INSERT", "t6", "c3", "salvador", "BA"),
            (20004, "UPDATE", "t7", "c3", "recife", "PE"),     # 2 events same key same batch
        ],
        SCHEMA,
    )
    b3 = spark.createDataFrame(
        [
            (30001, "INSERT", "t8", "c1", "belo horizonte", "MG"),  # re-insert after delete
            (30002, "DELETE", "t9", "c2", None, None),
        ],
        SCHEMA,
    )
    return b1, b2, b3


def test_scd1_snapshot_latest_wins(spark, batches):
    b1, _, _ = batches
    snap = {r.customer_id: r for r in scd1_snapshot(b1, SPEC).collect()}
    assert snap["c1"].city == "rio"  # seq 10002 wins despite arrival order
    assert snap["c2"].city == "curitiba"
    # envelope excluded (COLUMNS * EXCEPT), __seq system col present
    assert "operation" not in scd1_snapshot(b1, SPEC).columns
    assert "change_timestamp" not in scd1_snapshot(b1, SPEC).columns


def test_scd1_delete_and_reinsert(spark, batches):
    b1, b2, b3 = batches
    all_events = b1.unionByName(b2).unionByName(b3)
    snap = {r.customer_id: r for r in scd1_snapshot(all_events, SPEC).collect()}
    assert set(snap) == {"c1", "c3"}  # c2 deleted in b3; c1 re-inserted
    assert snap["c1"].city == "belo horizonte"
    assert snap["c3"].city == "recife"


def test_scd1_incremental_equals_batch(spark, batches):
    b1, b2, b3 = batches
    target = None
    for b in batches:
        target = scd1_apply(target, b, SPEC)
    full = scd1_snapshot(b1.unionByName(b2).unionByName(b3), SPEC)
    inc = {tuple(r) for r in target.collect()}
    bat = {tuple(r) for r in full.collect()}
    assert inc == bat


def test_scd1_out_of_order_across_batches(spark, batches):
    """A late event with a lower sequence must NOT overwrite newer state
    (docs/CDC_GUIDE.md:237-244)."""
    b1, _, _ = batches
    target = scd1_apply(None, b1, SPEC)
    late = spark.createDataFrame(
        [(9000, "UPDATE", "t0", "c1", "stale city", "XX")], SCHEMA
    )
    merged = {r.customer_id: r for r in scd1_apply(target, late, SPEC).collect()}
    assert merged["c1"].city == "rio"


def test_scd2_versions_and_current(spark, batches):
    b1, b2, b3 = batches
    hist = scd2_history(b1.unionByName(b2).unionByName(b3), SPEC)
    rows = hist.collect()
    c1 = sorted([r for r in rows if r.customer_id == "c1"], key=lambda r: r["__start_at"])
    # c1: insert(10001) -> update(10002) -> delete(20002) -> reinsert(30001)
    assert [r.city for r in c1] == ["sao paulo", "rio", "belo horizonte"]
    assert [r["__end_at"] for r in c1] == [10002, 20002, None]  # delete closes v2
    assert [r["__is_current"] for r in c1] == [False, False, True]
    # c2 fully deleted: no current row
    c2 = [r for r in rows if r.customer_id == "c2"]
    assert all(not r["__is_current"] for r in c2)


def test_scd2_invariants(spark, batches):
    """One current row per live key; no validity gaps
    (docs/CDC_GUIDE.md:279-308 verification queries)."""
    b1, b2, b3 = batches
    hist = scd2_history(b1.unionByName(b2).unionByName(b3), SPEC)
    cur_counts = (
        hist.filter("__is_current").groupBy("customer_id").count().collect()
    )
    assert all(r["count"] == 1 for r in cur_counts)
    # gap check: self-join successive versions (reference CDC_GUIDE.md:303-308)
    h1 = hist.alias("a")
    h2 = hist.alias("b")
    successive = h1.join(
        h2,
        (F.col("a.customer_id") == F.col("b.customer_id"))
        & (F.col("a.__end_at") == F.col("b.__start_at")),
        "inner",
    ).count()
    closed_with_successor = hist.filter(F.col("__end_at").isNotNull()).count()
    # every closed version either has a successor or was closed by DELETE
    deletes = 2  # c1@20002 (reopened later), c2@30002
    assert successive == closed_with_successor - deletes


def test_scd2_incremental_equals_batch(spark, batches):
    b1, b2, b3 = batches
    target = None
    for b in batches:
        target = scd2_apply(target, b, SPEC)
    full = scd2_history(b1.unionByName(b2).unionByName(b3), SPEC)
    inc = {tuple(r) for r in target.collect()}
    bat = {tuple(r) for r in full.collect()}
    assert inc == bat


def test_scd2_late_event_splices_into_history(spark, batches):
    b1, _, _ = batches
    target = scd2_apply(None, b1, SPEC)
    late = spark.createDataFrame(
        [(10001 + 1, "UPDATE", "tx", "c2", "florianopolis", "SC")], SCHEMA
    )  # seq 10002 < existing c2 insert at 10003? no: 10002 BEFORE 10003
    merged = scd2_apply(target, late, SPEC)
    c2 = sorted(
        [r for r in merged.collect() if r.customer_id == "c2"],
        key=lambda r: r["__start_at"],
    )
    # late event becomes the first version, closed by the original insert
    assert [r.city for r in c2] == ["florianopolis", "curitiba"]
    assert c2[0]["__end_at"] == 10003
    assert c2[1]["__is_current"]


def test_events_from_history_roundtrip(spark, batches):
    b1, b2, b3 = batches
    hist = scd2_history(b1.unionByName(b2).unionByName(b3), SPEC)
    replay_spec = ChangeSpec(
        keys=("customer_id",), sequence_by=("__evt_seq",), operation_col="__evt_op"
    )
    rebuilt = scd2_history(events_from_history(hist, SPEC), replay_spec)
    orig = {tuple(r) for r in hist.collect()}
    new = {
        tuple(r)
        for r in rebuilt.select(*[c for c in hist.columns]).collect()
    }
    assert orig == new


def test_track_history_except_suppresses_versions(spark):
    spec = ChangeSpec(
        keys=("k",),
        sequence_by=("seq",),
        track_history_except=("noise",),
    )
    df = spark.createDataFrame(
        [
            (1, "INSERT", "a", "x", 1.0),
            (2, "UPDATE", "a", "x", 2.0),  # only 'noise' changed: no new version
            (3, "UPDATE", "a", "y", 3.0),  # tracked 'v' changed: new version
        ],
        "seq bigint, operation string, k string, v string, noise double",
    )
    hist = scd2_history(df, spec)
    versions = sorted(hist.collect(), key=lambda r: r["__start_at"])
    assert [r.v for r in versions] == ["x", "y"]
    assert versions[0]["__end_at"] == 3


def test_validate_changes(spark):
    spec = ChangeSpec(keys=("k",), sequence_by=("seq",))
    df = spark.createDataFrame(
        [
            (1, "INSERT", "a"),
            (None, "UPDATE", "a"),   # null sequence
            (2, "UPDATE", None),     # null key
            (3, "UPDATE", "b"),
            (3, "DELETE", "b"),      # duplicate (key, seq)
        ],
        "seq bigint, operation string, k string",
    )
    viols = validate_changes(df, spec).collect()
    reasons = sorted(r["__violation"] for r in viols)
    assert reasons == ["duplicate_sequence", "duplicate_sequence", "null_key", "null_sequence"]


def test_cdc_sink_streaming_end_to_end(spark, batches, tmp_path):
    """CdcSink through a real streaming query: CDC batches land as
    files, availableNow replays them through foreachBatch SCD1 apply;
    the resulting snapshot equals the single-batch rebuild."""
    from olist_lakehouse_2_0_spark.operators.cdc import CdcSink

    b1, b2, b3 = batches
    landing = tmp_path / "landing"
    landing.mkdir()
    for i, b in enumerate((b1, b2, b3)):
        b.coalesce(1).write.parquet(str(landing / f"batch{i}"))

    target = str(tmp_path / "scd1")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    sink = CdcSink(target, SPEC, scd_type=1)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(target)
    expected = scd1_snapshot(b1.unionByName(b2).unionByName(b3), SPEC)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_cdc_sink_streaming_scd2_end_to_end(spark, batches, tmp_path):
    """CdcSink SCD2 through a real streaming query (C3 incremental):
    micro-batched apply — including the delete-then-reinsert run and
    same-batch multi-versions — must equal the one-shot history over
    all events."""
    from olist_lakehouse_2_0_spark.operators.cdc import CdcSink, scd2_history

    b1, b2, b3 = batches
    landing = tmp_path / "landing2"
    landing.mkdir()
    for i, b in enumerate((b1, b2, b3)):
        b.coalesce(1).write.parquet(str(landing / f"batch{i}"))

    target = str(tmp_path / "scd2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing) + "/*")
    )
    sink = CdcSink(target, SPEC, scd_type=2)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(target)
    expected = scd2_history(b1.unionByName(b2).unionByName(b3), SPEC)
    assert sorted(got.columns) == sorted(expected.columns)
    cols = sorted(got.columns)
    assert got.select(cols).exceptAll(expected.select(cols)).count() == 0
    assert expected.select(cols).exceptAll(got.select(cols)).count() == 0


def test_orphan_delete_across_batches_not_resurrected(spark, tmp_path):
    """A DELETE whose micro-batch arrives BEFORE the batch carrying the
    key's INSERT must stay deleted (SCD1) and close the version (SCD2).
    The target alone cannot represent the orphan delete — the
    tombstone sidecar must carry it across batches. Regression for the
    round-2 oracle-gate failure."""
    from olist_lakehouse_2_0_spark.operators.cdc import CdcSink

    # arrival: batch A = {DELETE c9@seq 84}, batch B = {INSERT c9@seq 10,
    # UPDATE c9@seq 205}; truth in sequence order: 10, 84(DELETE), 205.
    batch_a = spark.createDataFrame(
        [(84, "DELETE", "ta", "c9", "x", "XX")], SCHEMA
    )
    batch_b = spark.createDataFrame(
        [(10, "INSERT", "tb", "c9", "sp", "SP"),
         (205, "UPDATE", "tc", "c9", "ba", "BA")],
        SCHEMA,
    )
    for scd_type, check in ((1, "snap"), (2, "hist")):
        sink = CdcSink(str(tmp_path / f"t{scd_type}"), SPEC, scd_type=scd_type)
        sink(batch_a, 0)
        sink(batch_b, 1)
        out = spark.read.parquet(sink.path)
        if check == "snap":
            rows = {r["customer_id"]: r["city"] for r in out.collect()}
            assert rows == {"c9": "ba"}  # state at seq 205 survives
        else:
            vers = sorted(
                (r["__start_at"], r["__end_at"]) for r in out.collect()
            )
            # version 10 closed by the delete at 84, version 205 open —
            # NOT version 10 closed at 205 (the resurrect bug).
            assert vers == [(10, 84), (205, None)]

    # trailing orphan delete: the delete is the LAST event overall
    sink = CdcSink(str(tmp_path / "t3"), SPEC, scd_type=1)
    sink(spark.createDataFrame([(300, "DELETE", "td", "c9", "x", "XX")], SCHEMA), 0)
    sink(batch_b, 1)
    assert spark.read.parquet(sink.path).count() == 0


def test_cdc_sink_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between the swap renames leaves the table aside as
    __old; the next batch must restore and keep merging instead of
    rebuilding from the incoming batch alone."""
    import os
    import shutil

    from olist_lakehouse_2_0_spark.operators.cdc import CdcSink

    sink = CdcSink(str(tmp_path / "t"), SPEC, scd_type=1)
    sink(spark.createDataFrame([(1, "INSERT", "t1", "c1", "sp", "SP")], SCHEMA), 0)
    # simulate a crash mid-swap: promoted target missing, aside present
    shutil.move(sink.path, sink.path + "__old")
    assert not os.path.exists(sink.path)
    sink(spark.createDataFrame([(2, "UPDATE", "t2", "c2", "ba", "BA")], SCHEMA), 1)
    rows = {r["customer_id"]: r["city"] for r in
            spark.read.parquet(sink.path).collect()}
    assert rows == {"c1": "sp", "c2": "ba"}  # c1 survived the crash


def test_cdc_sink_tombstone_replay_idempotent(spark, tmp_path):
    """The append-only tombstone sidecar's crash contract: a batch that
    crashed AFTER its tombstone append but before the checkpoint
    commits is replayed in full — the duplicate appended tombstones
    must not change the final state, and the orphan-delete guarantee
    (delete arriving before its key's insert) must survive the
    replay."""
    from olist_lakehouse_2_0_spark.operators.cdc import CdcSink

    sink = CdcSink(str(tmp_path / "t"), SPEC, scd_type=1)
    # Batch 0 carries an ORPHAN delete for c9 (no prior row) + a row.
    b0 = spark.createDataFrame(
        [
            (5, "DELETE", "t1", "c9", None, None),
            (1, "INSERT", "t1", "c1", "sp", "SP"),
        ],
        SCHEMA,
    )
    sink(b0, 0)
    # Replay the SAME batch (crash-after-append => duplicate tombstones
    # in the log), then a later batch tries to resurrect c9 with a
    # STALE (pre-delete) sequence.
    sink(b0, 0)
    sink(
        spark.createDataFrame([(3, "INSERT", "t2", "c9", "rj", "RJ")], SCHEMA),
        1,
    )
    rows = {
        r["customer_id"]: r["city"]
        for r in spark.read.parquet(sink.path).collect()
    }
    assert rows == {"c1": "sp"}  # c9's stale insert stays dead
    # The log holds duplicates; the deduped view holds exactly one.
    log = spark.read.parquet(sink.deletes_path)
    assert log.count() >= 2
    assert log.distinct().count() == 1


def test_cdc_sink_recovers_uncommitted_first_write(spark, tmp_path):
    """A crash DURING the very first target write (no rename-aside
    protects batch 0) leaves the directory holding only an uncommitted
    ``_temporary/`` subtree: fs.exists is True but there is no parquet
    footer to infer a schema from. The replayed batch must treat that
    debris as "no target yet" and overwrite it — not wedge every
    restart on AnalysisException."""
    import os

    from olist_lakehouse_2_0_spark.operators.cdc import CdcSink

    sink = CdcSink(str(tmp_path / "t"), SPEC, scd_type=1)
    os.makedirs(os.path.join(sink.path, "_temporary", "0"))
    sink(spark.createDataFrame([(1, "INSERT", "t1", "c1", "sp", "SP")], SCHEMA), 0)
    rows = {r["customer_id"]: r["city"] for r in
            spark.read.parquet(sink.path).collect()}
    assert rows == {"c1": "sp"}


def test_cdc_sink_restores_stranded_tombstone_log(spark, tmp_path):
    """A pre-round-4 run could crash mid-swap of the DELETES sidecar,
    leaving the whole log aside at __deletes__old. The append-only
    path must restore it before appending — otherwise a fresh log
    starts from this batch alone and earlier orphan tombstones are
    silently lost, resurrecting deleted keys."""
    import os
    import shutil

    from olist_lakehouse_2_0_spark.operators.cdc import CdcSink

    sink = CdcSink(str(tmp_path / "t"), SPEC, scd_type=1)
    # Batch 0: orphan delete for c9 lands in the tombstone log.
    sink(spark.createDataFrame(
        [(5, "DELETE", "t1", "c9", None, None)], SCHEMA), 0)
    # Simulate the legacy crash layout: log stranded at __deletes__old.
    shutil.move(sink.deletes_path, sink.deletes_path + "__old")
    assert not os.path.exists(sink.deletes_path)
    # Batch 1 carries c9's stale (pre-delete) insert; without the
    # restore the fresh log would not know about the seq-5 tombstone.
    sink(spark.createDataFrame(
        [(3, "INSERT", "t2", "c9", "rj", "RJ")], SCHEMA), 1)
    assert spark.read.parquet(sink.path).count() == 0  # c9 stays dead
