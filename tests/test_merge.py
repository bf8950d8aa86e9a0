"""MERGE INTO + optimistic concurrency over the versioned layout.

Delta's flagship write primitive (reference README.md:302-308 — the
reference's storage layer is Delta; its AUTO CDC flows compile to MERGE
under DLT) re-expressed Spark-first: ``merge_frames`` computes the
post-merge relation in one full-outer-join plan; ``Catalog.merge_into``
persists it with compare-and-swap promotion so a concurrent writer's
commit is detected, not silently overwritten (the lost-update anomaly).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import Catalog, ConcurrentWriteError
from olist_lakehouse_2_0_spark.operators.merge import merge_frames


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id int, tag string, amount double",
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_update_insert_defaults(spark):
    # Default clauses: matched -> update all shared non-key cols from
    # the source; not matched -> insert.
    source = spark.createDataFrame(
        [(2, "B", 200.0), (5, "e", 50.0)], "id int, tag string, amount double"
    )
    out = merge_frames(_target(spark), source, ["id"])
    assert _rows(out) == {
        (1, "a", 10.0),
        (2, "B", 200.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
        (5, "e", 50.0),
    }


def test_merge_clause_ladder(spark):
    # delete-when-matched wins over update (Delta clause order when the
    # delete clause is listed first); conditional update leaves
    # non-qualifying matches untouched; conditional insert filters.
    source = spark.createDataFrame(
        [(1, "DEL", 0.0), (2, "upd", 999.0), (3, "skip", 1.0), (9, "new", 90.0),
         (10, "reject", 100.0)],
        "id int, tag string, amount double",
    )
    out = merge_frames(
        _target(spark),
        source,
        ["id"],
        matched_delete_condition=F.col("s.tag") == "DEL",
        matched_update_condition=F.col("s.amount") > 100,
        update_set={"amount": F.col("s.amount")},
        not_matched_insert_condition=F.col("s.amount") < 95,
    )
    assert _rows(out) == {
        # id=1 deleted; id=2 updated (amount only — tag kept);
        # id=3 matched but condition false -> unchanged; id=4 untouched;
        # id=9 inserted; id=10 insert condition false -> dropped.
        (2, "b", 999.0),
        (3, "c", 30.0),
        (4, "d", 40.0),
        (9, "new", 90.0),
    }


def test_merge_not_matched_by_source_delete(spark):
    # Delta's WHEN NOT MATCHED BY SOURCE THEN DELETE: target rows the
    # source doesn't mention are purged when the condition holds
    # (full-sync semantics).
    source = spark.createDataFrame([(2, "b2", 2.0)], "id int, tag string, amount double")
    out = merge_frames(
        _target(spark),
        source,
        ["id"],
        delete_when_not_matched_by_source=F.col("t.amount") > 25,
    )
    assert _rows(out) == {(1, "a", 10.0), (2, "b2", 2.0)}


def test_merge_null_keys_never_match(spark):
    # ANSI MERGE: NULL keys fall through to the not-matched clause.
    source = spark.createDataFrame(
        [(None, "n", 1.0)], "id int, tag string, amount double"
    )
    out = merge_frames(_target(spark), source, ["id"])
    assert out.count() == 5
    assert out.filter(F.col("id").isNull()).count() == 1


def test_merge_missing_source_column_inserts_null(spark):
    source = spark.createDataFrame([(7, "g")], "id int, tag string")
    out = merge_frames(_target(spark), source, ["id"])
    row = out.filter(F.col("id") == 7).collect()[0]
    assert (row.tag, row.amount) == ("g", None)


def test_merge_duplicate_source_keys_validated(spark):
    source = spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "id int, tag string, amount double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_frames(_target(spark), source, ["id"], validate_unique_source=True)


def test_catalog_merge_into_and_time_travel(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(_target(spark), spark, "t", layer="gold")
    source = spark.createDataFrame(
        [(1, "A", 100.0), (8, "h", 80.0)], "id int, tag string, amount double"
    )
    cat.merge_into(spark, source, "t", ["id"], layer="gold")
    after = cat.read(spark, "t", layer="gold")
    assert _rows(after.filter(F.col("id").isin(1, 8))) == {
        (1, "A", 100.0),
        (8, "h", 80.0),
    }
    # Snapshot isolation: the pre-merge version is still readable.
    before = cat.read_version(spark, "t", 1, layer="gold")
    assert _rows(before.filter(F.col("id") == 1)) == {(1, "a", 10.0)}


def test_cas_promote_detects_concurrent_commit(spark, tmp_path):
    # Two writers read version 1; B commits first; A's CAS promote
    # must raise, not overwrite or nest (Hadoop local-FS rename onto an
    # existing directory nests the source inside it and returns true —
    # promote_version detects and undoes the nest).
    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(spark.range(10), spark, "t")
    base = cat.latest_version_number(spark, "t")
    cat.stage_version(spark.range(20), "t", token="a")
    cat.stage_version(spark.range(30), "t", token="b")
    cat.promote_version(spark, "t", expected_version=base, token="b")
    with pytest.raises(ConcurrentWriteError):
        cat.promote_version(spark, "t", expected_version=base, token="a")
    # B's commit is intact — no nested directory, right row count.
    assert cat.read(spark, "t").count() == 30
    assert cat.latest_version_number(spark, "t") == 2


def test_merge_into_retries_after_conflict_no_lost_update(spark, tmp_path):
    # The classic lost-update test: writer A reads v1, writer B merges
    # (v2), then A merges with a stale read. A must retry against v2 so
    # BOTH updates survive.
    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(_target(spark), spark, "t")
    b_src = spark.createDataFrame([(2, "fromB", 2.0)], "id int, tag string, amount double")
    a_src = spark.createDataFrame([(3, "fromA", 3.0)], "id int, tag string, amount double")

    # Simulate A's stale read deterministically: stage A's merge
    # against v1, let B commit v2, then drive A through merge_into,
    # whose first CAS attempt conflicts and whose retry recomputes.
    base = cat.latest_version_number(spark, "t")
    target_v1 = cat.read_version(spark, "t", base)
    stale_merged = merge_frames(target_v1, a_src, ["id"])
    cat.stage_version(stale_merged, "t", token="stale-a")
    cat.merge_into(spark, b_src, "t", ["id"])  # B wins the race
    with pytest.raises(ConcurrentWriteError):
        cat.promote_version(spark, "t", expected_version=base, token="stale-a")
    cat.merge_into(spark, a_src, "t", ["id"])  # A retries properly
    final = cat.read(spark, "t")
    assert _rows(final.filter(F.col("id").isin(2, 3))) == {
        (2, "fromB", 2.0),
        (3, "fromA", 3.0),
    }


def test_merge_into_requires_existing_table(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    src = spark.createDataFrame([(1, "a", 1.0)], "id int, tag string, amount double")
    with pytest.raises(ValueError, match="no committed version"):
        cat.merge_into(spark, src, "missing", ["id"])


def test_delete_where_and_update_where(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(_target(spark), spark, "t")
    cat.update_where(
        spark, "t", F.col("tag") == "b", {"amount": F.col("amount") * 10}
    )
    cat.delete_where(spark, "t", F.col("id") == 4)
    final = cat.read(spark, "t")
    assert _rows(final) == {(1, "a", 10.0), (2, "b", 200.0), (3, "c", 30.0)}


def test_table_changes_multiset_diff(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    # v1 has a duplicate row (2 copies of id=1); v2 drops one copy,
    # updates id=2, inserts id=9.
    v1 = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (3, "c")], "id int, tag string"
    )
    v2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c"), (9, "z")], "id int, tag string"
    )
    cat.write_versioned(v1, spark, "t")
    cat.write_versioned(v2, spark, "t")
    changes = {
        (r.id, r.tag, r._change_type)
        for r in cat.table_changes(spark, "t", 1, 2).collect()
    }
    assert changes == {
        (1, "a", "delete"),   # net one copy removed (multiset)
        (2, "b", "delete"),
        (2, "B", "insert"),   # update = delete preimage + insert postimage
        (9, "z", "insert"),
    }
    # Unchanged rows (id=3, one surviving id=1 copy) never appear.
    assert cat.table_changes(spark, "t", 1, 2).count() == 4


def test_table_changes_counts_net_copies(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    one = spark.createDataFrame([(1, "a")], "id int, tag string")
    three = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "a")], "id int, tag string"
    )
    cat.write_versioned(one, spark, "t")
    cat.write_versioned(three, spark, "t")
    rows = cat.table_changes(spark, "t", 1, 2).collect()
    assert len(rows) == 2 and all(r._change_type == "insert" for r in rows)


def test_vacuum_staging_reclaims_crashed_writers_only(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(_target(spark), spark, "t")
    # Two crashed writers left staging behind; one committed version.
    cat.stage_version(spark.range(5), "t", token="crashed-1")
    cat.stage_version(spark.range(6), "t", token="crashed-2")
    assert cat.vacuum_staging(spark, "t") == 2
    assert cat.vacuum_staging(spark, "t") == 0  # idempotent
    assert cat.read(spark, "t").count() == 4  # committed data intact
    assert cat.vacuum_staging(spark, "missing") == 0


def test_versioned_merge_sink_out_of_order_and_replay(spark, tmp_path):
    """The streaming upsert sink's sequence guard: out-of-order batches
    are no-ops for stale keys, and replaying a batch (at-least-once
    delivery) leaves the table unchanged."""
    from olist_lakehouse_2_0_spark.streaming.upsert import VersionedMergeSink

    cat = Catalog(root=str(tmp_path))
    sink = VersionedMergeSink(cat, "t", keys=("k",), sequence_col="seq")
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (1, 12, "b"), (2, 5, "x")], "k int, seq int, v string"
    )
    b2 = spark.createDataFrame(
        [(1, 11, "stale"), (2, 6, "y"), (3, 1, "new")],
        "k int, seq int, v string",
    )
    sink(b1, 0)
    sink(b2, 1)
    want = {(1, 12, "b"), (2, 6, "y"), (3, 1, "new")}
    assert _rows(cat.read(spark, "t")) == want
    sink(b2, 1)  # replay: every row stale or equal-seq -> no-op
    assert _rows(cat.read(spark, "t")) == want


def test_merge_into_true_thread_concurrency(spark, tmp_path):
    """Two driver threads merge_into the same table CONCURRENTLY (real
    race, not a scripted interleaving): whichever CAS loses must retry
    and recompute, so both updates land and exactly two commits happen
    regardless of timing."""
    from concurrent.futures import ThreadPoolExecutor

    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(_target(spark), spark, "t")
    a_src = spark.createDataFrame(
        [(1, "A", 111.0)], "id int, tag string, amount double"
    )
    b_src = spark.createDataFrame(
        [(4, "B", 444.0)], "id int, tag string, amount double"
    )

    def do(src):
        return cat.merge_into(spark, src, "t", ["id"], max_retries=5)

    with ThreadPoolExecutor(max_workers=2) as pool:
        fa, fb = pool.submit(do, a_src), pool.submit(do, b_src)
        fa.result(), fb.result()

    final = cat.read(spark, "t")
    assert _rows(final.filter(F.col("id").isin(1, 4))) == {
        (1, "A", 111.0),
        (4, "B", 444.0),
    }
    assert cat.latest_version_number(spark, "t") == 3


def test_cas_conflicts_even_when_contended_slot_was_vacuumed(spark, tmp_path):
    """The retention-hole regression: a stale writer whose v(expected+1)
    slot was deleted by later writers' retention must still CONFLICT —
    before the fresh-listing check, its rename onto the reused number
    SUCCEEDED and silently committed a version readers never resolve."""
    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(spark.range(10), spark, "t")          # v1
    base = cat.latest_version_number(spark, "t")
    cat.stage_version(spark.range(99), "t", token="stale")
    for n in (20, 30, 40):                                    # v2..v4
        cat.write_versioned(spark.range(n), spark, "t")       # keep=2
    # v2 (the slot the stale writer would claim) is now vacuumed.
    import os
    assert not os.path.exists(str(tmp_path / "t" / "v000000002"))
    with pytest.raises(ConcurrentWriteError):
        cat.promote_version(spark, "t", expected_version=base, token="stale")
    assert cat.read(spark, "t").count() == 40  # latest untouched
    assert cat.latest_version_number(spark, "t") == 4


def test_cas_promote_rejects_keep_below_two(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(spark.range(5), spark, "t")
    cat.stage_version(spark.range(6), "t", token="x")
    with pytest.raises(ValueError, match="keep >= 2"):
        cat.promote_version(spark, "t", keep=1, expected_version=1, token="x")


def test_merge_not_matched_by_source_update(spark):
    """Delta's WHEN NOT MATCHED BY SOURCE THEN UPDATE: target rows the
    source stopped mentioning get marked (expressions see t.* only);
    the NBS delete clause still wins over the NBS update when both
    fire."""
    source = spark.createDataFrame(
        [(2, "b2", 2.0)], "id int, tag string, amount double"
    )
    out = merge_frames(
        _target(spark),
        source,
        ["id"],
        not_matched_by_source_update_set={"tag": F.lit("stale")},
        not_matched_by_source_update_condition=F.col("t.amount") < 35,
        delete_when_not_matched_by_source=F.col("t.amount") > 35,
    )
    assert _rows(out) == {
        (1, "stale", 10.0),   # NBS update fires
        (2, "b2", 2.0),       # matched update
        (3, "stale", 30.0),   # NBS update fires
        # id=4 (amount 40): NBS delete wins
    }


_CROSS_PROCESS_WRITER = '''
"""Standalone CAS writer: own JVM, own SparkSession, no shared state
with the parent test process — only the table directory on disk.
argv: root, token, expected_version, n_rows. Exit 0 on commit, 42 on
ConcurrentWriteError."""
import sys

sys.path.insert(0, sys.argv[5])

from olist_lakehouse_2_0_spark import get_spark
from olist_lakehouse_2_0_spark.catalog import Catalog, ConcurrentWriteError

root, token, expected, n = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
)
spark = get_spark(
    app_name="cas-writer-subprocess",
    master="local[2]",
    shuffle_partitions=2,
    extra_conf={"spark.driver.memory": "2g"},
)
cat = Catalog(root=root)
cat.stage_version(spark.range(n), "t", token=token)
try:
    cat.promote_version(spark, "t", expected_version=expected, token=token)
except ConcurrentWriteError:
    spark.stop()
    sys.exit(42)
spark.stop()
sys.exit(0)
'''


def test_cas_promote_holds_across_os_processes(spark, tmp_path):
    """The CAS arbiter is the filesystem rename, not any in-process
    state — so it must hold between two OS processes each running its
    own JVM (VERDICT r5 next-step #4; the thread-concurrency test
    shares one driver). Both directions:

    1. parent stages against v1, a SUBPROCESS writer commits v2 first,
       parent's promote must raise ConcurrentWriteError;
    2. parent commits v3, a second subprocess with the stale
       expected_version must detect the conflict itself (exit 42).
    """
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    writer = tmp_path / "cas_writer.py"
    writer.write_text(_CROSS_PROCESS_WRITER)

    def run_child(token: str, expected: int, n: int) -> int:
        env = dict(os.environ)
        env["SPARK_GRAFT_DRIVER_MEM"] = "2g"
        return subprocess.run(
            [sys.executable, str(writer), str(tmp_path), token,
             str(expected), str(n), repo],
            cwd=str(tmp_path),  # isolate any derby/warehouse litter
            env=env,
            timeout=300,
        ).returncode

    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(spark.range(10), spark, "t")           # v1
    base = cat.latest_version_number(spark, "t")
    assert base == 1

    # Parent stages FIRST (its read is genuinely stale by commit time).
    cat.stage_version(spark.range(15), "t", token="parent")
    assert run_child("child", base, 20) == 0                   # child: v2
    with pytest.raises(ConcurrentWriteError):
        cat.promote_version(spark, "t", expected_version=base, token="parent")
    assert cat.read(spark, "t").count() == 20
    assert cat.latest_version_number(spark, "t") == 2

    # Reverse direction: parent commits v3; a stale child must lose.
    cat.stage_version(spark.range(25), "t", token="parent2")
    cat.promote_version(spark, "t", expected_version=2, token="parent2")
    assert run_child("child-stale", 2, 99) == 42
    assert cat.read(spark, "t").count() == 25
    assert cat.latest_version_number(spark, "t") == 3
