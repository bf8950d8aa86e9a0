"""File-management operators: small-file compaction preserves data and
reduces file count; range-clustered writes yield non-overlapping file
key ranges that prune point queries to O(1) files."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import Catalog, load


def _parquet_files(path: str) -> list[str]:
    return [
        os.path.join(root, f)
        for root, _, names in os.walk(path)
        for f in names
        if f.endswith(".parquet")
    ]


def test_compact_reduces_files_and_preserves_data(spark, sf_smoke, tmp_path):
    cat = Catalog(root=str(tmp_path))
    li = load(spark, sf_smoke, "lineitem")
    # simulate a streaming-ingested table: many tiny files
    cat.write(li.repartition(40), "lineitem_small")
    path = cat.path_for("lineitem_small")
    assert len(_parquet_files(path)) == 40
    expected = li.count()

    before, after = cat.compact(spark, "lineitem_small", target_file_bytes=1 << 20)
    assert before == 40 and after < 40

    got = spark.read.parquet(path)
    assert got.count() == expected
    assert sorted(got.columns) == sorted(li.columns)
    # identical content, not just identical counts
    assert (
        got.exceptAll(li).count() == 0 and li.exceptAll(got).count() == 0
    )

    # already compact -> no-op
    b2, a2 = cat.compact(spark, "lineitem_small", target_file_bytes=1 << 30)
    assert (b2, a2) == (after, after)


def test_compact_preserves_partitioned_layout(spark, sf_smoke, tmp_path):
    """Compacting a key=value partitioned table must keep the partition
    directories (and thus pruning + overwrite_partitions), not flatten
    them into plain files."""
    cat = Catalog(root=str(tmp_path))
    orders = load(spark, sf_smoke, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = cat.path_for("orders_part")
    (
        orders.repartition(12)
        .write.mode("overwrite")
        .partitionBy("status")
        .parquet(path)
    )
    cat.register("orders_part", path)
    expected = orders.count()
    n_before = len(_parquet_files(path))

    before, after = cat.compact(
        spark, "orders_part", target_file_bytes=1 << 20
    )
    assert before == n_before and after < n_before

    # partition directories survive
    subdirs = [
        d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d)) and d.startswith("status=")
    ]
    assert len(subdirs) >= 2
    got = spark.read.parquet(path)
    assert got.count() == expected
    assert "status" in got.columns
    # pruning still works: a status filter reads only its own directory
    one = got.filter(F.col("status") == "F")
    assert one.count() == orders.filter(F.col("status") == "F").count()


def test_clustered_write_prunes_point_queries(spark, sf_smoke, tmp_path):
    cat = Catalog(root=str(tmp_path))
    li = load(spark, sf_smoke, "lineitem")
    n_files = 8
    cat.write(li.repartition(n_files), "li_unclustered")
    cat.write_clustered(li, "li_clustered", ["l_orderkey"], num_files=n_files)

    def overlapping_files(path: str, key_value: int) -> int:
        hits = 0
        for f in _parquet_files(path):
            meta = pq.ParquetFile(f).metadata
            idx = next(
                i
                for i in range(meta.num_columns)
                if meta.row_group(0).column(i).path_in_schema == "l_orderkey"
            )
            lo = min(
                meta.row_group(g).column(idx).statistics.min
                for g in range(meta.num_row_groups)
            )
            hi = max(
                meta.row_group(g).column(idx).statistics.max
                for g in range(meta.num_row_groups)
            )
            if lo <= key_value <= hi:
                hits += 1
        return hits

    mid_key = li.approxQuantile("l_orderkey", [0.5], 0.01)[0]
    unclustered = overlapping_files(cat.path_for("li_unclustered"), int(mid_key))
    clustered = overlapping_files(cat.path_for("li_clustered"), int(mid_key))
    # round-robin files all span the full key range; range-clustered
    # files have disjoint ranges (ties at boundaries at most)
    assert unclustered == n_files
    assert clustered <= 2

    # content unchanged by clustering
    got = spark.read.parquet(cat.path_for("li_clustered"))
    assert got.exceptAll(li).count() == 0 and li.exceptAll(got).count() == 0

    # rows inside each file are sorted by the cluster key (tight
    # row-group stats for skipping)
    one = _parquet_files(cat.path_for("li_clustered"))[0]
    keys = pq.read_table(one, columns=["l_orderkey"])["l_orderkey"].to_pylist()
    assert keys == sorted(keys)


def _overlapping_files(path: str, col: str, key_value: float) -> int:
    hits = 0
    for f in _parquet_files(path):
        meta = pq.ParquetFile(f).metadata
        idx = next(
            i
            for i in range(meta.num_columns)
            if meta.row_group(0).column(i).path_in_schema == col
        )
        lo = min(
            meta.row_group(g).column(idx).statistics.min
            for g in range(meta.num_row_groups)
        )
        hi = max(
            meta.row_group(g).column(idx).statistics.max
            for g in range(meta.num_row_groups)
        )
        if lo <= key_value <= hi:
            hits += 1
    return hits


def test_dynamic_partition_overwrite_scopes_to_touched_partitions(
    spark, sf_smoke, tmp_path
):
    """Rewriting one order-priority partition must leave the others
    byte-for-byte intact (no table truncate)."""
    from pyspark.sql import functions as F

    cat = Catalog(root=str(tmp_path))
    orders = load(spark, sf_smoke, "orders")
    cat.overwrite_partitions(orders, "orders_part", ["o_orderpriority"])
    path = cat.path_for("orders_part")
    before = {
        p: sorted(os.listdir(os.path.join(path, p)))
        for p in os.listdir(path)
        if p.startswith("o_orderpriority=")
    }

    # recompute just the 5-LOW partition with a derived change
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    cat.overwrite_partitions(low, "orders_part", ["o_orderpriority"])

    after = {
        p: sorted(os.listdir(os.path.join(path, p)))
        for p in os.listdir(path)
        if p.startswith("o_orderpriority=")
    }
    assert set(before) == set(after), "partition set changed"
    untouched = [p for p in before if "5-LOW" not in p]
    assert untouched and all(before[p] == after[p] for p in untouched), (
        "untouched partitions were rewritten"
    )
    assert before["o_orderpriority=5-LOW"] != after["o_orderpriority=5-LOW"]

    got = spark.read.parquet(path)
    assert got.count() == orders.count()
    doubled = got.filter(F.col("o_orderpriority") == "5-LOW").agg(
        F.sum("o_totalprice")
    ).first()[0]
    original = orders.filter(F.col("o_orderpriority") == "5-LOW").agg(
        F.sum("o_totalprice") * 2
    ).first()[0]
    assert abs(doubled - original) < 1e-6


def test_zordered_write_prunes_both_dimensions(spark, sf_smoke, tmp_path):
    """Z-order interleaving must let point queries on EITHER dimension
    skip files, where round-robin files span everything and single-key
    range clustering only serves its own key."""
    cat = Catalog(root=str(tmp_path))
    li = load(spark, sf_smoke, "lineitem")
    n_files = 16
    cat.write(li.repartition(n_files), "li_rr")
    cat.write_zordered(
        spark, li, "li_z", ["l_partkey", "l_suppkey"], num_files=n_files
    )
    assert len(_parquet_files(cat.path_for("li_z"))) == n_files

    mid_part = int(li.approxQuantile("l_partkey", [0.5], 0.01)[0])
    mid_supp = int(li.approxQuantile("l_suppkey", [0.5], 0.01)[0])
    rr_path, z_path = cat.path_for("li_rr"), cat.path_for("li_z")
    # round-robin: every file spans the full range of both keys
    assert _overlapping_files(rr_path, "l_partkey", mid_part) == n_files
    assert _overlapping_files(rr_path, "l_suppkey", mid_supp) == n_files
    # z-ordered: each dimension individually prunes most files
    # (16 files = 4 leading z-bits = 2 bits per dimension -> a point
    # query on either key matches ~4 of 16 ranges, + boundary spill)
    assert _overlapping_files(z_path, "l_partkey", mid_part) <= 8
    assert _overlapping_files(z_path, "l_suppkey", mid_supp) <= 8

    # content identity
    got = spark.read.parquet(z_path)
    assert got.exceptAll(li).count() == 0 and li.exceptAll(got).count() == 0


def test_zorder_rejects_single_column(spark, sf_smoke, tmp_path):
    import pytest

    cat = Catalog(root=str(tmp_path))
    li = load(spark, sf_smoke, "lineitem")
    with pytest.raises(ValueError):
        cat.write_zordered(spark, li, "bad", ["l_partkey"])


def test_filtered_scan_reads_fewer_rows_on_clustered(spark, sf_smoke, tmp_path):
    """End-to-end pruning: a key-range filter over the clustered table
    must skip row groups (scan fewer rows) vs the round-robin layout."""
    cat = Catalog(root=str(tmp_path))
    li = load(spark, sf_smoke, "lineitem")
    cat.write(li.repartition(8), "li_rr")
    cat.write_clustered(li, "li_rc", ["l_orderkey"], num_files=8)

    lo, hi = 100, 200
    pred = (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
    expected = li.filter(pred).count()
    for name in ("li_rr", "li_rc"):
        assert spark.read.parquet(cat.path_for(name)).filter(pred).count() == expected


def test_compact_refuses_hidden_foreign_parquet(spark, sf_smoke, tmp_path):
    """Code-review r9: a hidden '_backup=x' directory holding parquet
    inside a table is foreign data — invisible to stats/export/vacuum,
    fatal to Spark's partition discovery on the rewrite read
    (CONFLICTING_PARTITION_COLUMN_NAMES), and the staging swap would
    silently DESTROY it. compact must refuse with a clear error and
    leave the table untouched, not crash mid-rewrite or drop the dir."""
    import shutil

    import pytest

    cat = Catalog(root=str(tmp_path))
    orders = load(spark, sf_smoke, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = cat.path_for("orders_hidden")
    (
        orders.repartition(8)
        .write.mode("overwrite")
        .partitionBy("status")
        .parquet(path)
    )
    cat.register("orders_hidden", path)
    # plant the hidden hive-looking dir with a real parquet inside
    (src_dir,) = [d for d in os.listdir(path) if d == "status=F"]
    src_file = next(
        f
        for f in os.listdir(os.path.join(path, src_dir))
        if f.endswith(".parquet")
    )
    hidden = os.path.join(path, "_backup=x")
    os.makedirs(hidden)
    shutil.copy(
        os.path.join(path, src_dir, src_file),
        os.path.join(hidden, "f.parquet"),
    )
    n_before = len(_parquet_files(path))
    with pytest.raises(IOError, match="_backup=x"):
        cat.compact(spark, "orders_hidden", target_file_bytes=1 << 20)
    # untouched: same visible files, foreign file still there
    assert len(_parquet_files(path)) == n_before
    assert os.path.exists(os.path.join(hidden, "f.parquet"))


def test_compact_refusal_names_delta_log_history(
    spark, sf_smoke, tmp_path
):
    """ADVICE r9: on a table converted in place by convert_to_delta,
    the hidden parquet compact finds is the log's own CHECKPOINT — the
    refusal must say the table carries published Delta history (and
    never advise deleting those files), because 'move or remove it'
    is actively wrong advice for a checkpoint."""
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import (
        convert_to_delta,
        write_checkpoint,
    )

    cat = Catalog(root=str(tmp_path))
    orders = load(spark, sf_smoke, "orders")
    path = cat.path_for("orders_converted")
    orders.limit(200).repartition(4).write.parquet(path)
    cat.register("orders_converted", path)
    convert_to_delta(spark, path)
    # review r10: a FRESH conversion has a JSON-only log (no
    # checkpoint parquet yet) — the refusal must fire on the
    # _delta_log directory itself, or the staging swap destroys the
    # entire published history without a peep
    with pytest.raises(IOError, match="published history"):
        cat.compact(spark, "orders_converted", target_file_bytes=1)
    write_checkpoint(spark, path)  # checkpoint parquet under _delta_log
    with pytest.raises(IOError, match="published history"):
        cat.compact(spark, "orders_converted", target_file_bytes=1)
    # and the message must NOT tell the operator to remove the files
    try:
        cat.compact(spark, "orders_converted", target_file_bytes=1)
    except IOError as e:
        assert "move or remove" not in str(e)
    # log untouched
    assert os.path.isdir(os.path.join(path, "_delta_log"))


def test_compact_tolerates_spark_write_debris(spark, sf_smoke, tmp_path):
    """Code-review r9 (second + third pass): STALE '_temporary/**'
    parquet is Spark's own crashed-committer scratch — compact must
    proceed AND reclaim it (no other maintenance path removes it, and
    the no-op early return must not skip the cleanup). A FRESH
    scratch tree may belong to an in-flight write: refuse. A
    hidden-NAMED parquet file in the root is foreign: refuse."""
    import time

    import pytest

    cat = Catalog(root=str(tmp_path))
    orders = load(spark, sf_smoke, "orders")
    path = cat.path_for("orders_debris")
    orders.repartition(8).write.mode("overwrite").parquet(path)
    cat.register("orders_debris", path)
    scratch = os.path.join(path, "_temporary", "0", "attempt_1")
    os.makedirs(scratch)
    src = next(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    import shutil

    shutil.copy(
        os.path.join(path, src), os.path.join(scratch, "part.parquet")
    )
    # FRESH scratch -> an ingest may be in flight -> refuse
    with pytest.raises(IOError, match="in flight"):
        cat.compact(spark, "orders_debris", target_file_bytes=1 << 30)
    # backdate the whole scratch tree -> crash debris -> reclaimed,
    # even though this compaction no-ops (target above total size)
    old = time.time() - 7200
    for walk_root, _dirs, names in os.walk(os.path.join(path, "_temporary")):
        os.utime(walk_root, (old, old))
        for f in names:
            os.utime(os.path.join(walk_root, f), (old, old))
    before, after = cat.compact(
        spark, "orders_debris", target_file_bytes=1 << 30
    )
    assert after <= before
    assert not os.path.exists(os.path.join(path, "_temporary"))
    # FAR-FUTURE mtimes (writer clock skew) are indistinguishable from
    # a live write: refuse with the skew named, never delete
    # (re-capture a part name — the compaction above rewrote the files)
    src2 = next(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    os.makedirs(scratch)
    shutil.copy(
        os.path.join(path, src2), os.path.join(scratch, "part.parquet")
    )
    future = time.time() + 7200
    for walk_root, _dirs, names in os.walk(
        os.path.join(path, "_temporary")
    ):
        os.utime(walk_root, (future, future))
        for f in names:
            os.utime(os.path.join(walk_root, f), (future, future))
    with pytest.raises(IOError, match="FUTURE"):
        cat.compact(spark, "orders_debris", target_file_bytes=1 << 30)
    assert os.path.exists(os.path.join(scratch, "part.parquet"))
    # ...but a hidden-named file in the root is foreign data
    path2 = cat.path_for("orders_hidden_file")
    orders.repartition(4).write.mode("overwrite").parquet(path2)
    cat.register("orders_hidden_file", path2)
    src2 = next(
        f for f in os.listdir(path2) if f.endswith(".parquet")
    )
    shutil.copy(
        os.path.join(path2, src2), os.path.join(path2, "_backup.parquet")
    )
    with pytest.raises(IOError, match="_backup.parquet"):
        cat.compact(spark, "orders_hidden_file", target_file_bytes=1 << 30)
