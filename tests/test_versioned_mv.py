"""Versioned materialized-view storage (VERDICT r4 next-step #6): the
rename-aside swap has a window where a concurrent reader holding the
old directory listing sees FileNotFound. The versioned layout
(Catalog.stage_version / promote_version) gives cheap snapshot
isolation: writers stage to ``_staging`` and atomically rename to the
next ``v<n>`` directory; readers resolve the highest committed
version; the previous version is retained, so a reader that resolved
it mid-refresh keeps reading real files."""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F

from olist_lakehouse_2_0_spark.catalog import Catalog
from olist_lakehouse_2_0_spark.operators.expectations import expect_or_fail
from olist_lakehouse_2_0_spark.plans.pipeline import (
    Materialization,
    Pipeline,
    TableDef,
)


def test_versioned_write_read_and_retention(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    for n in (100, 200, 300):
        cat.write_versioned(spark.range(n), spark, "t", layer="gold")
    assert cat.read(spark, "t", layer="gold").count() == 300
    root = cat.path_for("t", "gold")
    dirs = sorted(d for d in os.listdir(root) if d.startswith("v"))
    # keep=2: v1 deleted, v2 retained for in-flight readers, v3 current
    assert dirs == ["v000000002", "v000000003"]


def test_fresh_catalog_resolves_versioned_layout_on_disk(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(spark.range(42), spark, "t", layer="gold")
    # A NEW process's catalog (no in-memory registration) must still
    # read the committed version, not the root directory.
    fresh = Catalog(root=str(tmp_path))
    assert fresh.read(spark, "t", layer="gold").count() == 42


def test_reader_during_refresh_sees_old_or_new_never_errors(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    cat.write_versioned(spark.range(100), spark, "t")
    allowed = {100, 200, 300, 400, 500}
    errors: list[Exception] = []
    seen: set[int] = set()
    stop = threading.Event()

    def reader():
        # A fresh Catalog per read = a reader process that resolves
        # the version at ITS OWN read time, concurrent with promotes.
        while not stop.is_set():
            try:
                n = Catalog(root=str(tmp_path)).read(spark, "t").count()
                seen.add(n)
                if n not in allowed:
                    errors.append(AssertionError(f"torn read: {n}"))
            except Exception as e:  # noqa: BLE001
                errors.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for n in (200, 300, 400, 500):
            cat.write_versioned(spark.range(n), spark, "t")
    finally:
        stop.set()
        t.join()
    assert not errors, errors[:3]
    assert seen  # the reader actually observed snapshots


def test_pipeline_versioned_mvs_promote_and_fail_gate(spark, tmp_path):
    cat = Catalog(root=str(tmp_path / "lake"))
    src = spark.range(50).select(F.col("id"), (F.col("id") % 5).alias("g"))
    good = TableDef(
        name="mv",
        inputs=("src",),
        build=lambda ins: ins["src"].groupBy("g").agg(
            F.count(F.lit(1)).alias("n")
        ),
        materialization=Materialization.MATERIALIZED_VIEW,
        layer="gold",
    )
    pipe = Pipeline("p", cat, [good], versioned_mvs=True)
    pipe.run(spark, external_inputs={"src": src})
    assert cat.read(spark, "mv", layer="gold").count() == 5

    # A FAIL-expectation violation in the refresh must leave the
    # PREVIOUS version current: the staged directory is never promoted.
    bad = TableDef(
        name="mv",
        inputs=("src",),
        build=lambda ins: ins["src"].groupBy("g").agg(
            F.count(F.lit(1)).alias("n")
        ),
        expectations=[expect_or_fail("impossible", F.col("n") < 0)],
        materialization=Materialization.MATERIALIZED_VIEW,
        layer="gold",
    )
    pipe_bad = Pipeline("p", cat, [bad], versioned_mvs=True)
    try:
        pipe_bad.run(spark, external_inputs={"src": src})
        raise AssertionError("FAIL expectation did not raise")
    except Exception:
        pass
    assert cat.read(spark, "mv", layer="gold").count() == 5
    root = cat.path_for("mv", "gold")
    assert sorted(d for d in os.listdir(root) if d.startswith("v")) == [
        "v000000001"
    ]


def test_time_travel_reads_retained_versions(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    for n in (10, 20, 30):
        cat.write_versioned(spark.range(n), spark, "t", keep=3)
    assert cat.read_version(spark, "t", 1).count() == 10
    assert cat.read_version(spark, "t", 2).count() == 20
    assert cat.read_version(spark, "t", 3).count() == 30
    hist = cat.version_history(spark, "t")
    rows = {r["version"]: r for r in hist.collect()}
    assert sorted(rows) == [1, 2, 3]
    assert all(r["n_files"] >= 1 and r["bytes"] > 0 for r in rows.values())
    # Version 1 falls out of the keep=2 retention window...
    cat.write_versioned(spark.range(40), spark, "t", keep=2)
    try:
        cat.read_version(spark, "t", 1)
        raise AssertionError("expected retention error")
    except FileNotFoundError as e:
        assert "available" in str(e)
    # ...but the retained ones still time-travel.
    assert cat.read_version(spark, "t", 3).count() == 30


def test_schema_enforcement_on_versioned_write(spark, tmp_path):
    cat = Catalog(root=str(tmp_path))
    base = spark.range(5).select(
        F.col("id"), F.col("id").cast("string").alias("name")
    )
    cat.write_versioned(base, spark, "t", enforce_schema=True)
    # New column: allowed by default (additive evolution).
    widened = base.withColumn("extra", F.lit(1))
    cat.write_versioned(widened, spark, "t", enforce_schema=True)
    assert "extra" in cat.read(spark, "t").columns
    # Dropped column: rejected BEFORE any data is staged.
    try:
        cat.write_versioned(
            spark.range(5).select("id"), spark, "t", enforce_schema=True
        )
        raise AssertionError("expected drop-column rejection")
    except ValueError as e:
        assert "drops columns" in str(e)
    # Type change on an existing column: rejected.
    try:
        cat.write_versioned(
            widened.withColumn("name", F.lit(7)), spark, "t",
            enforce_schema=True,
        )
        raise AssertionError("expected type-change rejection")
    except ValueError as e:
        assert "incompatible type" in str(e)
    # Strict mode: even new columns rejected.
    try:
        cat.write_versioned(
            widened.withColumn("extra2", F.lit(2)), spark, "t",
            enforce_schema=True, allow_new_columns=False,
        )
        raise AssertionError("expected new-column rejection")
    except ValueError as e:
        assert "new columns" in str(e)
    # The failed writes left the table intact and current.
    assert cat.read(spark, "t").count() == 5


def test_version_history_ignores_hidden_hive_dirs(spark, tmp_path):
    """ADVICE r8 (catalog): version_history must traverse the same
    directory universe as the Delta export/vacuum walk — a hidden
    '_backup=x'-style directory inside a version is invisible to the
    exporter, the reader, and vacuum, so it must not inflate the
    reported file counts/bytes either."""
    import shutil

    cat = Catalog(root=str(tmp_path / "cat"))
    df = spark.createDataFrame([("A", 1), ("B", 2)], "k string, v int")
    cat.write_versioned(
        df.repartition(1), spark, "t", partition_by=["k"]
    )
    v1 = os.path.join(cat.path_for("t"), "v000000001")
    hist0 = cat.version_history(spark, "t").collect()[0]
    assert hist0["n_files"] == 2
    # plant a hidden hive-looking dir with a real parquet file inside
    (src_dir,) = [d for d in os.listdir(v1) if d == "k=A"]
    (src_file,) = [
        f for f in os.listdir(os.path.join(v1, src_dir))
        if f.endswith(".parquet")
    ]
    hidden = os.path.join(v1, "_backup=x")
    os.makedirs(hidden)
    shutil.copy(
        os.path.join(v1, src_dir, src_file),
        os.path.join(hidden, "f.parquet"),
    )
    hist1 = cat.version_history(spark, "t").collect()[0]
    assert hist1["n_files"] == 2
    assert hist1["bytes"] == hist0["bytes"]
