"""Delta-protocol export conformance (delta_export.py): the action
stream must match the PUBLIC Delta Lake protocol spec
(github.com/delta-io/delta PROTOCOL.md) structurally, and the
independent log-replay reader must reproduce the catalog's own time
travel exactly. The reference stores all tables as Delta
(/root/reference README.md:302-308); this gates the interop layer the
sandbox can't validate with an external reader."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from olist_lakehouse_2_0_spark.catalog import Catalog
from olist_lakehouse_2_0_spark.delta_export import export_delta, read_delta


def _versioned_table(spark, tmp_path, counts=(100, 200, 300), keep=3):
    cat = Catalog(root=str(tmp_path / "cat"))
    for n in counts:
        cat.write_versioned(
            spark.range(n).withColumn("val", F.col("id") * 2),
            spark, "t", layer="gold", keep=keep,
        )
    return cat, cat.path_for("t", "gold")


def _commits(dest):
    log = os.path.join(dest, "_delta_log")
    names = sorted(n for n in os.listdir(log) if n.endswith(".json"))
    return [
        [json.loads(l) for l in open(os.path.join(log, n)) if l.strip()]
        for n in names
    ], names


def _rewrite_log_file(path, text):
    """Out-of-band rewrite of any log file + drop the local-FS
    checksum sidecar the rewrite invalidates — the ONE copy of the
    sidecar rule every doctoring helper shares (sixth + seventh
    review passes)."""
    with open(path, "w") as fh:
        fh.write(text)
    crc = os.path.join(
        os.path.dirname(path), f".{os.path.basename(path)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)


def _update_commit_info(dest, version, info):
    """Doctor one commit's commitInfo in place (merging ``info``)."""
    from olist_lakehouse_2_0_spark.delta_export import _commit_path

    cpath = _commit_path(dest, version)
    actions = [json.loads(l) for l in open(cpath) if l.strip()]
    for a in actions:
        if "commitInfo" in a:
            a["commitInfo"].update(info)
    _rewrite_log_file(
        cpath, "\n".join(json.dumps(a) for a in actions)
    )


def test_log_structure_is_protocol_conformant(spark, tmp_path):
    _, root = _versioned_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    assert export_delta(spark, root, dest) == 3
    commits, names = _commits(dest)
    # zero-padded contiguous versions from 0 (protocol file layout)
    assert names == [f"{i:020d}.json" for i in range(3)]
    first = commits[0]
    protocols = [a["protocol"] for a in first if "protocol" in a]
    metas = [a["metaData"] for a in first if "metaData" in a]
    assert protocols == [{"minReaderVersion": 1, "minWriterVersion": 2}]
    (meta,) = metas
    # metaData required fields + parseable Spark-JSON schemaString
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == []
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    assert [f.name for f in schema.fields] == ["id", "val"]
    # protocol/metaData appear ONLY in commit 0
    for c in commits[1:]:
        assert not any("protocol" in a or "metaData" in a for a in c)
    # every add has the required fields, a RELATIVE path, and a
    # size matching the copied file
    for c in commits:
        for a in c:
            if "add" in a:
                add = a["add"]
                assert not add["path"].startswith("/")
                assert add["partitionValues"] == {}
                assert add["dataChange"] is True
                f = os.path.join(dest, add["path"])
                assert os.path.getsize(f) == add["size"]
    # overwrite shape: commit N removes exactly commit N-1's adds
    prev_adds = {a["add"]["path"] for a in commits[0] if "add" in a}
    for c in commits[1:]:
        removes = {a["remove"]["path"] for a in c if "remove" in a}
        assert removes == prev_adds
        prev_adds = {a["add"]["path"] for a in c if "add" in a}


def test_reader_reproduces_catalog_time_travel(spark, tmp_path):
    cat, root = _versioned_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest)
    # latest matches the catalog's read
    got = read_delta(spark, dest)
    assert got.count() == 300
    assert [f.name for f in got.schema.fields] == ["id", "val"]
    assert (
        got.agg(F.sum("val")).first()[0]
        == cat.read(spark, "t", layer="gold").agg(F.sum("val")).first()[0]
    )
    # VERSION AS OF: delta version k == k-th exported catalog snapshot
    assert read_delta(spark, dest, version=0).count() == 100
    assert read_delta(spark, dest, version=1).count() == 200
    v0 = read_delta(spark, dest, version=0)
    assert v0.agg(F.sum("val")).first()[0] == sum(2 * i for i in range(100))


def test_incremental_export_appends_only_new_commits(spark, tmp_path):
    cat, root = _versioned_table(spark, tmp_path, counts=(50, 60))
    dest = str(tmp_path / "delta")
    assert export_delta(spark, root, dest) == 2
    _, names_before = _commits(dest)
    sizes_before = {
        n: os.path.getsize(os.path.join(dest, "_delta_log", n))
        for n in names_before
    }
    # no new catalog versions -> no-op
    assert export_delta(spark, root, dest) == 0
    # one new catalog version -> exactly one appended commit; earlier
    # commit files are byte-identical (published versions are immutable)
    cat.write_versioned(
        spark.range(70).withColumn("val", F.col("id") * 2),
        spark, "t", layer="gold", keep=3,
    )
    assert export_delta(spark, root, dest) == 1
    _, names_after = _commits(dest)
    assert names_after == names_before + [f"{len(names_before):020d}.json"]
    for n, sz in sizes_before.items():
        assert os.path.getsize(os.path.join(dest, "_delta_log", n)) == sz
    assert read_delta(spark, dest).count() == 70
    # versions that aged out of catalog retention stay readable
    assert read_delta(spark, dest, version=0).count() == 50


def test_export_survives_catalog_retention_pruning(spark, tmp_path):
    """keep=2 prunes old catalog versions; an export taken per round
    still accumulates the full history because appends are driven by
    sourceVersion, not by what the catalog still retains."""
    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    for n in (10, 20, 30, 40):
        cat.write_versioned(spark.range(n), spark, "t", keep=2)
        export_delta(spark, cat.path_for("t"), dest)
    commits, _ = _commits(dest)
    # keep=2 means each export sees at most 2 versions, but the log
    # accumulated all four snapshots
    assert len(commits) == 4
    assert [read_delta(spark, dest, version=v).count() for v in range(4)] \
        == [10, 20, 30, 40]


def test_checkpoint_bootstraps_reads_and_survives_log_pruning(spark, tmp_path):
    """The protocol's scale answer: after a checkpoint, reads bootstrap
    from the parquet snapshot + JSON tail; pruning the subsumed JSON
    commits must not affect any read at or above the checkpoint, and
    time travel below it must fail with the missing-commits error (the
    same contract as Delta's own log cleanup)."""
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import prune_log

    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    # 12 exported snapshots (commits 0..11) with interval 5 ->
    # checkpoints every 5 commits: at 4 and 9
    for n in range(10, 130, 10):
        cat.write_versioned(spark.range(n), spark, "t", keep=2)
        export_delta(spark, cat.path_for("t"), dest, checkpoint_interval=5)
    log = os.path.join(dest, "_delta_log")
    cps = sorted(n for n in os.listdir(log) if n.endswith(".checkpoint.parquet"))
    assert cps[-1] == f"{9:020d}.checkpoint.parquet", cps
    last_cp = json.loads(open(os.path.join(log, "_last_checkpoint")).read())
    assert last_cp["version"] == 9
    # checkpointed adds must carry dataChange=false (spec requirement)
    cp_df = spark.read.parquet(os.path.join(log, cps[-1]))
    adds = [r["add"] for r in cp_df.collect() if r["add"] is not None]
    assert adds and all(a["dataChange"] is False for a in adds)
    # prune: JSONs <= 9 go away; reads at/above 9 still exact
    assert prune_log(spark, dest) == 10
    remaining = sorted(int(n[:-5]) for n in os.listdir(log) if n.endswith(".json"))
    assert remaining == [10, 11]
    assert read_delta(spark, dest).count() == 120
    assert read_delta(spark, dest, version=9).count() == 100
    assert read_delta(spark, dest, version=10).count() == 110
    with pytest.raises(IOError, match="missing commits"):
        read_delta(spark, dest, version=3)
    # incremental export keeps working off the checkpoint bootstrap
    cat.write_versioned(spark.range(130), spark, "t", keep=2)
    assert export_delta(spark, cat.path_for("t"), dest, checkpoint_interval=5) == 1
    assert read_delta(spark, dest).count() == 130
    assert read_delta(spark, dest, version=12).count() == 130


def test_checkpoint_preserves_table_identity_and_truncated_copy_heals(
    spark, tmp_path
):
    """Two export-robustness regressions: (1) the checkpoint must carry
    the commit-0 metaData VERBATIM (id included) — a reconstructed
    metaData would mutate the table identity mid-history once the JSON
    commits are pruned; (2) a crash-interrupted data-file copy leaves a
    truncated file at the destination, and the resumed export must
    detect the size mismatch and re-copy rather than publish a commit
    pointing at garbage."""
    from olist_lakehouse_2_0_spark.delta_export import (
        _replay,
        prune_log,
        write_checkpoint,
    )

    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    cat.write_versioned(spark.range(5), spark, "t", keep=3)
    export_delta(spark, cat.path_for("t"), dest)
    commits, _ = _commits(dest)
    (orig_meta,) = [a["metaData"] for a in commits[0] if "metaData" in a]
    write_checkpoint(spark, dest)
    prune_log(spark, dest)
    # identity survives the checkpoint + prune round trip verbatim
    state = _replay(spark, dest, 0)
    assert state["metadata"]["id"] == orig_meta["id"]
    assert state["metadata"]["createdTime"] == orig_meta["createdTime"]

    # simulate a killed copy: plant a truncated file where the next
    # snapshot's first data file will land
    cat2 = Catalog(root=str(tmp_path / "cat2"))
    cat2.write_versioned(spark.range(7), spark, "u", keep=3)
    root2 = cat2.path_for("u")
    dest2 = str(tmp_path / "delta2")
    vdir = sorted(
        d for d in os.listdir(root2) if d.startswith("v")
    )[-1]
    part = sorted(
        f for f in os.listdir(os.path.join(root2, vdir))
        if f.endswith(".parquet")
    )[0]
    os.makedirs(dest2, exist_ok=True)
    with open(os.path.join(dest2, f"{vdir}-{part}"), "wb") as fh:
        fh.write(b"truncated")
    export_delta(spark, root2, dest2)
    assert read_delta(spark, dest2).count() == 7


def test_schema_evolution_re_emits_metadata(spark, tmp_path):
    """The catalog allows additive schema evolution between versions;
    the export must re-emit a metaData action in the commit whose
    snapshot schema changed — otherwise a reader scans the evolved
    files under the stale log schema and silently drops the new
    column. Older versions keep reading under their own schema."""
    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    cat.write_versioned(spark.range(10), spark, "t", keep=3)
    cat.write_versioned(
        spark.range(20).withColumn("extra", F.col("id") + 100),
        spark, "t", keep=3, allow_new_columns=True,
    )
    export_delta(spark, cat.path_for("t"), dest)
    commits, _ = _commits(dest)
    metas = [
        a["metaData"]["schemaString"]
        for c in commits
        for a in c
        if "metaData" in a
    ]
    assert len(metas) == 2 and metas[0] != metas[1]
    latest = read_delta(spark, dest)
    assert [f.name for f in latest.schema.fields] == ["id", "extra"]
    assert latest.filter(F.col("extra").isNotNull()).count() == 20
    v0 = read_delta(spark, dest, version=0)
    assert [f.name for f in v0.schema.fields] == ["id"]
    assert v0.count() == 10
    # a checkpoint after the evolution carries the evolved schema
    from olist_lakehouse_2_0_spark.delta_export import write_checkpoint

    write_checkpoint(spark, dest)
    assert [
        f.name for f in read_delta(spark, dest, version=1).schema.fields
    ] == ["id", "extra"]


def test_vacuum_retains_window_and_deletes_unreferenced_files(
    spark, tmp_path
):
    """vacuum_export with retain_versions=2 on a 6-commit table: reads
    at and above the cutoff stay exact, time travel below raises, the
    old snapshots' data files are gone from disk, and incremental
    export keeps appending afterwards."""
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import vacuum_export

    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    for n in (10, 20, 30, 40, 50, 60):
        cat.write_versioned(spark.range(n), spark, "t", keep=2)
        export_delta(spark, cat.path_for("t"), dest, checkpoint_interval=0)

    def data_files():
        return {
            f for f in os.listdir(dest)
            if f.endswith(".parquet") and f != "_delta_log"
        }

    before = data_files()
    res = vacuum_export(spark, dest, retain_versions=2)
    assert res["cutoff"] == 4
    after = data_files()
    # every surviving file is referenced by version 4 or 5 (prefixes
    # v000000005- / v000000006- — catalog versions 5 and 6)
    assert after < before
    assert all(
        f.startswith(("v000000005-", "v000000006-")) for f in after
    )
    assert read_delta(spark, dest).count() == 60
    assert read_delta(spark, dest, version=4).count() == 50
    with pytest.raises(IOError, match="missing commits"):
        read_delta(spark, dest, version=2)
    # export continues appending after the vacuum
    cat.write_versioned(spark.range(70), spark, "t", keep=2)
    assert export_delta(spark, cat.path_for("t"), dest) == 1
    assert read_delta(spark, dest).count() == 70
    assert read_delta(spark, dest, version=4).count() == 50


def test_commit_write_refuses_to_rewrite_published_history(spark, tmp_path):
    """Published Delta versions are immutable: a writer that would land
    on an existing commit file must fail, not overwrite (POSIX rename
    silently replaces, which would rewrite history under a reader)."""
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import _write_commit

    _, root = _versioned_table(spark, tmp_path, counts=(5,))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest)
    with pytest.raises(IOError, match="already exists"):
        _write_commit(spark, dest, 0, [{"commitInfo": {"timestamp": 0}}])
    # the published commit is untouched and still readable
    assert read_delta(spark, dest).count() == 5


def test_randomized_export_prune_checkpoint_sequences(spark, tmp_path):
    """Deterministic pseudo-random torture: interleave catalog writes,
    incremental exports (varying checkpoint intervals), checkpoints and
    prunes, tracking expected row counts per Delta version in plain
    Python; every still-reachable version must read back exactly, and
    pruned versions must raise. Catches state-tracking drift between
    export resume, checkpoint bootstrap, and log cleanup that the
    scripted tests can't."""
    import random

    import pytest

    from olist_lakehouse_2_0_spark.delta_export import (
        prune_log,
        write_checkpoint,
    )

    rng = random.Random(7)
    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    expected: list[int] = []  # expected row count per Delta version
    pending = 0  # catalog versions written but not yet exported
    checkpoints: set[int] = set()  # checkpoint versions on disk
    json_present: set[int] = set()  # JSON commits still on disk
    counts = iter(range(10, 10_000, 10))
    for step in range(30):
        op = rng.choice(["write", "write", "export", "checkpoint", "prune"])
        if op == "write":
            n = next(counts)
            cat.write_versioned(spark.range(n), spark, "t", keep=3)
            expected.append(n)
            pending += 1
            # keep=3: exports must not fall behind retention
            if pending == 3:
                op = "export"
        if op == "export" and expected and pending:
            got = export_delta(
                spark, cat.path_for("t"), dest, checkpoint_interval=0
            )
            assert got == pending, (step, got, pending)
            json_present.update(
                range(len(expected) - pending, len(expected))
            )
            pending = 0
        if op == "checkpoint" and len(expected) > pending:
            v = write_checkpoint(spark, dest)
            assert v == len(expected) - pending - 1
            checkpoints.add(v)
        if op == "prune" and checkpoints:
            prune_log(spark, dest)
            json_present -= set(range(max(checkpoints) + 1))
    # drain any unexported tail, then verify every version's read
    if pending:
        export_delta(spark, cat.path_for("t"), dest, checkpoint_interval=0)
        json_present.update(range(len(expected) - pending, len(expected)))

    def readable(v: int) -> bool:
        # v reads back iff some bootstrap point c <= v (a checkpoint,
        # or -1 for log start) has every JSON commit in (c, v] on disk
        for c in sorted(checkpoints | {-1}, reverse=True):
            if c <= v:
                if all(x in json_present for x in range(c + 1, v + 1)):
                    return True
        return False

    for v, n in enumerate(expected):
        if readable(v):
            assert read_delta(spark, dest, version=v).count() == n, (v, n)
        else:
            with pytest.raises(IOError, match="missing commits"):
                read_delta(spark, dest, version=v)
    assert read_delta(spark, dest).count() == expected[-1]


def test_reader_refuses_unsupported_reader_version(spark, tmp_path):
    _, root = _versioned_table(spark, tmp_path, counts=(5,))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest)
    # forge a protocol upgrade the reader floor doesn't support
    path = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(path) if l.strip()]
    for a in actions:
        if "protocol" in a:
            a["protocol"]["minReaderVersion"] = 3
    with open(path, "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))
    # the out-of-band rewrite invalidates Hadoop LocalFileSystem's
    # checksum sidecar; drop it so the read exercises the protocol
    # check, not the CRC
    crc = os.path.join(os.path.dirname(path), f".{os.path.basename(path)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    import pytest

    with pytest.raises(IOError, match="reader version"):
        read_delta(spark, dest)


def test_vacuum_preserves_resume_cursor_with_checkpoint_on_latest(
    spark, tmp_path
):
    """ADVICE r7 #1 regression: when a checkpoint file exists AT the
    latest commit (routine with checkpoint_interval=10 and ≥10 commits),
    vacuum_export's final pointer re-point used to bootstrap from that
    checkpoint with the pointer still at the cutoff, losing
    maxSourceVersion (-1) — and the next export_delta re-published every
    retained catalog version as duplicate commits. The pointer must keep
    the exact resume cursor, and post-vacuum export must append ONLY the
    genuinely new catalog versions."""
    from olist_lakehouse_2_0_spark.delta_export import (
        _read_last_checkpoint,
    )

    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    # 10 catalog versions (1..10) -> Delta commits 0..9; with
    # interval=10 the cadence lands a checkpoint exactly on commit 9,
    # the latest — the advice's trigger condition.
    for n in range(10, 110, 10):
        cat.write_versioned(spark.range(n), spark, "t", keep=12)
    assert export_delta(
        spark, cat.path_for("t"), dest, checkpoint_interval=10
    ) == 10
    from olist_lakehouse_2_0_spark.delta_export import (
        _list_checkpoints,
        vacuum_export,
    )

    assert _list_checkpoints(spark, dest) == [9]
    res = vacuum_export(spark, dest, retain_versions=2)
    assert res["cutoff"] == 8
    ptr = _read_last_checkpoint(spark, dest)
    # pointer tracks the newest checkpoint (9, the latest commit) and
    # keeps the exact catalog-resume cursor (catalog version 10)
    assert ptr["version"] == 9
    assert ptr["maxSourceVersion"] == 10
    # the next export appends exactly ONE commit for the one new
    # catalog version — no duplicate re-publication of history
    cat.write_versioned(spark.range(110), spark, "t", keep=12)
    assert export_delta(spark, cat.path_for("t"), dest) == 1
    assert read_delta(spark, dest).count() == 110
    assert read_delta(spark, dest, version=8).count() == 90


def test_atomic_promote_refuses_existing_destination(spark, tmp_path):
    """ADVICE r7 #2 regression: the commit point must be a TRUE
    test-and-set. Hadoop's local rename is POSIX rename (silent
    overwrite), so exists-check-then-rename had a race window; the
    promote now hard-links (EEXIST is atomic) and must refuse an
    existing destination WITHOUT the caller's exists pre-check."""
    from olist_lakehouse_2_0_spark.delta_export import (
        _atomic_promote,
        _fs,
        _read_text,
        _write_text,
    )

    tmp_file = str(tmp_path / "commit.tmp")
    final = str(tmp_path / "commit.json")
    jvm, HPath, fs = _fs(spark, str(tmp_path))
    # success path: promote moves content and clears the temp
    _write_text(spark, tmp_file, "first-writer")
    assert _atomic_promote(spark, jvm, fs, HPath(tmp_file), HPath(final))
    assert _read_text(spark, final) == "first-writer"
    assert not fs.exists(HPath(tmp_file))
    # conflict path: a second writer racing to the same commit file
    # must lose atomically, leaving the published content untouched
    _write_text(spark, tmp_file, "second-writer")
    assert not _atomic_promote(
        spark, jvm, fs, HPath(tmp_file), HPath(final)
    )
    assert _read_text(spark, final) == "first-writer"


def _partitioned_table(spark, tmp_path, months=("2017-01", "2017-02", "2017-03")):
    """A hive-partitioned plain gold table (the overwrite_partitions /
    Catalog.write(partition_by=...) layout the daily job produces)."""
    cat = Catalog(root=str(tmp_path / "cat"))
    rows = []
    for i, m in enumerate(months):
        rows += [(m, i * 100 + j, float(j)) for j in range(5)]
    df = spark.createDataFrame(rows, "month string, id int, amount double")
    cat.write(df.repartition(1), "gold_monthly", partition_by=["month"])
    return cat, cat.path_for("gold_monthly"), df


def test_partitioned_publish_writes_protocol_partition_contract(
    spark, tmp_path
):
    """partitionColumns in metaData + per-add partitionValues + hive
    directory layout — the protocol's partition contract (PROTOCOL.md:
    add.partitionValues is required for partitioned tables; external
    readers prune from the log alone)."""
    from olist_lakehouse_2_0_spark.delta_export import publish_delta

    _, root, df = _partitioned_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    assert publish_delta(spark, root, dest) == 0
    commits, _ = _commits(dest)
    (meta,) = [a["metaData"] for a in commits[0] if "metaData" in a]
    assert meta["partitionColumns"] == ["month"]
    # schemaString still carries the FULL schema incl. partition cols
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    assert {f.name for f in schema.fields} == {"month", "id", "amount"}
    adds = [a["add"] for a in commits[0] if "add" in a]
    assert len(adds) == 3
    for add in adds:
        # path keeps the hive dir, prefix lands on the file name
        head, _, base = add["path"].rpartition("/")
        assert head.startswith("month=")
        assert base.startswith("p000000000-")
        assert add["partitionValues"] == {"month": head.split("=", 1)[1]}
        assert os.path.exists(os.path.join(dest, add["path"]))
    # roundtrip: full read matches the source table exactly (the
    # export's declared schema derives from the on-disk snapshot,
    # where discovery orders partition columns last — align for the
    # value compare)
    got = read_delta(spark, dest).select("month", "id", "amount")
    assert sorted(got.collect()) == sorted(df.collect())


def test_partitioned_read_prunes_partitions_in_plan(spark, tmp_path):
    """A filter on the partition column must prune at PLANNING time —
    the scan's PartitionFilters carry the predicate and only the one
    matching directory's file is read. At 100 TB this is the difference
    between scanning one day and scanning the table."""
    from olist_lakehouse_2_0_spark.delta_export import publish_delta

    _, root, df = _partitioned_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    publish_delta(spark, root, dest)
    got = read_delta(spark, dest).where(F.col("month") == "2017-02")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "month" in plan.split(
        "PartitionFilters:"
    )[1][:200]
    expected = sorted(df.where(F.col("month") == "2017-02").collect())
    assert sorted(
        got.select("month", "id", "amount").collect()
    ) == expected
    # count distinct files actually scanned == 1 partition's worth
    n_files = (
        got.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert n_files == 1


def test_partitioned_republish_checkpoint_and_time_travel(spark, tmp_path):
    """Partitioned tables through the full lifecycle: re-publish,
    checkpoint, prune, time travel — partitionValues must survive the
    checkpoint parquet (the add struct's map column) and reads below /
    at / above the checkpoint must stay exact."""
    from olist_lakehouse_2_0_spark.delta_export import (
        prune_log,
        publish_delta,
        write_checkpoint,
    )

    cat, root, df0 = _partitioned_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    publish_delta(spark, root, dest, checkpoint_interval=0)
    # refresh one partition (dynamic partition overwrite) + republish
    upd = spark.createDataFrame(
        [("2017-02", 999, 42.0)], "month string, id int, amount double"
    )
    cat.overwrite_partitions(upd, "gold_monthly", partition_by=["month"])
    publish_delta(spark, root, dest, checkpoint_interval=0)
    write_checkpoint(spark, dest)
    prune_log(spark, dest)
    # current state reads through the CHECKPOINT (JSONs pruned)
    cur = read_delta(spark, dest)
    assert cur.where(F.col("month") == "2017-02").count() == 1
    assert cur.count() == 11  # 5 + 1 + 5
    assert sorted(
        cur.where(F.col("month") == "2017-01")
        .select("month", "id", "amount").collect()
    ) == sorted(df0.where(F.col("month") == "2017-01").collect())
    # partition pruning still planned from the checkpointed log
    plan = (
        cur.where(F.col("month") == "2017-03")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan
    # a third publish keeps appending after the prune
    cat.overwrite_partitions(
        spark.createDataFrame(
            [("2017-04", 1, 1.0)], "month string, id int, amount double"
        ),
        "gold_monthly",
        partition_by=["month"],
    )
    publish_delta(spark, root, dest, checkpoint_interval=0)
    assert read_delta(spark, dest).count() == 12
    assert read_delta(spark, dest, version=1).count() == 11


def test_partitioning_change_re_emits_metadata(spark, tmp_path):
    """Re-publishing with a DIFFERENT partitioning must re-emit
    metaData (same mechanism as schema evolution) — otherwise a reader
    would map the new files' partitionValues against stale
    partitionColumns."""
    from olist_lakehouse_2_0_spark.delta_export import publish_delta

    cat, root, df = _partitioned_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    publish_delta(spark, root, dest)
    # rewrite the same data unpartitioned, republish
    cat.write(df, "gold_monthly")
    publish_delta(spark, root, dest)
    commits, _ = _commits(dest)
    metas = [a["metaData"] for a in commits[1] if "metaData" in a]
    assert len(metas) == 1 and metas[0]["partitionColumns"] == []
    assert read_delta(spark, dest).count() == df.count()
    assert read_delta(spark, dest, version=0).where(
        F.col("month") == "2017-01"
    ).count() == 5


def test_partitioned_vacuum_sweeps_partition_directories(spark, tmp_path):
    """vacuum_export must find unreferenced data files INSIDE partition
    directories (the sweep recurses), while retained versions' files
    survive."""
    from olist_lakehouse_2_0_spark.delta_export import (
        publish_delta,
        vacuum_export,
    )

    cat, root, df = _partitioned_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    publish_delta(spark, root, dest, checkpoint_interval=0)
    for n in (7, 9):
        cat.write(
            df.limit(n).repartition(1), "gold_monthly",
            partition_by=["month"],
        )
        publish_delta(spark, root, dest, checkpoint_interval=0)
    res = vacuum_export(spark, dest, retain_versions=2)
    assert res["cutoff"] == 1
    # version-0 partition files (prefix p000000000-) are gone
    leftover = []
    for dirpath, _, files in os.walk(dest):
        if "_delta_log" in dirpath:
            continue
        leftover += [f for f in files if f.endswith(".parquet")]
    assert not any(f.startswith("p000000000-") for f in leftover)
    assert read_delta(spark, dest).count() == 9
    assert read_delta(spark, dest, version=1).count() == 7


def test_history_and_timestamp_travel(spark, tmp_path):
    """DESCRIBE-HISTORY analogue + TIMESTAMP AS OF: history lists one
    row per retained JSON commit with the catalog source mapping;
    timestamp resolution picks the latest commit at-or-before the
    target, both epoch-ms and ISO-8601 forms; targets predating
    retained history raise instead of silently substituting; after a
    prune, history shrinks to the retained tail — Delta's own contract
    after log cleanup."""
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import (
        export_history,
        prune_log,
        write_checkpoint,
    )

    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    for n in (10, 20, 30):
        cat.write_versioned(spark.range(n), spark, "t", keep=3)
        export_delta(spark, cat.path_for("t"), dest, checkpoint_interval=0)
    hist = export_history(spark, dest).orderBy("version").collect()
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["source_version"] for h in hist] == [1, 2, 3]
    assert all(h["operation"] == "WRITE" for h in hist)
    ts = [h["timestamp"] for h in hist]
    assert ts == sorted(ts)
    # epoch-ms resolution: at commit 1's stamp -> version 1 (ties pick
    # the LATEST commit at that stamp, Delta semantics)
    expect_at_ts1 = max(
        v for v, t in zip([0, 1, 2], ts) if t <= ts[1]
    )
    got = read_delta(spark, dest, timestamp=ts[1])
    assert got.count() == (expect_at_ts1 + 1) * 10
    # far future -> latest; ISO-8601 form
    assert read_delta(spark, dest, timestamp="2100-01-01").count() == 30
    # before the first commit -> explicit refusal
    with pytest.raises(ValueError, match="predates"):
        read_delta(spark, dest, timestamp=ts[0] - 1)
    with pytest.raises(ValueError, match="not both"):
        read_delta(spark, dest, version=1, timestamp=ts[1])
    # prune to the checkpoint: history covers only the retained tail
    cat.write_versioned(spark.range(40), spark, "t", keep=3)
    export_delta(spark, cat.path_for("t"), dest, checkpoint_interval=0)
    write_checkpoint(spark, dest, 2)
    prune_log(spark, dest)
    hist2 = export_history(spark, dest).orderBy("version").collect()
    assert [h["version"] for h in hist2] == [3]
    with pytest.raises(ValueError, match="predates"):
        read_delta(spark, dest, timestamp=ts[0])


def test_partitioned_versioned_table_exports_and_time_travels(
    spark, tmp_path
):
    """Partitioned VERSIONED writes (write_versioned(partition_by=...))
    flow through the whole stack: promote renames the hive layout into
    v<N>, version_history counts files inside partition dirs,
    export_delta emits the partition contract per snapshot, and both
    current and VERSION AS OF reads prune on the partition column."""
    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")

    def mk(n):
        return spark.range(n).select(
            (F.col("id") % 3).cast("string").alias("bucket"),
            F.col("id"),
        ).repartition(1)

    for n in (9, 18):
        cat.write_versioned(
            mk(n), spark, "pv", keep=3, partition_by=["bucket"]
        )
    # catalog-side: read + time travel + history see through partitions
    assert cat.read(spark, "pv").count() == 18
    assert cat.read_version(spark, "pv", 1).count() == 9
    hist = {
        r["version"]: r for r in cat.version_history(spark, "pv").collect()
    }
    assert hist[1]["n_files"] == 3 and hist[2]["n_files"] == 3
    assert hist[1]["bytes"] > 0
    # export: both snapshots carry the partition contract
    assert export_delta(spark, cat.path_for("pv"), dest) == 2
    commits, _ = _commits(dest)
    (meta,) = [a["metaData"] for a in commits[0] if "metaData" in a]
    assert meta["partitionColumns"] == ["bucket"]
    for c in commits:
        for a in c:
            if "add" in a:
                assert a["add"]["partitionValues"].keys() == {"bucket"}
    got = read_delta(spark, dest).where(F.col("bucket") == "1")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert got.count() == 6
    assert read_delta(spark, dest, version=0).where(
        F.col("bucket") == "1"
    ).count() == 3


def test_convert_to_delta_zero_copy(spark, tmp_path):
    """CONVERT TO DELTA analogue: an existing plain-parquet table gains
    a _delta_log IN PLACE — commit 0 references the files already there
    (no copies), partition layouts convert with the full partition
    contract, and the directory is immediately readable as a Delta
    table. A second convert refuses (already a Delta table)."""
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import convert_to_delta

    cat = Catalog(root=str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(12)],
        "grp string, id int, v double",
    ).withColumn("grp", (F.col("id") % 3).cast("string"))
    cat.write(df.repartition(1), "plain", partition_by=["grp"])
    root = cat.path_for("plain")
    before = {
        os.path.join(dp, f)
        for dp, _, fs_ in os.walk(root) for f in fs_
        if f.endswith(".parquet")
    }
    n = convert_to_delta(spark, root)
    assert n == 3  # one file per partition
    # zero-copy: exactly the same data files, untouched
    after = {
        os.path.join(dp, f)
        for dp, _, fs_ in os.walk(root) for f in fs_
        if f.endswith(".parquet") and "_delta_log" not in dp
    }
    assert after == before
    commits, _ = _commits(root)
    (meta,) = [a["metaData"] for a in commits[0] if "metaData" in a]
    assert meta["partitionColumns"] == ["grp"]
    infos = [a["commitInfo"] for a in commits[0] if "commitInfo" in a]
    assert infos and infos[0]["operation"] == "CONVERT"
    got = read_delta(spark, root)
    assert got.count() == 12
    assert got.where(F.col("grp") == "1").count() == 4
    with pytest.raises(IOError, match="already has a _delta_log"):
        convert_to_delta(spark, root)


def _forge_column_mapped_table(spark, root, mode="name"):
    """Hand-forge a foreign minReaderVersion=2 table with column
    mapping: physical parquet names col-1/col-2, logical names
    (city, pop) declared only in the log's schemaString metadata."""
    phys = spark.createDataFrame(
        [("ams", 900), ("rio", 6700)], "`col-1` string, `col-2` int"
    )
    phys.coalesce(1).write.parquet(root)
    files = [
        f for f in os.listdir(root) if f.endswith(".parquet")
    ]
    schema = {
        "type": "struct",
        "fields": [
            {
                "name": "city", "type": "string", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 1,
                    "delta.columnMapping.physicalName": "col-1",
                },
            },
            {
                "name": "pop", "type": "integer", "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": 2,
                    "delta.columnMapping.physicalName": "col-2",
                },
            },
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "forged-cm-table",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": mode},
                "createdTime": 0,
            }
        },
    ] + [
        {
            "add": {
                "path": f,
                "partitionValues": {},
                "size": os.path.getsize(os.path.join(root, f)),
                "modificationTime": 0,
                "dataChange": True,
            }
        }
        for f in files
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))


def test_reader_maps_foreign_column_mapped_table(spark, tmp_path):
    """Foreign minReaderVersion=2 tables with column mapping (the
    default for tables written by modern Delta writers) read through
    the physicalName annotations: logical column names out, physical
    parquet names underneath. Unsupported feature floors still refuse
    (version 3, and unknown v2 modes)."""
    import pytest

    root = str(tmp_path / "cm")
    _forge_column_mapped_table(spark, root)
    got = read_delta(spark, root)
    assert [f.name for f in got.schema.fields] == ["city", "pop"]
    assert {(r["city"], r["pop"]) for r in got.collect()} == {
        ("ams", 900), ("rio", 6700)
    }
    # floor refusals stay intact
    log = os.path.join(root, "_delta_log", f"{0:020d}.json")
    text = open(log).read()
    open(log, "w").write(
        text.replace('"minReaderVersion": 2', '"minReaderVersion": 3')
    )
    crc = os.path.join(root, "_delta_log", f".{0:020d}.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(IOError, match="reader version 3"):
        read_delta(spark, root)


def test_randomized_vacuum_resume_cursor_invariant(spark, tmp_path):
    """Deterministic pseudo-random torture over the FULL lifecycle —
    writes, exports at varying checkpoint cadences, prunes, and
    retain-N vacuums — pinning the ADVICE-r7 resume-cursor invariant:
    after ANY interleaving, the _last_checkpoint's maxSourceVersion
    equals the number of catalog versions actually exported, and the
    next export appends EXACTLY the pending catalog versions (never a
    duplicate re-publication). Checkpoint/commit sets are observed from
    disk; expected row counts per Delta version are tracked in plain
    Python; reads of retained versions must be exact and reads below
    the vacuum cutoff must refuse."""
    import random

    import pytest

    from olist_lakehouse_2_0_spark.delta_export import (
        _list_checkpoints,
        _list_commits,
        _read_last_checkpoint,
        prune_log,
        vacuum_export,
    )

    rng = random.Random(11)
    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    expected: list[int] = []  # row count per Delta version
    written: list[int] = []  # row count per catalog write, in order
    pending = 0
    counts = iter(range(10, 10_000, 10))
    exported_any = False
    for step in range(26):
        op = rng.choice(
            ["write", "write", "export", "vacuum", "prune", "export"]
        )
        if op == "write":
            n = next(counts)
            cat.write_versioned(spark.range(n), spark, "t", keep=3)
            written.append(n)
            pending += 1
            if pending == 3:
                op = "export"
        if op == "export" and pending:
            interval = rng.choice([0, 2, 3])
            got = export_delta(
                spark, cat.path_for("t"), dest,
                checkpoint_interval=interval,
            )
            assert got == pending, (step, got, pending)
            exported_any = True
            expected.extend(written[len(expected):len(expected) + pending])
            pending = 0
        if op == "vacuum" and exported_any:
            retain = rng.choice([2, 3])
            vacuum_export(spark, dest, retain_versions=retain)
        if op == "prune" and exported_any:
            prune_log(spark, dest)
        # INVARIANT after every step: the pointer's cursor equals the
        # exported catalog count, so a no-new-versions export is a no-op
        if exported_any:
            # the pointer carries the cursor AT ITS OWN version (the
            # tail above it is recovered from JSON commitInfos); in
            # this sequential history delta version v holds catalog
            # version v+1
            ptr = _read_last_checkpoint(spark, dest)
            if ptr is not None:
                assert ptr.get("maxSourceVersion") == ptr["version"] + 1, (
                    step, op, ptr
                )
            if pending == 0:
                # with nothing new in the catalog, export must be a
                # no-op — a duplicate re-publication here is exactly
                # the cursor-loss failure mode the r7 advice described
                assert export_delta(spark, cat.path_for("t"), dest) == 0

    # drain and verify final reads
    if pending:
        assert export_delta(spark, cat.path_for("t"), dest) == pending
        expected.extend(written[len(expected):len(expected) + pending])
    assert read_delta(spark, dest).count() == expected[-1]
    commits = set(_list_commits(spark, dest))
    cps = set(_list_checkpoints(spark, dest))

    def readable(v: int) -> bool:
        for c in sorted(cps | {-1}, reverse=True):
            if c <= v and all(x in commits for x in range(c + 1, v + 1)):
                return True
        return False

    for v, n in enumerate(expected):
        if readable(v):
            assert read_delta(spark, dest, version=v).count() == n, (v, n)
        else:
            with pytest.raises(IOError, match="missing commits"):
                read_delta(spark, dest, version=v)


def test_vacuum_retain_escalation_clamps_not_crashes(spark, tmp_path):
    """Review r8: asking a later vacuum for MORE history than earlier
    cleanups left reconstructable must clamp the cutoff up to the
    oldest still-readable version, not crash on missing commits —
    retention cannot resurrect removed history."""
    from olist_lakehouse_2_0_spark.delta_export import vacuum_export

    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    for n in (10, 20, 30, 40, 50):
        cat.write_versioned(spark.range(n), spark, "t", keep=2)
        export_delta(spark, cat.path_for("t"), dest, checkpoint_interval=0)
    first = vacuum_export(spark, dest, retain_versions=2)
    assert first["cutoff"] == 3
    # no new commits; a wider retention window can only keep what the
    # first vacuum left: cutoff clamps to 3, nothing crashes
    second = vacuum_export(spark, dest, retain_versions=5)
    assert second["cutoff"] == 3
    assert read_delta(spark, dest).count() == 50
    assert read_delta(spark, dest, version=3).count() == 40
    import pytest

    with pytest.raises(IOError, match="missing commits"):
        read_delta(spark, dest, version=1)


def test_partition_values_unescaped_and_null_sentinel(spark, tmp_path):
    """Review r8: hive path segments escape special characters and
    spell NULL as __HIVE_DEFAULT_PARTITION__; add.partitionValues must
    carry the LOGICAL value (decoded string / JSON null) because
    foreign readers take partitionValues verbatim and never re-derive
    from paths. The roundtrip read must surface the logical values."""
    from olist_lakehouse_2_0_spark.delta_export import publish_delta

    cat = Catalog(root=str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [("2017-01-01 12:00:00", 1), (None, 2), ("plain", 3)],
        "ts string, id int",
    )
    cat.write(df.repartition(1), "esc", partition_by=["ts"])
    root = cat.path_for("esc")
    dest = str(tmp_path / "delta")
    publish_delta(spark, root, dest)
    commits, _ = _commits(dest)
    pvals = {
        a["add"]["partitionValues"]["ts"]
        for c in commits for a in c if "add" in a
    }
    # logical values in the log: decoded timestamp string, None, plain
    assert pvals == {"2017-01-01 12:00:00", None, "plain"}
    got = read_delta(spark, dest)
    assert {
        (r["ts"], r["id"]) for r in got.collect()
    } == {("2017-01-01 12:00:00", 1), (None, 2), ("plain", 3)}


def test_reader_honors_log_partition_values_for_flat_layouts(
    spark, tmp_path
):
    """Review r8: PROTOCOL.md makes add.partitionValues authoritative
    and places NO constraint on data-file paths. A foreign partitioned
    table whose files sit FLAT at the table root (values only in the
    log) must read correctly with the values injected from the log —
    not be refused for 'disagreeing' paths."""
    root = str(tmp_path / "flat")
    os.makedirs(root)
    # two physical files, no hive dirs
    for i, grp in enumerate(("a", "b")):
        spark.createDataFrame(
            [(10 * (i + 1),)], "v int"
        ).coalesce(1).write.parquet(str(tmp_path / f"stage{i}"))
        src = next(
            f for f in os.listdir(tmp_path / f"stage{i}")
            if f.endswith(".parquet")
        )
        os.rename(
            str(tmp_path / f"stage{i}" / src),
            os.path.join(root, f"file-{grp}.parquet"),
        )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "grp", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "integer", "nullable": True,
             "metadata": {}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "forged-flat", "format":
                {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": ["grp"], "configuration": {},
                "createdTime": 0,
            }
        },
    ] + [
        {
            "add": {
                "path": f"file-{grp}.parquet",
                "partitionValues": {"grp": grp},
                "size": os.path.getsize(
                    os.path.join(root, f"file-{grp}.parquet")
                ),
                "modificationTime": 0, "dataChange": True,
            }
        }
        for grp in ("a", "b")
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    got = read_delta(spark, root)
    assert [f.name for f in got.schema.fields] == ["grp", "v"]
    assert {(r["grp"], r["v"]) for r in got.collect()} == {
        ("a", 10), ("b", 20)
    }


def test_vacuum_never_touches_non_hive_subdirectories(spark, tmp_path):
    """Review r8: the vacuum sweep must use the SAME traversal scope as
    the export walk (top level + hive col=value dirs). Parquet files in
    a non-hive subdirectory of a converted-in-place table (backups,
    archives, nested datasets) are foreign data the log never
    referenced — deleting them would be data loss."""
    from olist_lakehouse_2_0_spark.delta_export import (
        convert_to_delta,
        publish_delta,
        vacuum_export,
    )

    cat = Catalog(root=str(tmp_path / "cat"))
    df = spark.range(10).withColumn("g", (F.col("id") % 2).cast("string"))
    cat.write(df.repartition(1), "conv", partition_by=["g"])
    root = cat.path_for("conv")
    # a foreign sibling directory with parquet the log knows nothing of
    foreign = os.path.join(root, "_backup_2017")
    spark.range(3).coalesce(1).write.parquet(foreign)
    # also one with a non-hive plain name
    foreign2 = os.path.join(root, "archive")
    spark.range(4).coalesce(1).write.parquet(foreign2)
    convert_to_delta(spark, root)
    # one refresh so version 0's files become unreferenced
    stage = str(tmp_path / "stage")
    df.limit(4).repartition(1).write.parquet(stage)
    publish_delta(spark, stage, root)
    res = vacuum_export(spark, root, retain_versions=1)
    assert res["cutoff"] == 1
    # the foreign parquet files survived, byte-for-byte count
    assert spark.read.parquet(foreign).count() == 3
    assert spark.read.parquet(foreign2).count() == 4
    assert read_delta(spark, root).count() == 4


def test_reader_refuses_id_mode_without_field_ids(spark, tmp_path):
    """Review r8, narrowed in r10: id-mode column mapping matches
    parquet columns by FIELD ID (PROTOCOL.md). Files that CARRY ids
    now read through Spark's native field-id matching
    (test_read_delta_id_mode_field_ids); this fixture's files keep
    their original names with NO ids — matching by name could silently
    read all-NULL, so the floor for id-less files stays refusal."""
    import pytest

    root = str(tmp_path / "cm_id")
    _forge_column_mapped_table(spark, root, mode="id")
    with pytest.raises(IOError, match="field ids"):
        read_delta(spark, root)


def test_atomic_promote_falls_back_without_hard_links(
    spark, tmp_path, monkeypatch
):
    """Review r8: local mounts without link(2) support (FAT, some
    FUSE/network filesystems raise EPERM/ENOTSUP) must fall back to the
    FileContext no-overwrite rename instead of crashing every commit —
    and the fallback must still refuse an existing destination."""
    import errno

    from olist_lakehouse_2_0_spark.delta_export import (
        _atomic_promote,
        _fs,
        _read_text,
        _write_text,
    )

    def no_links(src, dst, **kw):
        raise OSError(errno.EPERM, "Operation not permitted")

    monkeypatch.setattr(os, "link", no_links)
    jvm, HPath, fs = _fs(spark, str(tmp_path))
    tmp_file = str(tmp_path / "c.tmp")
    final = str(tmp_path / "c.json")
    _write_text(spark, tmp_file, "winner")
    assert _atomic_promote(spark, jvm, fs, HPath(tmp_file), HPath(final))
    assert _read_text(spark, final) == "winner"
    _write_text(spark, tmp_file, "loser")
    assert not _atomic_promote(
        spark, jvm, fs, HPath(tmp_file), HPath(final)
    )
    assert _read_text(spark, final) == "winner"


def test_add_path_is_percent_encoded_per_protocol(spark, tmp_path):
    """Review r8 #2: PROTOCOL.md requires add.path to be an RFC 2396
    percent-encoded relative path (delta-spark does new Path(new
    URI(path)) — a raw space throws). Escaped-partition layouts must
    export with encoded log paths whose DECODED form is the on-disk
    location; plain names stay identical (so pre-encoding logs read
    unchanged)."""
    from urllib.parse import unquote

    from olist_lakehouse_2_0_spark.delta_export import publish_delta

    cat = Catalog(root=str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [("2017-01-01 12:00:00", 1), ("plain", 2)], "ts string, id int"
    )
    cat.write(df.repartition(1), "esc", partition_by=["ts"])
    dest = str(tmp_path / "delta")
    publish_delta(spark, cat.path_for("esc"), dest)
    commits, _ = _commits(dest)
    adds = [a["add"] for c in commits for a in c if "add" in a]
    for add in adds:
        assert " " not in add["path"], add["path"]
        # decoded log path == the on-disk file
        assert os.path.exists(os.path.join(dest, unquote(add["path"])))
    # the hive '=' separator stays literal, as delta-spark writes it
    assert all("=" in a["path"] and "%3D" not in a["path"] for a in adds)
    got = read_delta(spark, dest)
    assert {(r["ts"], r["id"]) for r in got.collect()} == {
        ("2017-01-01 12:00:00", 1), ("plain", 2)
    }


def test_foreign_encoded_paths_read_and_survive_vacuum(spark, tmp_path):
    """Review r8 #2/#3: a spec-conformant foreign table whose add.path
    entries are percent-encoded for on-disk names with spaces must READ
    (decode before resolving) and must NOT lose its live files to the
    vacuum sweep (the referenced-set compare decodes too)."""
    from olist_lakehouse_2_0_spark.delta_export import vacuum_export

    root = str(tmp_path / "enc")
    os.makedirs(root)
    spark.createDataFrame([(7,)], "v int").coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    src = next(
        f for f in os.listdir(tmp_path / "stage") if f.endswith(".parquet")
    )
    os.rename(
        str(tmp_path / "stage" / src), os.path.join(root, "part a.parquet")
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "v", "type": "integer", "nullable": True,
             "metadata": {}}
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "forged-enc",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [], "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": "part%20a.parquet",  # encoded per the spec
                "partitionValues": {},
                "size": os.path.getsize(
                    os.path.join(root, "part a.parquet")
                ),
                "modificationTime": 0, "dataChange": True,
            }
        },
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    assert read_delta(spark, root).collect()[0]["v"] == 7
    res = vacuum_export(spark, root, retain_versions=1)
    assert res["data_files_deleted"] == 0
    assert os.path.exists(os.path.join(root, "part a.parquet"))
    assert read_delta(spark, root).collect()[0]["v"] == 7


def test_inconsistent_hive_nesting_order_takes_log_fallback(
    spark, tmp_path
):
    """Review r8 #6: same partition VALUES but different segment ORDER
    across files is protocol-legal (paths are unconstrained) yet kills
    Spark's partition discovery — the consistency check must require
    the log's column order so such tables route to the log-driven
    fallback instead of crashing."""
    root = str(tmp_path / "mixed")
    for i, (d, val) in enumerate(
        (("a=1/b=2", 10), ("b=3/a=1", 20))
    ):
        os.makedirs(os.path.join(root, d), exist_ok=True)
        spark.createDataFrame([(val,)], "v int").coalesce(1).write.parquet(
            str(tmp_path / f"st{i}")
        )
        src = next(
            f for f in os.listdir(tmp_path / f"st{i}")
            if f.endswith(".parquet")
        )
        os.rename(
            str(tmp_path / f"st{i}" / src),
            os.path.join(root, d, "f.parquet"),
        )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "a", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "b", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "integer", "nullable": True,
             "metadata": {}},
        ],
    }
    adds = [
        ("a=1/b=2/f.parquet", {"a": "1", "b": "2"}),
        ("b=3/a=1/f.parquet", {"a": "1", "b": "3"}),
    ]
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "forged-mixed",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": ["a", "b"], "configuration": {},
                "createdTime": 0,
            }
        },
    ] + [
        {
            "add": {
                "path": p, "partitionValues": pv,
                "size": os.path.getsize(os.path.join(root, p)),
                "modificationTime": 0, "dataChange": True,
            }
        }
        for p, pv in adds
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    got = read_delta(spark, root)
    assert {(r["a"], r["b"], r["v"]) for r in got.collect()} == {
        ("1", "2", 10), ("1", "3", 20)
    }


def test_pre_encoding_logs_with_escaped_dirs_still_read_and_vacuum_safely(
    spark, tmp_path
):
    """Review r8 #3 (third pass): logs written by the PRE-encoding
    exporter stored RAW disk names in add.path — including hive
    %-escapes like %3A. An upgraded reader must not decode those into
    nonexistent paths, and vacuum must not sweep the live files of such
    a table. Forge an old-style log (raw escaped path) over a real
    escaped-partition layout."""
    from olist_lakehouse_2_0_spark.delta_export import vacuum_export

    cat = Catalog(root=str(tmp_path / "cat"))
    df = spark.createDataFrame(
        [("2017-01-01 12:00:00", 5)], "ts string, id int"
    )
    cat.write(df.repartition(1), "legacy", partition_by=["ts"])
    root = cat.path_for("legacy")
    # the escaped hive dir + its single data file, as on disk
    (disk_dir,) = [
        d for d in os.listdir(root) if d.startswith("ts=")
    ]
    assert "%3A" in disk_dir  # precondition: the layout IS escaped
    (data_file,) = [
        f for f in os.listdir(os.path.join(root, disk_dir))
        if f.endswith(".parquet")
    ]
    raw_rel = f"{disk_dir}/{data_file}"
    schema = {
        "type": "struct",
        "fields": [
            {"name": "ts", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "id", "type": "integer", "nullable": True,
             "metadata": {}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "legacy-raw", "format":
                {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": ["ts"], "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": raw_rel,  # RAW, as the old exporter wrote it
                "partitionValues": {"ts": disk_dir.split("=", 1)[1]},
                "size": os.path.getsize(os.path.join(root, raw_rel)),
                "modificationTime": 0, "dataChange": True,
            }
        },
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    got = read_delta(spark, root)
    assert got.count() == 1 and got.collect()[0]["id"] == 5
    res = vacuum_export(spark, root, retain_versions=1)
    assert res["data_files_deleted"] == 0
    assert os.path.exists(os.path.join(root, raw_rel))
    assert read_delta(spark, root).count() == 1


def _stage_colon_file(spark, tmp_path, root):
    os.makedirs(root)
    spark.createDataFrame([(3,)], "v int").coalesce(1).write.parquet(
        str(tmp_path / "stage")
    )
    src = next(
        f for f in os.listdir(tmp_path / "stage") if f.endswith(".parquet")
    )
    dst = os.path.join(root, "log:2017.parquet")
    os.rename(str(tmp_path / "stage" / src), dst)
    return dst


def test_first_segment_colon_is_encoded(spark, tmp_path):
    """Review r8 #3 (third pass) + r8 verdict: RFC 2396 rel_segment
    forbids ':' before the first '/' — 'log:2017.parquet' would parse
    as scheme 'log' in delta-spark's new URI(path) — so _encode_path
    must escape it for foreign/object-store logs. But on Hadoop's LOCAL
    filesystem such a file is unreadable regardless of encoding: the
    ChecksumFileSystem CRC sibling '.log:2017.parquet.crc' is an
    unrepresentable relative Path (HADOOP-14829), so the PRODUCT
    CONTRACT is refusal with a clear error at conversion time, never an
    opaque URISyntaxException mid-scan."""
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import (
        _encode_path,
        convert_to_delta,
    )

    assert _encode_path("log:2017.parquet") == "log%3A2017.parquet"
    assert _encode_path("d=1/log:2017.parquet") == "d=1/log:2017.parquet"
    root = str(tmp_path / "colon")
    _stage_colon_file(spark, tmp_path, root)
    with pytest.raises(IOError, match="HADOOP-14829"):
        convert_to_delta(spark, root)
    # refusal happens BEFORE any log is minted
    assert not os.path.exists(os.path.join(root, "_delta_log"))


def test_foreign_colon_path_read_is_refused_on_local_fs(spark, tmp_path):
    """A FOREIGN log (e.g. written on an object store, copied to local
    disk) referencing a colon-named data file must refuse at read
    planning with the contract error, not die in Hadoop's checksum
    layer mid-scan."""
    import pytest

    root = str(tmp_path / "colonread")
    dst = _stage_colon_file(spark, tmp_path, root)
    schema = {
        "type": "struct",
        "fields": [
            {"name": "v", "type": "integer", "nullable": True,
             "metadata": {}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "forged-colon",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [], "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": "log%3A2017.parquet",
                "partitionValues": {},
                "size": os.path.getsize(dst),
                "modificationTime": 0, "dataChange": True,
            }
        },
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    with pytest.raises(IOError, match="HADOOP-14829"):
        read_delta(spark, root).collect()


def test_hidden_extra_segment_routes_to_log_fallback(spark, tmp_path):
    """Review r8 #2 (third pass): a foreign path with an extra
    '_'-prefixed col=val segment agrees with the log on the COUNTED
    values but would crash Spark's discovery on the fast path — it must
    route to the log-driven fallback and read correctly."""
    root = str(tmp_path / "hidden")
    for i, (d, a_val, val) in enumerate(
        (("_backup=x/a=1", "1", 10), ("a=2", "2", 20))
    ):
        os.makedirs(os.path.join(root, d), exist_ok=True)
        spark.createDataFrame([(val,)], "v int").coalesce(1).write.parquet(
            str(tmp_path / f"hs{i}")
        )
        src = next(
            f for f in os.listdir(tmp_path / f"hs{i}")
            if f.endswith(".parquet")
        )
        os.rename(
            str(tmp_path / f"hs{i}" / src),
            os.path.join(root, d, "f.parquet"),
        )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "a", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "integer", "nullable": True,
             "metadata": {}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "forged-hidden",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": ["a"], "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": "_backup=x/a=1/f.parquet",
                "partitionValues": {"a": "1"},
                "size": os.path.getsize(
                    os.path.join(root, "_backup=x/a=1/f.parquet")
                ),
                "modificationTime": 0, "dataChange": True,
            }
        },
        {
            "add": {
                "path": "a=2/f.parquet",
                "partitionValues": {"a": "2"},
                "size": os.path.getsize(
                    os.path.join(root, "a=2/f.parquet")
                ),
                "modificationTime": 0, "dataChange": True,
            }
        },
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    got = read_delta(spark, root)
    assert {(r["a"], r["v"]) for r in got.collect()} == {
        ("1", 10), ("2", 20)
    }


def test_resolve_disk_paths_batches_listings_per_directory(
    spark, tmp_path, monkeypatch
):
    """r8 verdict scale nit: resolving N escape-carrying legacy paths
    must cost ONE directory listing per parent directory (names cached
    across files), not 2N per-file existence probes — on a 10^6-file
    foreign table with hive %-escapes the per-file form is 2x10^6
    serial NameNode round-trips on the read path."""
    from olist_lakehouse_2_0_spark import delta_export as de

    root = str(tmp_path / "legacy")
    os.makedirs(root)
    rels = []
    for i in range(8):
        # RAW disk names containing an escape: the pre-encoding
        # exporter stored these verbatim in add.path
        name = f"part%20{i}.parquet"
        open(os.path.join(root, name), "wb").close()
        rels.append(name)

    real_fs = de._fs
    counts = {"listStatus": 0}

    class _CountingFs:
        def __init__(self, inner):
            self._inner = inner

        def listStatus(self, p):
            counts["listStatus"] += 1
            return self._inner.listStatus(p)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    def counting(spark_, path):
        jvm, HPath, fs = real_fs(spark_, path)
        return jvm, HPath, _CountingFs(fs)

    monkeypatch.setattr(de, "_fs", counting)
    out = de._resolve_disk_paths(spark, root, rels)
    # every decoded form ('part 0.parquet') is absent and every raw
    # name exists -> all 8 take the legacy fallback...
    for rel in rels:
        assert out[rel] == os.path.join(root, rel)
    # ...through exactly ONE listing of the one parent directory
    assert counts["listStatus"] == 1

    # a transient/permission listing failure must PROPAGATE, never be
    # cached as "directory empty" (that would silently flip the
    # legacy-vs-decoded routing to the wrong file)
    import pytest

    class _FailingFs(_CountingFs):
        def listStatus(self, p):
            raise RuntimeError("Permission denied: fake transient")

    def failing(spark_, path):
        jvm, HPath, fs = real_fs(spark_, path)
        return jvm, HPath, _FailingFs(fs)

    monkeypatch.setattr(de, "_fs", failing)
    with pytest.raises(RuntimeError, match="Permission denied"):
        de._resolve_disk_paths(spark, root, rels)


def test_commit_timestamps_clamped_strictly_monotonic(spark, tmp_path):
    """ADVICE r8: commitInfo timestamps must be strictly monotone even
    when a snapshot's file mtimes REGRESS (copied snapshot, clock
    skew) — Delta clamps the same way — or TIMESTAMP AS OF resolution
    and export_history ordering flake."""
    from olist_lakehouse_2_0_spark.delta_export import export_history

    cat = Catalog(root=str(tmp_path / "cat"))
    dest = str(tmp_path / "delta")
    for n in (10, 20):
        cat.write_versioned(spark.range(n), spark, "t", keep=4)
    export_delta(spark, cat.path_for("t"), dest, checkpoint_interval=0)
    # next snapshot's files backdated to 2000-01-01
    cat.write_versioned(spark.range(30), spark, "t", keep=4)
    v3 = os.path.join(cat.path_for("t"), "v000000003")
    old = 946684800
    for dirpath, _, files in os.walk(v3):
        for f in files:
            os.utime(os.path.join(dirpath, f), (old, old))
    export_delta(spark, cat.path_for("t"), dest, checkpoint_interval=0)
    hist = export_history(spark, dest).orderBy("version").collect()
    ts = [h["timestamp"] for h in hist]
    assert len(ts) == 3 and ts[2] > ts[1] > ts[0]
    # the clamped stamp resolves the regressed version itself
    assert read_delta(spark, dest, timestamp=ts[2]).count() == 30


def test_naive_timestamp_resolves_in_session_timezone(spark, tmp_path):
    """ADVICE r8: a NAIVE ISO-8601 TIMESTAMP AS OF string resolves in
    spark.sql.session.timeZone (delta-spark's rule), not hardcoded
    UTC — the same string must name the same version on a non-UTC
    session."""
    from datetime import datetime, timezone
    from zoneinfo import ZoneInfo

    from olist_lakehouse_2_0_spark.delta_export import (
        _resolve_timestamp,
        export_history,
    )

    _, root = _versioned_table(spark, tmp_path, counts=(5,))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest)
    ts0 = export_history(spark, dest).collect()[0]["timestamp"]
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set(
            "spark.sql.session.timeZone", "America/Los_Angeles"
        )
        la = ZoneInfo("America/Los_Angeles")
        naive = datetime.fromtimestamp(
            (ts0 + 5) / 1000, tz=la
        ).replace(tzinfo=None)
        # under the session tz this lands just after commit 0; the old
        # naive=UTC reading places it 7-8h EARLIER than the commit and
        # would refuse as predating retained history
        assert int(
            naive.replace(tzinfo=timezone.utc).timestamp() * 1000
        ) < ts0
        assert _resolve_timestamp(spark, dest, naive.isoformat()) == 0
        # fixed-offset session timezones take the explicit-offset
        # fallback and must not crash — in every form Java ZoneId
        # accepts, including the short ones %z cannot parse
        for tz in (
            "GMT+08:00", "GMT+8", "UTC-0530", "UT+09", "+05:45",
            "Z", "+08:30:15",
        ):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert _resolve_timestamp(spark, dest, "2100-01-01") == 0
        # malformed forms Java ZoneId rejects can't even be SET as the
        # session timezone — Spark validates eagerly, so the
        # resolver's strict grammar (which also rejects '+830' etc.,
        # never resolving under a bogus backtracked offset) is
        # defense-in-depth for configs set outside a live session
        import pytest

        for tz in ("+830", "+08301"):
            with pytest.raises(Exception, match="[Zz]one"):
                spark.conf.set("spark.sql.session.timeZone", tz)
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_commit_staging_is_writer_unique(spark, tmp_path):
    """ADVICE r8 (medium): two exporters racing on one version must
    never share a staging inode — a stale fixed-name '<v>.json.tmp'
    (the pre-r9 staging path, here standing in for a concurrent
    writer's stage) must be left untouched, and the published commit
    must carry OUR bytes."""
    from olist_lakehouse_2_0_spark.delta_export import (
        _commit_path,
        _read_commit,
        _write_commit,
    )

    dest = str(tmp_path / "delta")
    os.makedirs(os.path.join(dest, "_delta_log"))
    stale = _commit_path(dest, 0) + ".tmp"
    with open(stale, "w") as fh:
        fh.write('{"foreign":"writer"}')
    _write_commit(spark, dest, 0, [{"commitInfo": {"timestamp": 1}}])
    assert _read_commit(spark, dest, 0) == [
        {"commitInfo": {"timestamp": 1}}
    ]
    # the foreign stage was never adopted, truncated, or promoted
    with open(stale) as fh:
        assert fh.read() == '{"foreign":"writer"}'


def test_vacuum_reclaims_crash_orphaned_stages(spark, tmp_path):
    """Code-review r9 (second + third pass): writer-unique '*.tmp'
    stages and '.cp_tmp_*' checkpoint staging dirs leaked by a
    hard-killed exporter are referenced by no log and must be
    reclaimed by vacuum — but ONLY once older than stage_retain_ms
    (Delta VACUUM's retention-threshold protection): a merely-slow
    concurrent writer's FRESH stage survives."""
    import time

    from olist_lakehouse_2_0_spark.delta_export import vacuum_export

    _, root = _versioned_table(spark, tmp_path, counts=(10, 20))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest)
    # plant crash debris: a data-copy stage, a commit-JSON stage, and
    # a checkpoint staging DIRECTORY (the non-local write path's)
    data_tmp = os.path.join(dest, "v000000001-part.parquet.abc123.tmp")
    with open(data_tmp, "wb") as fh:
        fh.write(b"torn")
    log_tmp = os.path.join(
        dest, "_delta_log", f"{2:020d}.json.def456.tmp"
    )
    with open(log_tmp, "w") as fh:
        fh.write("{}")
    cp_tmp = os.path.join(dest, "_delta_log", ".cp_tmp_5")
    os.makedirs(cp_tmp)
    with open(os.path.join(cp_tmp, "part-0.parquet"), "wb") as fh:
        fh.write(b"x")
    before = read_delta(spark, dest).count()
    # FRESH stages survive a vacuum (in-flight writer protection)
    res = vacuum_export(spark, dest, retain_versions=2)
    assert res["stage_files_deleted"] == 0
    assert os.path.exists(data_tmp) and os.path.exists(cp_tmp)
    # backdated stages are crash debris and are reclaimed
    old = time.time() - 2 * 86400
    for p in (data_tmp, log_tmp, cp_tmp):
        os.utime(p, (old, old))
    res = vacuum_export(spark, dest, retain_versions=2)
    assert res["stage_files_deleted"] == 3
    assert not os.path.exists(log_tmp)
    assert not os.path.exists(cp_tmp)
    assert not any(
        n.endswith(".tmp") for n in os.listdir(dest) if "=" not in n
    )
    assert read_delta(spark, dest).count() == before


def test_session_tzinfo_matches_java_zoneid_values():
    """Code-review r9 (fourth pass): the fixed-offset grammar must
    enforce Java ZoneOffset's VALUE ranges too — '+0899' is not
    +09:39, '+08:75' is not +09:15, and totals beyond ±18:00 are
    invalid — while every form Java accepts resolves."""
    from datetime import timedelta, timezone

    import pytest

    from olist_lakehouse_2_0_spark.delta_export import _session_tzinfo

    assert _session_tzinfo("Z") is timezone.utc
    # Java hardcodes the bare forms independent of tzdata links
    for bare in ("UT", "UTC", "GMT"):
        assert _session_tzinfo(bare).utcoffset(None) == timedelta(0)
    assert _session_tzinfo("GMT+8").utcoffset(None) == timedelta(hours=8)
    assert _session_tzinfo("+18:00").utcoffset(None) == timedelta(hours=18)
    assert _session_tzinfo("-0530").utcoffset(None) == -timedelta(
        hours=5, minutes=30
    )
    assert _session_tzinfo("+08:30:15").utcoffset(None) == timedelta(
        hours=8, minutes=30, seconds=15
    )
    assert str(_session_tzinfo("America/Los_Angeles")) != ""
    # ADVICE r9: Spark's DateTimeUtils.getZoneId pads the pre-3.0
    # single-digit forms and resolves through ZoneId.SHORT_IDS — a
    # session validly configured with any of these must resolve here
    assert _session_tzinfo("+8:30").utcoffset(None) == timedelta(
        hours=8, minutes=30
    )
    assert _session_tzinfo("-8:30").utcoffset(None) == -timedelta(
        hours=8, minutes=30
    )
    assert _session_tzinfo("+08:3").utcoffset(None) == timedelta(
        hours=8, minutes=3
    )
    assert _session_tzinfo("GMT+8:30").utcoffset(None) == timedelta(
        hours=8, minutes=30
    )
    assert _session_tzinfo("EST").utcoffset(None) == -timedelta(hours=5)
    assert _session_tzinfo("HST").utcoffset(None) == -timedelta(hours=10)
    assert str(_session_tzinfo("PST")) == "America/Los_Angeles"
    assert str(_session_tzinfo("JST")) == "Asia/Tokyo"
    for bad in (
        "+830", "+08301", "+0899", "+08:75", "+19", "+08:30:99",
        "+99", "Mars/Olympus", "QQT",
    ):
        with pytest.raises(ValueError, match="unsupported"):
            _session_tzinfo(bad)


def test_vacuum_protects_inflight_uncommitted_parquet(spark, tmp_path):
    """Code-review r9 (fourth pass): a concurrent exporter's
    renamed-but-NOT-YET-COMMITTED '.parquet' copies are untracked by
    the log and must survive a vacuum until stage_retain_ms ages them
    out — only files the log PROVES dead (referenced by replayable
    below-cutoff versions) are swept immediately."""
    import time

    from olist_lakehouse_2_0_spark.delta_export import vacuum_export

    _, root = _versioned_table(spark, tmp_path, counts=(10, 20, 30))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest)
    # an in-flight exporter just renamed a copy for NOT-YET-COMMITTED
    # version 3 (fresh mtime, untracked by any commit)
    inflight = os.path.join(dest, "v000000004-part-future.parquet")
    with open(inflight, "wb") as fh:
        fh.write(b"PAR1 future snapshot PAR1")
    res = vacuum_export(spark, dest, retain_versions=2)
    # version 0's files ARE swept (tracked-dead), the in-flight
    # untracked copy is NOT
    assert res["data_files_deleted"] > 0
    assert os.path.exists(inflight)
    assert read_delta(spark, dest).count() == 30
    # once stale it is reclaimed as orphaned debris
    old = time.time() - 2 * 86400
    os.utime(inflight, (old, old))
    res2 = vacuum_export(spark, dest, retain_versions=2)
    assert not os.path.exists(inflight)
    assert res2["data_files_deleted"] == 1


def test_vacuum_remove_tombstone_proves_dead(spark, tmp_path):
    """Code-review r9 (sixth pass): a RETAINED remove tombstone proves
    a file dead even when its add commit AND the checkpoint that
    listed it were already lost (the crash-interrupted-earlier-vacuum
    shape) — such a file must be swept IMMEDIATELY under the version
    contract, not wait out the 24h untracked guard."""
    from olist_lakehouse_2_0_spark.delta_export import (
        _checkpoint_path,
        prune_log,
        vacuum_export,
        write_checkpoint,
    )

    _, root = _versioned_table(spark, tmp_path, counts=(10, 20, 30))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest, checkpoint_interval=0)
    # prune the add commit of delta-v0's files (commit 0)...
    write_checkpoint(spark, dest, 0)
    prune_log(spark, dest)
    write_checkpoint(spark, dest, 2)
    # ...and lose the checkpoint that listed them (as a vacuum crash
    # between its log cleanup steps would)
    os.remove(_checkpoint_path(dest, 0))
    v1_files = [f for f in os.listdir(dest) if f.startswith("v000000001-")]
    assert v1_files  # precondition: the orphaned (FRESH) file exists
    res = vacuum_export(spark, dest, retain_versions=1)
    # commit 1's retained REMOVE is the only proof v1's file is dead —
    # and it suffices: swept immediately despite the fresh mtime
    assert not any(
        f.startswith("v000000001-") for f in os.listdir(dest)
    )
    assert res["data_files_deleted"] >= 1
    assert read_delta(spark, dest).count() == 30


def test_latest_commit_ts_reads_one_commit(spark, tmp_path, monkeypatch):
    """ADVICE r9 (medium): _latest_commit_ts must read ONLY the newest
    retained commit (this writer's timestamps are strictly monotone) —
    the full-tail scan made the Nth keep-full-history publish cost
    O(N) driver-side reads, O(N^2) over a table's lifetime, on the
    write hot path. A newest commit lacking commitInfo.timestamp
    (legacy/foreign log) still falls back to the full scan."""
    import olist_lakehouse_2_0_spark.delta_export as de

    _, root = _versioned_table(spark, tmp_path, counts=(50, 60, 70))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest, checkpoint_interval=0)

    calls: list[int] = []
    real = de._read_commit

    def counting(spark_, dest_, version):
        calls.append(version)
        return real(spark_, dest_, version)

    monkeypatch.setattr(de, "_read_commit", counting)
    ts = de._latest_commit_ts(spark, dest)
    assert calls == [2]  # newest retained commit only
    infos = de._commit_infos(spark, dest)
    assert ts == max(i["timestamp"] for _, i in infos if "timestamp" in i)

    # legacy fallback: strip commitInfo from the newest commit -> the
    # floor must come from the full retained scan, not silently -1
    cpath = de._commit_path(dest, 2)
    actions = [
        json.loads(l) for l in open(cpath) if l.strip()
    ]
    with open(cpath, "w") as fh:
        fh.write(
            "\n".join(
                json.dumps(a) for a in actions if "commitInfo" not in a
            )
        )
    calls.clear()
    ts2 = de._latest_commit_ts(spark, dest)
    assert len(calls) >= 3  # fell back to the scan
    assert ts2 == max(
        i["timestamp"]
        for _, i in de._commit_infos(spark, dest)
        if "timestamp" in i
    )


def test_resolve_disk_paths_connector_notfound_fallback(
    spark, monkeypatch
):
    """ADVICE r9 (low): an object-store connector may surface
    not-found through an exception whose text never says
    'FileNotFoundException'. _resolve_disk_paths must then confirm
    absence with one fs.exists probe on the parent and treat it as
    empty (keeping legacy-path routing working) — but still propagate
    when the parent EXISTS (a genuine IO/permission error)."""
    import pytest

    import olist_lakehouse_2_0_spark.delta_export as de

    class FakeUri:
        def getScheme(self):
            return "objstore"  # not 'file': colon gate passes through

    class FakeFS:
        def __init__(self, parent_exists):
            self.parent_exists = parent_exists

        def getUri(self):
            return FakeUri()

        def listStatus(self, path):
            raise RuntimeError("ObjectStoreKeyMissing: no such prefix")

        def exists(self, path):
            return self.parent_exists

    def fake_fs_factory(parent_exists):
        def _fake(spark_, path_):
            return None, (lambda p: p), FakeFS(parent_exists)

        return _fake

    # parent absent: the escaped rel resolves to its DECODED form
    # (nothing on disk under either name -> protocol default)
    monkeypatch.setattr(de, "_fs", fake_fs_factory(False))
    out = de._resolve_disk_paths(spark, "/tbl", ["a%20b.parquet"])
    assert out == {"a%20b.parquet": "/tbl/a b.parquet"}

    # parent present but listing still fails: genuine error, propagate
    monkeypatch.setattr(de, "_fs", fake_fs_factory(True))
    with pytest.raises(RuntimeError, match="ObjectStoreKeyMissing"):
        de._resolve_disk_paths(spark, "/tbl", ["a%20b.parquet"])


# ---------------------------------------------------------------------
# Reader version 3: deletion vectors, feature gating, id-mode mapping
# ---------------------------------------------------------------------


def _doctor_commit0(dest, mutate):
    """Rewrite commit 0's actions through ``mutate`` (fixture helper:
    forges the foreign protocol/metaData shapes a delta-spark writer
    would emit; read_delta is the code under test)."""
    from olist_lakehouse_2_0_spark.delta_export import _commit_path

    cpath = _commit_path(dest, 0)
    actions = [json.loads(l) for l in open(cpath) if l.strip()]
    actions = mutate(actions)
    with open(cpath, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))


def _write_rows_parquet(path, ids, vals):
    """One parquet file with a deterministic row order, so row index i
    holds ids[i] — the ground truth a forged DV needs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "val": pa.array(vals, pa.string()),
            }
        ),
        path,
    )


def test_read_delta_applies_deletion_vectors(spark, tmp_path):
    """A forged reader-v3 table whose adds carry one on-disk ('u',
    shared DV file with offsets + random prefix) and one inline ('i')
    deletion vector must read back with exactly the deleted row
    indexes hidden — the spec's row-index anti-filter semantics."""
    import uuid as _uuid

    from olist_lakehouse_2_0_spark.delta_export import convert_to_delta
    from olist_lakehouse_2_0_spark.deletion_vectors import (
        make_inline_descriptor,
        make_uuid_descriptor,
        pack_dv_file,
        serialize_roaring_array,
    )

    dest = str(tmp_path / "dvt")
    os.makedirs(dest)
    _write_rows_parquet(
        os.path.join(dest, "a.parquet"), [0, 1, 2, 3, 4],
        ["a0", "a1", "a2", "a3", "a4"],
    )
    _write_rows_parquet(
        os.path.join(dest, "b.parquet"), [10, 11, 12],
        ["b0", "b1", "b2"],
    )
    convert_to_delta(spark, dest)

    # on-disk DV for a.parquet: delete row indexes 1 and 3
    bm_a = serialize_roaring_array([1, 3])
    file_bytes, slots = pack_dv_file([bm_a])
    u = _uuid.uuid4()
    os.makedirs(os.path.join(dest, "ab"))
    with open(
        os.path.join(dest, "ab", f"deletion_vector_{u}.bin"), "wb"
    ) as fh:
        fh.write(file_bytes)
    dv_a = make_uuid_descriptor(
        u, slots[0]["offset"], slots[0]["sizeInBytes"],
        slots[0]["cardinality"], prefix="ab",
    )
    # inline DV for b.parquet: delete row index 0
    dv_b = make_inline_descriptor(serialize_roaring_array([0]))

    def mutate(actions):
        for a in actions:
            if "protocol" in a:
                a["protocol"] = {
                    "minReaderVersion": 3, "minWriterVersion": 7,
                    "readerFeatures": ["deletionVectors"],
                    "writerFeatures": ["deletionVectors"],
                }
            if "add" in a and a["add"]["path"] == "a.parquet":
                a["add"]["deletionVector"] = dv_a
            if "add" in a and a["add"]["path"] == "b.parquet":
                a["add"]["deletionVector"] = dv_b
        return actions

    _doctor_commit0(dest, mutate)
    got = sorted(
        (r["id"], r["val"])
        for r in read_delta(spark, dest).collect()
    )
    assert got == [
        (0, "a0"), (2, "a2"), (4, "a4"), (11, "b1"), (12, "b2"),
    ]


def test_read_delta_dv_survives_foreign_checkpoint(spark, tmp_path):
    """DV descriptors must replay through a CHECKPOINT bootstrap too —
    a reader that drops add.deletionVector when reading checkpoint
    parquet silently resurrects deleted rows. The checkpoint here is
    forged the way a foreign v3 writer would emit it (protocol
    readerFeatures + add.deletionVector columns)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olist_lakehouse_2_0_spark.delta_export import (
        _checkpoint_path,
        _commit_path,
        _cp_arrow_schema,
        _last_checkpoint_path,
        convert_to_delta,
    )
    from olist_lakehouse_2_0_spark.deletion_vectors import (
        make_inline_descriptor,
        serialize_roaring_array,
    )

    dest = str(tmp_path / "dvcp")
    os.makedirs(dest)
    _write_rows_parquet(
        os.path.join(dest, "a.parquet"), [0, 1, 2, 3],
        ["r0", "r1", "r2", "r3"],
    )
    convert_to_delta(spark, dest)
    dv = make_inline_descriptor(serialize_roaring_array([0, 2]))
    proto = {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["deletionVectors"],
        "writerFeatures": ["deletionVectors"],
    }

    def mutate(actions):
        for a in actions:
            if "protocol" in a:
                a["protocol"] = dict(proto)
            if "add" in a:
                a["add"]["deletionVector"] = dv
        return actions

    _doctor_commit0(dest, mutate)
    # forge the v0 checkpoint from the commit's own actions, then
    # prune the JSON so bootstrap MUST come from checkpoint parquet
    actions = [
        json.loads(l) for l in open(_commit_path(dest, 0)) if l.strip()
    ]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    adds = [a["add"] for a in actions if "add" in a]
    rows = [{"protocol": proto}, {"metaData": meta}] + [
        {"add": {**a, "dataChange": False}} for a in adds
    ]
    pq.write_table(
        pa.Table.from_pylist(
            [
                {
                    "protocol": r.get("protocol"),
                    "metaData": r.get("metaData"),
                    "add": r.get("add"),
                }
                for r in rows
            ],
            schema=_cp_arrow_schema(),
        ),
        _checkpoint_path(dest, 0),
    )
    with open(_last_checkpoint_path(dest), "w") as fh:
        fh.write(json.dumps({"version": 0, "size": len(rows)}))
    os.remove(_commit_path(dest, 0))

    got = sorted(r["id"] for r in read_delta(spark, dest).collect())
    assert got == [1, 3]


def test_read_delta_refuses_unknown_reader_features(spark, tmp_path):
    """Spec rule: a v3 reader may serve a table iff it implements
    EVERY readerFeature. Unknown features refuse BY NAME; a supported
    subset (timestampNtz alone) proceeds."""
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import convert_to_delta

    dest = str(tmp_path / "feat")
    os.makedirs(dest)
    _write_rows_parquet(os.path.join(dest, "a.parquet"), [1], ["x"])
    convert_to_delta(spark, dest)

    def set_features(feats, mrv=3):
        def mutate(actions):
            for a in actions:
                if "protocol" in a:
                    a["protocol"] = {
                        "minReaderVersion": mrv,
                        "minWriterVersion": 7,
                        "readerFeatures": feats,
                        "writerFeatures": [],
                    }
            return actions

        return mutate

    _doctor_commit0(dest, set_features(["deletionVectors", "v2Checkpoint"]))
    with pytest.raises(IOError, match="v2Checkpoint"):
        read_delta(spark, dest)
    _doctor_commit0(dest, set_features(["timestampNtz"]))
    assert read_delta(spark, dest).count() == 1
    _doctor_commit0(dest, set_features([], mrv=4))
    with pytest.raises(IOError, match="reader version 4"):
        read_delta(spark, dest)


def test_write_paths_refuse_foreign_protocol(spark, tmp_path):
    """The writer floor is protocol (1,2): export/publish/checkpoint/
    vacuum onto a foreign column-mapped or DV table must refuse — e.g.
    vacuum would sweep DV .bin files as untracked debris and publish
    would evolve metaData without physicalName bookkeeping."""
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import (
        convert_to_delta,
        publish_delta,
        vacuum_export,
        write_checkpoint,
    )

    dest = str(tmp_path / "foreign")
    os.makedirs(dest)
    _write_rows_parquet(os.path.join(dest, "a.parquet"), [1], ["x"])
    convert_to_delta(spark, dest)

    def mutate(actions):
        for a in actions:
            if "protocol" in a:
                a["protocol"] = {
                    "minReaderVersion": 2, "minWriterVersion": 5,
                }
        return actions

    _doctor_commit0(dest, mutate)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_rows_parquet(os.path.join(src, "s.parquet"), [2], ["y"])
    for op_name, op in (
        ("publish", lambda: publish_delta(spark, src, dest)),
        ("checkpoint", lambda: write_checkpoint(spark, dest)),
        ("vacuum", lambda: vacuum_export(spark, dest, retain_versions=1)),
    ):
        with pytest.raises(IOError, match="writer's floor"):
            op()
    # export_delta resume refuses too (needs a versioned source root)
    _, vroot = _versioned_table(spark, tmp_path, counts=(5,))
    with pytest.raises(IOError, match="writer's floor"):
        export_delta(spark, vroot, dest)
    # reading the same table stays supported (mrv=2, mode none)
    assert read_delta(spark, dest).count() == 1


def test_read_delta_id_mode_field_ids(spark, tmp_path):
    """Id-mode column mapping: files carrying parquet FIELD IDS read
    through Spark's native field-id matching (physical names ignored
    entirely); files without ids are refused up front — a name-based
    read would return all-NULL columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from olist_lakehouse_2_0_spark.delta_export import convert_to_delta

    def build(dest, with_ids):
        os.makedirs(dest)
        tbl = pa.table(
            {
                "phys_k": pa.array([1, 2, 3], pa.int64()),
                "phys_v": pa.array(["p", "q", "r"], pa.string()),
            }
        )
        if with_ids:
            tbl = tbl.cast(
                pa.schema(
                    [
                        pa.field(
                            "phys_k", pa.int64(),
                            metadata={b"PARQUET:field_id": b"1"},
                        ),
                        pa.field(
                            "phys_v", pa.string(),
                            metadata={b"PARQUET:field_id": b"2"},
                        ),
                    ]
                )
            )
        pq.write_table(tbl, os.path.join(dest, "a.parquet"))
        convert_to_delta(spark, dest)
        logical = T.StructType(
            [
                T.StructField(
                    "k", T.LongType(), True,
                    {"delta.columnMapping.id": 1,
                     "delta.columnMapping.physicalName": "phys_k"},
                ),
                T.StructField(
                    "v", T.StringType(), True,
                    {"delta.columnMapping.id": 2,
                     "delta.columnMapping.physicalName": "phys_v"},
                ),
            ]
        )

        def mutate(actions):
            for a in actions:
                if "protocol" in a:
                    a["protocol"] = {
                        "minReaderVersion": 2, "minWriterVersion": 5,
                    }
                if "metaData" in a:
                    a["metaData"]["schemaString"] = logical.json()
                    a["metaData"]["configuration"] = {
                        "delta.columnMapping.mode": "id",
                        "delta.columnMapping.maxColumnId": "2",
                    }
            return actions

        _doctor_commit0(dest, mutate)

    good = str(tmp_path / "idmode")
    build(good, with_ids=True)
    got = sorted(
        (r["k"], r["v"]) for r in read_delta(spark, good).collect()
    )
    assert got == [(1, "p"), (2, "q"), (3, "r")]

    bad = str(tmp_path / "idless")
    build(bad, with_ids=False)
    with pytest.raises(IOError, match="field ids"):
        read_delta(spark, bad)


def test_read_delta_dv_on_foreign_flat_layout(spark, tmp_path):
    """DVs must also apply through the GROUPED read path (foreign
    flat layouts whose partition values exist only in the log): the
    per-group scans are tagged with file/row-index metadata before
    the partition literals are injected, and the DV filter runs over
    the union. Also pins the plan: small bitmaps take the broadcast
    bitmap FILTER path (an Arrow-batched membership test — no join,
    no shuffle, the shape Delta's own readers use), while monkeying
    the byte gate to -1 forces the large-DV fallback, a plain
    NON-broadcast shuffle anti-join — both produce identical rows."""
    from olist_lakehouse_2_0_spark.deletion_vectors import (
        make_inline_descriptor,
        serialize_roaring_array,
    )

    root = str(tmp_path / "flatdv")
    os.makedirs(os.path.join(root, "_delta_log"))
    _write_rows_parquet(
        os.path.join(root, "file-a.parquet"), [0, 1, 2], ["a", "b", "c"]
    )
    _write_rows_parquet(
        os.path.join(root, "file-b.parquet"), [10, 11], ["d", "e"]
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "grp", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "val", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
    dv_a = make_inline_descriptor(serialize_roaring_array([1]))
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "forged-flat-dv",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": ["grp"], "configuration": {},
                "createdTime": 0,
            }
        },
        {
            "add": {
                "path": "file-a.parquet",
                "partitionValues": {"grp": "a"},
                "size": os.path.getsize(
                    os.path.join(root, "file-a.parquet")
                ),
                "modificationTime": 0, "dataChange": True,
                "deletionVector": dv_a,
            }
        },
        {
            "add": {
                "path": "file-b.parquet",
                "partitionValues": {"grp": "b"},
                "size": os.path.getsize(
                    os.path.join(root, "file-b.parquet")
                ),
                "modificationTime": 0, "dataChange": True,
            }
        },
    ]
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    df = read_delta(spark, root)
    assert [f.name for f in df.schema.fields] == ["grp", "id", "val"]
    assert sorted(
        (r["grp"], r["id"], r["val"]) for r in df.collect()
    ) == [
        ("a", 0, "a"), ("a", 2, "c"), ("b", 10, "d"), ("b", 11, "e"),
    ]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" in plan or "ArrowEvalPython" in plan
    assert "Join" not in plan  # bitmap filter: no join, no shuffle

    # large-DV fallback: force the anti-join path and re-verify rows
    import olist_lakehouse_2_0_spark.delta_export as de
    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(de, "_DV_BROADCAST_MAX_BYTES", -1)
        df2 = read_delta(spark, root)
        assert sorted(
            (r["grp"], r["id"], r["val"]) for r in df2.collect()
        ) == [
            ("a", 0, "a"), ("a", 2, "c"), ("b", 10, "d"), ("b", 11, "e"),
        ]
        plan2 = df2._jdf.queryExecution().executedPlan().toString()
        # anti-JOIN shape (vs the filter path above); the declared
        # plan carries no broadcast hint, so at scale AQE keeps the
        # shuffle join — here it legitimately converts the tiny side
        # to a runtime broadcast, which is AQE's call, not ours
        assert "LeftAnti" in plan2
    finally:
        mp.undo()


def test_read_delta_dv_in_space_partition_dir(spark, tmp_path):
    """Regression (r10): ``_metadata.file_path`` is the URI-ENCODED
    path — a 'priority=NOT%20SPECIFIED' partition dir — while Hadoop
    Path.toString decodes. The DV anti-join key must be built in the
    metadata column's exact encoding (scheme:[//authority]rawPath),
    or every DV on a space/percent-carrying path silently fails to
    apply and its deleted rows RESURRECT."""
    from olist_lakehouse_2_0_spark.delta_export import (
        _commit_path,
        convert_to_delta,
    )
    from olist_lakehouse_2_0_spark.deletion_vectors import (
        make_inline_descriptor,
        serialize_roaring_array,
    )

    dest = str(tmp_path / "dvspace")
    part = os.path.join(dest, "p=NOT SPECIFIED")
    os.makedirs(part)
    _write_rows_parquet(
        os.path.join(part, "a.parquet"), [0, 1, 2], ["x", "y", "z"]
    )
    convert_to_delta(spark, dest)
    dv = make_inline_descriptor(serialize_roaring_array([1]))

    cpath = _commit_path(dest, 0)
    actions = [json.loads(l) for l in open(cpath) if l.strip()]
    for a in actions:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        if "add" in a:
            # the protocol encodes the space in add.path
            assert "%20" in a["add"]["path"]
            a["add"]["deletionVector"] = dv
    with open(cpath, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))

    got = sorted(
        (r["p"], r["id"]) for r in read_delta(spark, dest).collect()
    )
    assert got == [("NOT SPECIFIED", 0), ("NOT SPECIFIED", 2)]


def test_commit_infos_reconstruct_nonmonotone_legacy_timestamps(
    spark, tmp_path
):
    """Review r10: logs written by the pre-clamp exporter (or any
    foreign writer — Delta commit stamps are file mtimes and regress
    routinely) can carry RAW timestamp regressions. _commit_infos
    must reconstruct them monotonically the way Delta's own history
    reader does (each displayed stamp >= predecessor+1), so
    TIMESTAMP AS OF and export_history resolve exactly as Delta
    would, and _latest_commit_ts's single-read floor stays safe."""
    import olist_lakehouse_2_0_spark.delta_export as de

    _, root = _versioned_table(spark, tmp_path, counts=(10, 20, 30))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest, checkpoint_interval=0)
    # forge the pre-clamp shape: regress v1's and v2's raw stamps
    raw = {0: 10_000, 1: 9_000, 2: 9_100}
    for v, ts in raw.items():
        _update_commit_info(dest, v, {"timestamp": ts})
    infos = de._commit_infos(spark, dest)
    shown = [i["timestamp"] for _, i in infos]
    assert shown == [10_000, 10_001, 10_002]  # Delta's reconstruction
    # TIMESTAMP AS OF between v0 and the reconstructed v1 -> v0,
    # never the raw-regressed v1
    assert de._resolve_timestamp(spark, dest, 10_000) == 0
    assert de._resolve_timestamp(spark, dest, 10_001) == 1
    # history shows the reconstructed, nondecreasing stamps
    hist = de.export_history(spark, dest).orderBy("version").collect()
    assert [h["timestamp"] for h in hist] == [10_000, 10_001, 10_002]
    # the next publish stamps strictly above what READERS display:
    # _latest_commit_ts's one-read floor may see raw 9_100, but the
    # reader-side reconstruction absorbs it deterministically
    stage = str(tmp_path / "snap")
    spark.range(7).coalesce(1).write.parquet(stage)
    de.publish_delta(spark, stage, dest)
    hist2 = de.export_history(spark, dest).orderBy("version").collect()
    ts2 = [h["timestamp"] for h in hist2]
    assert ts2 == sorted(ts2) and len(set(ts2)) == 4


def test_read_delta_dv_helper_name_collision(spark, tmp_path):
    """Review r10: a spec-conformant table may itself carry a column
    named __dv_file / __dv_row_index; the DV tag/filter must uniquify
    its helper names against the schema instead of colliding (an
    ambiguous-reference crash or a silently dropped user column)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olist_lakehouse_2_0_spark.delta_export import convert_to_delta
    from olist_lakehouse_2_0_spark.deletion_vectors import (
        make_inline_descriptor,
        serialize_roaring_array,
    )

    dest = str(tmp_path / "dvcollide")
    os.makedirs(dest)
    pq.write_table(
        pa.table(
            {
                "__dv_file": pa.array(["u0", "u1", "u2"], pa.string()),
                "__dv_row_index": pa.array([7, 8, 9], pa.int64()),
            }
        ),
        os.path.join(dest, "a.parquet"),
    )
    convert_to_delta(spark, dest)
    dv = make_inline_descriptor(serialize_roaring_array([1]))
    cpath = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(cpath) if l.strip()]
    for a in actions:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        if "add" in a:
            a["add"]["deletionVector"] = dv
    with open(cpath, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    df = read_delta(spark, dest)
    assert [f.name for f in df.schema.fields] == [
        "__dv_file", "__dv_row_index",
    ]
    assert sorted(
        (r["__dv_file"], r["__dv_row_index"]) for r in df.collect()
    ) == [("u0", 7), ("u2", 9)]


def test_id_mode_pins_ignore_missing_false(spark, tmp_path):
    """Review r10: the refusal-over-misread contract must not depend
    on an unverified session default — an id-mode read pins
    spark.sql.parquet.fieldId.read.ignoreMissing to false even when
    another workload set it true (true would let an id-less file read
    as all-NULL on non-local tables the footer probe can't reach)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from olist_lakehouse_2_0_spark.delta_export import convert_to_delta

    spark.conf.set(
        "spark.sql.parquet.fieldId.read.ignoreMissing", "true"
    )
    try:
        dest = str(tmp_path / "idpin")
        os.makedirs(dest)
        tbl = pa.table({"pk": pa.array([1, 2], pa.int64())})
        tbl = tbl.cast(
            pa.schema(
                [
                    pa.field(
                        "pk", pa.int64(),
                        metadata={b"PARQUET:field_id": b"1"},
                    )
                ]
            )
        )
        pq.write_table(tbl, os.path.join(dest, "a.parquet"))
        convert_to_delta(spark, dest)
        logical = T.StructType(
            [
                T.StructField(
                    "k", T.LongType(), True,
                    {"delta.columnMapping.id": 1,
                     "delta.columnMapping.physicalName": "pk"},
                )
            ]
        )
        cpath = os.path.join(dest, "_delta_log", f"{0:020d}.json")
        actions = [json.loads(l) for l in open(cpath) if l.strip()]
        for a in actions:
            if "protocol" in a:
                a["protocol"] = {
                    "minReaderVersion": 2, "minWriterVersion": 5,
                }
            if "metaData" in a:
                a["metaData"]["schemaString"] = logical.json()
                a["metaData"]["configuration"] = {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "1",
                }
        with open(cpath, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions))
        assert sorted(
            r["k"] for r in read_delta(spark, dest).collect()
        ) == [1, 2]
        assert (
            spark.conf.get(
                "spark.sql.parquet.fieldId.read.ignoreMissing"
            )
            == "false"
        )
    finally:
        spark.conf.unset("spark.sql.parquet.fieldId.read.ignoreMissing")


def test_commit_infos_tolerate_null_timestamp(spark, tmp_path):
    """Second review pass: a foreign commitInfo carrying a JSON-null
    timestamp must pass through for display without entering the
    clamp arithmetic or timestamp resolution — previously a clean
    TypeError crash in every history/timestamp-travel path."""
    import olist_lakehouse_2_0_spark.delta_export as de

    _, root = _versioned_table(spark, tmp_path, counts=(5, 6, 7))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest, checkpoint_interval=0)
    _update_commit_info(dest, 1, {"timestamp": None})
    hist = de.export_history(spark, dest).orderBy("version").collect()
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[1]["timestamp"] is None  # displayed, not invented
    # resolution skips the unstamped commit and still works
    assert de._resolve_timestamp(spark, dest, hist[2]["timestamp"]) == 2
    assert de._latest_commit_ts(spark, dest) == hist[2]["timestamp"]
    # and a null on the NEWEST commit falls back to the stamped scan
    _update_commit_info(dest, 2, {"timestamp": None})
    assert de._latest_commit_ts(spark, dest) == hist[0]["timestamp"]


def test_read_delta_dv_collision_with_case_and_fallback(
    spark, tmp_path
):
    """Second review pass: (a) helper-name uniquification must be
    CASE-insensitive (Spark resolution is), so a table column named
    __DV_FILE still reads; (b) the collision-uniquified names must
    also survive the large-DV anti-join fallback path, which renames
    the expanded side to match."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    import olist_lakehouse_2_0_spark.delta_export as de
    from olist_lakehouse_2_0_spark.delta_export import convert_to_delta
    from olist_lakehouse_2_0_spark.deletion_vectors import (
        make_inline_descriptor,
        serialize_roaring_array,
    )

    dest = str(tmp_path / "dvcase")
    os.makedirs(dest)
    pq.write_table(
        pa.table(
            {
                "__DV_FILE": pa.array(["u0", "u1", "u2"], pa.string()),
                "val": pa.array([7, 8, 9], pa.int64()),
            }
        ),
        os.path.join(dest, "a.parquet"),
    )
    convert_to_delta(spark, dest)
    dv = make_inline_descriptor(serialize_roaring_array([1]))
    cpath = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(cpath) if l.strip()]
    for a in actions:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        if "add" in a:
            a["add"]["deletionVector"] = dv
    with open(cpath, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))

    expected = [("u0", 7), ("u2", 9)]
    got = sorted(
        (r["__DV_FILE"], r["val"])
        for r in read_delta(spark, dest).collect()
    )
    assert got == expected
    # same table through the anti-join fallback (gate forced shut)
    mp = _pytest.MonkeyPatch()
    try:
        mp.setattr(de, "_DV_BROADCAST_MAX_BYTES", -1)
        got2 = sorted(
            (r["__DV_FILE"], r["val"])
            for r in read_delta(spark, dest).collect()
        )
        assert got2 == expected
    finally:
        mp.undo()


def test_dv_gate_routes_run_compressed_bitmaps_to_antijoin(
    spark, tmp_path, monkeypatch
):
    """Second review pass: the broadcast gate must bound DECODED
    cardinality, not just serialized bytes — a run-compressed DV of a
    few hundred bytes can decode to millions of indexes. With the row
    bound lowered under this fixture's cardinality, the plan must be
    the anti-join, never the broadcast filter."""
    import olist_lakehouse_2_0_spark.delta_export as de
    from olist_lakehouse_2_0_spark.delta_export import convert_to_delta
    from olist_lakehouse_2_0_spark.deletion_vectors import (
        make_inline_descriptor,
        serialize_roaring_array,
    )

    dest = str(tmp_path / "dvrun")
    os.makedirs(dest)
    _write_rows_parquet(
        os.path.join(dest, "a.parquet"), list(range(10)),
        [f"r{i}" for i in range(10)],
    )
    convert_to_delta(spark, dest)
    dv = make_inline_descriptor(serialize_roaring_array(range(5)))
    cpath = os.path.join(dest, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(cpath) if l.strip()]
    for a in actions:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        if "add" in a:
            a["add"]["deletionVector"] = dv
    with open(cpath, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    monkeypatch.setattr(de, "_DV_BROADCAST_MAX_ROWS", 4)
    df = read_delta(spark, dest)
    assert sorted(r["id"] for r in df.collect()) == [5, 6, 7, 8, 9]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan  # routed to the join, not the filter


def test_export_history_coerces_foreign_commit_info(spark, tmp_path):
    """Fourth review pass: the protocol types operationParameters as
    map<string,string>, so a GENUINE delta-spark sourceVersion arrives
    as the string '123'; export_history must display it as a long,
    and junk strings / beyond-int64 ints / non-string operations must
    display as null instead of crashing the typed relation."""
    import olist_lakehouse_2_0_spark.delta_export as de

    _, root = _versioned_table(spark, tmp_path, counts=(5, 6))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest, checkpoint_interval=0)
    doctored = {
        0: {"timestamp": 2**63, "operation": 7,
            "operationParameters": {"sourceVersion": "123"}},
        1: {"timestamp": "not-a-number",
            "operationParameters": {"sourceVersion": "junk"}},
    }
    for v, info in doctored.items():
        _update_commit_info(dest, v, info)
    hist = de.export_history(spark, dest).orderBy("version").collect()
    assert hist[0]["timestamp"] is None  # 2**63 overflows int64
    assert hist[0]["operation"] == "7"  # stringified, not crashed
    assert hist[0]["source_version"] == 123  # protocol string form
    assert hist[1]["timestamp"] is None
    assert hist[1]["source_version"] is None


def test_string_timestamps_and_cursor_coerce_consistently(
    spark, tmp_path
):
    """Fifth review pass: a protocol-string timestamp ('1234') must
    coerce AT INGESTION so display, the monotone clamp, and TIMESTAMP
    AS OF all see the same value; a beyond-int64 sourceVersion must
    never poison the export resume cursor (it would wedge every
    future export's newness gate), while the protocol-string form
    '123' must ADVANCE it."""
    import olist_lakehouse_2_0_spark.delta_export as de

    _, root = _versioned_table(spark, tmp_path, counts=(5, 6))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest, checkpoint_interval=0)

    doctor = lambda v, info: _update_commit_info(dest, v, info)  # noqa: E731
    doctor(0, {"timestamp": 5000})
    doctor(1, {"timestamp": "1234"})  # string, regressed
    infos = de._commit_infos(spark, dest)
    # coerced, then clamped above v0 — display and resolution agree
    assert [i["timestamp"] for _, i in infos] == [5000, 5001]
    assert de._resolve_timestamp(spark, dest, 5001) == 1
    hist = de.export_history(spark, dest).orderBy("version").collect()
    assert [h["timestamp"] for h in hist] == [5000, 5001]

    # resume cursor: 2**100 and True must be ignored; '123' advances
    doctor(1, {"operationParameters": {"sourceVersion": 2**100}})
    assert de._replay(spark, dest, 1)["max_source_version"] == 1
    doctor(1, {"operationParameters": {"sourceVersion": True}})
    assert de._replay(spark, dest, 1)["max_source_version"] == 1
    doctor(1, {"operationParameters": {"sourceVersion": "123"}})
    assert de._replay(spark, dest, 1)["max_source_version"] == 123
    # sixth review pass: a >4300-digit decimal string must display/
    # resolve as null, not crash Python 3.11's int() conversion limit
    doctor(1, {"timestamp": "1" * 5000})
    assert de._latest_commit_ts(spark, dest) == 5000  # falls back
    assert [
        i.get("timestamp") for _, i in de._commit_infos(spark, dest)
    ][1] == "1" * 5000  # raw passthrough, no crash
    # ...and the string fast path: a protocol-string NEWEST stamp
    # keeps the one-read floor
    doctor(1, {"timestamp": "6000"})
    assert de._latest_commit_ts(spark, dest) == 6000
    # the POINTER file is the cursor's second ingestion point: a
    # forged maxSourceVersion must neither wedge the newness gate at
    # 2**100 nor crash max() — an untrustworthy pointer degrades the
    # cursor to -1 (a lost cursor re-publishes duplicates, the
    # documented safe direction; a wedged one silently exports
    # nothing forever)
    de.write_checkpoint(spark, dest, 1)
    ptr = de._last_checkpoint_path(dest)
    meta = json.loads(open(ptr).read())
    meta["maxSourceVersion"] = 2**100
    _rewrite_log_file(ptr, json.dumps(meta))
    assert de._replay(spark, dest, 1)["max_source_version"] == -1
    # seventh pass: a forged pointer VERSION makes the whole pointer
    # absent (Delta's corrupt-pointer fallback) — reads still work
    meta["version"] = "not-a-version"
    _rewrite_log_file(ptr, json.dumps(meta))
    assert de._read_last_checkpoint(spark, dest) is None
    assert read_delta(spark, dest).count() > 0
    # and Delta's own %020d zero-padded cursor form must coerce
    assert de._as_long("00000000000000000123") == 123
    assert de._as_long("1" * 65) is None


def test_corrupt_pointer_on_pruned_log_degrades_not_restarts(
    spark, tmp_path
):
    """Eighth review pass: checkpoint + prune_log leaves ZERO JSON
    commits; if the pointer is then corrupted, the table must still
    (a) read through the on-disk checkpoint listing and (b) continue
    exporting ABOVE the checkpointed version — before this fix the
    normalized-away pointer made the table look log-less, so reads
    raised missing-table and exports silently restarted at commit 0,
    with the stale checkpoint later poisoning replay with
    pre-corruption state."""
    import olist_lakehouse_2_0_spark.delta_export as de

    cat, root = _versioned_table(spark, tmp_path, counts=(10, 20))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest, checkpoint_interval=0)
    de.write_checkpoint(spark, dest)  # checkpoint at latest (v1)
    assert de.prune_log(spark, dest) == 2  # all JSON commits gone
    ptr = de._last_checkpoint_path(dest)
    _rewrite_log_file(ptr, '{"version": "corrupt"}')
    assert de._read_last_checkpoint(spark, dest) is None
    # reads serve through the checkpoint listing
    assert read_delta(spark, dest).count() == 20
    assert de._latest_log_version(spark, dest) == 1
    # exports continue above the checkpoint, never restart at 0
    cat.write_versioned(
        spark.range(30).withColumn("val", F.col("id") * 2),
        spark, "t", layer="gold", keep=3,
    )
    appended = export_delta(spark, root, dest, checkpoint_interval=0)
    # the corrupt pointer lost the resume cursor, so all 3 retained
    # catalog versions re-publish (duplicate overwrite commits — the
    # DOCUMENTED lost-cursor fallback), appended ABOVE v1
    assert appended == 3
    commits = de._list_commits(spark, dest)
    assert commits and min(commits) >= 2
    assert read_delta(spark, dest).count() == 30

    # publish_delta has the same gate: a corrupt pointer on a pruned
    # publish log must continue above the checkpoint, never restart
    # the ordinal-0 history (ninth review pass — this branch was
    # untested)
    pdest = str(tmp_path / "pub")
    stage = str(tmp_path / "pstage")
    spark.range(5).coalesce(1).write.parquet(stage)
    de.publish_delta(spark, stage, pdest)
    stage2 = str(tmp_path / "pstage2")
    spark.range(8).coalesce(1).write.parquet(stage2)
    de.publish_delta(spark, stage2, pdest)
    de.write_checkpoint(spark, pdest)
    assert de.prune_log(spark, pdest) == 2
    _rewrite_log_file(
        de._last_checkpoint_path(pdest), '{"version": "corrupt"}'
    )
    stage3 = str(tmp_path / "pstage3")
    spark.range(11).coalesce(1).write.parquet(stage3)
    assert de.publish_delta(spark, stage3, pdest) == 2  # above v1
    assert read_delta(spark, pdest).count() == 11
    assert read_delta(spark, pdest, version=1).count() == 8


def test_multipart_checkpoint_bootstrap_and_incomplete_refusal(
    spark, tmp_path
):
    """Foreign writers with large logs emit the protocol's MULTI-PART
    classic checkpoint (<v>.checkpoint.<part>.<total>.parquet). The
    reader must (a) list a COMPLETE part set as a usable checkpoint
    and bootstrap from all parts' union, (b) treat an INCOMPLETE set
    (torn upload) as no checkpoint at all — partial state must never
    be served — and (c) have vacuum's old-checkpoint sweep remove
    every part, not just the single-file name."""
    import pyarrow.parquet as pq

    import olist_lakehouse_2_0_spark.delta_export as de

    _, root = _versioned_table(spark, tmp_path, counts=(10, 20))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest, checkpoint_interval=0)
    de.write_checkpoint(spark, dest)  # single-file checkpoint at v1
    single = de._checkpoint_path(dest, 1)
    # split it into the protocol's 2-part form and drop the original
    table = pq.read_table(single)
    half = max(1, table.num_rows // 2)
    log = os.path.join(dest, "_delta_log")
    pq.write_table(
        table.slice(0, half),
        os.path.join(
            log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
        ),
    )
    pq.write_table(
        table.slice(half),
        os.path.join(
            log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
        ),
    )
    os.remove(single)
    crc = os.path.join(log, f".{os.path.basename(single)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert de._list_checkpoints(spark, dest) == [1]
    # prune the JSON tail: bootstrap MUST come from the parts
    assert de.prune_log(spark, dest) == 2
    assert read_delta(spark, dest).count() == 20

    # incomplete part set = NO checkpoint (and with the JSONs pruned,
    # a loud missing-commits refusal — never partial state)
    os.remove(
        os.path.join(
            log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
        )
    )
    assert de._list_checkpoints(spark, dest) == []
    import pytest as _pytest

    with _pytest.raises(IOError):
        read_delta(spark, dest)

    # (c) vacuum sweeps every part of a below-cutoff checkpoint
    dest2 = str(tmp_path / "delta2")
    export_delta(spark, root, dest2, checkpoint_interval=0)
    de.write_checkpoint(spark, dest2, 0)
    s0 = de._checkpoint_path(dest2, 0)
    t0 = pq.read_table(s0)
    log2 = os.path.join(dest2, "_delta_log")
    pq.write_table(
        t0.slice(0, 1),
        os.path.join(
            log2, f"{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
        ),
    )
    pq.write_table(
        t0.slice(1),
        os.path.join(
            log2, f"{0:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
        ),
    )
    os.remove(s0)
    crc0 = os.path.join(log2, f".{os.path.basename(s0)}.crc")
    if os.path.exists(crc0):
        os.remove(crc0)
    # plant a TORN part below the cutoff (permanent debris unless the
    # sweep parses names, not just the usable mapping) and a torn part
    # AT the cutoff (maybe an in-flight concurrent upload — keep)
    with open(
        os.path.join(
            log2, f"{0:020d}.checkpoint.{1:010d}.{9:010d}.parquet"
        ),
        "wb",
    ) as fh:
        fh.write(b"torn below cutoff")
    torn_kept = f"{1:020d}.checkpoint.{1:010d}.{9:010d}.parquet"
    with open(os.path.join(log2, torn_kept), "wb") as fh:
        fh.write(b"torn at cutoff, possibly in-flight")
    de.vacuum_export(spark, dest2, retain_versions=1)
    leftover = [
        n for n in os.listdir(log2) if ".checkpoint." in n and
        n.startswith(f"{0:020d}.")
    ]
    assert leftover == []  # both real parts AND the torn one swept
    assert os.path.exists(os.path.join(log2, torn_kept))  # kept
    assert read_delta(spark, dest2).count() == 20


def test_log_listing_ignores_noncanonical_digit_names(spark, tmp_path):
    """Review r10: Unicode-digit file names ('²...².json') pass
    .isdigit() but crash int(); commit and checkpoint listings share
    one ASCII grammar, so such junk is skipped everywhere — and a
    non-canonical '5.checkpoint.parquet' is foreign/unknown, neither
    listed nor ever deleted by vacuum."""
    import olist_lakehouse_2_0_spark.delta_export as de

    _, root = _versioned_table(spark, tmp_path, counts=(10, 20))
    dest = str(tmp_path / "delta")
    export_delta(spark, root, dest, checkpoint_interval=0)
    log = os.path.join(dest, "_delta_log")
    junk = [
        "²" * 20 + ".json",  # superscript digits: isdigit()=True
        "5.checkpoint.parquet",  # unpadded stem
        "٠" * 20 + ".json",  # Arabic-Indic digits
    ]
    for nm in junk:
        with open(os.path.join(log, nm), "wb") as fh:
            fh.write(b"junk")
    assert de._list_commits(spark, dest) == [0, 1]
    assert de._list_checkpoints(spark, dest) == []
    assert read_delta(spark, dest).count() == 20
    de.export_history(spark, dest).collect()  # no crash anywhere
    res = de.vacuum_export(spark, dest, retain_versions=1)
    assert res["cutoff"] == 1
    # unknown names survive the sweep (never-delete-what-we-don't-
    # understand), and the table still reads
    for nm in junk:
        assert os.path.exists(os.path.join(log, nm))
    assert read_delta(spark, dest).count() == 20
