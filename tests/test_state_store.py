"""Versioned parquet state store + MERGE semantics unit tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from automated_datastore_discovery_with_aws_glue_spark.state.merge import merge_frames
from automated_datastore_discovery_with_aws_glue_spark.state.store import ParquetStateStore


@pytest.fixture()
def store(spark, tmp_path):
    return ParquetStateStore(spark, str(tmp_path))


def _df(spark, rows):
    return spark.createDataFrame(rows, ["id", "val", "flag"])


def test_merge_insert_only_never_clobbers(spark):
    t = _df(spark, [("a", 1, False), ("b", 2, False)])
    s = _df(spark, [("b", 99, True), ("c", 3, True)])
    out = {r["id"]: (r["val"], r["flag"]) for r in merge_frames(t, s, "id").collect()}
    assert out == {"a": (1, False), "b": (2, False), "c": (3, True)}


def test_merge_update_only(spark):
    t = _df(spark, [("a", 1, False), ("b", 2, False)])
    s = _df(spark, [("b", 0, True), ("c", 0, True)])
    out = {
        r["id"]: (r["val"], r["flag"])
        for r in merge_frames(
            t, s, "id",
            set_on_match={"flag": F.lit(True), "val": F.col("src.val")},
            insert_not_matched=False,
        ).collect()
    }
    assert out == {"a": (1, False), "b": (0, True)}


def test_merge_rejects_null_source_key(spark):
    """A NULL merge key can never match the equi-join and would silently
    become an unmatchable insert; the lazy in-plan guard fires during
    the merge's own evaluation (no extra up-front job)."""
    t = _df(spark, [("a", 1, False)])
    s = _df(spark, [(None, 9, True), ("b", 2, True)])
    with pytest.raises(Exception, match="NULL merge key"):
        merge_frames(t, s, "id").collect()


def test_merge_missing_source_columns_null_filled(spark):
    t = _df(spark, [("a", 1, False)])
    s = spark.createDataFrame([("z",)], ["id"])
    out = {r["id"]: (r["val"], r["flag"]) for r in merge_frames(t, s, "id").collect()}
    assert out == {"a": (1, False), "z": (None, None)}


def _partition_inodes(store, table, version, part):
    d = f"{store.root}/{table}/v={version:08d}/{part}"
    import os

    return {
        name: os.stat(os.path.join(d, name)).st_ino
        for name in os.listdir(d)
        if not name.startswith(("_", "."))
    }


def test_merge_prune_rewrites_only_touched_partitions(spark, store):
    """Partition-pruned MERGE: the source's partition values rewrite;
    every other partition's files hard-link into the new version
    (same inode) — O(touched), not O(table)."""
    t = spark.createDataFrame(
        [("a", 1, "s3"), ("b", 2, "s3"), ("c", 3, "rds"), ("d", 4, "rds")],
        ["id", "val", "data_source_type"],
    )
    store.init("trk", t, partition_by="data_source_type")
    src = spark.createDataFrame([("a", 99, "s3"), ("e", 5, "s3")], ["id", "val", "data_source_type"])
    store.merge(
        "trk",
        src,
        "id",
        set_on_match={"val": F.col("src.val")},
        insert_not_matched=True,
        partition_by="data_source_type",
        prune_partitions=True,
    )
    out = {r["id"]: (r["val"], r["data_source_type"]) for r in store.read("trk").collect()}
    assert out == {
        "a": (99, "s3"), "b": (2, "s3"), "e": (5, "s3"),
        "c": (3, "rds"), "d": (4, "rds"),
    }
    # untouched rds partition: identical hard-linked files
    assert _partition_inodes(store, "trk", 2, "data_source_type=rds") == _partition_inodes(
        store, "trk", 1, "data_source_type=rds"
    )
    # touched s3 partition: freshly written files
    v1 = set(_partition_inodes(store, "trk", 1, "data_source_type=s3").values())
    v2 = set(_partition_inodes(store, "trk", 2, "data_source_type=s3").values())
    assert not (v1 & v2)


def test_merge_prune_null_partition_value_loses_nothing(spark, store):
    """A NULL partition value in the source can't be matched by isin();
    pruning must fall back to the full rewrite so the NULL partition's
    target rows survive (regression: they were silently dropped)."""
    t = spark.createDataFrame(
        [("a", 1, "s3"), ("b", 2, None), ("c", 3, "rds")],
        "id string, val int, data_source_type string",
    )
    store.init("trknull", t, partition_by="data_source_type")
    src = spark.createDataFrame(
        [("x", 9, None), ("a", 10, "s3")], "id string, val int, data_source_type string"
    )
    store.merge(
        "trknull",
        src,
        "id",
        set_on_match={"val": F.col("src.val")},
        insert_not_matched=True,
        partition_by="data_source_type",
        prune_partitions=True,
    )
    out = {r["id"]: (r["val"], r["data_source_type"]) for r in store.read("trknull").collect()}
    assert out == {
        "a": (10, "s3"),
        "b": (2, None),   # NULL-partition target row preserved
        "c": (3, "rds"),
        "x": (9, None),
    }


def test_merge_prune_falls_back_when_partition_value_updated(spark, store):
    """set_on_match rewriting the partition column defeats the pruning
    contract -> full rewrite, still correct."""
    t = spark.createDataFrame(
        [("a", 1, "s3"), ("c", 3, "rds")], ["id", "val", "data_source_type"]
    )
    store.init("trk2", t, partition_by="data_source_type")
    src = spark.createDataFrame([("a", 0, "rds")], ["id", "val", "data_source_type"])
    store.merge(
        "trk2",
        src,
        "id",
        set_on_match={"val": F.col("src.val"), "data_source_type": F.col("src.data_source_type")},
        insert_not_matched=False,
        partition_by="data_source_type",
        prune_partitions=True,
    )
    out = {r["id"]: (r["val"], r["data_source_type"]) for r in store.read("trk2").collect()}
    assert out == {"a": (0, "rds"), "c": (3, "rds")}


def test_state_read_prunes_partitions(spark, store):
    """The P1-P5 filter key (data_source_type) is the partition column,
    so state scans prune at planning time — the reference's 'PartiQL full
    scan per invocation' becomes a one-partition read."""
    t = spark.createDataFrame(
        [("a", 1, "s3"), ("c", 3, "rds"), ("d", 4, "dynamodb")],
        ["id", "val", "data_source_type"],
    )
    store.init("trk3", t, partition_by="data_source_type")
    q = store.read("trk3").filter(F.col("data_source_type") == "s3")
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    line = plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert "data_source_type" in line, plan
    assert [r["id"] for r in q.collect()] == ["a"]


def test_store_versioning_and_vacuum(spark, store):
    store.init("t", _df(spark, [("a", 1, False)]))
    assert store.latest_version("t") == 1
    store.merge("t", _df(spark, [("b", 2, True)]), "id")
    assert store.latest_version("t") == 2
    assert store.read("t").count() == 2
    store.append("t", _df(spark, [("c", 3, True)]))
    assert store.read("t").count() == 3
    store.vacuum("t", keep=1)
    assert store.read("t").count() == 3  # latest survives


def test_store_merge_initializes_absent_table(spark, store):
    store.merge("fresh", _df(spark, [("a", 1, False)]), "id")
    assert store.read("fresh").count() == 1


def test_store_merge_idempotent_replay(spark, store):
    batch = _df(spark, [("a", 1, False)])
    store.merge("r", batch, "id")
    store.merge("r", batch, "id")
    store.merge("r", batch, "id")
    assert store.read("r").count() == 1


def _data_files(d):
    import os

    out = []
    for root, _dirs, files in os.walk(d):
        out += [
            os.path.join(root, f) for f in files if not f.startswith(("_", "."))
        ]
    return out


def test_append_is_o_batch_not_o_table(spark, store, tmp_path):
    """Append must not rewrite existing data: every data file of the previous
    version must reappear in the new version as a hard link (same inode),
    i.e. zero bytes of old data pass through Spark."""
    import os

    store.init("t", _df(spark, [("a", 1, False), ("b", 2, False)]))
    v1 = store._version_dir("t", 1)
    v1_inodes = {os.stat(p).st_ino for p in _data_files(v1)}
    assert v1_inodes

    store.append("t", _df(spark, [("c", 3, True)]))
    assert store.latest_version("t") == 2
    v2 = store._version_dir("t", 2)
    v2_files = _data_files(v2)
    v2_inodes = {os.stat(p).st_ino for p in v2_files}
    # all previous data files are present by hard link, not rewritten
    assert v1_inodes <= v2_inodes
    # and the batch contributed new files on top
    assert len(v2_inodes) > len(v1_inodes)
    out = {r["id"]: r["val"] for r in store.read("t").collect()}
    assert out == {"a": 1, "b": 2, "c": 3}


def test_append_schema_drift_falls_back_to_rewrite(spark, store):
    store.init("t", _df(spark, [("a", 1, False)]))
    wider = spark.createDataFrame([("b", 2, True, "x")], ["id", "val", "flag", "extra"])
    store.append("t", wider)
    got = store.read("t")
    assert set(got.columns) == {"id", "val", "flag", "extra"}
    assert got.count() == 2


def test_append_partitioned_keeps_layout_and_links(spark, store):
    import os

    rows = [("x", 1, False), ("y", 2, True)]
    df = spark.createDataFrame(rows, ["grp", "val", "flag"])
    store.init("p", df, partition_by="grp")
    v1_inodes = {os.stat(p).st_ino for p in _data_files(store._version_dir("p", 1))}
    batch = spark.createDataFrame([("y", 3, True)], ["grp", "val", "flag"])
    store.append("p", batch, partition_by="grp")
    v2_inodes = {os.stat(p).st_ino for p in _data_files(store._version_dir("p", 2))}
    assert v1_inodes <= v2_inodes
    got = store.read("p")
    assert got.filter(F.col("grp") == "y").count() == 2
    assert got.count() == 3


def test_vacuum_after_append_keeps_linked_data_alive(spark, store):
    store.init("v", _df(spark, [("a", 1, False)]))
    store.append("v", _df(spark, [("b", 2, False)]))
    store.append("v", _df(spark, [("c", 3, False)]))
    store.vacuum("v", keep=1)  # removes v1/v2 dirs; hard links keep inodes
    assert sorted(r["id"] for r in store.read("v").collect()) == ["a", "b", "c"]


def test_commit_cas_rejects_stale_writer(spark, store):
    """Optimistic concurrency: a writer whose snapshot moved loses with
    ConcurrentWriteError and its orphan version dir is discarded."""
    from automated_datastore_discovery_with_aws_glue_spark.state.store import ConcurrentWriteError

    import os

    store.init("t", _df(spark, [("a", 1, True)]))
    stale = store.latest_version("t")  # = 1
    # the stale writer fully materializes its staging dir first...
    loser_staging = store._staging_dir("t")
    _df(spark, [("stale", 9, False)]).write.parquet(loser_staging)
    # ...but a concurrent winner commits v2 before it can publish
    store.overwrite("t", _df(spark, [("b", 2, True)]))
    with pytest.raises(ConcurrentWriteError):
        store._commit_staged("t", loser_staging, expect=stale)
    # the winner's commit stands; the loser left nothing behind
    assert store.latest_version("t") == 2
    assert [r["id"] for r in store.read("t").collect()] == ["b"]
    assert not os.path.exists(os.path.join(store._table_dir("t"), "_COMMIT_LOCK"))
    assert not os.path.exists(loser_staging)


def test_commit_lock_is_released_after_success(spark, store):
    import os

    store.init("t", _df(spark, [("a", 1, True)]))
    store.append("t", _df(spark, [("b", 2, False)]))
    store.merge("t", _df(spark, [("c", 3, True)]), "id")
    assert store.latest_version("t") == 3
    assert not os.path.exists(os.path.join(store._table_dir("t"), "_COMMIT_LOCK"))


def test_time_travel_read_and_versions(spark, store):
    """Every retained version stays readable at its snapshot content;
    vacuumed versions error clearly."""
    store.init("tt", _df(spark, [("a", 1, False)]))
    store.append("tt", _df(spark, [("b", 2, True)]))
    store.append("tt", _df(spark, [("c", 3, True)]))
    assert store.versions("tt") == [1, 2, 3]
    assert {r["id"] for r in store.read("tt", version=1).collect()} == {"a"}
    assert {r["id"] for r in store.read("tt", version=2).collect()} == {"a", "b"}
    assert {r["id"] for r in store.read("tt").collect()} == {"a", "b", "c"}
    store.vacuum("tt", keep=1)
    assert store.versions("tt") == [3]
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        store.read("tt", version=1)
    with pytest.raises(FileNotFoundError):
        store.read("tt", version=9)


def test_failed_merge_leaves_no_staging_garbage(spark, store):
    """A mid-write failure (the lazy NULL-key guard firing executor-side)
    must clean up its staging directory, not accumulate partial data."""
    import os

    store.init("clean", _df(spark, [("a", 1, False)]))
    bad = spark.createDataFrame([(None, 9, True)], "id string, val long, flag boolean")
    with pytest.raises(Exception, match="NULL merge key"):
        store.merge("clean", bad, "id")
    leftovers = [n for n in os.listdir(f"{store.root}/clean") if n.startswith("._staging_")]
    assert leftovers == []
    assert store.read("clean").count() == 1  # table untouched


def _no_link(monkeypatch):
    import os

    def raiser(src, dst, **kw):
        raise OSError("hard links unsupported on this filesystem")

    monkeypatch.setattr(os, "link", raiser)


def test_linkless_append_is_metadata_only(spark, store, monkeypatch):
    """On a filesystem without hard links (os.link raises — the
    object-store posture) an append must stay O(batch): prior data files
    are inherited via the _INHERITED manifest, not copied. Asserted by
    basenames: a copy would materialize the old part files (their names
    are job-unique) inside the new version directory."""
    import os

    store.init("t", _df(spark, [("a", 1, False), ("b", 2, False)]))
    v1_names = {os.path.basename(p) for p in _data_files(store._version_dir("t", 1))}

    _no_link(monkeypatch)
    store.append("t", _df(spark, [("c", 3, True)]))
    v2 = store._version_dir("t", 2)
    v2_names = {os.path.basename(p) for p in _data_files(v2)}
    # no old data file was copied into v2 ...
    assert not (v1_names & v2_names)
    # ... they are inherited through the manifest instead
    manifest = store._read_manifest(v2)
    assert {os.path.basename(e["src"]) for e in manifest} == v1_names
    out = {r["id"]: r["val"] for r in store.read("t").collect()}
    assert out == {"a": 1, "b": 2, "c": 3}

    # second linkless append: manifests never chain — v3's manifest points
    # straight at each file's owning version
    store.append("t", _df(spark, [("d", 4, True)]))
    v3 = store._version_dir("t", 3)
    m3 = store._read_manifest(v3)
    assert {os.path.basename(e["src"]) for e in m3} >= v1_names
    for e in m3:
        assert os.path.isfile(e["src"])  # resolved, not a reference to a manifest
    assert sorted(r["id"] for r in store.read("t").collect()) == ["a", "b", "c", "d"]
    # time travel still works across manifest versions
    assert sorted(r["id"] for r in store.read("t", version=2).collect()) == ["a", "b", "c"]


def test_linkless_merge_prune_keeps_untouched_partitions(spark, store, monkeypatch):
    rows = [("s3", "a", 1), ("s3", "b", 2), ("rds", "c", 3)]
    df = spark.createDataFrame(rows, ["data_source_type", "id", "val"])
    store.init("p", df, partition_by="data_source_type")
    _no_link(monkeypatch)
    src = spark.createDataFrame([("s3", "a", 99)], ["data_source_type", "id", "val"])
    store.merge(
        "p", src, "id",
        set_on_match={"val": F.col("src.val")},
        insert_not_matched=False,
        partition_by="data_source_type",
        prune_partitions=True,
    )
    got = {r["id"]: r["val"] for r in store.read("p").collect()}
    assert got == {"a": 99, "b": 2, "c": 3}
    # the untouched rds partition is inherited by manifest, not copied
    import os
    v2 = store._version_dir("p", 2)
    assert not _data_files(os.path.join(v2, "data_source_type=rds"))
    m = store._read_manifest(v2)
    assert any(e["dst"].startswith("data_source_type=rds") for e in m)


def test_linkless_vacuum_keeps_referenced_files(spark, store, monkeypatch):
    """vacuum on a link-less store must not delete files a retained
    version's manifest still points at; the vacuumed version directory
    becomes a tombstoned file pool and leaves the readable history."""
    store.init("v", _df(spark, [("a", 1, False)]))
    _no_link(monkeypatch)
    store.append("v", _df(spark, [("b", 2, False)]))
    store.append("v", _df(spark, [("c", 3, False)]))
    store.vacuum("v", keep=1)
    # full data still readable through the retained version's manifest
    assert sorted(r["id"] for r in store.read("v").collect()) == ["a", "b", "c"]
    # vacuumed versions drop out of the readable history
    assert store.versions("v") == [3]
    with pytest.raises(FileNotFoundError):
        store.read("v", version=1)


def test_reserved_version_column_rejected(spark, store):
    df = spark.createDataFrame([(1, "x")], ["v", "val"])
    with pytest.raises(ValueError, match="reserve"):
        store.init("r", df)


def test_linkless_vacuum_keep_shrink_then_grow(spark, store, monkeypatch):
    """keep can vary call-to-call: an aggressively vacuumed (tombstoned)
    version stays dead when a later vacuum retains more history, and
    files its pool still serves to newer manifests keep surviving."""
    store.init("v", _df(spark, [("a", 1, False)]))
    _no_link(monkeypatch)
    store.append("v", _df(spark, [("b", 2, False)]))
    store.append("v", _df(spark, [("c", 3, False)]))
    store.append("v", _df(spark, [("d", 4, False)]))
    store.vacuum("v", keep=1)
    assert store.versions("v") == [4]
    store.vacuum("v", keep=3)  # growing keep must not resurrect the dead
    assert store.versions("v") == [4]
    assert sorted(r["id"] for r in store.read("v").collect()) == ["a", "b", "c", "d"]
    with pytest.raises(FileNotFoundError):
        store.read("v", version=2)


def test_linkless_append_empty_batch(spark, store, monkeypatch):
    """An empty batch on a manifest store still produces a readable new
    version whose data is entirely inherited."""
    store.init("t", _df(spark, [("a", 1, False)]))
    _no_link(monkeypatch)
    empty = spark.createDataFrame([], _df(spark, [("a", 1, False)]).schema)
    store.append("t", empty)
    assert store.latest_version("t") == 2
    assert sorted(r["id"] for r in store.read("t").collect()) == ["a"]


def test_linkless_vacuum_survives_root_respell(spark, store, monkeypatch, tmp_path_factory):
    """Manifest srcs are stored TABLE-ROOT-RELATIVE and vacuum compares
    realpaths: a store re-opened through a different spelling of the same
    directory (here: a symlink) must still recognize manifest-referenced
    files as live — absolute-path manifests used to make vacuum rmtree
    pools that retained versions still read."""
    import os

    store.init("v", _df(spark, [("a", 1, False)]))
    _no_link(monkeypatch)
    store.append("v", _df(spark, [("b", 2, False)]))
    store.append("v", _df(spark, [("c", 3, False)]))
    link_root = str(tmp_path_factory.mktemp("respell")) + "/alias"
    os.symlink(store.root, link_root)
    alias = ParquetStateStore(spark, link_root)
    alias.vacuum("v", keep=1)
    # the retained version's manifest-referenced files survived
    assert sorted(r["id"] for r in alias.read("v").collect()) == ["a", "b", "c"]
    assert sorted(r["id"] for r in store.read("v").collect()) == ["a", "b", "c"]


def test_commit_lock_held_raises_concurrent_write(spark, store):
    """Simulated non-atomic-rename environment / crashed mid-commit
    writer: while the O_EXCL commit lock exists, any writer fails with
    ConcurrentWriteError (never corrupts the pointer) and discards its
    staging; vacuum cleans crashed writers' leftovers."""
    import os

    from automated_datastore_discovery_with_aws_glue_spark.state.store import ConcurrentWriteError

    store.init("t", _df(spark, [("a", 1, True)]))
    lock = os.path.join(store._table_dir("t"), "_COMMIT_LOCK")
    with open(lock, "w"):
        pass
    with pytest.raises(ConcurrentWriteError, match="lock"):
        store.append("t", _df(spark, [("b", 2, False)]))
    # loser's staging is gone; the table is untouched
    leftovers = [n for n in os.listdir(store._table_dir("t")) if n.startswith("._staging_")]
    assert leftovers == []
    assert store.latest_version("t") == 1
    os.remove(lock)  # operator intervention for a crashed holder
    store.append("t", _df(spark, [("b", 2, False)]))
    assert store.latest_version("t") == 2
    # vacuum sweeps staging dirs a crashed writer left behind — but only
    # past the idle grace period: an ACTIVE writer's staging (written
    # before it takes the commit lock) must never be swept mid-flight
    orphan = store._staging_dir("t")
    os.makedirs(orphan)
    store.vacuum("t", keep=5)
    assert os.path.exists(orphan), "fresh staging must survive vacuum"
    old = os.path.getmtime(orphan) - 7200
    os.utime(orphan, (old, old))
    store.vacuum("t", keep=5)
    assert not os.path.exists(orphan)


def test_orphan_version_dir_does_not_wedge_commits(spark, store):
    """A crash between the version-dir rename and the pointer flip leaves
    an orphan v=N+1 the pointer never references; the next commit (under
    the lock) must clear and replace it instead of failing ENOTEMPTY
    forever."""
    import os

    store.init("t", _df(spark, [("a", 1, True)]))
    # simulate the crashed commit: v=2 exists with data, pointer still 1
    orphan = store._version_dir("t", 2)
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-dead.parquet"), "w") as fh:
        fh.write("garbage")
    assert store.latest_version("t") == 1
    store.append("t", _df(spark, [("b", 2, False)]))
    assert store.latest_version("t") == 2
    assert sorted(r["id"] for r in store.read("t").collect()) == ["a", "b"]


def test_append_drift_path_loses_cas_to_concurrent_commit(spark, store):
    """The schema-drift union-rewrite pins the snapshot it read: a commit
    landing mid-rewrite must make the drift append LOSE with
    ConcurrentWriteError, never silently overwrite the winner."""
    from automated_datastore_discovery_with_aws_glue_spark.state.store import ConcurrentWriteError

    store.init("t", _df(spark, [("a", 1, True)]))
    drifted = spark.createDataFrame([("x", 9)], ["id", "val"])  # column set differs

    orig = store._stage_version

    def racing(table, df, **kw):
        # winner commits between the drift path's snapshot read and its write
        if kw.get("expect") == 1:
            store._write_version(table, _df(spark, [("winner", 7, True)]), partition_by=None)
        return orig(table, df, **kw)

    store._stage_version = racing
    try:
        with pytest.raises(ConcurrentWriteError):
            store.append("t", drifted)
    finally:
        store._stage_version = orig
    # the winner's commit stands untouched (its version wrote exactly
    # its own full-version content); the drift append lost cleanly
    assert store.latest_version("t") == 2
    assert {r["id"] for r in store.read("t").collect()} == {"winner"}


def test_append_partition_column_change_falls_back_to_rewrite(spark, store):
    """Same column set but a DIFFERENT partition column is layout drift:
    the fast link path would mix region=*/ dirs with linked
    data_source_type=*/ dirs; the append must take the union-rewrite."""
    rows = [("s3", "a", 1), ("rds", "b", 2)]
    df = spark.createDataFrame(rows, ["data_source_type", "id", "val"])
    store.init("p", df, partition_by="data_source_type")
    more = spark.createDataFrame([("s3", "c", 3)], ["data_source_type", "id", "val"])
    store.append("p", more, partition_by="id")  # different partition col
    got = {r["id"]: r["val"] for r in store.read("p").collect()}
    assert got == {"a": 1, "b": 2, "c": 3}
    import os

    v2 = store._version_dir("p", 2)
    subdirs = {n.split("=")[0] for n in os.listdir(v2) if "=" in n}
    assert subdirs == {"id"}  # clean rewrite, no mixed layouts


def test_merge_collapses_exact_replays_and_rejects_dup_keys(spark):
    """Full-row duplicate source rows (queue redelivery in one batch)
    collapse; DISTINCT rows sharing a merge key are rejected loudly — a
    set-based MERGE has no arrival order to pick a winner, and letting
    them through would multiply matched rows / insert duplicate keys."""
    t = _df(spark, [("a", 1, False)])
    replay = _df(spark, [("b", 2, True), ("b", 2, True)])
    out = {r["id"] for r in merge_frames(t, replay, "id").collect()}
    assert out == {"a", "b"}
    conflict = _df(spark, [("b", 2, True), ("b", 3, True)])
    with pytest.raises(Exception, match="DISTINCT source rows"):
        merge_frames(t, conflict, "id").collect()


def test_replace_partitions_overwrite_link_and_empty(spark, store):
    """INSERT OVERWRITE PARTITION semantics: listed values are replaced
    wholesale (including replacement-by-nothing — a delete merge can't
    express), untouched partitions hard-link, stray values are rejected."""
    import pytest as _pytest

    t = spark.createDataFrame(
        [("s1", "f1", 10), ("s1", "f2", 20), ("s2", "f1", 30)],
        ["source_id", "file", "n"],
    )
    store.init("stats", t, partition_by="source_id")

    # replace s1 with a different row set (f2 dropped, f3 added)
    repl = spark.createDataFrame([("s1", "f1", 11), ("s1", "f3", 12)], ["source_id", "file", "n"])
    store.replace_partitions("stats", repl, partition_by="source_id", values=["s1"])
    out = {(r["source_id"], r["file"]): r["n"] for r in store.read("stats").collect()}
    assert out == {("s1", "f1"): 11, ("s1", "f3"): 12, ("s2", "f1"): 30}
    # untouched s2: identical hard-linked files
    assert _partition_inodes(store, "stats", 2, "source_id=s2") == _partition_inodes(
        store, "stats", 1, "source_id=s2"
    )

    # replacement-by-nothing empties the partition
    empty = spark.createDataFrame([], "source_id string, file string, n int")
    store.replace_partitions("stats", empty, partition_by="source_id", values=["s1"])
    out = {(r["source_id"], r["file"]): r["n"] for r in store.read("stats").collect()}
    assert out == {("s2", "f1"): 30}

    # a frame carrying values outside the declared set is rejected
    stray = spark.createDataFrame([("s9", "f1", 1)], ["source_id", "file", "n"])
    with _pytest.raises(ValueError, match="outside the declared"):
        store.replace_partitions("stats", stray, partition_by="source_id", values=["s1"])


def test_replace_partitions_unpartitioned_fallback(spark, store):
    """A current version not laid out by the partition column takes the
    logical full-rewrite path — other sources' rows survive."""
    t = spark.createDataFrame([("s1", 1), ("s2", 2)], ["source_id", "n"])
    store.init("flat", t)  # unpartitioned v1
    repl = spark.createDataFrame([("s1", 99)], ["source_id", "n"])
    store.replace_partitions("flat", repl, partition_by="source_id", values=["s1"])
    out = {r["source_id"]: r["n"] for r in store.read("flat").collect()}
    assert out == {"s1": 99, "s2": 2}
    # and the new version IS partitioned, so the next replace prunes
    repl2 = spark.createDataFrame([("s2", 88)], ["source_id", "n"])
    store.replace_partitions("flat", repl2, partition_by="source_id", values=["s2"])
    assert _partition_inodes(store, "flat", 3, "source_id=s1") == _partition_inodes(
        store, "flat", 2, "source_id=s1"
    )


# ---------------------------------------------------------------------------
# ConditionalPutCommitBackend — the rename-less object-store commit
# ---------------------------------------------------------------------------


@pytest.fixture()
def cond_store(spark, tmp_path):
    from automated_datastore_discovery_with_aws_glue_spark.state.commit import ConditionalPutCommitBackend

    return ParquetStateStore(
        spark, str(tmp_path), commit_backend=ConditionalPutCommitBackend()
    )


def test_conditional_backend_full_store_surface(spark, cond_store):
    """init/append/merge/prune/read/time-travel/vacuum all work through
    the conditional-PUT commit path (no lock file, no renames)."""
    import os

    t = spark.createDataFrame(
        [("a", 1, "s3"), ("b", 2, "rds")], ["id", "val", "data_source_type"]
    )
    cond_store.init("trk", t, partition_by="data_source_type")
    cond_store.append(
        "trk",
        spark.createDataFrame([("c", 3, "s3")], ["id", "val", "data_source_type"]),
        partition_by="data_source_type",
    )
    cond_store.merge(
        "trk",
        spark.createDataFrame([("a", 99, "s3")], ["id", "val", "data_source_type"]),
        "id",
        set_on_match={"val": F.col("src.val")},
        partition_by="data_source_type",
        prune_partitions=True,
    )
    out = {r["id"]: r["val"] for r in cond_store.read("trk").collect()}
    assert out == {"a": 99, "b": 2, "c": 3}
    assert cond_store.versions("trk") == [1, 2, 3]
    assert {r["id"] for r in cond_store.read("trk", version=1).collect()} == {"a", "b"}
    cond_store.vacuum("trk", keep=1)
    # no POSIX commit-lock artifacts anywhere
    assert not os.path.exists(os.path.join(cond_store._table_dir("trk"), "_COMMIT_LOCK"))
    # committed versions carry no claim markers
    from automated_datastore_discovery_with_aws_glue_spark.state.commit import CLAIM_MARKER

    for v in cond_store.versions("trk"):
        assert not os.path.exists(
            os.path.join(cond_store._version_dir("trk", v), CLAIM_MARKER)
        )


def test_conditional_backend_cas_rejects_stale_writer(spark, cond_store):
    """Same optimistic-concurrency contract as the POSIX backend: the
    stale writer loses with ConcurrentWriteError, cleans its staging,
    and the winner's commit stands."""
    import os

    from automated_datastore_discovery_with_aws_glue_spark.state.store import ConcurrentWriteError

    cond_store.init("t", _df(spark, [("a", 1, True)]))
    stale = cond_store.latest_version("t")
    loser_staging = cond_store._staging_dir("t")
    _df(spark, [("stale", 9, False)]).write.parquet(loser_staging)
    cond_store.overwrite("t", _df(spark, [("b", 2, True)]))
    with pytest.raises(ConcurrentWriteError):
        cond_store._commit_staged("t", loser_staging, expect=stale)
    assert cond_store.latest_version("t") == 2
    assert [r["id"] for r in cond_store.read("t").collect()] == ["b"]
    assert not os.path.exists(loser_staging)


def test_conditional_backend_pointer_cas_never_tears(spark, cond_store):
    """The pointer flip is a single If-Match CAS: when the pointer moves
    AFTER the loser's claim-slot check but BEFORE its flip, the loser
    retracts its half-published slot and raises — the pointer always
    names exactly one fully-published version."""
    from automated_datastore_discovery_with_aws_glue_spark.state.commit import ConditionalPutCommitBackend
    from automated_datastore_discovery_with_aws_glue_spark.state.store import ConcurrentWriteError

    cond_store.init("t", _df(spark, [("a", 1, True)]))
    # loser stages v2 content...
    loser_staging = cond_store._staging_dir("t")
    _df(spark, [("loser", 9, False)]).write.parquet(loser_staging)

    # ...but a winner commits v2 through a SIDE pointer bump between the
    # loser's early pointer check and its CAS: simulate by letting the
    # loser pass the early check, then bumping the pointer mid-publish
    backend = cond_store._backend
    real_copy = ConditionalPutCommitBackend._copy_tree
    winner_dir = cond_store._version_dir("t", 2)

    def hijack(src, dst, __real=real_copy):
        __real(src, dst)
        # winner lands while the loser is copying: pointer moves to 2 —
        # but the loser claimed the v2 slot first, so the winner writes
        # v3... to keep the simulation honest, just bump the pointer as
        # an external commit would
        with open(cond_store._pointer("t"), "w") as fh:
            fh.write("7")

    backend._copy_tree = hijack
    try:
        with pytest.raises(ConcurrentWriteError, match="pointer moved"):
            cond_store._commit_staged("t", loser_staging, expect=1)
    finally:
        backend._copy_tree = real_copy
    import os

    # the loser retracted its claim slot entirely; pointer is the
    # external writer's value, untorn
    assert not os.path.exists(winner_dir)
    assert cond_store.latest_version("t") == 7


def test_conditional_backend_crash_mid_publish_is_invisible_then_fail_stop(
    spark, cond_store
):
    """A writer dying during the non-atomic multi-file publish leaves an
    unreferenced claimed slot: readers still see the old snapshot, and a
    later commit of the same version FAIL-STOPS (never overwrites a slot
    whose claimant might be alive) until the stale claim is removed —
    the documented operator intervention."""
    import os
    import shutil

    from automated_datastore_discovery_with_aws_glue_spark.state.commit import ConditionalPutCommitBackend
    from automated_datastore_discovery_with_aws_glue_spark.state.store import ConcurrentWriteError

    cond_store.init("t", _df(spark, [("a", 1, True)]))

    backend = cond_store._backend

    def crash(src, dst):
        # one file lands, then the process "dies"
        files = []
        for root, _d, names in os.walk(src):
            files += [os.path.join(root, n) for n in names]
        shutil.copy2(files[0], os.path.join(dst, os.path.basename(files[0])))
        raise OSError("simulated crash mid-publish")

    backend._copy_tree = crash
    try:
        with pytest.raises(OSError, match="simulated crash"):
            cond_store.append("t", _df(spark, [("b", 2, False)]))
    finally:
        backend._copy_tree = ConditionalPutCommitBackend._copy_tree

    # invisible: pointer and reads unchanged
    assert cond_store.latest_version("t") == 1
    assert [r["id"] for r in cond_store.read("t").collect()] == ["a"]

    # fail-stop: the claimed slot blocks the next commit of v2
    with pytest.raises(ConcurrentWriteError, match="claimed"):
        cond_store.append("t", _df(spark, [("b", 2, False)]))

    # operator removes the stale claim dir -> commits flow again
    shutil.rmtree(cond_store._version_dir("t", 2))
    cond_store.append("t", _df(spark, [("b", 2, False)]))
    assert sorted(r["id"] for r in cond_store.read("t").collect()) == ["a", "b"]


def test_conditional_backend_threaded_race_single_winner(spark, cond_store):
    """Two writers racing the same expected version: exactly one commits,
    the other raises ConcurrentWriteError; the final state is one of the
    two complete snapshots, never a mix."""
    import threading

    from automated_datastore_discovery_with_aws_glue_spark.state.store import ConcurrentWriteError

    cond_store.init("t", _df(spark, [("a", 1, True)]))
    stagings = []
    for tag in ("x", "y"):
        s = cond_store._staging_dir("t")
        _df(spark, [(tag, 2, False)]).write.parquet(s)
        stagings.append(s)

    barrier = threading.Barrier(2)
    outcomes = {}

    def run(idx):
        barrier.wait()
        try:
            cond_store._commit_staged("t", stagings[idx], expect=1)
            outcomes[idx] = "ok"
        except ConcurrentWriteError:
            outcomes[idx] = "lost"

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(outcomes.values()) == ["lost", "ok"]
    assert cond_store.latest_version("t") == 2
    ids = [r["id"] for r in cond_store.read("t").collect()]
    assert ids in (["x"], ["y"])


def test_overwrite_expect_pins_snapshot(spark, tmp_path):
    """overwrite(expect=v) is the read-modify-overwrite CAS: committing
    against a snapshot another writer has already superseded raises
    ConcurrentWriteError instead of silently dropping the newer version."""
    from automated_datastore_discovery_with_aws_glue_spark.state.store import (
        ConcurrentWriteError,
        ParquetStateStore,
    )

    store = ParquetStateStore(spark, str(tmp_path / "st"))
    df = spark.createDataFrame([(1,)], "a long")
    store.init("t", df)
    base = store.latest_version("t")
    store.append("t", spark.createDataFrame([(2,)], "a long"))
    with pytest.raises(ConcurrentWriteError):
        store.overwrite("t", df, expect=base)
    # the racing append's row survived untouched
    assert sorted(r["a"] for r in store.read("t").collect()) == [1, 2]
    # and a correctly-pinned overwrite still commits
    store.overwrite(
        "t", spark.createDataFrame([(9,)], "a long"), expect=store.latest_version("t")
    )
    assert [r["a"] for r in store.read("t").collect()] == [9]


def test_append_expect_and_atomic_table_meta(spark, tmp_path):
    """r10: append(expect=) is the read-derive-append CAS, and meta=
    commits atomically with the version (table_meta is per-version,
    absent versions return {})."""
    from automated_datastore_discovery_with_aws_glue_spark.state.store import (
        ConcurrentWriteError,
        ParquetStateStore,
    )

    store = ParquetStateStore(spark, str(tmp_path / "st"))
    store.init("t", spark.createDataFrame([(1,)], "a long"))
    v1 = store.latest_version("t")
    assert store.table_meta("t") == {}

    store.append(
        "t", spark.createDataFrame([(2,)], "a long"), expect=v1, meta={"w": [0, 1]}
    )
    assert store.table_meta("t") == {"w": [0, 1]}
    assert store.table_meta("t", version=v1) == {}

    # a stale expect loses the CAS and changes nothing
    with pytest.raises(ConcurrentWriteError):
        store.append("t", spark.createDataFrame([(3,)], "a long"), expect=v1)
    assert sorted(r["a"] for r in store.read("t").collect()) == [1, 2]
    assert store.table_meta("t") == {"w": [0, 1]}

    # meta also rides the schema-drift rewrite path
    store.append(
        "t",
        spark.createDataFrame([(4, "x")], "a long, b string"),
        expect=store.latest_version("t"),
        meta={"w": [0, 1, 2]},
    )
    assert store.table_meta("t") == {"w": [0, 1, 2]}


def test_append_many_stages_concurrently_commits_in_order(spark, store):
    """append_many: both tables land as one ingest — results identical
    to sequential appends, links preserved (O(batch)), meta and expect
    honored — and the pointer flips happen in LIST order."""
    import os

    store.init("a", _df(spark, [("a", 1, False)]))
    store.init("b", _df(spark, [("x", 9, True)]))
    v_a = store.latest_version("a")
    store.append_many(
        [
            {
                "table": "a",
                "df": _df(spark, [("b", 2, True)]),
                "expect": v_a,
                "meta": {"watermark": 7},
            },
            {"table": "b", "df": _df(spark, [("y", 8, False)])},
        ]
    )
    assert store.latest_version("a") == 2
    assert store.latest_version("b") == 2
    assert store.table_meta("a") == {"watermark": 7}
    got_a = {r["id"]: r["val"] for r in store.read("a").collect()}
    got_b = {r["id"]: r["val"] for r in store.read("b").collect()}
    assert got_a == {"a": 1, "b": 2}
    assert got_b == {"x": 9, "y": 8}
    # O(batch) contract intact: v1 files reappear as hard links in v2
    v1_inodes = {os.stat(p).st_ino for p in _data_files(store._version_dir("a", 1))}
    v2_inodes = {os.stat(p).st_ino for p in _data_files(store._version_dir("a", 2))}
    assert v1_inodes <= v2_inodes
    # no staging leftovers
    for t in ("a", "b"):
        assert not [
            n for n in os.listdir(store._table_dir(t)) if n.startswith("._staging_")
        ]


def test_append_many_lost_cas_commits_nothing_later(spark, store):
    """A lost CAS on the FIRST table must leave the SECOND table
    untouched (commit order is the cross-table invariant) and sweep its
    staging."""
    import os

    from automated_datastore_discovery_with_aws_glue_spark.state.store import (
        ConcurrentWriteError,
    )

    store.init("a", _df(spark, [("a", 1, False)]))
    store.init("b", _df(spark, [("x", 9, True)]))
    stale = store.latest_version("a")  # snapshot BEFORE the concurrent commit
    store.append("a", _df(spark, [("z", 5, False)]))  # the concurrent winner
    with pytest.raises(ConcurrentWriteError):
        store.append_many(
            [
                {
                    "table": "a",
                    "df": _df(spark, [("b", 2, True)]),
                    "expect": stale,
                },
                {"table": "b", "df": _df(spark, [("y", 8, False)])},
            ]
        )
    assert store.latest_version("a") == 2
    assert store.latest_version("b") == 1
    assert not [
        n for n in os.listdir(store._table_dir("b")) if n.startswith("._staging_")
    ]


def test_append_many_rejects_duplicate_tables(spark, store):
    store.init("a", _df(spark, [("a", 1, False)]))
    with pytest.raises(ValueError, match="distinct"):
        store.append_many(
            [
                {"table": "a", "df": _df(spark, [("b", 2, True)])},
                {"table": "a", "df": _df(spark, [("c", 3, True)])},
            ]
        )
