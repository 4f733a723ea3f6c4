"""Pointer-store sub-seam (VERDICT r05 #5): the `_CURRENT` decision is
injectable.  The default rename store is atomic only where rename is;
`CommitLogPointer` must give (a) no missing-pointer window on a
copy+delete-rename filesystem and (b) a true CAS on the publish itself.
"""

from __future__ import annotations

import os

import pytest

from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
    _COMMITS,
    _POINTER,
    CommitLogPointer,
    LocalFilesystem,
    SnapshotConflictError,
    snapshot_commit,
    snapshot_commit_partitioned,
    snapshot_read,
    snapshot_versions,
)


class _Interrupted(RuntimeError):
    pass


class _CopyDeleteFS(LocalFilesystem):
    """Filesystem whose rename is NON-ATOMIC copy+delete (the S3A
    shape): dst is deleted, then — across a crashable window — src is
    copied in and removed.  `crash_in_window=True` aborts between the
    delete and the copy, leaving NEITHER file: the failure mode an
    object store exposes to a pointer swap."""

    def __init__(self):
        self.crash_in_window = False
        self.renames: list[tuple[str, str]] = []

    def rename(self, src: str, dst: str) -> None:
        self.renames.append((src, dst))
        text = self.read_text(src)
        self.rmtree(dst)
        if self.crash_in_window:
            raise _Interrupted(f"rename died after deleting {dst}")
        self.write_text(dst, text)
        self.rmtree(src)


def test_rename_pointer_has_missing_pointer_window_on_copy_delete(
    spark, tmp_path
):
    """The documented S3A race is REAL on a copy+delete rename: a crash
    mid-swap loses the pointer entirely (this is the negative the
    commit-log store exists to close — if this ever stops failing the
    fake is wrong, not the protocol)."""
    fs = _CopyDeleteFS()
    root = str(tmp_path / "snap")
    snapshot_commit(spark.range(5), root, fs=fs)
    assert snapshot_read(spark, root, fs=fs).count() == 5

    fs.crash_in_window = True
    with pytest.raises(_Interrupted):
        snapshot_commit(spark.range(7), root, fs=fs)
    # the old pointer is GONE — readers now see an empty root
    assert snapshot_versions(root, fs=fs) == []


def test_commit_log_pointer_survives_copy_delete_rename(spark, tmp_path):
    """Same crash-happy filesystem, commit-log store: the pointer is
    never renamed at all, so the missing-pointer window cannot exist —
    every reader sees entirely-old or entirely-new, even if data-dir
    writes crash mid-commit."""
    inner = _CopyDeleteFS()
    inner.crash_in_window = True  # ANY rename would die mid-window
    fs = CommitLogPointer(inner)
    root = str(tmp_path / "snap")

    v1 = snapshot_commit(spark.range(5), root, fs=fs)
    assert v1 == "v-00001"
    assert snapshot_read(spark, root, fs=fs).count() == 5
    v2 = snapshot_commit(spark.range(7), root, fs=fs)
    assert snapshot_read(spark, root, fs=fs).count() == 7
    assert snapshot_versions(root, fs=fs) == [v1, v2]
    # no _CURRENT key exists, and no pointer rename ever ran
    assert not os.path.exists(os.path.join(root, _POINTER))
    assert all(_POINTER not in dst for _, dst in inner.renames)
    # manifestless root: the log IS the pointer
    assert sorted(os.listdir(os.path.join(root, _COMMITS))) == [v1, v2]


def test_commit_log_publish_is_cas(tmp_path):
    """Two writers racing the SAME next version: exactly one
    create_exclusive wins; the loser gets SnapshotConflictError even
    though both passed every optimistic pre-check (the residual
    check-to-swap window of the rename store)."""
    fs = CommitLogPointer(LocalFilesystem())
    root = str(tmp_path / "snap")
    os.makedirs(root)
    fs.pointer_publish(root, "v-00001")
    with pytest.raises(SnapshotConflictError, match="commit-log CAS"):
        fs.pointer_publish(root, "v-00001")
    assert fs.pointer_read(root) == "v-00001"


def test_gc_forgets_log_entries_with_dropped_dirs(spark, tmp_path):
    """Unpartitioned commits (no carry-forward references): keep=2
    drops v-00001's dir at the third commit, and the commit log must
    forget its entry too — otherwise the log grows with commit count
    instead of retained versions."""
    fs = CommitLogPointer(LocalFilesystem())
    root = str(tmp_path / "snap")
    for n in (3, 4, 5):
        snapshot_commit(spark.range(n), root, fs=fs, keep=2)
    assert sorted(os.listdir(os.path.join(root, _COMMITS))) == [
        "v-00002", "v-00003",
    ]
    assert snapshot_read(spark, root, fs=fs).count() == 5


def test_stream_cdc_merge_through_commit_log_store(spark, tmp_path):
    """The streaming CDC MERGE loop composes with the commit-log store
    end-to-end: change batches publish log entries instead of pointer
    renames, a checkpoint replay applies nothing twice, and a new file
    after the restart lands as the next log entry — the full S3-safe
    deployment shape (foreachBatch + CommitLogPointer)."""
    import json as _json

    from pyspark.sql import types as T

    from etl_pulumi_aws_snowflake_spark.streaming.cdc import stream_cdc_merge

    fs = CommitLogPointer(LocalFilesystem())
    snap = str(tmp_path / "snapshot")
    changes = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(changes)
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, name string, bal double",
    ).write.parquet(snap)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("bal", T.DoubleType()),
            T.StructField("is_delete", T.BooleanType()),
        ]
    )
    with open(f"{changes}/c1.json", "w") as f:
        f.write(_json.dumps(
            {"k": 2, "name": "b2", "bal": 99.0, "is_delete": False}
        ) + "\n")

    def run():
        stream_cdc_merge(
            spark, changes, schema, snap, ["k"], ckpt,
            delete_col="is_delete", fs=fs,
        )

    run()
    want = {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0)}
    got = {
        r["k"]: (r["name"], r["bal"])
        for r in snapshot_read(spark, snap, fs=fs).collect()
    }
    assert got == want
    assert fs.pointer_read(snap) == "v-00001"

    run()  # replay: processed files skipped, no spurious log entry
    assert fs.pointer_read(snap) == "v-00001"

    with open(f"{changes}/c2.json", "w") as f:
        f.write(_json.dumps(
            {"k": 3, "name": "c", "bal": 0.0, "is_delete": True}
        ) + "\n")
    run()
    want = {1: ("a", 10.0), 2: ("b2", 99.0)}
    got = {
        r["k"]: (r["name"], r["bal"])
        for r in snapshot_read(spark, snap, fs=fs).collect()
    }
    assert got == want
    assert fs.pointer_read(snap) == "v-00002"
    assert not os.path.exists(os.path.join(snap, _POINTER))


def test_commit_log_full_partitioned_cycle_and_gc_bounds_log(spark, tmp_path):
    """Partitioned commits + pruned carry-forward + time travel + GC
    through the commit-log store behave exactly as on the default
    store, and GC forgets log entries with the dirs it drops — log
    size tracks retained versions, not commit count."""
    fs = CommitLogPointer(LocalFilesystem())
    root = str(tmp_path / "snap")
    df = spark.createDataFrame(
        [(i, i % 3, i * 10.0) for i in range(30)], "id long, g int, v double"
    )
    v1 = snapshot_commit_partitioned(df, root, "g", fs=fs, keep=2)
    changed = df.filter("g = 1").withColumn("v", df.v + 1)
    v2 = snapshot_commit_partitioned(
        changed, root, "g", changed_values=[1], fs=fs, keep=2
    )
    # carried partitions resolve into v1; time travel to v1 exact
    live = snapshot_read(spark, root, fs=fs)
    assert live.filter("g = 1").agg({"v": "sum"}).first()[0] == sum(
        i * 10.0 + 1 for i in range(30) if i % 3 == 1
    )
    old = snapshot_read(spark, root, fs=fs, version=v1)
    assert old.agg({"v": "sum"}).first()[0] == sum(i * 10.0 for i in range(30))

    # two more commits rotate v1 out (keep=2) — but v1 stays while v2's
    # manifest references it; the LOG mirrors the retained dirs
    v3 = snapshot_commit_partitioned(
        df.filter("g = 2"), root, "g", changed_values=[2], fs=fs, keep=2
    )
    v4 = snapshot_commit_partitioned(
        df.filter("g = 0"), root, "g", changed_values=[0], fs=fs, keep=2
    )
    on_disk = {d for d in os.listdir(root) if d.startswith("v-")}
    log = set(os.listdir(os.path.join(root, _COMMITS)))
    assert log == on_disk, (log, on_disk)
    assert {v3, v4} <= log
    assert snapshot_read(spark, root, fs=fs).count() == 30
