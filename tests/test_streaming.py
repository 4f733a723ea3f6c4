"""Structured Streaming tests (SURVEY.md §2.9): the streaming window
builders must agree with the oracle-checked batch queries, and dedup
must be exactly-once per key across arriving files."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark import schemas
from etl_pulumi_aws_snowflake_spark.sources import load_table
from etl_pulumi_aws_snowflake_spark.streaming.windows import (
    dedup_stream,
    session_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    """Events re-materialized as normal-µs-timestamp parquet (the
    testdata's raw nanos int64 needs the batch-side conversion first;
    a stream source sees the already-normalized layout)."""
    out = str(tmp_path / "events_stream")
    load_table(spark, SF, "events").write.parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _run_to_memory(spark, stream_df, name, mode):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_tumbling_matches_batch(spark, events_stream_dir):
    stream = spark.readStream.schema(schemas.EVENTS).parquet(events_stream_dir)
    result = _run_to_memory(
        spark, tumbling_counts(stream), "tumbling_out", "complete"
    ).collect()

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start"), "event_type", "n_events")
        .collect()
    )
    stream_counts = {(r.window_start, r.event_type): r.n_events for r in result}
    batch_counts = {(r.start, r.event_type): r.n_events for r in batch}
    assert stream_counts == batch_counts
    assert len(stream_counts) > 100


def test_stream_session_matches_batch(spark, events_stream_dir):
    stream = spark.readStream.schema(schemas.EVENTS).parquet(events_stream_dir)
    result = _run_to_memory(
        spark, session_counts(stream), "session_out", "complete"
    ).collect()

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("session_window.start").alias("s"), "user_id", "n_events")
        .collect()
    )
    assert {(r.user_id, r.session_start, r.n_events) for r in result} == {
        (r.user_id, r.s, r.n_events) for r in batch
    }


def test_stream_dedup_exactly_once(spark, tmp_path):
    """The same events file arriving twice (two microbatches) must load
    each event_id once."""
    events = load_table(spark, SF, "events").limit(200)
    indir = str(tmp_path / "arrivals")
    events.write.parquet(indir)

    stream = spark.readStream.schema(schemas.EVENTS).parquet(indir)
    deduped = dedup_stream(stream, ["event_id"])

    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def sink(batch_df, _epoch):
        batch_df.write.mode("append").parquet(outdir)

    for _ in range(2):
        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # second iteration: same rows land again under a new file name
        events.write.mode("append").parquet(indir)

    loaded = spark.read.parquet(outdir)
    assert loaded.count() == loaded.select("event_id").distinct().count() == 200


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState keeps per-user totals across microbatches:
    after two file arrivals the final emitted row per user equals the
    batch group-by over everything that arrived."""
    from etl_pulumi_aws_snowflake_spark.streaming.stateful import running_user_totals

    events = load_table(spark, SF, "events").limit(400)
    first, second = events.filter("event_id % 2 = 0"), events.filter("event_id % 2 = 1")
    indir, outdir, ckpt = (str(tmp_path / d) for d in ("arrivals", "out", "ckpt"))
    first.coalesce(1).write.parquet(indir)

    stream = spark.readStream.schema(schemas.EVENTS).parquet(indir)
    totals = running_user_totals(stream)

    def sink(batch_df, epoch):
        batch_df.withColumn("epoch", F.lit(epoch)).write.mode("append").parquet(outdir)

    for arrival in (second, None):
        q = (
            totals.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if arrival is not None:
            arrival.coalesce(1).write.mode("append").parquet(indir)

    out = spark.read.parquet(outdir)
    # last emission per user = cumulative totals over both arrivals
    latest = (
        out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("user_id").orderBy(
                    F.desc("epoch")
                )
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    expected = {
        r.user_id: (r.n, r.total)
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert len(latest) == len(expected)
    for r in latest:
        n, total = expected[r.user_id]
        assert r.n_events == n
        assert abs(r.total_value - total) < 1e-6


def test_stream_sliding_matches_batch(spark, events_stream_dir):
    from etl_pulumi_aws_snowflake_spark.streaming.windows import sliding_counts

    stream = spark.readStream.schema(schemas.EVENTS).parquet(events_stream_dir)
    result = _run_to_memory(
        spark, sliding_counts(stream), "sliding_out", "complete"
    ).collect()

    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("s"), "event_type", "n_events")
        .collect()
    )
    assert {(r.window_start, r.event_type, r.n_events) for r in result} == {
        (r.s, r.event_type, r.n_events) for r in batch
    }


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join (signup -> purchase within 30 min,
    same user) must agree with the identical batch join."""
    from etl_pulumi_aws_snowflake_spark.streaming.joins import interval_join

    events = load_table(spark, SF, "events")
    signups = events.filter(F.col("event_type") == "signup")
    purchases = events.filter(F.col("event_type") == "purchase")
    sdir, pdir = str(tmp_path / "s"), str(tmp_path / "p")
    signups.write.parquet(sdir)
    purchases.write.parquet(pdir)

    ls = spark.readStream.schema(schemas.EVENTS).parquet(sdir)
    rs = spark.readStream.schema(schemas.EVENTS).parquet(pdir)
    result = _run_to_memory(
        spark, interval_join(ls, rs, "user_id"), "ssj_out", "append"
    ).collect()

    batch = (
        signups.alias("l")
        .join(
            purchases.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 30 minutes")),
        )
        .select(F.col("l.event_id").alias("a"), F.col("r.event_id").alias("b"))
        .collect()
    )
    assert {(r.l_event_id, r.r_event_id) for r in result} == {
        (r.a, r.b) for r in batch
    }
    assert len(result) > 0


def test_stream_cdc_merge_applies_batches_exactly_once(spark, tmp_path):
    """Two change files MERGE into the snapshot (update, delete,
    insert); re-running the stream on the same checkpoint applies
    nothing twice."""
    import json
    import os

    from pyspark.sql import types as T

    from etl_pulumi_aws_snowflake_spark.streaming.cdc import stream_cdc_merge

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

    def drop_file(path, rows):
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    drop_file(
        f"{changes}/c1.json",
        [
            {"k": 2, "name": "b2", "bal": 99.0, "is_delete": False},
            {"k": 3, "name": "c", "bal": 0.0, "is_delete": True},
        ],
    )
    drop_file(
        f"{changes}/c2.json",
        [{"k": 9, "name": "z", "bal": 1.0, "is_delete": False}],
    )

    def run():
        stream_cdc_merge(
            spark, changes, schema, snap, ["k"], ckpt, delete_col="is_delete"
        )

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    run()
    want = {1: ("a", 10.0), 2: ("b2", 99.0), 9: ("z", 1.0)}
    got = {
        r["k"]: (r["name"], r["bal"])
        for r in snapshot_read(spark, snap).collect()
    }
    assert got == want

    # Replay with the same checkpoint: already-processed files are
    # skipped, the snapshot is unchanged.
    run()
    got2 = {
        r["k"]: (r["name"], r["bal"])
        for r in snapshot_read(spark, snap).collect()
    }
    assert got2 == want


def test_snapshot_commit_is_atomic_for_readers(spark, tmp_path):
    """A reader concurrent with a snapshot rewrite sees old-or-new,
    never partial: the new version dir is invisible until the pointer
    swap, and the pointer swap is a single atomic rename."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit,
        snapshot_read,
    )

    root = str(tmp_path / "snap")
    seed = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    seed.write.parquet(root)
    assert {r["k"] for r in snapshot_read(spark, root).collect()} == {1, 2}

    # Mid-rewrite state: the next version's files exist on disk but the
    # pointer has not swapped — a reader must still resolve the OLD data
    # (this is exactly what a reader sees while snapshot_commit's
    # parquet write is in flight).
    new = spark.createDataFrame([(1, "a2"), (3, "c")], "k bigint, v string")
    new.write.parquet(os.path.join(root, "v-00001"))
    assert {r["k"] for r in snapshot_read(spark, root).collect()} == {1, 2}

    # Committed (the writer finishing that same in-flight version and
    # swapping the pointer): readers now resolve the new data, in full.
    v = snapshot_commit(new, root)
    assert v == "v-00001"
    assert {
        (r["k"], r["v"]) for r in snapshot_read(spark, root).collect()
    } == {(1, "a2"), (3, "c")}

    # Successive commits prune all but the live + previous version (a
    # reader that resolved the pointer just before the swap may still
    # be scanning the previous dir).
    snapshot_commit(new, root)
    snapshot_commit(new, root)
    versions = sorted(d for d in os.listdir(root) if d.startswith("v-"))
    assert versions == ["v-00002", "v-00003"]


def test_snapshot_prune_survives_padding_overflow(spark, tmp_path):
    """Version pruning must sort numerically: past v-99999 the 5-digit
    zero-padding overflows and 'v-100000' sorts lexicographically BEFORE
    'v-99999' — a lexicographic prune would rmtree the just-committed
    live version while _CURRENT points at it."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit,
        snapshot_read,
    )

    root = str(tmp_path / "snap")
    os.makedirs(root)
    df = spark.createDataFrame([(1, "a")], "k bigint, v string")
    for v in ("v-99998", "v-99999"):
        df.write.parquet(os.path.join(root, v))
    with open(os.path.join(root, "_CURRENT"), "w") as f:
        f.write("v-99999")

    new = spark.createDataFrame([(2, "b")], "k bigint, v string")
    assert snapshot_commit(new, root) == "v-100000"
    versions = set(d for d in os.listdir(root) if d.startswith("v-"))
    # live + previous survive; the oldest is pruned
    assert versions == {"v-99999", "v-100000"}
    assert {(r["k"], r["v"]) for r in snapshot_read(spark, root).collect()} == {
        (2, "b")
    }


def _seed_partitioned(spark, root):
    """Seed a 3-partition snapshot via a full partitioned commit."""
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
    )

    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(30)], "k bigint, p bigint, v string"
    )
    snapshot_commit_partitioned(df, root, "p")
    return df


def _part_files(root, version, p):
    import os

    d = os.path.join(root, version, "data", f"_p={p}")
    out = {}
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            with open(os.path.join(d, f), "rb") as fh:
                out[f] = fh.read()
    return out


def test_pruned_merge_matches_full_merge(spark, tmp_path):
    """merge_upsert_pruned over a partitioned snapshot must produce the
    same table as the plain full-rewrite merge_upsert."""
    from etl_pulumi_aws_snowflake_spark.operators.warehouse import (
        merge_upsert,
        merge_upsert_pruned,
    )
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    root = str(tmp_path / "snap")
    seed = _seed_partitioned(spark, root)
    # update k=4 (p=1), delete k=7 (p=1), insert k=100 (p=1): one
    # changed partition out of three
    batch = spark.createDataFrame(
        [(4, 1, "UPD", False), (7, 1, "r7", True), (100, 1, "NEW", False)],
        "k bigint, p bigint, v string, is_delete boolean",
    )
    merge_upsert_pruned(spark, root, batch, ["k"], "p", delete_col="is_delete")
    got = {(r.k, r.p, r.v) for r in snapshot_read(spark, root).collect()}
    want = {
        (r.k, r.p, r.v)
        for r in merge_upsert(seed, batch, ["k"], delete_col="is_delete").collect()
    }
    assert got == want
    assert (4, 1, "UPD") in got and (100, 1, "NEW") in got
    assert not any(k == 7 for k, _, _ in got)


def test_pruned_merge_unrelated_partition_is_untouched_bytes(spark, tmp_path):
    """The point of pruning: a merge touching only p=1 must leave the
    other partitions' physical files byte-identical (carried forward by
    manifest reference, no data copy) and write no p=0/p=2 dirs in the
    new version."""
    import json
    import os

    from etl_pulumi_aws_snowflake_spark.operators.warehouse import merge_upsert_pruned

    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    before = {p: _part_files(root, "v-00001", p) for p in (0, 2)}

    batch = spark.createDataFrame(
        [(4, 1, "UPD", False)], "k bigint, p bigint, v string, is_delete boolean"
    )
    v = merge_upsert_pruned(spark, root, batch, ["k"], "p", delete_col="is_delete")
    assert v == "v-00002"

    with open(os.path.join(root, v, "_MANIFEST.json")) as f:
        man = json.load(f)
    assert man["entries"] == {"0": "v-00001", "1": "v-00002", "2": "v-00001"}
    assert not os.path.exists(os.path.join(root, v, "data", "_p=0"))
    assert not os.path.exists(os.path.join(root, v, "data", "_p=2"))
    for p in (0, 2):
        assert _part_files(root, "v-00001", p) == before[p]


def test_pruned_merge_drops_emptied_partition(spark, tmp_path):
    """Deleting every row of a partition removes its manifest entry;
    read-back no longer includes the partition."""
    import json
    import os

    from etl_pulumi_aws_snowflake_spark.operators.warehouse import merge_upsert_pruned
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    rows = [(k, 2, f"r{k}", True) for k in range(30) if k % 3 == 2]
    batch = spark.createDataFrame(rows, "k bigint, p bigint, v string, is_delete boolean")
    v = merge_upsert_pruned(spark, root, batch, ["k"], "p", delete_col="is_delete")
    with open(os.path.join(root, v, "_MANIFEST.json")) as f:
        man = json.load(f)
    assert "2" not in man["entries"]
    out = snapshot_read(spark, root)
    assert out.filter("p = 2").count() == 0
    assert out.count() == 20


def test_gc_keeps_referenced_versions(spark, tmp_path):
    """A version outside the keep window survives while a kept manifest
    still references its partitions, and is deleted once nothing does."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators.warehouse import merge_upsert_pruned
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)  # v-00001 holds p=0,1,2

    def touch(pval, k, ver_expect):
        batch = spark.createDataFrame(
            [(k, pval, "UPD", False)], "k bigint, p bigint, v string, is_delete boolean"
        )
        v = merge_upsert_pruned(spark, root, batch, ["k"], "p", delete_col="is_delete")
        assert v == ver_expect

    touch(1, 4, "v-00002")
    touch(1, 4, "v-00003")
    # keep window = {v-00002, v-00003}, but both manifests still point
    # p=0/p=2 at v-00001 -> it must survive GC
    assert os.path.exists(os.path.join(root, "v-00001"))

    # rewrite the remaining referenced partitions: after v-00005 the
    # LIVE manifest no longer references v-00001, but the kept PREVIOUS
    # version (v-00004) still points p=2 there — it must survive until
    # that too ages out (previous stays fully readable)
    touch(0, 3, "v-00004")
    touch(2, 5, "v-00005")
    assert os.path.exists(os.path.join(root, "v-00001"))
    touch(1, 4, "v-00006")
    assert not os.path.exists(os.path.join(root, "v-00001"))
    # table still fully readable from surviving referenced versions
    assert snapshot_read(spark, root).count() == 30


def test_pruned_merge_wide_batch_falls_back_to_full_rewrite(spark, tmp_path):
    """A batch spreading over more partitions than the prune cap must
    fall back to the full rewrite — and still be correct, with every
    partition's manifest entry pointing at the NEW version."""
    import json
    import os

    from etl_pulumi_aws_snowflake_spark.operators.warehouse import merge_upsert_pruned
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    # batch touches 2 partitions but the cap is 1 -> full rewrite
    batch = spark.createDataFrame(
        [(4, 1, "UPD", False), (5, 2, "UPD", False)],
        "k bigint, p bigint, v string, is_delete boolean",
    )
    v = merge_upsert_pruned(
        spark, root, batch, ["k"], "p", delete_col="is_delete",
        max_pruned_partitions=1,
    )
    with open(os.path.join(root, v, "_MANIFEST.json")) as f:
        man = json.load(f)
    assert set(man["entries"].values()) == {v}
    got = {(r.k, r.v) for r in snapshot_read(spark, root).collect()}
    assert (4, "UPD") in got and (5, "UPD") in got and len(got) == 30

    # and a pruned read of a value with no manifest entry is empty but
    # keeps the schema (the empty-manifest-subset branch)
    empty = snapshot_read(spark, root, partition_values=[99])
    assert empty.columns == ["k", "p", "v"]
    assert empty.count() == 0


def test_partition_value_validation_rejects_unsafe_changed_values(spark, tmp_path):
    """Commit-time validation (ADVICE r04): a changed_values entry that
    Hive-escaping would rewrite must raise BEFORE any write — nothing
    new appears under the root and the live version is untouched."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_read,
        snapshot_commit_partitioned,
    )

    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    before = sorted(os.listdir(root))
    df = spark.createDataFrame([(1, "a:b", "x")], "k bigint, p string, v string")
    for bad in [None, "a:b", "a/b", "50%", "", "__HIVE_DEFAULT_PARTITION__"]:
        with pytest.raises(ValueError, match="partition"):
            snapshot_commit_partitioned(df, root, "p", changed_values=[bad])
    assert sorted(os.listdir(root)) == before
    assert snapshot_read(spark, root).count() == 30


def test_partition_value_validation_detects_unsafe_data(spark, tmp_path):
    """Unsafe values IN THE DATA are detected from the written dir keys
    (they arrive Hive-escaped or as the null dir): the unpublished
    version dir is removed and the commit raises, pointer untouched."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_read,
        snapshot_commit_partitioned,
    )

    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    for bad in ["a:b", None]:
        df = spark.createDataFrame(
            [(1, "ok", "x"), (2, bad, "y")], "k bigint, p string, v string"
        )
        with pytest.raises(ValueError, match="partition"):
            snapshot_commit_partitioned(df, root, "p")
        # the aborted version dir is cleaned up, live data still reads
        assert sorted(d for d in os.listdir(root) if d.startswith("v-")) == [
            "v-00001"
        ]
    assert snapshot_read(spark, root).count() == 30


def test_pruning_unpartitioned_snapshot_raises(spark, tmp_path):
    """snapshot_read(partition_values=...) on a manifest-less snapshot
    raises (no silent post-scan-filter fallback — the docstring
    contract)."""
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit,
        snapshot_read,
    )

    root = str(tmp_path / "snap")
    snapshot_commit(spark.range(5), root)
    with pytest.raises(ValueError, match="manifest"):
        snapshot_read(spark, root, partition_values=[1])


class _RecordingFS:
    """LocalFilesystem that records every protocol call — proves the
    snapshot protocol reaches storage ONLY through the seam and that
    every visible commit is an atomic rename."""

    def __init__(self):
        from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
            LocalFilesystem,
        )

        self._inner = LocalFilesystem()
        self.calls: list[tuple[str, ...]] = []

    def read_text(self, path):
        self.calls.append(("read_text", path))
        return self._inner.read_text(path)

    def write_text(self, path, text):
        self.calls.append(("write_text", path))
        return self._inner.write_text(path, text)

    def rename(self, src, dst):
        self.calls.append(("rename", src, dst))
        return self._inner.rename(src, dst)

    def listdir(self, path):
        self.calls.append(("listdir", path))
        return self._inner.listdir(path)

    def rmtree(self, path):
        self.calls.append(("rmtree", path))
        return self._inner.rmtree(path)


def test_snapshot_protocol_through_injected_fs(spark, tmp_path):
    """The full partitioned-commit + pruned-merge + read cycle driven
    through an injected filesystem: (a) results identical to the
    default-FS path, (b) the pointer and manifest become visible ONLY
    via atomic renames (write_text targets are tmp paths), (c) no
    protocol metadata IO bypasses the seam."""
    import os

    from etl_pulumi_aws_snowflake_spark.operators.warehouse import (
        merge_upsert_pruned,
    )
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        _MANIFEST,
        _POINTER,
        snapshot_commit_partitioned,
        snapshot_read,
    )

    fs = _RecordingFS()
    root = str(tmp_path / "snap")
    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(30)], "k bigint, p bigint, v string"
    )
    snapshot_commit_partitioned(df, root, "p", fs=fs)
    batch = spark.createDataFrame(
        [(4, 1, "UPD", False), (100, 1, "NEW", False)],
        "k bigint, p bigint, v string, is_delete boolean",
    )
    merge_upsert_pruned(
        spark, root, batch, ["k"], "p", delete_col="is_delete", fs=fs
    )
    got = {(r.k, r.p, r.v) for r in snapshot_read(spark, root, fs=fs).collect()}
    assert (4, 1, "UPD") in got and (100, 1, "NEW") in got and len(got) == 31

    # every pointer/manifest publish is write-tmp-then-rename: the
    # final path only ever appears as a rename DESTINATION
    finals = {_POINTER, _MANIFEST}
    for call in fs.calls:
        if call[0] == "write_text":
            assert os.path.basename(call[1]) not in finals, call
    renamed_to = {os.path.basename(c[2]) for c in fs.calls if c[0] == "rename"}
    assert renamed_to == finals
    # both commits swapped the pointer atomically
    assert sum(
        1 for c in fs.calls if c[0] == "rename" and c[2].endswith(_POINTER)
    ) == 2


def test_late_file_dropped_only_after_eviction(spark, tmp_path):
    """The mechanism behind stream_late_data_discard_e2e's oracle
    equality: append-mode eviction finalizes a window, and a late file
    arriving AFTER that is dropped at the stateful operator
    (numRowsDroppedByWatermark) instead of re-aggregated — re-emitting
    a finalized window would break append's exactly-once-per-window
    contract.  Conversely, the late rows never reach the sink."""
    import os

    from etl_pulumi_aws_snowflake_spark.queries.streaming_e2e import (
        _stage_late_arrivals,
    )
    from etl_pulumi_aws_snowflake_spark.streaming.windows import tumbling_counts

    landing = str(tmp_path / "landing")
    # The SAME staging the driver entry uses — so this mechanism pin
    # cannot drift from the arrival pattern the entry actually runs.
    on_time, t_max = _stage_late_arrivals(
        load_table(spark, SF, "events"), landing
    )

    stream = (
        spark.readStream.schema(schemas.EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "*"))
    )
    outdir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def sink(batch_df, _epoch):
        batch_df.write.mode("append").parquet(outdir)

    q = (
        tumbling_counts(stream)
        .drop("total_value")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped_per_batch = [
        sum(s.get("numRowsDroppedByWatermark", 0) for s in p["stateOperators"])
        for p in sorted(q.recentProgress, key=lambda p: p["batchId"])
    ]
    # Batches 0/1 (on-time) drop nothing; the late batch drops its
    # whole (partially-aggregated) input.
    assert dropped_per_batch[0] == 0
    assert dropped_per_batch[-1] > 0, dropped_per_batch

    got = {
        (r.window_start, r.event_type, r.n_events)
        for r in spark.read.parquet(outdir).collect()
    }
    want = {
        (r.ws, r.event_type, r.n_events)
        for r in on_time.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(
            F.col("window.end") <= F.lit(t_max) - F.expr("INTERVAL 1 HOUR")
        )
        .select(F.col("window.start").alias("ws"), "event_type", "n_events")
        .collect()
    }
    assert got == want


def test_snapshot_protocol_through_hadoop_fs(spark, tmp_path):
    """The cluster-side seam implementation: the full commit →
    partitioned-commit → pruned-merge-style carry-forward → pruned-read
    cycle runs through HadoopFilesystem (file:// locally; same JVM API
    as hdfs://), interoperably with the default LocalFilesystem on the
    same root — the S3/HDFS port is configuration, not surgery."""
    from etl_pulumi_aws_snowflake_spark.streaming.hadoop_fs import (
        HadoopFilesystem,
    )
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit,
        snapshot_commit_partitioned,
        snapshot_read,
    )

    fs = HadoopFilesystem(spark, "file:///")
    root = str(tmp_path / "snap")

    seed = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    snapshot_commit(seed, root, fs=fs)
    assert {r.k for r in snapshot_read(spark, root, fs=fs).collect()} == {1, 2}

    pdf = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "x")],
        "k bigint, v string, part string",
    )
    snapshot_commit_partitioned(pdf, root, "part", fs=fs)
    upd = spark.createDataFrame([(2, "B2", "y")], "k bigint, v string, part string")
    snapshot_commit_partitioned(upd, root, "part", changed_values=["y"], fs=fs)

    got = {(r.k, r.v) for r in snapshot_read(spark, root, fs=fs).collect()}
    assert got == {(1, "a"), (3, "c"), (2, "B2")}
    pruned = {
        (r.k, r.v)
        for r in snapshot_read(
            spark, root, partition_values=["x"], fs=fs
        ).collect()
    }
    assert pruned == {(1, "a"), (3, "c")}

    # Same physical layout: the default local seam resolves the root
    # the hadoop seam wrote (pointer text, manifest, version dirs).
    assert snapshot_read(spark, root).count() == 3

    # Maintenance runs through the same seam: a SCOPED compaction
    # rewrites the carried partition (x, still in the first partitioned
    # version) with the content untouched; the default-scope run is
    # within the reference bound ({v2, v3} = 2) and no-ops.
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_compact

    assert snapshot_compact(spark, root, fs=fs) is None  # within bound
    assert snapshot_compact(spark, root, partition_values=["x"], fs=fs) is not None
    assert got == {(r.k, r.v) for r in snapshot_read(spark, root, fs=fs).collect()}
    # x is now live-resident: the same scoped run converges to a no-op
    assert snapshot_compact(spark, root, partition_values=["x"], fs=fs) is None

    # The protocol's absence contract holds across implementations.
    with pytest.raises(FileNotFoundError):
        fs.read_text(str(tmp_path / "missing.txt"))
    with pytest.raises(FileNotFoundError):
        fs.listdir(str(tmp_path / "missing_dir"))


def test_late_rows_with_live_state_are_aggregated_not_dropped(spark, tmp_path):
    """Pins the other half of the measured watermark contract (SCALE.md
    "where the watermark actually drops late rows"): when a late file's
    windows still have LIVE state (no eviction batch in between), this
    engine aggregates the late rows rather than dropping them — the
    docs' drop guarantee is one-sided.  If a Spark upgrade starts
    dropping at ingest, this fails and SCALE.md (and the
    stream_late_data_discard_e2e design notes) need re-measuring."""
    import os
    import time

    from etl_pulumi_aws_snowflake_spark.queries.streaming_e2e import _force_mtime
    from etl_pulumi_aws_snowflake_spark.streaming.windows import tumbling_counts

    events = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    t_max = events.agg(F.max("ts")).first()[0]
    late = events.filter(
        F.col("ts") <= F.lit(t_max) - F.expr("INTERVAL 3 HOURS")
    ).withColumn("event_id", F.col("event_id") + F.lit(10_000_000))

    landing = str(tmp_path / "landing")
    now = time.time()
    # File order: all events, then the late replay — NO on-time batch
    # in between, so the late windows' state is never evicted first.
    for i, df in enumerate((events, late)):
        sub = os.path.join(landing, f"f{i}")
        df.coalesce(1).write.parquet(sub)
        _force_mtime(sub, now - 300 + i * 60)

    stream = (
        spark.readStream.schema(schemas.EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "*"))
    )
    outdir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def sink(batch_df, epoch):
        batch_df.withColumn("epoch", F.lit(epoch)).write.mode("append").parquet(
            outdir
        )

    q = (
        tumbling_counts(stream)
        .drop("total_value")
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert all(
        s.get("numRowsDroppedByWatermark", 0) == 0
        for p in q.recentProgress
        for s in p["stateOperators"]
    )

    from pyspark.sql import Window

    latest = (
        spark.read.parquet(outdir)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("window_start", "event_type").orderBy(
                    F.desc("epoch")
                )
            ),
        )
        .filter("rn = 1")
    )
    got = {
        (r.window_start, r.event_type, r.n_events) for r in latest.collect()
    }
    want = {
        (r.ws, r.event_type, r.n_events)
        for r in events.unionByName(late)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("ws"), "event_type", "n_events")
        .collect()
    }
    assert got == want


def test_snapshot_time_travel_reads_retained_versions(spark, tmp_path):
    """Time travel: a retained older version reads back exactly what a
    reader saw when it was live — including a partitioned version whose
    carried-forward partition data lives in an even older dir — and a
    GC'd / unknown version raises with the retained list."""
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit,
        snapshot_commit_partitioned,
        snapshot_read,
        snapshot_versions,
    )

    root = str(tmp_path / "snap")
    v1 = snapshot_commit(
        spark.createDataFrame([(1, "a")], "k bigint, v string"), root, keep=4
    )
    pdf = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "k bigint, v string, part string"
    )
    v2 = snapshot_commit_partitioned(pdf, root, "part", keep=4)
    upd = spark.createDataFrame([(2, "B2", "y")], "k bigint, v string, part string")
    v3 = snapshot_commit_partitioned(
        upd, root, "part", changed_values=["y"], keep=4
    )
    assert snapshot_versions(root) == [v1, v2, v3]

    # live == v3 semantics; v2 time-travel shows the pre-merge rows
    assert {(r.k, r.v) for r in snapshot_read(spark, root).collect()} == {
        (1, "a"),
        (2, "B2"),
    }
    assert {
        (r.k, r.v) for r in snapshot_read(spark, root, version=v2).collect()
    } == {(1, "a"), (2, "b")}
    # v3's x-partition is carried forward BY REFERENCE into v2's dir —
    # time travel and live read agree on it
    assert {
        (r.k, r.v)
        for r in snapshot_read(
            spark, root, version=v3, partition_values=["x"]
        ).collect()
    } == {(1, "a")}
    # unpartitioned seed version stays readable
    assert {
        (r.k, r.v) for r in snapshot_read(spark, root, version=v1).collect()
    } == {(1, "a")}

    with pytest.raises(ValueError, match=r"v-99999.*readable"):
        snapshot_read(spark, root, version="v-99999")


def test_snapshot_versions_excludes_unreadable_and_orphaned(spark, tmp_path):
    """The readable horizon (code-review findings, r05): a version kept
    on disk only because newer manifests reference its DATA may itself
    reference GC'd dirs — it must not be offered for time travel
    (reading it would PATH_NOT_FOUND mid-scan); and a dir numerically
    above the live pointer (in-progress commit or crash orphan) must
    not be listed — reading it would be a torn read of never-committed
    data."""
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
        snapshot_read,
        snapshot_versions,
    )

    root = str(tmp_path / "snap")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "k bigint, v string, part string"
    )
    snapshot_commit_partitioned(
        mk([(1, "a", "x"), (2, "b", "y")]), root, "part", keep=2
    )  # v1: holds x and y
    snapshot_commit_partitioned(
        mk([(1, "a2", "x")]), root, "part", changed_values=["x"], keep=2
    )  # v2: holds x, references v1 for y
    snapshot_commit_partitioned(
        mk([(2, "b3", "y")]), root, "part", changed_values=["y"], keep=2
    )  # v3: holds y, references v2 for x
    snapshot_commit_partitioned(
        mk([(2, "b4", "y")]), root, "part", changed_values=["y"], keep=2
    )  # v4: holds y, references v2 for x.  GC keeps {v3, v4} plus v2
    #    (kept manifests reference its x data) and drops v1 — so the
    #    surviving v2's OWN manifest now dangles (y -> GC'd v1): the
    #    exact data-holder-but-unreadable case the horizon must exclude.
    on_disk = sorted(d for d in os.listdir(root) if d.startswith("v-"))
    assert on_disk == ["v-00002", "v-00003", "v-00004"]
    readable = snapshot_versions(root)
    assert readable == ["v-00003", "v-00004"]  # v2 excluded: dangling ref
    for v in readable:  # every listed version must actually read
        assert snapshot_read(spark, root, version=v).count() >= 1
    with pytest.raises(ValueError, match="v-00002"):
        snapshot_read(spark, root, version="v-00002")
    # live still correct after the chain of pruned merges
    assert {(r.k, r.v) for r in snapshot_read(spark, root).collect()} == {
        (1, "a2"),
        (2, "b4"),
    }

    # Crash-orphan simulation: a half-written next version above the
    # pointer is invisible to the horizon and refuses time travel.
    mk([(9, "z", "x")]).write.parquet(os.path.join(root, "v-00099"))
    assert "v-00099" not in snapshot_versions(root)
    with pytest.raises(ValueError, match="v-00099"):
        snapshot_read(spark, root, version="v-00099")



def test_hadoop_fs_create_exclusive_cas_loss_by_exception_class(spark, tmp_path):
    """create_exclusive maps CAS loss to FileExistsError by JAVA
    EXCEPTION CLASS (walking the cause chain), not message substring:
    an S3A conditional-PUT loser surfaces as RemoteFileChangedException
    whose message never says 'exists' (ADVICE r06).  file:// exercises
    the real py4j path; fakes cover the S3A class names."""
    from etl_pulumi_aws_snowflake_spark.streaming.hadoop_fs import (
        HadoopFilesystem,
    )

    fs = HadoopFilesystem(spark, "file:///")
    p = str(tmp_path / "claim")
    fs.create_exclusive(p, "winner")
    with pytest.raises(FileExistsError):  # real JVM exception end-to-end
        fs.create_exclusive(p, "loser")
    assert fs.read_text(p) == "winner"

    class _FakeJException:
        def __init__(self, name, cause=None):
            self._name, self._cause = name, cause

        def getClass(self):
            outer = self

            class _C:
                def getName(self):
                    return outer._name

            return _C()

        def getCause(self):
            return self._cause

    class _FakePy4JError(Exception):
        def __init__(self, java_exception):
            super().__init__("An error occurred while calling o1.create")
            self.java_exception = java_exception

    # S3A conditional PUT loss: 412 -> RemoteFileChangedException,
    # possibly nested as a cause — both must classify as CAS loss
    s3a = "org.apache.hadoop.fs.s3a.RemoteFileChangedException"
    assert fs._is_cas_loss(_FakePy4JError(_FakeJException(s3a)))
    assert fs._is_cas_loss(
        _FakePy4JError(
            _FakeJException("java.io.IOException", _FakeJException(s3a))
        )
    )
    assert fs._is_cas_loss(
        _FakePy4JError(
            _FakeJException("org.apache.hadoop.fs.FileAlreadyExistsException")
        )
    )
    # an unrelated failure must re-raise raw, not masquerade as a loss
    assert not fs._is_cas_loss(
        _FakePy4JError(
            _FakeJException("org.apache.hadoop.fs.s3a.AWSBadRequestException")
        )
    )
