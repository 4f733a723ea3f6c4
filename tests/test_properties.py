"""Property-based semantics tests (hypothesis) for the composite
operators whose edge cases a fixed fixture can miss: as-of carry with
NULL payloads, MERGE deletes of absent keys, SCD2 no-change collapse
with NULL attributes, salted == plain under NULL/hot keys, connected
components vs union-find, and bucketized == broadcast range joins.

Each example is tiny (≤ ~25 rows) — the point is adversarial VARIETY,
not volume; sf-scale behavior is covered by the oracle suite.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from etl_pulumi_aws_snowflake_spark.operators.dedup import connected_components
from etl_pulumi_aws_snowflake_spark.operators.joins import (
    asof_join,
    range_join,
    range_join_bucketed,
)
from etl_pulumi_aws_snowflake_spark.operators.skew import salted_groupby, salted_join
from etl_pulumi_aws_snowflake_spark.operators.warehouse import (
    merge_upsert,
    scd2_history,
)

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_keys = st.integers(min_value=0, max_value=3)
_ts = st.integers(min_value=0, max_value=50)
_val = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))



def _nsort(rows):
    """None-safe deterministic sort for tuples mixing None and values."""
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


# ---------------------------------------------------------------- as-of


@st.composite
def _asof_case(draw):
    left = draw(
        st.lists(st.tuples(_keys, _ts), min_size=0, max_size=20)
    )
    # unique (key, ts) on the right so the winning row is well defined
    right = draw(
        st.lists(
            st.tuples(_keys, _ts, _val, _val),
            min_size=0,
            max_size=20,
            unique_by=lambda r: (r[0], r[1]),
        )
    )
    return left, right


@PROP
@given(_asof_case())
def test_asof_join_matches_reference(spark, case):
    left_rows, right_rows = case
    lschema = StructType(
        [StructField("k", LongType()), StructField("ts", LongType())]
    )
    rschema = StructType(
        [
            StructField("k", LongType()),
            StructField("ts", LongType()),
            StructField("x", LongType(), True),
            StructField("y", LongType(), True),
        ]
    )
    left = spark.createDataFrame(left_rows, lschema)
    right = spark.createDataFrame(right_rows, rschema)
    got = _nsort(
        tuple(r)
        for r in asof_join(left, right, on="ts", by=["k"]).collect()
    )

    def ref_row(k, ts):
        cands = [r for r in right_rows if r[0] == k and r[1] <= ts]
        if not cands:
            return (k, ts, None, None)
        best = max(cands, key=lambda r: r[1])
        # BOTH payload fields must come from the same winning row,
        # even when one or both are NULL (no per-column skip-back).
        return (k, ts, best[2], best[3])

    want = _nsort(ref_row(k, ts) for k, ts in left_rows)
    assert got == want


# ---------------------------------------------------------------- MERGE


@st.composite
def _merge_case(draw):
    target = draw(
        st.lists(
            st.tuples(_keys, _val, _val),
            min_size=0,
            max_size=10,
            unique_by=lambda r: r[0],
        )
    )
    source = draw(
        st.lists(
            st.tuples(_keys, _val, _val, st.booleans()),
            min_size=0,
            max_size=10,
            unique_by=lambda r: r[0],
        )
    )
    return target, source


@PROP
@given(_merge_case())
def test_merge_upsert_matches_reference(spark, case):
    target_rows, source_rows = case
    tschema = StructType(
        [
            StructField("k", LongType()),
            StructField("a", LongType(), True),
            StructField("b", LongType(), True),
        ]
    )
    sschema = StructType(list(tschema.fields) + [StructField("is_delete", BooleanType())])
    target = spark.createDataFrame(target_rows, tschema)
    source = spark.createDataFrame(source_rows, sschema)
    got = _nsort(
        tuple(r)
        for r in merge_upsert(target, source, key=["k"], delete_col="is_delete").collect()
    )

    ref = {k: (k, a, b) for k, a, b in target_rows}
    for k, a, b, is_delete in source_rows:
        if is_delete:
            ref.pop(k, None)  # delete of an absent key is a no-op
        else:
            ref[k] = (k, a, b)
    assert got == _nsort(ref.values())


@st.composite
def _merge_fold_case(draw):
    target = draw(
        st.lists(
            st.tuples(_keys, _val, _val),
            min_size=0,
            max_size=8,
            unique_by=lambda r: r[0],
        )
    )
    # An ORDERED change sequence — keys may repeat across (not within)
    # batches; later changes must win, exactly as arriving CDC files do.
    changes = draw(st.lists(st.tuples(_keys, _val, _val, st.booleans()), max_size=12))
    cuts = draw(st.lists(st.integers(0, len(changes)), max_size=3))
    bounds = sorted({0, *cuts, len(changes)})
    batches = [
        changes[i:j] for i, j in zip(bounds, bounds[1:]) if changes[i:j]
    ]
    # Dedup keys WITHIN a batch (last wins) — one change per key per
    # file is the CDC contract; cross-batch repeats are the point here.
    batches = [list({c[0]: c for c in b}.values()) for b in batches]
    return target, batches


@PROP
@given(_merge_fold_case())
def test_merge_fold_over_batches_matches_sequential_reference(spark, case):
    """The streaming CDC loop's core guarantee: folding merge_upsert
    over arriving batches equals replaying the ordered change sequence
    — however the files happen to be batched (`AvailableNow` may group
    them arbitrarily)."""
    target_rows, batches = case
    tschema = StructType(
        [
            StructField("k", LongType()),
            StructField("a", LongType(), True),
            StructField("b", LongType(), True),
        ]
    )
    sschema = StructType(list(tschema.fields) + [StructField("is_delete", BooleanType())])
    snap = spark.createDataFrame(target_rows, tschema)
    for batch in batches:
        snap = merge_upsert(
            snap, spark.createDataFrame(batch, sschema), key=["k"], delete_col="is_delete"
        ).localCheckpoint()
    got = _nsort(tuple(r) for r in snap.collect())

    ref = {k: (k, a, b) for k, a, b in target_rows}
    for batch in batches:
        for k, a, b, is_delete in batch:
            if is_delete:
                ref.pop(k, None)
            else:
                ref[k] = (k, a, b)
    assert got == _nsort(ref.values())


# ----------------------------------------------------------------- SCD2


@st.composite
def _scd2_case(draw):
    return draw(
        st.lists(
            st.tuples(_keys, _ts, _val, _val),
            min_size=0,
            max_size=20,
            unique_by=lambda r: (r[0], r[1]),  # one change event per (key, ts)
        )
    )


@PROP
@given(_scd2_case())
def test_scd2_matches_reference(spark, rows):
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ts", LongType()),
            StructField("a", LongType(), True),
            StructField("b", LongType(), True),
        ]
    )
    changes = spark.createDataFrame(rows, schema)
    got = _nsort(
        (r["k"], r["a"], r["b"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(changes, key=["k"], ts_col="ts", attr_cols=["a", "b"]).collect()
    )

    want = []
    for k in {r[0] for r in rows}:
        events = sorted((r for r in rows if r[0] == k), key=lambda r: r[1])
        versions = []
        for _, ts, a, b in events:
            if versions and versions[-1][1] == (a, b):
                continue  # no-change event opens no version (NULL-safe)
            versions.append((ts, (a, b)))
        for i, (ts, (a, b)) in enumerate(versions):
            nxt = versions[i + 1][0] if i + 1 < len(versions) else None
            want.append((k, a, b, ts, nxt, nxt is None))
    assert got == _nsort(want)


# --------------------------------------------------------------- salted


@st.composite
def _salted_case(draw):
    # mostly-hot key distribution: key 0 dominates, NULL keys included
    key = st.one_of(
        st.just(0), st.just(0), st.just(0), st.integers(0, 3), st.none()
    )
    rows = draw(
        st.lists(
            st.tuples(st.integers(0, 10**6), key, st.integers(-5, 5)),
            min_size=0,
            max_size=25,
            unique_by=lambda r: r[0],
        )
    )
    dim = draw(
        st.lists(
            st.tuples(st.integers(0, 4), _val),
            min_size=0,
            max_size=5,
            unique_by=lambda r: r[0],
        )
    )
    return rows, dim


@PROP
@given(_salted_case())
def test_salted_join_and_groupby_match_plain(spark, case):
    rows, dim_rows = case
    fschema = StructType(
        [
            StructField("rid", LongType()),
            StructField("k", LongType(), True),
            StructField("v", LongType()),
        ]
    )
    dschema = StructType(
        [StructField("k", LongType()), StructField("d", LongType(), True)]
    )
    fact = spark.createDataFrame(rows, fschema)
    dim = spark.createDataFrame(dim_rows, dschema)

    plain_join = _nsort(
        tuple(r) for r in fact.join(dim, on=["k"], how="left").collect()
    )
    salted = _nsort(
        tuple(r)
        for r in salted_join(
            fact, dim, on=["k"], n=4, probe_id_cols=["rid"], how="left"
        ).collect()
    )
    assert salted == plain_join

    plain_agg = _nsort(
        tuple(r)
        for r in fact.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    salted_agg = _nsort(
        tuple(r)
        for r in salted_groupby(
            fact,
            ["k"],
            aggs={"ps": F.sum("v"), "pn": F.count(F.lit(1))},
            finals={"s": F.sum("ps"), "n": F.sum("pn")},
            n=4,
            id_cols=["rid"],
        ).collect()
    )
    assert salted_agg == plain_agg


# --------------------------------------------- connected components


@PROP
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=20,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_match_union_find(spark, edge_list):
    edges = [(a, b) for a, b in edge_list if a != b]
    schema = StructType(
        [StructField("doc_a", LongType()), StructField("doc_b", LongType())]
    )
    pairs = spark.createDataFrame(edges, schema)
    got = {r["id"]: r["label"] for r in connected_components(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


# ----------------------------------------------------------- range join


@st.composite
def _range_case(draw):
    vals = draw(st.lists(st.integers(-20, 20), min_size=0, max_size=15))
    bands = draw(
        st.lists(
            st.tuples(st.integers(0, 10**6), st.integers(-20, 20), st.integers(1, 15)),
            min_size=0,
            max_size=8,
            unique_by=lambda r: r[0],
        )
    )
    width = draw(st.sampled_from([0.5, 1.0, 3.0, 7.0]))
    return vals, bands, width


@PROP
@given(_range_case())
def test_bucketized_range_join_matches_broadcast(spark, case):
    vals, band_rows, width = case
    lschema = StructType([StructField("x", DoubleType())])
    bschema = StructType(
        [
            StructField("band_id", LongType()),
            StructField("lo", DoubleType()),
            StructField("hi", DoubleType()),
        ]
    )
    left = spark.createDataFrame([(float(v),) for v in vals], lschema)
    bands = spark.createDataFrame(
        [(bid, float(lo), float(lo + span)) for bid, lo, span in band_rows], bschema
    )
    broadcast_inner = _nsort(
        tuple(r)
        for r in range_join(left, bands, value="x").filter(F.col("band_id").isNotNull()).collect()
    )
    bucketized = _nsort(
        tuple(r)
        for r in range_join_bucketed(left, bands, value="x", bucket_width=width)
        .select(*[f.name for f in lschema.fields], *[f.name for f in bschema.fields])
        .collect()
    )
    assert bucketized == broadcast_inner


# ------------------------------------------------- partition-pruned MERGE


@st.composite
def _pruned_merge_case(draw):
    """Target/source with partition p functionally determined by the key
    (p = k % 3) — the pruned merge's stable-partition contract — and
    adversarial variety: absent-key deletes, empty sides, partitions
    fully emptied, inserts into brand-new partitions."""
    tkeys = draw(st.lists(st.integers(0, 9), min_size=0, max_size=8, unique=True))
    skeys = draw(st.lists(st.integers(0, 11), min_size=0, max_size=8, unique=True))
    target = [(k, k % 3, draw(_val)) for k in tkeys]
    source = [(k, k % 3, draw(_val), draw(st.booleans())) for k in skeys]
    return target, source


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(_pruned_merge_case())
def test_pruned_merge_matches_full_merge_property(spark, case):
    import shutil
    import tempfile

    from etl_pulumi_aws_snowflake_spark.operators.warehouse import (
        merge_upsert_pruned,
    )
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
        snapshot_read,
    )

    target_rows, source_rows = case
    tschema = StructType(
        [
            StructField("k", LongType()),
            StructField("p", LongType()),
            StructField("v", LongType(), True),
        ]
    )
    sschema = StructType(
        list(tschema.fields) + [StructField("is_delete", BooleanType())]
    )
    target = spark.createDataFrame(target_rows, tschema)
    source = spark.createDataFrame(source_rows, sschema)

    root = tempfile.mkdtemp(prefix="pruned_merge_prop_")
    try:
        snapshot_commit_partitioned(target, root, "p")
        merge_upsert_pruned(spark, root, source, ["k"], "p", delete_col="is_delete")
        got = _nsort(tuple(r) for r in snapshot_read(spark, root).collect())
        want = _nsort(
            tuple(r)
            for r in merge_upsert(
                target, source, key=["k"], delete_col="is_delete"
            ).collect()
        )
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ------------------------------------- snapshot version/GC/time-travel model


@st.composite
def _snapshot_history_case(draw):
    """A commit SEQUENCE against one snapshot root: a full partitioned
    commit, then 2-4 pruned commits each rewriting a random partition
    subset — the shape under which GC, manifest carry-forward, and the
    readable time-travel horizon interact (the r05 review found two
    real bugs exactly here)."""
    parts = [0, 1, 2]
    steps = [("full", {p: draw(st.integers(0, 99)) for p in parts})]
    for _ in range(draw(st.integers(2, 4))):
        kind = draw(st.integers(0, 7))
        if kind == 0:
            # maintenance interleaves with ingestion — compaction must
            # uphold every invariant commits do (possibly as a no-op)
            steps.append(("compact", {}))
            continue
        if kind in (1, 2):
            # two writers derive from the SAME live version; the one
            # committing second holds a stale expected_current token
            # and must lose deterministically (VERDICT r07 #7)
            winner = draw(
                st.lists(st.sampled_from(parts), min_size=1, max_size=3, unique=True)
            )
            loser = draw(
                st.lists(st.sampled_from(parts), min_size=1, max_size=3, unique=True)
            )
            steps.append(
                (
                    "race",
                    (
                        {p: draw(st.integers(0, 99)) for p in winner},
                        {p: draw(st.integers(100, 199)) for p in loser},
                    ),
                )
            )
            continue
        if kind == 3:
            # compaction races a pruned commit (VERDICT r08 #7): both
            # derive from the same live version; hypothesis picks which
            # one publishes first, the other holds a stale token
            changed = draw(
                st.lists(st.sampled_from(parts), min_size=1, max_size=3, unique=True)
            )
            steps.append(
                (
                    "race_compact",
                    (
                        draw(st.sampled_from(["compact_first", "commit_first"])),
                        {p: draw(st.integers(200, 299)) for p in changed},
                    ),
                )
            )
            continue
        changed = draw(
            st.lists(st.sampled_from(parts), min_size=1, max_size=3, unique=True)
        )
        steps.append(
            ("pruned", {p: draw(st.integers(0, 99)) for p in changed})
        )
    return steps


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(_snapshot_history_case())
def test_snapshot_history_model_property(spark, case):
    """Model-based protocol check: after every commit (and every
    interleaved COMPACTION — content-neutral by contract), (a) the live
    read equals the logical model table; (b) EVERY version listed by
    snapshot_versions reads back exactly the model state at its commit
    (readable means readable — no PATH_NOT_FOUND mid-scan ever); (c)
    every on-disk version NOT listed refuses time travel with
    ValueError rather than returning something; (d) a zone-map skip_by
    read plus the real filter equals the model filter — skipping never
    changes results, whatever commit/compact history built the stats;
    (e) interleaved RACING writers (VERDICT r07 #7): when two commits
    derive from the same live version, the second holds a stale
    ``expected_current`` and must raise SnapshotConflictError with
    ZERO footprint (no new dir, loser data never readable at ANY
    version — no torn read exists in the model), whatever random
    history preceded the race; (f) COMPACT-vs-COMMIT interleavings
    (VERDICT r08 #7), both orders: a compaction publishing first makes
    a stale-token pruned commit lose with zero footprint; a pruned
    commit publishing first makes the compaction — driven through the
    REAL snapshot_compact with only its initial live-read patched to
    the stale capture, so its internal conflict check sees the true
    pointer — lose (or legitimately no-op) with zero footprint, and
    the winner's content survives untouched in both orders."""
    import os
    import shutil
    import tempfile
    from unittest import mock

    import pytest
    from pyspark.sql import functions as F

    import etl_pulumi_aws_snowflake_spark.streaming.snapshot as snap_mod
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        SnapshotConflictError,
        snapshot_commit_partitioned,
        snapshot_compact,
        snapshot_read,
        snapshot_versions,
    )

    root = tempfile.mkdtemp(prefix="snap_model_prop_")
    shutil.rmtree(root, ignore_errors=True)
    schema = StructType(
        [StructField("p", LongType()), StructField("v", LongType())]
    )
    try:
        table: dict[int, int] = {}
        model: dict[str, dict[int, int]] = {}
        live_ver: str | None = None
        for kind, vals in case:
            if kind == "compact":
                ver = snapshot_compact(spark, root, keep=2)
                if ver is not None:
                    model[ver] = dict(table)  # content-neutral
                    live_ver = ver
            elif kind == "race":
                winner_vals, loser_vals = vals
                stale = live_ver  # BOTH writers read this live version
                table = dict(table)
                table.update(winner_vals)
                ver = snapshot_commit_partitioned(
                    spark.createDataFrame(sorted(winner_vals.items()), schema),
                    root,
                    "p",
                    changed_values=list(winner_vals),
                    keep=2,
                    expected_current=stale,
                )
                model[ver] = dict(table)
                live_ver = ver
                before = {
                    d for d in os.listdir(root) if d.startswith("v-")
                }
                with pytest.raises(SnapshotConflictError):
                    snapshot_commit_partitioned(
                        spark.createDataFrame(
                            sorted(loser_vals.items()), schema
                        ),
                        root,
                        "p",
                        changed_values=list(loser_vals),
                        keep=2,
                        expected_current=stale,
                    )
                # zero footprint: the pre-write check aborts before any
                # data lands, so the loser leaves no dir at all
                after = {d for d in os.listdir(root) if d.startswith("v-")}
                assert after == before
            elif kind == "race_compact":
                order, commit_vals = vals
                stale = live_ver  # both contenders read this version
                if order == "compact_first":
                    cver = snapshot_compact(spark, root, keep=2)
                    if cver is not None:
                        # compaction published: the pruned commit's
                        # token is now stale — it must lose, zero
                        # footprint, content stays the compaction's
                        model[cver] = dict(table)
                        live_ver = ver = cver
                        before = {
                            d for d in os.listdir(root) if d.startswith("v-")
                        }
                        with pytest.raises(SnapshotConflictError):
                            snapshot_commit_partitioned(
                                spark.createDataFrame(
                                    sorted(commit_vals.items()), schema
                                ),
                                root,
                                "p",
                                changed_values=list(commit_vals),
                                keep=2,
                                expected_current=stale,
                            )
                        after = {
                            d for d in os.listdir(root) if d.startswith("v-")
                        }
                        assert after == before
                    else:
                        # nothing worth compacting: no publish happened,
                        # the token is still live — the commit wins
                        table = dict(table)
                        table.update(commit_vals)
                        ver = snapshot_commit_partitioned(
                            spark.createDataFrame(
                                sorted(commit_vals.items()), schema
                            ),
                            root,
                            "p",
                            changed_values=list(commit_vals),
                            keep=2,
                            expected_current=stale,
                        )
                        model[ver] = dict(table)
                        live_ver = ver
                else:  # commit_first
                    table = dict(table)
                    table.update(commit_vals)
                    ver = snapshot_commit_partitioned(
                        spark.createDataFrame(
                            sorted(commit_vals.items()), schema
                        ),
                        root,
                        "p",
                        changed_values=list(commit_vals),
                        keep=2,
                        expected_current=stale,
                    )
                    model[ver] = dict(table)
                    live_ver = ver
                    # The racing compaction captured `stale` BEFORE that
                    # publish.  Drive the REAL snapshot_compact, patching
                    # only its FIRST _current_version call to the stale
                    # capture — every later call (the commit-path
                    # conflict check) sees the true pointer, so this is
                    # the genuine interleaving, not a simulation of it.
                    before = {
                        d for d in os.listdir(root) if d.startswith("v-")
                    }
                    real_cv = snap_mod._current_version
                    state = {"first": True}

                    def _stale_first(r_, f_):
                        if state["first"]:
                            state["first"] = False
                            return stale
                        return real_cv(r_, f_)

                    with mock.patch.object(
                        snap_mod, "_current_version", side_effect=_stale_first
                    ):
                        try:
                            cver = snapshot_compact(spark, root, keep=2)
                        except SnapshotConflictError:
                            cver = "CONFLICT"
                    # loser either no-ops (stale view not fragmented) or
                    # conflicts — never publishes, zero footprint
                    assert cver in ("CONFLICT", None)
                    after = {
                        d for d in os.listdir(root) if d.startswith("v-")
                    }
                    assert after == before
            else:
                table = dict(table)
                table.update(vals)
                if kind == "full":
                    df = spark.createDataFrame(sorted(table.items()), schema)
                    ver = snapshot_commit_partitioned(df, root, "p", keep=2)
                else:
                    df = spark.createDataFrame(sorted(vals.items()), schema)
                    ver = snapshot_commit_partitioned(
                        df, root, "p", changed_values=list(vals), keep=2
                    )
                model[ver] = dict(table)
                live_ver = ver

            live = {r.p: r.v for r in snapshot_read(spark, root).collect()}
            assert live == table
            skim = {
                r.p: r.v
                for r in snapshot_read(spark, root, skip_by={"v": (30, 60)})
                .filter(F.col("v").between(30, 60))
                .collect()
            }
            assert skim == {p: v for p, v in table.items() if 30 <= v <= 60}
            on_disk = {
                d for d in os.listdir(root) if d.startswith("v-")
            }
            readable = snapshot_versions(root)
            assert set(readable) <= on_disk
            # the just-committed/compacted version (None = no-op compact)
            assert ver is None or ver in readable
            for rv in readable:
                got = {
                    r.p: r.v
                    for r in snapshot_read(spark, root, version=rv).collect()
                }
                assert got == model[rv], (rv, got, model[rv])
            for dv in sorted(on_disk - set(readable)):
                with pytest.raises(ValueError):
                    snapshot_read(spark, root, version=dv)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ----------------------------------------- zone-map skipping invariance


@st.composite
def _zone_map_case(draw):
    """Adversarial rows for the footer-stats collector: negative and
    huge values, NaN, NULLs, duplicate values, strings that sort
    unlike their bytes would suggest, partitions of 1 row, and bounds
    that straddle/miss/degenerate."""
    n = draw(st.integers(2, 18))
    rows = []
    for k in range(n):
        p = draw(st.integers(0, 2))
        x = draw(
            st.one_of(
                st.none(),
                st.just(float("nan")),
                st.floats(-1e6, 1e6, allow_nan=False),
                st.integers(-5, 5).map(float),
            )
        )
        s = draw(st.sampled_from(["", "a", "Z", "aa", "z9", "0x"]))
        rows.append((k, p, x, s))
    lo = draw(st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)))
    hi = draw(st.one_of(st.none(), st.floats(-10, 10, allow_nan=False)))
    return rows, lo, hi


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(_zone_map_case())
def test_zone_map_skipping_never_changes_results_property(spark, case):
    """skip_by ∘ filter == filter, for every generated data/bounds
    combination — including NaN rows (Spark: NaN > every number, so a
    `x >= lo` filter MATCHES them; pruning their partition would lose
    rows), NULLs (match nothing), and degenerate lo > hi ranges."""
    import shutil
    import tempfile

    from pyspark.sql.types import StringType

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
        snapshot_read,
    )

    rows, lo, hi = case
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("p", LongType()),
            StructField("x", DoubleType(), True),
            StructField("s", StringType()),
        ]
    )
    root = tempfile.mkdtemp(prefix="zone_prop_")
    shutil.rmtree(root, ignore_errors=True)
    try:
        df = spark.createDataFrame(rows, schema)
        snapshot_commit_partitioned(df, root, "p")

        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("x") >= lo)
        if hi is not None:
            cond = cond & (F.col("x") <= hi)
        want = {
            r.k for r in snapshot_read(spark, root).filter(cond).collect()
        }
        got = {
            r.k
            for r in snapshot_read(spark, root, skip_by={"x": (lo, hi)})
            .filter(cond)
            .collect()
        }
        assert got == want, (sorted(got), sorted(want), lo, hi)

        # string bounds against the string column, same invariant
        want_s = {
            r.k
            for r in snapshot_read(spark, root)
            .filter(F.col("s") >= "a")
            .collect()
        }
        got_s = {
            r.k
            for r in snapshot_read(spark, root, skip_by={"s": ("a", None)})
            .filter(F.col("s") >= "a")
            .collect()
        }
        assert got_s == want_s
    finally:
        shutil.rmtree(root, ignore_errors=True)


@st.composite
def _chunk_case(draw):
    window = draw(st.integers(min_value=1, max_value=12))
    stride = draw(st.integers(min_value=1, max_value=window))
    docs = draw(
        st.lists(
            st.integers(min_value=0, max_value=40),  # token counts
            min_size=1,
            max_size=6,
        )
    )
    return window, stride, docs


@PROP
@given(_chunk_case())
def test_chunk_windows_matches_python_reference(spark, case):
    """chunk_windows vs a from-scratch reference: same chunk indices,
    offsets, and reassembled text for random (window, stride, doc
    lengths) — plus the coverage invariants (union of chunks = [0, n),
    last window ends at n, no start beyond the rule's cap)."""
    from etl_pulumi_aws_snowflake_spark.operators.packing import chunk_windows

    window, stride, lens = case
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate(lens)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_ix"]): (
            r["tok_start"], r["tok_end"], r["chunk_text"]
        )
        for r in chunk_windows(
            docs, window=window, stride=stride
        ).collect()
    }

    want = {}
    for i, n in enumerate(lens):
        if n == 0:
            continue
        toks = [f"w{i}_{j}" for j in range(n)]
        max_ix = max(-(-(n - window) // stride), 0)  # ceil, clamped
        for ix in range(max_ix + 1):
            start = ix * stride
            end = min(start + window, n)
            want[(i, ix)] = (start, end, " ".join(toks[start:end]))
    assert got == want

    # coverage invariants
    for i, n in enumerate(lens):
        if n == 0:
            continue
        spans = sorted(
            (v[0], v[1]) for (d, _), v in want.items() if d == i
        )
        assert spans[0][0] == 0 and spans[-1][1] == n
        covered = set()
        for a, b in spans:
            covered.update(range(a, b))
        assert covered == set(range(n))


@st.composite
def _quant_case(draw):
    dims = draw(st.integers(min_value=1, max_value=6))
    vecs = draw(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-4.0,
                    max_value=4.0,
                    allow_nan=False,
                    allow_infinity=False,
                    width=32,
                ),
                min_size=dims,
                max_size=dims,
            ),
            min_size=1,
            max_size=5,
        )
    )
    return vecs


@PROP
@given(_quant_case())
def test_int8_quantization_matches_python_reference(spark, vecs):
    """quantize_assigned vs a from-scratch reference: identical int8
    values (floor(127·v/max|v| + 0.5) over the float32-rounded then
    double-cast inputs — the exact pipeline the index runs), norms
    equal, bounds hold, zero vectors dropped."""
    import math

    import numpy as np

    from etl_pulumi_aws_snowflake_spark.operators.similarity import (
        _prep,
        quantize_assigned,
    )
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    assigned = _prep(emb).withColumn("list_id", F.lit(0))
    got = {
        r["vec_id"]: (list(r["qv"]), r["qnrm"])
        for r in quantize_assigned(assigned).collect()
    }

    for i, v in enumerate(vecs):
        vv = [float(np.float32(x)) for x in v]  # storage round-trip
        m = max(abs(x) for x in vv)
        if m == 0.0:
            assert i not in got
            continue
        q = [int(math.floor(127.0 * x / m + 0.5)) for x in vv]
        assert got[i][0] == q, (vv, got[i][0], q)
        assert all(-127 <= x <= 127 for x in got[i][0])
        ref_nrm = 0.0
        for x in q:
            ref_nrm = ref_nrm + float(x) * float(x)
        assert got[i][1] == math.sqrt(ref_nrm)
