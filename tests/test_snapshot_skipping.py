"""Zone-map data skipping: footer-harvested per-partition min/max in
the snapshot manifest (`_collect_partition_stats`) and the
`snapshot_read(skip_by=...)` pruning path.

The invariant under test everywhere: skipping changes COST, never
RESULTS — a skip_by read followed by the real filter equals the full
read with the same filter, under every stats condition (present,
carried-forward, stripped, type-mismatched).
"""

from __future__ import annotations

import json
import os

from tests.test_snapshot_maintenance import _manifest
from tests.test_streaming import _seed_partitioned


def _read(spark, root, **kw):
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

    return snapshot_read(spark, root, **kw)


def test_commit_records_footer_stats(spark, tmp_path):
    """A partitioned commit writes {partition: {col: [min, max]}} into
    the manifest; `k` in partition p spans {p, p+3, ..., 27+p}."""
    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    stats = _manifest(root, "v-00001")["stats"]
    assert set(stats) == {"0", "1", "2"}
    for p in range(3):
        assert stats[str(p)]["k"] == [p, 27 + p]
        assert stats[str(p)]["p"] == [p, p]
        # strings get stats too (min/max part-row value)
        lo, hi = stats[str(p)]["v"]
        assert lo.startswith("r") and hi.startswith("r")


def test_skip_by_prunes_partitions_without_changing_results(spark, tmp_path):
    """k >= 28 can only live in partitions 1 (max 28) and 2 (max 29):
    partition 0 (max 27) is provably skippable.  The skip read opens
    two dirs, and filter-after-skip equals filter-after-full."""
    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)

    full = _read(spark, root).filter("k >= 28")
    skip = _read(spark, root, skip_by={"k": (28, None)})
    assert skip.count() == 20, "kept partitions returned whole (hint, not filter)"
    got = {tuple(r) for r in skip.filter("k >= 28").collect()}
    assert got == {tuple(r) for r in full.collect()}
    # and a range that nothing satisfies prunes everything
    assert _read(spark, root, skip_by={"k": (1000, None)}).count() == 0


def test_skip_by_stats_carry_forward_through_pruned_merge(spark, tmp_path):
    """After a pruned merge rewrites partition 1, untouched partitions
    keep their carried stats and partition 1's are refreshed: an
    inserted k=100 must widen partition 1's range so skip_by(k>=100)
    keeps exactly that partition."""
    from etl_pulumi_aws_snowflake_spark.operators.warehouse import merge_upsert_pruned

    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    batch = spark.createDataFrame(
        [(100, 1, "NEW", False)], "k bigint, p bigint, v string, is_delete boolean"
    )
    v = merge_upsert_pruned(spark, root, batch, ["k"], "p", delete_col="is_delete")
    stats = _manifest(root, v)["stats"]
    assert stats["1"]["k"] == [1, 100]
    assert stats["0"]["k"] == [0, 27] and stats["2"]["k"] == [2, 29]

    skip = _read(spark, root, skip_by={"k": (100, None)})
    assert {r.p for r in skip.collect()} == {1}
    assert {tuple(r) for r in skip.filter("k >= 100").collect()} == {
        (100, 1, "NEW")
    }


def test_skip_by_is_conservative_without_stats(spark, tmp_path):
    """Stripped stats (a commit made where footers weren't readable)
    must disable pruning, not break reads."""
    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    mpath = os.path.join(root, "v-00001", "_MANIFEST.json")
    man = json.load(open(mpath))
    man["stats"] = {}
    with open(mpath, "w") as f:
        json.dump(man, f)
    assert _read(spark, root, skip_by={"k": (1000, None)}).count() == 30


def test_skip_by_ignores_type_mismatched_bounds(spark, tmp_path):
    """A string bound against int stats cannot be decided — keep the
    partition (and the unknown column name is likewise a no-op)."""
    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    df = _read(
        spark, root, skip_by={"k": ("zzz", None), "no_such_col": (0, 1)}
    )
    assert df.count() == 30


def test_skip_by_composes_with_partition_values(spark, tmp_path):
    """Explicit partition pruning and zone-map skipping intersect."""
    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    df = _read(
        spark,
        root,
        partition_values=[0, 1],
        skip_by={"k": (28, None)},  # kills partition 0 (max 27)
    )
    assert {r.p for r in df.collect()} == {1}


def test_nan_bearing_float_column_gets_no_stats(spark, tmp_path):
    """Parquet writes e.g. (1.0, NaN) bounds for a NaN-bearing double
    column, Python min/max over row groups would silently drop the NaN,
    and Spark's filter treats NaN as larger than every number — so a
    pruned partition could hold rows the real filter matches.  The
    collector therefore refuses stats for such columns (Iceberg's
    nan_value_counts problem) and skip_by keeps the partition."""
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
    )

    root = str(tmp_path / "snap")
    df = spark.createDataFrame(
        [(0, 0, 1.0), (1, 0, float("nan")), (2, 1, 3.0)],
        "k bigint, p bigint, x double",
    )
    snapshot_commit_partitioned(df, root, "p")
    stats = _manifest(root, "v-00001")["stats"]
    assert "x" not in stats["0"], "NaN-bearing column must carry no bound"
    assert stats["1"]["x"] == [3.0, 3.0], "clean partition keeps stats"

    # Partition 0's x-range without the NaN is [1,1], so a naive bound
    # would prune it for x >= 5 — but Spark's filter matches the NaN
    # row (NaN > every number), and the conservative read keeps it.
    out = _read(spark, root, skip_by={"x": (5, None)})
    assert {r.k for r in out.collect()} >= {0, 1}
    matched = out.filter("x >= 5").collect()
    assert [r.k for r in matched] == [1], "the NaN row survives skipping"


def test_stats_collection_respects_driver_metadata_cap(spark, tmp_path, monkeypatch):
    """Above STATS_MAX_FILES written files, the commit publishes
    without stats (a full rewrite of a 10^4-partition table must not
    serialize 10^4 footer opens on the driver); reads stay
    conservative."""
    import etl_pulumi_aws_snowflake_spark.streaming.snapshot as S

    monkeypatch.setattr(S, "STATS_MAX_FILES", 1)
    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)  # 3 partitions > 1-file budget
    stats = _manifest(root, "v-00001")["stats"]
    assert stats == {}
    assert _read(spark, root, skip_by={"k": (1000, None)}).count() == 30


def test_foreign_float_bounds_without_contract_are_not_trusted(spark, tmp_path):
    """A stats source that silently OMITS NaN from finite bounds
    (parquet-cpp/pyarrow writers, a cluster port) would report e.g.
    [1.0, 1.0] for a partition that also holds a NaN row — and since
    Spark's filters order NaN above every number, skip_by(x >= 5)
    would prune a row the real filter matches.  The manifest therefore
    carries a stats_contract naming the NaN-poisoning proof; FLOAT
    bounds under any other (or missing) contract are ignored, while
    int/str bounds (NaN-immune) keep pruning."""
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
    )

    root = str(tmp_path / "snap")
    df = spark.createDataFrame(
        [(0, 0, 1.0), (1, 0, float("nan")), (2, 1, 3.0)],
        "k bigint, p bigint, x double",
    )
    snapshot_commit_partitioned(df, root, "p")

    # Simulate the foreign source: finite float bounds that LIE about
    # partition 0 (its NaN row vanished from the stats), no contract.
    mpath = os.path.join(root, "v-00001", "_MANIFEST.json")
    man = json.load(open(mpath))
    assert man["stats_contract"], "commits must stamp the contract"
    man["stats"]["0"]["x"] = [1.0, 1.0]
    del man["stats_contract"]
    with open(mpath, "w") as f:
        json.dump(man, f)

    out = _read(spark, root, skip_by={"x": (5, None)})
    assert {r.k for r in out.collect()} >= {0, 1}, (
        "float bound without the NaN-poisoning contract must not prune"
    )
    assert [r.k for r in out.filter("x >= 5").collect()] == [1], (
        "the NaN row the lying bound would have dropped survives"
    )
    # int bounds carry no NaN hazard: k-pruning still works contract-less
    assert _read(spark, root, skip_by={"k": (1000, None)}).count() == 0


def test_carried_float_bounds_from_foreign_manifest_are_stripped(
    spark, tmp_path
):
    """carry-forward laundering: a pruned merge copies the previous
    manifest's stats for untouched partitions — if that previous
    manifest had foreign float bounds, stamping OUR contract on the new
    manifest must not bless them.  The commit strips float bounds from
    a carried set whose source contract differs; int/str carries stay."""
    from etl_pulumi_aws_snowflake_spark.operators.warehouse import (
        merge_upsert_pruned,
    )

    root = str(tmp_path / "snap")
    _seed_partitioned(spark, root)
    # add a float column's worth of foreign bounds + wipe the contract
    mpath = os.path.join(root, "v-00001", "_MANIFEST.json")
    man = json.load(open(mpath))
    man["stats"]["0"]["fake_x"] = [1.0, 1.0]
    del man["stats_contract"]
    with open(mpath, "w") as f:
        json.dump(man, f)

    batch = spark.createDataFrame(
        [(100, 1, "NEW", False)],
        "k bigint, p bigint, v string, is_delete boolean",
    )
    v = merge_upsert_pruned(
        spark, root, batch, ["k"], "p", delete_col="is_delete"
    )
    stats = _manifest(root, v)["stats"]
    assert "fake_x" not in stats["0"], "foreign float carry must be stripped"
    assert stats["0"]["k"] == [0, 27], "int carry survives the strip"
    assert stats["0"]["v"], "str carry survives the strip"


def test_skipping_e2e_entry_survives_multi_month_fixture(spark, tmp_path):
    """The driver entry's pruning assert must be STRUCTURAL, not
    fixture-shaped (VERDICT r06 #5): partitioning by bare day-of-month
    would fold disjoint id clusters of different months into one
    partition and widen every zone map.  Feed the entry a synthetic
    THREE-month events table (ids ascending with time, like the
    generator's) and require it to still prune and return the exact
    range — proving the month-qualified partition key carries the
    clustering assumption across month boundaries."""
    import pyspark.sql.functions as F

    from etl_pulumi_aws_snowflake_spark.queries.pipeline_e2e import (
        snapshot_skipping_e2e,
    )

    sf_dir = str(tmp_path / "sf_multi")
    os.makedirs(sf_dir)
    n = 3000
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.expr(
                "timestampadd(HOUR, cast(id * 2160.0 / 3000 as int), "
                "timestamp'2024-01-01 00:00:00')"
            ).alias("ts"),  # 90 days ~ 3 months, ids ascend with time
            (F.col("id") % 97).alias("user_id"),
            F.expr("element_at(array('click','view','buy'), "
                   "cast(id % 3 as int) + 1)").alias("event_type"),
            (F.col("id") * 1.5).alias("value"),
            F.to_json(F.struct(F.col("id").alias("i"))).alias("props"),
        )
    )
    ev.write.parquet(os.path.join(sf_dir, "events.parquet"))

    out = snapshot_skipping_e2e(spark, sf_dir)  # asserts pruning inside
    ids = sorted(r.event_id for r in out.collect())
    lo, hi = n * 4 // 10, n * 5 // 10 - 1
    assert ids == list(range(lo, hi + 1))


# --- model-based skipping property -----------------------------------
import math
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SKPROP = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)

_NAN = float("nan")


@st.composite
def _skip_history(draw):
    """Random snapshot history over 3 partitions with a float column
    that may carry NaN, followed by random skip_by probes.  Steps:
    full commit, then 0-3 of {pruned rewrite, compact}."""
    parts = [0, 1, 2]

    def rows(changed, base):
        out = []
        for p in changed:
            for j in range(draw(st.integers(1, 3))):
                x = draw(
                    st.one_of(
                        st.just(_NAN),
                        st.integers(-50, 50).map(float),
                    )
                )
                out.append((base + p * 100 + j, p, x))
        return out

    steps = [("full", rows(parts, 0))]
    for i in range(draw(st.integers(0, 3))):
        kind = draw(st.sampled_from(["merge", "compact"]))
        if kind == "merge":
            changed = draw(
                st.lists(
                    st.sampled_from(parts), min_size=1, max_size=2, unique=True
                )
            )
            steps.append(("merge", rows(changed, (i + 1) * 1000)))
        else:
            steps.append(("compact", None))
    probes = draw(
        st.lists(
            st.tuples(
                st.sampled_from(["k", "x"]),
                st.integers(-60, 1200),
                st.one_of(st.none(), st.integers(-60, 4000)),
            ),
            min_size=1,
            max_size=4,
        )
    )
    return steps, probes


@_SKPROP
@given(_skip_history())
def test_skip_by_equals_full_scan_under_random_histories(spark, hist):
    """THE skipping invariant, model-based: for ANY commit/merge/compact
    history and ANY bounds probe, skip-read + real filter must equal
    full-read + real filter row-for-row.  Complements
    test_properties.py's single-commit zone-map case and int-valued
    history model with what neither covers: NaN-bearing FLOAT stats
    flowing through pruned-merge carry-forward, contract stripping,
    and compaction refresh before the probe.  Skipping changes cost,
    never results."""
    from pyspark.sql import functions as F

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
        snapshot_compact,
        snapshot_read,
    )

    steps, probes = hist
    root = tempfile.mkdtemp(prefix="skipmodel")
    try:
        sroot = os.path.join(root, "snap")
        for kind, data in steps:
            if kind == "full":
                df = spark.createDataFrame(
                    data, "k bigint, p bigint, x double"
                )
                snapshot_commit_partitioned(df, sroot, "p")
            elif kind == "merge":
                df = spark.createDataFrame(
                    data, "k bigint, p bigint, x double"
                )
                # pruned rewrite: the touched partitions are REPLACED
                changed = sorted({r[1] for r in data})
                snapshot_commit_partitioned(
                    df, sroot, "p", changed_values=changed
                )
            else:
                snapshot_compact(spark, sroot, max_versions_referenced=1)

        full = snapshot_read(spark, sroot)
        for col, lo, hi in probes:
            pred = F.col(col) >= lo
            if hi is not None:
                pred = pred & (F.col(col) <= hi)
            want = sorted(
                (r.k, r.p, "nan" if isinstance(r.x, float) and math.isnan(r.x) else r.x)
                for r in full.filter(pred).collect()
            )
            got = sorted(
                (r.k, r.p, "nan" if isinstance(r.x, float) and math.isnan(r.x) else r.x)
                for r in snapshot_read(
                    spark, sroot, skip_by={col: (lo, hi)}
                )
                .filter(pred)
                .collect()
            )
            assert got == want, (col, lo, hi)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_SKPROP
@given(_skip_history())
def test_time_travel_reproduces_every_readable_version(spark, hist):
    """Model-based time travel: for ANY history, track each published
    version's expected content (partition -> rows, replaced on pruned
    rewrite, untouched by compaction); afterwards every version the
    horizon lists must read back EXACTLY its recorded content, the
    horizon must list only recorded versions (GC shrinks it, never
    corrupts it), and the live table equals the last recording.
    Complements test_properties.py's history model (one int per
    partition) with MULTI-ROW partitions and a NaN-bearing float
    column riding through every version."""
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
        snapshot_compact,
        snapshot_read,
        snapshot_versions,
    )

    steps, _ = hist
    root = tempfile.mkdtemp(prefix="ttmodel")

    def canon(x):
        return "nan" if isinstance(x, float) and math.isnan(x) else x

    try:
        sroot = os.path.join(root, "snap")
        state: dict[int, list] = {}
        recorded: dict[str, set] = {}
        for kind, data in steps:
            if kind == "full":
                df = spark.createDataFrame(data, "k bigint, p bigint, x double")
                v = snapshot_commit_partitioned(df, sroot, "p")
                state = {}
                for r in data:
                    state.setdefault(r[1], []).append(r)
            elif kind == "merge":
                df = spark.createDataFrame(data, "k bigint, p bigint, x double")
                changed = sorted({r[1] for r in data})
                v = snapshot_commit_partitioned(
                    df, sroot, "p", changed_values=changed
                )
                for p in changed:
                    state[p] = [r for r in data if r[1] == p]
            else:
                v = snapshot_compact(spark, sroot, max_versions_referenced=1)
                if v is None:
                    continue
            recorded[v] = {
                (k, p, canon(x)) for rows in state.values() for k, p, x in rows
            }

        horizon = snapshot_versions(sroot)
        assert set(horizon) <= set(recorded), (horizon, sorted(recorded))
        last = max(recorded, key=lambda d: int(d.rsplit("-", 1)[1]))
        assert horizon and horizon[-1] == last
        for v in horizon:
            got = {
                (r.k, r.p, canon(r.x))
                for r in snapshot_read(spark, sroot, version=v).collect()
            }
            assert got == recorded[v], v
        live = {
            (r.k, r.p, canon(r.x))
            for r in snapshot_read(spark, sroot).collect()
        }
        assert live == recorded[last]
    finally:
        shutil.rmtree(root, ignore_errors=True)
