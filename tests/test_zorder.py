"""Z-order keys (`functions/zorder.py`): the bit interleave must match
a from-scratch Python Morton reference in BOTH dialects, the curve must
actually localize 2-D boxes, and the key must compose with
snapshot_compact's cluster_by as a multi-dimensional layout pass."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark.functions import zorder as Z


def _ref_key(vals: list[int], bits: int) -> int:
    k = len(vals)
    out = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * k + (k - 1 - i))
    return out


def test_interleave_matches_reference_in_both_dialects(spark):
    key = Z.zorder_key(
        [Z.bucket("x", 0, 255, 8), Z.bucket("y", 0, 255, 8)], bits=8
    )
    pts = [(x, y) for x in (0, 1, 5, 100, 255, 300, -4) for y in (0, 3, 77, 255)]
    df = spark.createDataFrame(pts, "x int, y int")
    got_spark = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", F.expr(key.spark).alias("z")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({x},{y})" for x, y in pts)
        + ") v(x, y)"
    )
    got_duck = {
        (r[0], r[1]): r[2]
        for r in con.execute(f"SELECT x, y, {key.duck} FROM t").fetchall()
    }
    for x, y in pts:
        # bucket() clamps outliers to the edge cells
        want = _ref_key([min(max(x, 0), 255), min(max(y, 0), 255)], 8)
        assert got_spark[(x, y)] == want, (x, y)
        assert got_duck[(x, y)] == want, (x, y)


def test_z_curve_orders_the_4x4_grid_canonically(spark):
    """2 bits x 2 dims: sorting the 4x4 grid by the key must walk the
    textbook Z curve — quadrant blocks before rows — which is exactly
    the property that keeps k-D boxes contiguous in the 1-D sort."""
    key = Z.zorder_key([Z.bucket("x", 0, 3, 2), Z.bucket("y", 0, 3, 2)], bits=2)
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    walk = [
        (r.x, r.y)
        for r in df.select("x", "y", F.expr(key.spark).alias("z"))
        .orderBy("z")
        .collect()
    ]
    assert walk == [
        (0, 0), (0, 1), (1, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (1, 3),
        (2, 0), (2, 1), (3, 0), (3, 1),
        (2, 2), (2, 3), (3, 2), (3, 3),
    ]
    # every aligned 2x2 quadrant is CONTIGUOUS in the walk
    for qx in (0, 2):
        for qy in (0, 2):
            idx = [
                i for i, (x, y) in enumerate(walk)
                if x in (qx, qx + 1) and y in (qy, qy + 1)
            ]
            assert idx == list(range(idx[0], idx[0] + 4))


def test_input_validation():
    with pytest.raises(ValueError, match="lo < hi"):
        Z.bucket("x", 5, 5, 8)
    with pytest.raises(ValueError, match="bits"):
        Z.bucket("x", 0, 10, 0)
    with pytest.raises(ValueError, match="2 dimensions"):
        Z.zorder_key([Z.bucket("x", 0, 10, 8)])
    with pytest.raises(ValueError, match="key bits"):
        Z.zorder_key([Z.bucket("x", 0, 10, 32)] * 3, bits=32)
    # bounds so wide that (hi-lo)*(2^bits-1) wraps BIGINT even for
    # in-range values must be rejected at construction, not at runtime
    with pytest.raises(ValueError, match="overflows BIGINT"):
        Z.bucket("x", 0, 1 << 56, 8)


def test_extreme_outliers_clamp_identically_in_both_dialects(spark):
    """The clamp runs on the RAW value before the multiply: an outlier
    beyond ~2^55 used to overflow (col-lo)*(2^bits-1) BEFORE the
    quotient clamp — Spark wrapped silently into a wrong cell while
    DuckDB raised, breaking both the edge-cell contract and dialect
    parity (ADVICE r06)."""
    key = Z.zorder_key(
        [Z.bucket("x", 0, 255, 8), Z.bucket("y", 0, 255, 8)], bits=8
    )
    big = (1 << 62) - 7
    pts = [(big, 0), (-big, 255), (big, big), (-big, -big), (128, big)]
    df = spark.createDataFrame(pts, "x long, y long")
    got_spark = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", F.expr(key.spark).alias("z")).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({x}::BIGINT,{y}::BIGINT)" for x, y in pts)
        + ") v(x, y)"
    )
    got_duck = {
        (r[0], r[1]): r[2]
        for r in con.execute(f"SELECT x, y, {key.duck} FROM t").fetchall()
    }
    for x, y in pts:
        want = _ref_key([min(max(x, 0), 255), min(max(y, 0), 255)], 8)
        assert got_spark[(x, y)] == want, (x, y)
        assert got_duck[(x, y)] == want, (x, y)


def test_compaction_clusters_by_zorder_key(spark, tmp_path):
    """cluster_by accepts the rendered key as a Column: a compaction
    pass re-lays fragmented partitions along the Z curve — content
    unchanged, every rewritten file monotone in the key, which is what
    parquet row-group pruning needs on BOTH interleaved dimensions."""
    import pyarrow.parquet as pq

    from etl_pulumi_aws_snowflake_spark.operators.warehouse import (
        merge_upsert_pruned,
    )
    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
        snapshot_compact,
        snapshot_read,
    )

    root = str(tmp_path / "snap")
    df = spark.createDataFrame(
        [(i, i % 3, (i * 7) % 64, (i * 13) % 64) for i in range(300)],
        "k bigint, p bigint, x bigint, y bigint",
    )
    snapshot_commit_partitioned(df, root, "p")
    # two pruned merges → live data spread over 3 dirs → compactable
    for key_p in ((0, 0), (1, 1)):
        batch = spark.createDataFrame(
            [(key_p[0], key_p[1], 1, 1, False)],
            "k bigint, p bigint, x bigint, y bigint, is_delete boolean",
        )
        merge_upsert_pruned(spark, root, batch, ["k"], "p", delete_col="is_delete")
    before = {
        tuple(r) for r in snapshot_read(spark, root).collect()
    }

    key = Z.zorder_key([Z.bucket("x", 0, 63, 6), Z.bucket("y", 0, 63, 6)], bits=6)
    v = snapshot_compact(spark, root, cluster_by=[F.expr(key.spark)])
    assert v is not None
    assert {tuple(r) for r in snapshot_read(spark, root).collect()} == before

    # the rewritten partition's single file must be z-monotone
    with open(os.path.join(root, v, "_MANIFEST.json")) as f:
        import json

        man = json.load(f)
    rewritten = [p for p, ver in man["entries"].items() if ver == v]
    assert rewritten
    for p in rewritten:
        d = os.path.join(root, v, "data", f"_p={p}")
        files = [fn for fn in os.listdir(d) if fn.endswith(".parquet")]
        assert len(files) == 1
        tbl = pq.read_table(os.path.join(d, files[0]), columns=["x", "y"])
        zs = [
            _ref_key([x, y], 6)
            for x, y in zip(tbl["x"].to_pylist(), tbl["y"].to_pylist())
        ]
        assert zs == sorted(zs)
        assert len(zs) >= 50


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ZPROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@_ZPROP
@given(
    pts=st.lists(
        st.tuples(st.integers(-50, 400), st.integers(-50, 400)),
        min_size=1,
        max_size=15,
    ),
    bits=st.integers(min_value=2, max_value=8),
)
def test_zorder_fuzz_both_dialects_match_reference(spark, pts, bits):
    """Randomized parity: arbitrary (possibly out-of-bounds) points and
    bit widths — Spark, DuckDB, and the Python reference must agree on
    every key.  Out-of-range inputs exercise the clamp AND the
    div-semantics edge (both SQL engines truncate, Python floors; after
    clamping to [0, 2^bits) the three provably coincide — this fuzz
    pins that argument)."""
    lo, hi = 0, 300
    n = (1 << bits) - 1
    key = Z.zorder_key([Z.bucket("x", lo, hi, bits), Z.bucket("y", lo, hi, bits)], bits=bits)
    df = spark.createDataFrame(pts, "x int, y int")
    got_s = [
        r.z
        for r in df.select(F.expr(key.spark).alias("z")).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({x},{y})" for x, y in pts)
        + ") v(x, y)"
    )
    got_d = [r[0] for r in con.execute(f"SELECT {key.duck} FROM t").fetchall()]

    def bkt(v):
        return min(max(((v - lo) * n) // (hi - lo), 0), n)

    want = [_ref_key([bkt(x), bkt(y)], bits) for x, y in pts]
    # Spark collect preserves the tiny single-partition input order;
    # compare as multisets anyway so the test never depends on it
    assert sorted(got_s) == sorted(want)
    assert sorted(got_d) == sorted(want)


@_ZPROP
@given(
    m=st.integers(min_value=1, max_value=3),
    qx=st.integers(min_value=0, max_value=7),
    qy=st.integers(min_value=0, max_value=7),
)
def test_aligned_boxes_are_contiguous_key_ranges(m, qx, qy):
    """The Z-curve guarantee clustering relies on, fuzzed in pure
    Python: every ALIGNED 2^m x 2^m box maps to one contiguous key
    range, so rows of such a box land in O(1) row-group runs after a
    z-clustered rewrite."""
    bits = 4
    side = 1 << m
    x0, y0 = (qx % (16 // side)) * side, (qy % (16 // side)) * side
    keys = sorted(
        _ref_key([x, y], bits)
        for x in range(x0, x0 + side)
        for y in range(y0, y0 + side)
    )
    assert keys == list(range(keys[0], keys[0] + side * side))
