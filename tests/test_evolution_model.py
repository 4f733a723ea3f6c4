"""Model-based property test for ADDITIVE SCHEMA EVOLUTION in the
snapshot protocol: random commit histories that widen the schema
mid-stream, interleaved with pruned rewrites and compaction.

The modeled semantics (exactly Delta mergeSchema's):

- a partition physically rewritten at-or-after the evolution point
  stores its `w` values; a partition carried forward by reference
  keeps its pre-evolution files and READS as w=NULL (the
  manifest-schema-pinned scan null-fills);
- compaction rewrites carried partitions through a live read, so a
  null-filled w is PERSISTED as NULL — content under the live schema
  never changes;
- time travel to a pre-evolution version shows the NARROW schema
  (each version pins its own manifest schema).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import LongType, StructField, StructType


@st.composite
def _evolution_history(draw):
    """full narrow commit → a few narrow pruned commits → evolution →
    wide pruned commits and compactions, over 3 partitions."""
    parts = [0, 1, 2]
    steps = [("full", {p: draw(st.integers(0, 99)) for p in parts})]
    for _ in range(draw(st.integers(0, 2))):
        changed = draw(
            st.lists(st.sampled_from(parts), min_size=1, max_size=2, unique=True)
        )
        steps.append(("narrow", {p: draw(st.integers(0, 99)) for p in changed}))
    n_wide = draw(st.integers(1, 3))
    for _ in range(n_wide):
        if draw(st.integers(0, 3)) == 0:
            steps.append(("compact", {}))
            continue
        changed = draw(
            st.lists(st.sampled_from(parts), min_size=1, max_size=2, unique=True)
        )
        steps.append(
            (
                "wide",
                {
                    p: (draw(st.integers(0, 99)), draw(st.integers(100, 199)))
                    for p in changed
                },
            )
        )
    return steps


_NARROW = StructType([StructField("p", LongType()), StructField("v", LongType())])
_WIDE = StructType(
    [
        StructField("p", LongType()),
        StructField("v", LongType()),
        StructField("w", LongType(), True),
    ]
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(_evolution_history())
def test_snapshot_evolution_model_property(spark, case):
    """After every step: the live read equals the model (w = the value
    stored by the partition's LAST physical rewrite; None if that
    rewrite predates evolution), every readable version reads back its
    own commit-time state AND schema (pre-evolution versions stay
    narrow), and compaction changes neither."""
    import pytest

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        snapshot_commit_partitioned,
        snapshot_compact,
        snapshot_read,
        snapshot_versions,
    )

    root = tempfile.mkdtemp(prefix="evo_model_prop_")
    shutil.rmtree(root, ignore_errors=True)
    try:
        # model: p -> (v, w_physical)  (w_physical None until a wide
        # rewrite of that partition)
        table: dict[int, tuple[int, int | None]] = {}
        model: dict[str, dict] = {}
        wide_model: dict[str, bool] = {}
        evolved = False
        for kind, vals in case:
            if kind == "compact":
                ver = snapshot_compact(spark, root, keep=2)
                if ver is not None:
                    model[ver] = dict(table)
                    wide_model[ver] = evolved
            elif kind == "full":
                table = {p: (v, None) for p, v in vals.items()}
                df = spark.createDataFrame(
                    sorted((p, v) for p, (v, _) in table.items()), _NARROW
                )
                ver = snapshot_commit_partitioned(df, root, "p", keep=2)
                model[ver] = dict(table)
                wide_model[ver] = False
            elif kind == "narrow":
                table = dict(table)
                table.update({p: (v, None) for p, v in vals.items()})
                df = spark.createDataFrame(sorted(vals.items()), _NARROW)
                ver = snapshot_commit_partitioned(
                    df, root, "p", changed_values=list(vals), keep=2
                )
                model[ver] = dict(table)
                wide_model[ver] = False
            else:  # wide
                evolved = True
                table = dict(table)
                table.update({p: (v, w) for p, (v, w) in vals.items()})
                df = spark.createDataFrame(
                    sorted((p, v, w) for p, (v, w) in vals.items()), _WIDE
                )
                ver = snapshot_commit_partitioned(
                    df, root, "p", changed_values=list(vals), keep=2
                )
                model[ver] = dict(table)
                wide_model[ver] = True

            # live read == model (schema is checked per-version below)
            out = snapshot_read(spark, root)
            live = {
                r.p: (r.v, getattr(r, "w", None)) for r in out.collect()
            }
            assert live == table, (live, table)

            # every readable version: exact commit-time rows AND schema
            on_disk = {d for d in os.listdir(root) if d.startswith("v-")}
            readable = snapshot_versions(root)
            assert ver is None or ver in readable
            for rv in readable:
                vout = snapshot_read(spark, root, version=rv)
                want_cols = ["p", "v", "w"] if wide_model[rv] else ["p", "v"]
                assert vout.columns == want_cols, (rv, vout.columns)
                got = {
                    r.p: (r.v, getattr(r, "w", None)) for r in vout.collect()
                }
                assert got == model[rv], (rv, got, model[rv])
            for dv in sorted(on_disk - set(readable)):
                with pytest.raises(ValueError):
                    snapshot_read(spark, root, version=dv)
    finally:
        shutil.rmtree(root, ignore_errors=True)
