#!/usr/bin/env python3
"""Measure Hilbert vs Morton row-group pruning through the engine's OWN
layout machinery (VERDICT r07 #1: make the Moon-et-al. citation a
measurement on this engine).

Path exercised end-to-end, identical for both curves except the
``cluster_by`` key handed to :func:`snapshot_compact`:

1. ``snapshot_commit_partitioned(events, root, "event_type")`` — v1;
2. re-commit ONE partition — v2, leaving the other partitions carried
   (fragmented), exactly the state a pruned MERGE leaves behind;
3. ``snapshot_compact(cluster_by=[key])`` with small parquet row
   groups (``parquet.block.size``) so each rewritten file holds many;
4. for each 2-D probe box: ``snapshot_read(skip_by=...)`` selects the
   partition set (manifest zone maps), then each surviving file's
   parquet footer min/max decides which ROW GROUPS a pushed-down
   filter would scan — the exact stats Spark's parquet row-group
   pruning reads, counted here deterministically from the footers
   instead of scraped from scan metrics.

Both curves see the same grid: ``bucket()`` quantizes user_id x
event_id into 2^bits cells per side; Morton = the dual-dialect
``zorder_key`` expression, Hilbert = ``hilbert_key_pandas`` over the
SAME bucket expressions (the documented maintenance-time scale path).

Prints one JSON line: per-probe {touched, total} row-group counts per
curve plus a rows-sanity field proving both layouts return identical
matching-row counts.  Results recorded in SCALE.md.

Usage: python scripts/hilbert_vs_morton.py [sf_dir] [bits] [block_bytes]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from etl_pulumi_aws_snowflake_spark import get_spark  # noqa: E402
from etl_pulumi_aws_snowflake_spark.functions import hilbert, zorder  # noqa: E402
from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (  # noqa: E402
    snapshot_commit_partitioned,
    snapshot_compact,
    snapshot_read,
)

#: Probe boxes (raw-value ranges, inclusive) — squares of three sizes
#: plus the two 1-D band shapes, the cases where curve choice matters.
PROBES = {
    "square_3pct": {"user_id": (700, 745), "event_id": (40000, 43000)},
    "square_10pct": {"user_id": (300, 450), "event_id": (20000, 30000)},
    "square_25pct": {"user_id": (400, 775), "event_id": (50000, 75000)},
    "band_user": {"user_id": (700, 760), "event_id": (0, 99999)},
    "band_event": {"user_id": (0, 1499), "event_id": (50000, 52000)},
}


def _cluster_keys(bits: int):
    bx = zorder.bucket("user_id", 0, 1500, bits)
    by = zorder.bucket("event_id", 0, 100_000, bits)
    morton = F.expr(zorder.zorder_key([bx, by], bits=bits).spark)
    hil = hilbert.hilbert_key_pandas(
        F.expr(bx.spark), F.expr(by.spark), bits=bits
    )
    return {"morton": morton, "hilbert": hil}


def _build(spark, root: str, key, sf_dir: str) -> list[str]:
    """Commit -> fragment -> compact with ``cluster_by=[key]``; return
    the partition values the compaction rewrote (the measured set)."""
    events = spark.read.parquet(
        str(Path(sf_dir) / "events.parquet")
    ).select("event_id", "ts", "user_id", "event_type", "value")
    snapshot_commit_partitioned(events, root, "event_type")
    # Re-commit the smallest partition so every OTHER partition is
    # carried -> fragmented -> rewritten clustered by the compaction.
    pinned = "error"
    snapshot_commit_partitioned(
        events.filter(F.col("event_type") == pinned),
        root,
        "event_type",
        changed_values=[pinned],
    )
    v = snapshot_compact(
        spark, root, cluster_by=[key], max_versions_referenced=1
    )
    assert v is not None, "compaction unexpectedly a no-op"
    types = [r.event_type for r in events.select("event_type").distinct().collect()]
    return sorted(t for t in types if t != pinned)


def _probe(spark, root: str, parts: list[str], box: dict) -> dict:
    df = snapshot_read(
        spark,
        root,
        partition_values=parts,
        skip_by={c: b for c, b in box.items()},
    )
    touched = total = 0
    for f in df.inputFiles():
        md = pq.ParquetFile(f.removeprefix("file:")).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            total += 1
            hit = True
            for col, (lo, hi) in box.items():
                st = rg.column(idx[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no evidence — a scanner must read it
                if st.max < lo or st.min > hi:
                    hit = False
                    break
            touched += hit
    cond = None
    for col, (lo, hi) in box.items():
        c = F.col(col).between(lo, hi)
        cond = c if cond is None else cond & c
    return {"touched": touched, "total": total, "rows": df.filter(cond).count()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 64 * 1024
    spark = get_spark(app_name="hilbert_vs_morton")
    # Small row groups at write time so each ~20k-row partition file
    # carries enough groups for the footer-stats comparison to resolve.
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.setInt("parquet.block.size", block)
    out: dict = {"sf_dir": sf_dir, "bits": bits, "block_bytes": block, "curves": {}}
    tmp = tempfile.mkdtemp(prefix="hvm-")
    try:
        for curve, key in _cluster_keys(bits).items():
            root = str(Path(tmp) / curve)
            parts = _build(spark, root, key, sf_dir)
            out["curves"][curve] = {
                name: _probe(spark, root, parts, box)
                for name, box in PROBES.items()
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    for name in PROBES:
        m, h = out["curves"]["morton"][name], out["curves"]["hilbert"][name]
        assert m["rows"] == h["rows"], (name, m, h)  # layout-invariant content
    print(json.dumps(out))


if __name__ == "__main__":
    main()
