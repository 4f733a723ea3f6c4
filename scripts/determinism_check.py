#!/usr/bin/env python3
"""Partition-invariance check for driver-checked queries.

The correctness driver runs queries in ITS OWN session — different
``spark.sql.shuffle.partitions`` / parallelism than our tests.  Any
query whose output depends on partitioning (tie-broken top-k,
first/last without total order) would pass locally and flake in the
driver.  This runs each of the first N registry entries under two
deliberately different session shapes and compares canonicalized rows.
Usage: python scripts/determinism_check.py [first_n] [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import SparkSession  # noqa: E402

from etl_pulumi_aws_snowflake_spark.queries import all_queries  # noqa: E402
from tests.oracle_check import _canon  # noqa: E402


def run_all(names, queries, sf_dir, master, shuffle_parts):
    spark = (
        SparkSession.builder.master(master)
        .appName(f"det_{shuffle_parts}")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    out = {}
    try:
        for name in names:
            df = queries[name](spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            out[name] = _canon(rows, df.columns)
            spark.catalog.clearCache()
    finally:
        spark.stop()
    return out


def main() -> None:
    import json

    first_n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    queries = all_queries()
    names = list(queries)[:first_n]
    t0 = time.perf_counter()
    a = run_all(names, queries, sf_dir, "local[32]", 32)
    b = run_all(names, queries, sf_dir, "local[5]", 7)
    bad = [n for n in names if a[n] != b[n]]
    for n in bad:
        diff = [(x, y) for x, y in zip(a[n], b[n]) if x != y]
        print(f"NONDETERMINISTIC {n}: {len(diff)} differing rows; first: {diff[:2]}")
    print(
        f"checked {len(names)} queries under (local[32],parts=32) vs "
        f"(local[5],parts=7): {len(names) - len(bad)} stable, {len(bad)} unstable "
        f"[{time.perf_counter() - t0:.0f}s]"
    )
    out = ROOT / "scripts" / "determinism_report.json"
    out.write_text(json.dumps({
        "checked": len(names),
        "stable": len(names) - len(bad),
        "unstable": sorted(bad),
        "sf_dir": sf_dir,
        "sessions": ["local[32]/parts=32", "local[5]/parts=7"],
        "names": names,
    }, indent=1))
    print(f"wrote {out}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
