#!/usr/bin/env python3
"""Targeted oracle mirror: run ONLY the named entries (argv[1] =
comma-list or a @file with one name per line) through the driver's
compare at sf0.01.  Used in optimization rounds to prove an operator
rewrite is hash-identical on every affected entry without paying the
full 206-entry sweep."""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from etl_pulumi_aws_snowflake_spark import get_spark  # noqa: E402
from etl_pulumi_aws_snowflake_spark.queries import all_oracles, all_queries  # noqa: E402
from tests.oracle_check import compare  # noqa: E402


def main() -> None:
    spec = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    if spec.startswith("@"):
        names = [
            ln.strip()
            for ln in Path(spec[1:]).read_text().splitlines()
            if ln.strip()
        ]
    else:
        names = [n for n in spec.split(",") if n]
    queries, oracles = all_queries(), all_oracles()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    spark = get_spark(app_name="mirror_subset")
    report: dict[str, dict] = {}
    try:
        for name in names:
            t0 = time.perf_counter()
            try:
                if name in oracles:
                    r = compare(spark, sf_dir, queries[name], oracles[name])
                else:
                    n = queries[name](spark, sf_dir).count()
                    r = {"ok": n >= 0, "spark_rows": n, "note": "rows_only"}
            except Exception:
                r = {"ok": False, "err": traceback.format_exc(limit=3)}
            r["sec"] = round(time.perf_counter() - t0, 2)
            report[name] = r
            print(
                f"{'ok' if r.get('ok') else 'FAIL':4s} {name:36s}"
                f" {r['sec']:7.2f}s",
                flush=True,
            )
            spark.catalog.clearCache()
    finally:
        spark.stop()
    bad = sorted(k for k, v in report.items() if not v.get("ok"))
    print(json.dumps({"total": len(report), "bad": bad}))
    if bad:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
