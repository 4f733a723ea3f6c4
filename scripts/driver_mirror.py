#!/usr/bin/env python3
"""Local replica of the external correctness driver.

Runs EVERY registered query and its DuckDB oracle at sf0.01 (the
driver's scale) through tests/oracle_check.compare — which uses the
driver's own pandas-sort canonicalization — and prints one JSON report.
Usage: python scripts/driver_mirror.py [first_n] [sf_dir] [report_name]
``report_name`` defaults to driver_mirror_report.json; the sf0.001
smoke sweep writes smoke_mirror_report.json so both artifacts persist
(COVERAGE.md's sweep paragraphs are guarded against them by
tests/test_docs.py).
"""

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
    first_n = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    queries, oracles = all_queries(), all_oracles()
    names = list(queries)
    if first_n:
        names = names[:first_n]
    spark = get_spark(app_name="driver_mirror")
    report: dict[str, dict] = {}
    t_total = time.perf_counter()
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
            status = "ok" if r.get("ok") else "FAIL"
            print(f"{status:4s} {name:32s} {r['sec']:7.2f}s", flush=True)
            spark.catalog.clearCache()
    finally:
        spark.stop()
    bad = {k: v for k, v in report.items() if not v.get("ok")}
    print(json.dumps({
        "total": len(report),
        "ok": len(report) - len(bad),
        "fail": sorted(bad),
        "total_sec": round(time.perf_counter() - t_total, 1),
    }))
    report_name = (
        sys.argv[3] if len(sys.argv) > 3 else "driver_mirror_report.json"
    )
    out = ROOT / "scripts" / report_name
    payload = dict(report)
    payload["_meta"] = {"sf_dir": sf_dir, "total": len(report),
                        "ok": len(report) - len(bad)}
    out.write_text(json.dumps(payload, indent=1, default=str))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
