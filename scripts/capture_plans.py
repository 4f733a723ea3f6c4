#!/usr/bin/env python3
"""Capture ``.explain('formatted')`` for registry entries into
``plans/<round>/<entry>_<tag>.txt`` (optimization-round deliverable).
The round directory comes from ``$PLANS_ROUND`` (default ``r19``).

Usage: python scripts/capture_plans.py <tag> entry [entry ...]

Note: entries that build indexes / collect scalars at call time DO run
that work here — the captured plan is the returned (serve) DataFrame's.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from etl_pulumi_aws_snowflake_spark import get_spark  # noqa: E402
from etl_pulumi_aws_snowflake_spark.queries import all_queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    outdir = REPO / "plans" / os.environ.get("PLANS_ROUND", "r19")
    outdir.mkdir(parents=True, exist_ok=True)
    queries = all_queries()
    spark = get_spark(app_name=f"plans-{tag}")
    try:
        for name in names:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (outdir / f"{name}_{tag}.txt").write_text(plan)
            print(f"wrote {outdir.relative_to(REPO)}/{name}_{tag}.txt")
            spark.catalog.clearCache()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
