#!/usr/bin/env python3
"""Same-JVM A/B for cross-round bench movers (VERDICT r09 #3).

The repo's discipline (q3 r04, suite r05, win_topk r06, jaccard r07):
a >1.5×-band cross-round bench move on untouched code is NOT evidence
until one same-JVM A/B separates harness-order effects from host
noise.  Protocol, exactly the r07 jaccard shape:

- one session, bench.py's config;
- phase SUITE: replay the bench harness context — warm ALL headline
  queries, then 5 reps of every query PRECEDING the target in HEADLINE
  order with ``clearCache()`` between (the exact deferred-persist, AQE
  and JIT state the suite leaves behind) — then n reps of the target;
- phase ISO: ``clearCache()``, warm the target once, n reps alone;
- the fixed-work calibration row brackets host speed within the run.

If SUITE ≈ ISO and both sit inside the query's historical band, the
cross-round reading was host-window noise — no code action.  Targets
default to round 10's two movers (dedup_minhash_lsh 1.68× normalized
r8→r9, q3_shipping_priority 1.46×).

Usage: python scripts/ab_check.py [target ...]
Prints one JSON line; findings recorded in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from etl_pulumi_aws_snowflake_spark import get_spark  # noqa: E402
from etl_pulumi_aws_snowflake_spark.queries import all_queries  # noqa: E402

REPS = 7
DEFAULT_TARGETS = ("dedup_minhash_lsh", "q3_shipping_priority")


def _run(spark, fn) -> float:
    start = time.perf_counter()
    fn(spark, bench.SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def _reps(spark, fn, n=REPS) -> list[float]:
    return [round(_run(spark, fn), 4) for _ in range(n)]


def main() -> None:
    targets = sys.argv[1:] or list(DEFAULT_TARGETS)
    queries = all_queries()
    spark = get_spark(app_name="ab_check")
    out: dict = {"sf_dir": bench.SF_DIR, "reps": REPS, "targets": {}}
    try:
        out["calibration_pre"] = round(min(bench._calibration(spark)), 4)
        for target in targets:
            res: dict = {}
            # SUITE: the exact state bench.py leaves at the target's slot
            for name in bench.HEADLINE:
                queries[name](spark, bench.SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            for name in bench.HEADLINE:
                if name == target:
                    break
                for _ in range(5):
                    _run(spark, queries[name])
                spark.catalog.clearCache()
            res["suite"] = sorted(_reps(spark, queries[target]))
            spark.catalog.clearCache()
            # ISO: the target alone
            _run(spark, queries[target])  # warm
            res["iso"] = sorted(_reps(spark, queries[target]))
            spark.catalog.clearCache()
            res["suite_min"], res["iso_min"] = res["suite"][0], res["iso"][0]
            res["suite_median"] = res["suite"][len(res["suite"]) // 2]
            res["iso_median"] = res["iso"][len(res["iso"]) // 2]
            out["targets"][target] = res
            print(f"  {target}: {res}", file=sys.stderr)
        out["calibration_post"] = round(min(bench._calibration(spark)), 4)
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
