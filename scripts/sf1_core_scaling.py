#!/usr/bin/env python3
"""Core-scaling measurement at sf1 (VERDICT r18 #9): run compute-bound
entries against the synthetic sf1 fixture (scripts/make_sf1.py) at two
core counts, fresh JVM per arm, noop sink, interleaved 8/32 rounds so
host drift cancels.  Writes scripts/sf1_scaling_report.json.

Usage: python scripts/sf1_core_scaling.py [entry,entry,...] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF1 = os.environ.get("SF1_DIR", "/tmp/sf1")
ENTRIES = (
    sys.argv[1].split(",")
    if len(sys.argv) > 1
    else ["mm_decode_jpeg", "sim_ivf_topk_pq_rerank"]
)
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPU_ARMS = (8, 32)

RUNNER = r"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path.cwd()))
from etl_pulumi_aws_snowflake_spark import get_spark
from etl_pulumi_aws_snowflake_spark.queries import all_queries
names, cpus, sf_dir = sys.argv[1].split(","), int(sys.argv[2]), sys.argv[3]
queries = all_queries()
spark = get_spark(app_name=f"sf1x{cpus}", cpus=cpus)
out = {}
try:
    for name in names:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
finally:
    spark.stop()
print("SCJSON:" + json.dumps(out))
"""


def run_arm(cpus: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, ",".join(ENTRIES), str(cpus), SF1],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("SCJSON:"):
            return json.loads(line[len("SCJSON:"):])
    raise RuntimeError(f"no SCJSON (cpus={cpus}):\n{p.stdout[-500:]}\n{p.stderr[-800:]}")


def main() -> None:
    runs: list[dict] = []
    for i in range(ROUNDS):
        for cpus in CPU_ARMS:
            doc = run_arm(cpus)
            runs.append({"cpus": cpus, **doc})
            print(f"# round {i} cpus={cpus}: {json.dumps(doc)}", file=sys.stderr)
    report = {"sf_dir": SF1, "rounds": ROUNDS, "entries": {}}
    for name in ENTRIES:
        per = {}
        for cpus in CPU_ARMS:
            ts = sorted(r[name] for r in runs if r["cpus"] == cpus)
            per[f"c{cpus}"] = {"min": ts[0], "med": ts[len(ts) // 2], "all": ts}
        per["speedup_32_over_8"] = round(
            per["c8"]["med"] / per["c32"]["med"], 2
        )
        report["entries"][name] = per
    (REPO / "scripts" / "sf1_scaling_report.json").write_text(
        json.dumps(report, indent=1) + "\n"
    )
    print(json.dumps(
        {n: report["entries"][n]["speedup_32_over_8"] for n in ENTRIES}
    ))


if __name__ == "__main__":
    main()
