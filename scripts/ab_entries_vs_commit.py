#!/usr/bin/env python3
"""Interleaved per-ENTRY A/B of HEAD vs a pinned commit (VERDICT r18
#4: the band-ambiguous touched entries need full-entry interleaved
re-measurement, not cross-session bench rows).  Each arm-round is a
fresh JVM running ONLY the target entries (warm rep + N timed reps,
noop sink, clearCache between entries — bench.py's methodology), and
arms alternate A B A B ... so host drift cancels.

Usage: python scripts/ab_entries_vs_commit.py <commit> <entry,entry,...> [rounds]
Writes scripts/ab_entries_report.json and prints one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
COMMIT = sys.argv[1]
ENTRIES = sys.argv[2].split(",")
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
WT = REPO / ".ab_prev"

RUNNER = r"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path.cwd()))
from etl_pulumi_aws_snowflake_spark import get_spark
from etl_pulumi_aws_snowflake_spark.queries import all_queries
import bench
names = sys.argv[1].split(",")
reps = int(sys.argv[2])
queries = all_queries()
spark = get_spark(app_name="ab_entries")
out = {}
try:
    cal = bench._calibration(spark)
    for name in names:
        fn = queries[name]
        fn(spark, bench.SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, bench.SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        out[name] = runs
    out["_cal"] = round(min(cal), 4)
finally:
    spark.stop()
print("ABJSON:" + json.dumps(out))
"""


def run_arm(cwd: Path, reps: int = 3) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", RUNNER, ",".join(ENTRIES), str(reps)],
        cwd=cwd,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("ABJSON:"):
            return json.loads(line[len("ABJSON:"):])
    raise RuntimeError(f"no ABJSON from {cwd}:\n{p.stdout[-500:]}\n{p.stderr[-800:]}")


def main() -> None:
    if not (WT / "bench.py").exists():
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(WT), COMMIT],
            cwd=REPO,
            check=True,
        )
    runs = []
    try:
        for i in range(ROUNDS):
            for arm, cwd in (("prev", WT), ("head", REPO)):
                doc = run_arm(cwd)
                runs.append({"arm": arm, **doc})
                print(f"# round {i} {arm}: cal={doc['_cal']} " + json.dumps(
                    {n: doc[n] for n in ENTRIES}), file=sys.stderr)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", str(WT)],
            cwd=REPO,
            check=False,
        )
    report = {"commit": COMMIT, "rounds": ROUNDS, "entries": {}}
    for name in ENTRIES:
        per = {}
        for arm in ("prev", "head"):
            ts = sorted(
                t for r in runs if r["arm"] == arm for t in r[name]
            )
            per[arm] = {"min": ts[0], "med": ts[len(ts) // 2], "all": ts}
        per["head_over_prev_med"] = round(per["head"]["med"] / per["prev"]["med"], 3)
        report["entries"][name] = per
    report["cals"] = {
        arm: [r["_cal"] for r in runs if r["arm"] == arm]
        for arm in ("prev", "head")
    }
    (REPO / "scripts" / "ab_entries_report.json").write_text(
        json.dumps(report, indent=1) + "\n"
    )
    print(json.dumps({
        n: report["entries"][n]["head_over_prev_med"] for n in ENTRIES
    }))


if __name__ == "__main__":
    main()
