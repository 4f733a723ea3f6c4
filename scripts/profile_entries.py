#!/usr/bin/env python3
"""Per-entry profiler for the optimization rounds (guide §1: measure
first).  For each requested registry entry: runs it through the noop
sink exactly like bench.py (warm rep excluded, then N timed reps) and
records, per rep, the Spark JOB COUNT and task count via a job group +
statusTracker — the fixed per-job latency at bench scale (tiny sf0.1
inputs on local[32]) makes job count the first-order cost driver, and
the 100 TB reading of the same number is "how many driver round trips
/ barriers does this operator take".

Usage: python scripts/profile_entries.py entry [entry ...]
       python scripts/profile_entries.py --top  # the expensive preset

Output: one JSON line per entry to stdout and a combined report at
scripts/profile_report.json (not committed by default — a measuring
tool, not an artifact).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_pulumi_aws_snowflake_spark import get_spark  # noqa: E402
from etl_pulumi_aws_snowflake_spark.queries import all_queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROFILE_REPS", "3"))

#: The bench entries worth profiling first: everything ≥ ~1 s in the
#: committed quiet run, costliest first.
TOP = [
    "curation_pipeline_e2e",
    "sim_ivf_topk_pq_rerank",
    "curation_pipeline_indexed_e2e",
    "sim_ivf_topk_pq_residual",
    "search_hybrid_rrf_indexed",
    "mm_decode_jpeg",
    "cdc_merge_mor_e2e",
    "sim_ivf_topk_quantized_rerank",
    "text_bpe_tokenize",
    "search_hybrid_rrf",
    "search_bm25_indexed",
    "dedup_survivors",
    "web_charset_quarantine",
    "web_pipeline_e2e",
    "decontaminate_semantic",
]


def profile(spark, name, fn):
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def once(tag):
        # Jobs submitted from operator-internal driver THREADS (the
        # §2.6 concurrent member commits) don't inherit this thread's
        # job group — they land group-less.  The profiler runs entries
        # serially in an exclusive session, so any NEW group-less job
        # in the window belongs to this entry: count both.
        before_ungrouped = set(tracker.getJobIdsForGroup(None))
        sc.setJobGroup(tag, f"profile:{name}")
        start = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - start
        sc.setJobGroup(None, None)
        job_ids = list(tracker.getJobIdsForGroup(tag)) + [
            j
            for j in tracker.getJobIdsForGroup(None)
            if j not in before_ungrouped
        ]
        ntasks = 0
        nstages = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    nstages += 1
                    ntasks += si.numTasks
        return wall, len(job_ids), nstages, ntasks

    once(f"{name}-warm")
    reps = [once(f"{name}-r{i}") for i in range(REPS)]
    walls = [r[0] for r in reps]
    best = min(reps, key=lambda r: r[0])
    return {
        "entry": name,
        "wall_min": round(min(walls), 4),
        "wall_med": round(sorted(walls)[len(walls) // 2], 4),
        "jobs": best[1],
        "stages": best[2],
        "tasks": best[3],
    }


def main() -> None:
    args = sys.argv[1:]
    names = TOP if (not args or args == ["--top"]) else args
    queries = all_queries()
    spark = get_spark(app_name="profile")
    out = []
    try:
        for name in names:
            if name not in queries:
                print(f"# unknown entry {name!r}", file=sys.stderr)
                continue
            rec = profile(spark, name, queries[name])
            out.append(rec)
            print(json.dumps(rec))
            spark.catalog.clearCache()
    finally:
        spark.stop()
    Path(__file__).with_name("profile_report.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )


if __name__ == "__main__":
    main()
