#!/usr/bin/env python3
"""Interleaved A/B for the sim_ivf_topk / sim_ivf_topk_nlists serve
regression (VERDICT r18 #1): r18's `_seeds_assigned_once` re-emits the
collected seed rows as a LOCAL frame via `spark.createDataFrame(list)`,
which compiles to applySchemaToPythonRDD — a Python-RDD round trip the
routing join then executes per rep.  Driver read the two entries at
0.59x/0.57x vs r17 (beyond the 15% host band).

Variants, each the FULL entry (construction + noop write, bench's
timed region), interleaved within one session so host drift cancels:

  r17      seed pick re-runs per consumer (2 corpus-pick subtrees,
           no local frame) — the r17 spelling
  now      HEAD: local seed frame via createDataFrame(list of tuples)
  arrow    local seed frame via createDataFrame(pandas) (Arrow path)
  persist  seed frame deferred_persist'ed; collect materializes it;
           routing reads the cache
  closure  probes routed in-closure via _assign_arrow(seed_rows) —
           no seed frame, no broadcast join, no window

Usage: python scripts/ab_ivf_seed_frame.py [rounds]
Prints one JSON line; full doc to scripts/ab_ivf_seed_frame_report.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from etl_pulumi_aws_snowflake_spark import get_spark  # noqa: E402
from etl_pulumi_aws_snowflake_spark.cache import (  # noqa: E402
    deferred_persist,
    release_deferred,
)
from etl_pulumi_aws_snowflake_spark.operators import similarity as S  # noqa: E402
from etl_pulumi_aws_snowflake_spark.queries._util import t  # noqa: E402

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SF_DIR = bench.SF_DIR
PROBE_STRIDE = 50
NLISTS = 10


def _probes(spark):
    emb = t(spark, SF_DIR, "embeddings")
    return emb.filter(F.col("vec_id") % PROBE_STRIDE == 0), emb


def _topk_with(spark, seed_mode: str, nlists=None, seed_stride=50):
    """sim_ivf_topk's body with the seed-table spelling swapped."""
    probes, corpus = _probes(spark)
    seeds_plan = S._seed_frame(corpus, seed_stride, None, nlists)
    if seed_mode == "r17":
        seed_rows = S._collect_seeds(seeds_plan)
        seeds = seeds_plan  # lazy: the routing join re-runs the pick
    elif seed_mode == "now":
        seed_rows = S._collect_seeds(seeds_plan)
        seeds = S._seed_rows_frame(spark, seed_rows)
    elif seed_mode == "arrow":
        import pandas as pd

        seed_rows = S._collect_seeds(seeds_plan)
        pdf = pd.DataFrame(
            {
                "seed_id": [r["seed_id"] for r in seed_rows],
                "v": [list(r["v"]) for r in seed_rows],
                "nrm": [r["nrm"] for r in seed_rows],
            }
        )
        seeds = spark.createDataFrame(
            pdf, "seed_id long, v array<double>, nrm double"
        )
    elif seed_mode == "persist":
        seeds = deferred_persist(seeds_plan)
        seed_rows = S._collect_seeds(seeds)
    elif seed_mode == "closure":
        seed_rows = S._collect_seeds(seeds_plan)
        assigned = S._assign_arrow(S._prep(corpus), seed_rows, 1)
        routed = S._assign_arrow(
            S._prep(probes), seed_rows, 2
        ).withColumnRenamed("vec_id", "probe_id")
        return S._rank_candidates(routed, assigned, 3)
    else:
        raise ValueError(seed_mode)
    assigned = S._assign_arrow(S._prep(corpus), seed_rows, 1)
    return S._rank_candidates(S._route_probes(probes, seeds, 2), assigned, 3)


VARIANTS = ("r17", "now", "arrow", "persist", "closure")


def main() -> None:
    spark = get_spark(app_name="ab_ivf_seed_frame")
    out: dict = {"sf_dir": SF_DIR, "rounds": ROUNDS, "entries": {}}
    try:
        out["calibration_pre"] = round(min(bench._calibration(spark)), 4)
        for entry, kw in (
            ("sim_ivf_topk", {"seed_stride": PROBE_STRIDE}),
            ("sim_ivf_topk_nlists", {"nlists": NLISTS}),
        ):
            times: dict[str, list[float]] = {v: [] for v in VARIANTS}
            # identity gate: every variant must produce the same rows
            ref = None
            for v in VARIANTS:
                rows = sorted(
                    map(tuple, _topk_with(spark, v, **kw).collect())
                )
                release_deferred(spark)
                spark.catalog.clearCache()
                if ref is None:
                    ref = rows
                elif rows != ref:
                    raise SystemExit(
                        f"variant {v!r} diverges on {entry}: "
                        f"{rows[:3]} vs {ref[:3]}"
                    )
            # warm each variant once (JIT/footer caches), excluded
            for v in VARIANTS:
                _topk_with(spark, v, **kw).write.format("noop").mode(
                    "overwrite"
                ).save()
                release_deferred(spark)
                spark.catalog.clearCache()
            for _ in range(ROUNDS):
                for v in VARIANTS:
                    start = time.perf_counter()
                    _topk_with(spark, v, **kw).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    times[v].append(round(time.perf_counter() - start, 4))
                    release_deferred(spark)
                    spark.catalog.clearCache()
            out["entries"][entry] = {
                v: {
                    "min": min(ts),
                    "med": sorted(ts)[len(ts) // 2],
                    "all": ts,
                }
                for v, ts in times.items()
            }
            print(f"# {entry}: " + json.dumps(
                {v: out['entries'][entry][v]['med'] for v in VARIANTS}
            ), file=sys.stderr)
        out["calibration_post"] = round(min(bench._calibration(spark)), 4)
    finally:
        spark.stop()
    Path(__file__).with_name("ab_ivf_seed_frame_report.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(json.dumps({
        e: {v: d[v]["med"] for v in VARIANTS}
        for e, d in out["entries"].items()
    }))


if __name__ == "__main__":
    main()
