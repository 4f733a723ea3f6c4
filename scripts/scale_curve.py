#!/usr/bin/env python3
"""Measured scale-up curve (VERDICT r08 #2): the 5 most expensive ops
at sf0.1 and builder-generated ~sf0.3 / ~sf1, one JVM, recording
wall-time ratios (expect ~linear in data) and driver-side collected
rows (expect FLAT — |strata| scalars, K partial-top-k rows, centroid
sets — never proportional to data).

Data: 10 key-shifted copies of /root/testdata/sf0.1 documents/
embeddings into a builder-owned dir (never touching the read-only
testdata).  Copy ``i > 0`` rewrites every word of ``text`` with a
copy-specific prefix so the duplicate/shingle structure of each copy
mirrors sf0.1 INTERNALLY while copies never near-match each other —
10x data must mean ~10x dup pairs, not the 45x cross-copy pair blowup
verbatim copies would manufacture (which would measure the fixture,
not the engine).  ``doc_id``/``vec_id`` shift per copy; the ``lang``
distribution is preserved so |strata| stays constant — exactly the
"driver work flat in data size" claim under test.

``sim_cosine_topk_blas`` is measured as the OPERATOR with a FIXED
probe set (copy-0 probes only): the registry entry derives probes from
the corpus, so at 10x data the entry does 100x dot products by query
shape — inherent to both sides scaling, not an engine property.  The
operator claim is linear-in-corpus with probes broadcast; that is what
gets measured.

Driver-collect instrumentation: DataFrame.collect is wrapped for the
duration of each timed run; the row counts it accumulates ARE the
operator-internal bounded collects (counts passes, survivor audits,
centroids).  Materialization is a noop-sink write, so no final-result
rows pollute the metric.

Usage: python scripts/scale_curve.py [--quick]
Writes scripts/scale_curve_report.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE = "/root/testdata/sf0.1"
OUT = Path(os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale"))
MULTS = (3, 10)
RUNS = 3


def build_scaled(mult: int) -> str:
    """DuckDB-generate the x``mult`` dir (idempotent)."""
    import duckdb

    out = OUT / f"x{mult}"
    done = out / "_DONE"
    if done.exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT d.doc_id + i.i * 10000000 AS doc_id,
                   CASE WHEN i.i = 0 THEN d.text
                        ELSE regexp_replace(d.text, '(\\w+)',
                                            'c' || i.i || '\\1', 'g')
                   END AS text,
                   d.lang, d.source, d.n_chars
            FROM read_parquet('{BASE}/documents.parquet') d
            CROSS JOIN (SELECT unnest(range({mult})) AS i) i
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT e.vec_id + i.i * 1000000 AS vec_id, e.embedding, e.label
            FROM read_parquet('{BASE}/embeddings.parquet') e
            CROSS JOIN (SELECT unnest(range({mult})) AS i) i
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    done.touch()
    return str(out)


def _fixed_probes(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_pulumi_aws_snowflake_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 1_000_000)
        ),
        emb,
    )


def blas_fixed_probes(spark, sf_dir):
    from etl_pulumi_aws_snowflake_spark.operators import similarity as S

    probes, emb = _fixed_probes(spark, sf_dir)
    return S.cosine_topk_blas(probes, emb, k=5).select(
        "probe_id", "rank", "vec_id"
    )


def ivf_fixed_probes(spark, sf_dir):
    from etl_pulumi_aws_snowflake_spark.operators import similarity as S

    probes, emb = _fixed_probes(spark, sf_dir)
    return S.ivf_topk(probes, emb, k=3, nprobe=2, seed_stride=50)


def ops():
    from etl_pulumi_aws_snowflake_spark.queries import all_queries

    q = all_queries()
    return {
        "dedup_survivors": q["dedup_survivors"],
        "dedup_ngram_jaccard": q["dedup_ngram_jaccard"],
        "dedup_minhash_lsh": q["dedup_minhash_lsh"],
        "pack_sequences": q["pack_sequences"],
        "sample_temperature_mixture": q["sample_temperature_mixture"],
        "sim_cosine_topk_blas_fixed_probes": blas_fixed_probes,
        "sim_ivf_topk_fixed_probes": ivf_fixed_probes,
    }


class CollectMeter:
    """Counts rows/calls through DataFrame.collect while active.

    The driver-flatness claim in SCALE.md rests on this counter, so it
    must fail LOUDLY rather than silently read zero: pyspark >= 4 puts
    the concrete class in ``pyspark.sql.classic.dataframe`` (ADVICE r09:
    older pyspark lacks that module — fall back to the public module),
    and :func:`timed` verifies the DataFrame actually produced by the
    op is an instance of the patched class (under Spark Connect it
    would not be, and an unpatched collect would count nothing)."""

    def __init__(self):
        try:
            import pyspark.sql.classic.dataframe as cd
        except ImportError:  # pyspark < 4.0
            import pyspark.sql.dataframe as cd

        self.cls = cd.DataFrame
        self.orig = cd.DataFrame.collect
        self.rows = 0
        self.calls = 0

    def __enter__(self):
        meter = self

        def patched(df):
            out = meter.orig(df)
            meter.rows += len(out)
            meter.calls += 1
            return out

        self.cls.collect = patched
        return self

    def __exit__(self, *exc):
        self.cls.collect = self.orig


def timed(spark, fn, sf_dir):
    meter_rows = []
    runs = []
    for _ in range(RUNS):
        spark.catalog.clearCache()
        with CollectMeter() as m:
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            if not isinstance(df, m.cls):
                raise RuntimeError(
                    f"CollectMeter patched {m.cls} but the op produced "
                    f"{type(df)} — collect counting would silently read "
                    "0 rows (Spark Connect session?)"
                )
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
        meter_rows.append((m.rows, m.calls))
    return {
        "min": round(min(runs), 4),
        "median": round(sorted(runs)[len(runs) // 2], 4),
        "collect_rows": meter_rows[0][0],
        "collect_calls": meter_rows[0][1],
    }


def main() -> None:
    global RUNS
    if "--quick" in sys.argv:
        RUNS = 1
    from etl_pulumi_aws_snowflake_spark import get_spark

    import bench

    dirs = {1: BASE}
    for m in MULTS:
        dirs[m] = build_scaled(m)

    spark = get_spark(app_name="scale_curve")
    try:
        cal = bench._calibration(spark)
        report = {
            "calibration_min": round(min(cal), 4),
            "runs_per_point": RUNS,
            "ops": {},
        }
        for name, fn in ops().items():
            report["ops"][name] = {}
            for mult in sorted(dirs):
                # warm (plans, JIT, parquet footers) — excluded
                spark.catalog.clearCache()
                fn(spark, dirs[mult]).write.format("noop").mode(
                    "overwrite"
                ).save()
                report["ops"][name][f"x{mult}"] = timed(spark, fn, dirs[mult])
                print(
                    f"  {name} x{mult}: {report['ops'][name][f'x{mult}']}",
                    file=sys.stderr,
                )
        out = REPO / "scripts" / "scale_curve_report.json"
        out.write_text(json.dumps(report, indent=2) + "\n")

        # markdown table for SCALE.md
        print("\n| op | x1 min (s) | x3 min (s) | x10 min (s) |"
              " t(x10)/t(x1) | collect rows x1 | x10 |")
        print("|---|---|---|---|---|---|---|")
        for name, pts in report["ops"].items():
            r = pts["x10"]["min"] / pts["x1"]["min"]
            print(
                f"| {name} | {pts['x1']['min']} | {pts['x3']['min']} | "
                f"{pts['x10']['min']} | {r:.2f} | "
                f"{pts['x1']['collect_rows']} | "
                f"{pts['x10']['collect_rows']} |"
            )
        print(f"\ncalibration (fixed-work): {report['calibration_min']} s")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
