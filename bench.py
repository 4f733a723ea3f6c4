#!/usr/bin/env python3
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced to full materialization with a cheap
``count()``-style action (write-free, so we measure compute + shuffle,
not local-disk serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_pulumi_aws_snowflake_spark import get_spark  # noqa: E402
from etl_pulumi_aws_snowflake_spark.queries import all_queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline subset — representative of each operator family; grows as
#: families land. Keys must exist in the query registry.
HEADLINE: tuple[str, ...] = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_broadcast",
    "join_asof",
    "agg_rollup",
    "win_topk_per_group",
    "scalar_array_explode",
    "q18_large_volume_customer",
    "udf_pandas_scalar",
    "win_tumbling",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_quality",
    "mm_binary_features",
    # heaviest shapes — in the headline so regressions in these paths
    # are visible round-over-round
    "q7_volume_shipping",
    "q9_product_profit",
    "dedup_ngram_jaccard",
    "dedup_survivors",
    "sim_ivf_topk",
    "sim_ivf_topk_nlists",
    "pack_sequences",
    "sim_cosine_topk_blas",
    "curation_pipeline_e2e",
    "search_bm25_topk",
    "search_bm25_indexed",
    "search_hybrid_rrf",
    "search_hybrid_rrf_indexed",
    "text_chunk_windows",
    "curation_pipeline_indexed_e2e",
    "sim_ivf_topk_quantized_rerank",
    "pack_bins",
    # r13 families
    "cdc_merge_mor_e2e",
    "sim_ivf_topk_pq_rerank",
    # r14 families: real-pixel JPEG decode through the Arrow worker;
    # residual PQ build + ADC serve
    "mm_decode_jpeg",
    "sim_ivf_topk_pq_residual",
    # r15 families: the raw-web decode chain (WARC → chunked HTTP →
    # HTML → main text, one Arrow worker pass); BPE train+tokenize
    "web_pipeline_e2e",
    "text_bpe_tokenize",
    # r16 families: the charset-aware quarantining web chain; the
    # video→image frame-feature composition; semantic decontamination
    # against an in-entry-built IVF index
    "web_charset_quarantine",
    "mm_video_frame_features",
    "decontaminate_semantic",
)

#: Rows whose registry callables time index CONSTRUCTION + the query
#: (they certify the full round trip; the correctness entry builds the
#: index in-callable).  Labeled in the bench JSON (VERDICT r10 #7) so a
#: round-over-round reader doesn't misread e.g. search_bm25_indexed's
#: ~2.5 s against search_bm25_topk's ~0.5 s as "the index is 5x slower
#: than the scan" — the SERVE-only costs are on the scale curve
#: (SCALE.md: search_bm25_indexed_fixed_query 0.97->1.31 s flat;
#: ivf/hybrid serve rows likewise), where the build is untimed.
BUILD_INCLUSIVE: tuple[str, ...] = (
    "search_bm25_indexed",
    "search_hybrid_rrf_indexed",
    "curation_pipeline_indexed_e2e",
    "sim_ivf_topk_quantized_rerank",
    # r13: the MoR e2e seeds its snapshot + streams the change files
    # in-entry; the PQ rerank builds its dual-payload index in-entry.
    # Serve-only / per-batch costs ride the SCALE.md curve rows
    # (cdc_merge_mor_fixed_batch, sim_ivf_pq_rerank_indexed_fixed_probes).
    "cdc_merge_mor_e2e",
    "sim_ivf_topk_pq_rerank",
    # r14: the residual entry builds its PQ index in-entry too.
    "sim_ivf_topk_pq_residual",
    # r15: tokenization TRAINS the 10-merge table in-entry (10 vocab
    # aggregations) before the broadcast apply it certifies.
    "text_bpe_tokenize",
    # r16: the semantic-decontamination entry builds its IVF index
    # in-entry; the serve-only shape shares sim_ivf serve curve rows.
    "decontaminate_semantic",
)

#: Entries whose SCOPE changed in a named round — a round-over-round
#: reader must compare against the rebaselined band, not the old one
#: (VERDICT r11 #3: r11's curation number was misread as a 1.97x
#: regression when it was a feature addition).
REBASELINED: dict[str, str] = {
    "curation_pipeline_e2e": (
        "r11 added the near-dup keep-one stage (MinHash LSH over the "
        "corpus inside the chain) — compare against BENCH_r11's 4.98 s "
        "band, not BENCH_r10's 2.52 s; r18 added the trained "
        "quality-filter arm (one extra integer aggregation pass to fit "
        "the diagonal-LDA model + a scan-side margin predicate) — "
        "compare against BENCH_r18's band onward"
    ),
}


def _calibration(spark) -> list[float]:
    """Fixed-work pure-CPU codegen loop (VERDICT r07 #6): 4B
    xxhash64-and-sum over ``spark.range`` — no IO, no shuffle beyond
    the final 32-partial reduce, no data dependence — so cross-round
    bench drift separates into host speed (calibration moved too) vs
    plan changes (calibration flat, query moved)."""
    from pyspark.sql import functions as F

    def once() -> float:
        start = time.perf_counter()
        (
            spark.range(0, 4_000_000_000, 1, 32)
            .select(F.xxhash64("id").alias("h"))
            .agg(F.expr("bit_xor(h)").alias("s"))  # overflow-free reduce
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - start

    once()  # warm, excluded
    return [once() for _ in range(5)]


def _calibration_shuffle(spark) -> list[float]:
    """Fixed-work SHUFFLE/memory-bound probe (VERDICT r15 #5): the
    pure-CPU loop above stayed flat (0.5234 → 0.5234) across the r15
    host degradation while every real query slowed ~17% — a
    cache-resident hash loop is blind to memory-bandwidth and
    shuffle-IO contention.  This probe moves what real queries move:
    10M rows with a 64-byte payload repartitioned by key (~640 MB
    through the shuffle writers/readers) into a grouped aggregate.
    Cross-round drift that shows here but not in the CPU probe is
    memory/IO host band; drift in neither is a plan change."""
    from pyspark.sql import functions as F

    def once() -> float:
        start = time.perf_counter()
        (
            spark.range(0, 10_000_000, 1, 32)
            .select(
                (F.col("id") % 65536).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            .repartition(32, "k")
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.max("payload").alias("m"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - start

    once()  # warm, excluded
    return [once() for _ in range(5)]


#: Where the FULL per-query document lands (committed in-repo, pinned
#: by tests/test_docs.py).  The driver's BENCH_r{N}.json records only a
#: 2000-char tail of stdout, which r12's 32-query full doc overflowed —
#: losing the headline total from the round artifact (VERDICT r12 #1).
#: The split: stdout gets ONE compact line (guaranteed < 2000 chars by
#: construction + test), the full doc lives here.
REPORT_PATH = Path(__file__).resolve().parent / "scripts" / "bench_report.json"


def compact_line(doc: dict) -> str:
    """The single stdout line the external driver parses: the full
    doc minus the verbose fields (per-query medians, rebaselined
    prose — both in the report file), per-query timings at 3 decimals,
    no whitespace.  tests/test_docs.py rebuilds this from the committed
    report and asserts < 2000 chars, so headline growth that would
    re-overflow the driver's tail window fails in CI, not in the round
    artifact."""
    return json.dumps(
        {
            "metric": doc["metric"],
            "value": doc["value"],
            "serve_only_total": doc["serve_only_total"],
            "unit": doc["unit"],
            "queries": {n: round(v, 3) for n, v in doc["queries"].items()},
            "calibration": doc["calibration"],
            "calibration_shuffle": doc["calibration_shuffle"],
            "build_inclusive": doc["build_inclusive"],
            "rebaselined": sorted(doc["rebaselined"]),
            "sf": doc["sf"],
            "report": "scripts/bench_report.json",
        },
        separators=(",", ":"),
    )


def main() -> None:
    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]
    # Procedure change (r13, VERDICT r12 #2): BUILD_INCLUSIVE entries
    # run LAST — warm-up and timing both.  Their per-rep index builds
    # are the one suite component that grows round-over-round (r11 had
    # two, r12 four), so letting them precede the shared queries makes
    # the shared suite's JVM/GC context a moving target across rounds.
    # With them last, the 29 shared queries are timed in a context that
    # no longer depends on how many index builders a round adds.
    names = [n for n in names if n not in BUILD_INCLUSIVE] + [
        n for n in names if n in BUILD_INCLUSIVE
    ]
    spark = get_spark(app_name="bench")
    try:
        # Warm JVM JIT, parquet footer caches, and the noop sink class
        # (excluded from timings).
        for name in names:
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

        timings: dict[str, float] = {}
        medians: dict[str, float] = {}
        for name in names:
            runs = []
            for _ in range(5):
                start = time.perf_counter()
                df = queries[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - start)
            # min-of-5: robust to host-contention spikes in this shared
            # container; measures engine capability, not scheduler luck.
            # Median reported alongside so harness-order effects (a
            # query slow only when run in-suite) are visible: min and
            # median disagreeing by ≫20% flags contention, not code.
            timings[name] = round(min(runs), 4)
            medians[name] = round(sorted(runs)[len(runs) // 2], 4)
            # Release blocks persisted inside operators (e.g. the
            # minhash shingle subtree) so repeated runs in one session
            # don't accumulate cached data or re-persist warnings.
            spark.catalog.clearCache()

        cal = _calibration(spark)
        cal_sh = _calibration_shuffle(spark)
        sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        doc = {
            "metric": "headline_queries_total",
            "value": round(sum(timings.values()), 4),
            # The round-over-round comparison number (r14, VERDICT r13
            # #7): headline total MINUS the build-inclusive rows, whose
            # per-rep index builds grow as rounds add tiers — serve
            # regressions read directly off this field without needing
            # the curve.
            "serve_only_total": round(
                sum(v for n, v in timings.items() if n not in BUILD_INCLUSIVE),
                4,
            ),
            "unit": "sec",
            "queries": timings,
            "queries_median": medians,
            # NOT in the total: measures the HOST, not the
            # engine — compare across rounds to attribute drift.
            "calibration": round(min(cal), 4),
            "calibration_median": round(sorted(cal)[len(cal) // 2], 4),
            # Second probe (r16, VERDICT r15 #5): shuffle/memory-bound
            # fixed work — the contention class the pure-CPU loop is
            # blind to.  Same host-not-engine reading.
            "calibration_shuffle": round(min(cal_sh), 4),
            "calibration_shuffle_median": round(
                sorted(cal_sh)[len(cal_sh) // 2], 4
            ),
            # These rows time index BUILD + query (round-trip
            # certification); serve-only costs live on the
            # SCALE.md curve.  Do not read them as query cost.
            "build_inclusive": [n for n in BUILD_INCLUSIVE if n in timings],
            # Scope-change annotations: compare these entries
            # round-over-round against the named rebaselined
            # band, not an older one.
            "rebaselined": {
                n: why for n, why in REBASELINED.items() if n in timings
            },
            "sf": float(sf),
        }
        REPORT_PATH.write_text(json.dumps(doc, indent=1) + "\n")
        print(compact_line(doc))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
