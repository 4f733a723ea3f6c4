"""Executable operator inventory (SURVEY.md §2 made runnable).

Every operator the engine claims is registered here as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle string with IDENTICAL output column names.  The driver
hash-compares the two at sf0.01.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query

# Import for registration side effects — order mirrors SURVEY.md §2.
from . import relational  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import setops_sorts  # noqa: E402,F401
from . import scalars  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import tpch_full  # noqa: E402,F401
from . import stream_windows  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import llm_dedup  # noqa: E402,F401
from . import llm_similarity  # noqa: E402,F401
from . import llm_text  # noqa: E402,F401
from . import llm_multimodal  # noqa: E402,F401
from . import llm_sampling  # noqa: E402,F401
from . import llm_packing  # noqa: E402,F401
from . import llm_curation  # noqa: E402,F401
from . import llm_pq  # noqa: E402,F401
from . import llm_web  # noqa: E402,F401
from . import llm_bpe  # noqa: E402,F401
from . import llm_search  # noqa: E402,F401
from . import warehouse_ops  # noqa: E402,F401
from . import pipeline_e2e  # noqa: E402,F401
from . import streaming_e2e  # noqa: E402,F401


# The external correctness driver checks the FIRST 50 dict entries per
# round (CORRECTNESS_r01-r15 each recorded exactly queries()[:50] in
# order).  Round 16 rotates the window per the staleness rule
# (scripts/driver_staleness.py order): (a) the FIVE entries round 16
# added lead (never-checked-entries-lead rule — the charset-aware
# quarantining web ingest, its streaming decode-at-ingest composition,
# URL canonicalization + URL-level dedup, the embedding-space
# decontamination arm,
# and the video→image frame-feature composition); then (b) ALL 45
# r12-stale entries the r15 note deferred — due now, exactly as
# promised (align/cdc-pruned/corpus pair/curation-indexed/
# decontaminate/the dedup five/dq_audit/join_salted/layout/the merge
# pair/the mm plumbing trio/the pack pair/the pipeline pair/pivot/
# q17/the sample quartet/the scalar quartet/set_distinct/
# sim_cosine_topk/the int8-IVF rerank+lifecycle quartet/
# stream_ivf_q_ingest/text_lm_score/text_quality/the UDF pair/
# win_range_frame); then (c) the first 2 r13-stale entries in
# the five new plus all 45 r12-stale fill the window exactly; the
# whole 50-entry r13 cohort leads r17's window.
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) NEW in r16 — first-ever driver evidence
    "decontaminate_semantic", "mm_video_frame_features",
    "stream_web_ingest_e2e", "web_charset_quarantine", "web_url_dedup",
    # (b) ALL 45 r12-stale entries deferred by the r15 note — due now
    "align_by_name_ci", "cdc_merge_pruned_e2e", "corpus_quality_filter",
    "corpus_split", "curation_pipeline_indexed_e2e", "decontaminate",
    "dedup_exact", "dedup_fingerprint_groups", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "dq_audit", "join_salted",
    "layout_cluster_key", "merge_schema_evolution",
    "merge_upsert_customers", "mm_binary_features", "mm_decode_ppm",
    "mm_resize", "pack_bins", "pack_sequences", "pipeline_batch_e2e",
    "pipeline_stream_e2e", "pivot_status_by_priority",
    "q17_small_qty_revenue", "sample_exact_quota",
    "sample_hash_bernoulli", "sample_stratified_by_lang",
    "sample_temperature_mixture", "scalar_conditional",
    "scalar_hilbert_key", "scalar_math", "scalar_string",
    "set_distinct_rows", "sim_cosine_topk",
    "sim_ivf_recall_quantized_rerank", "sim_ivf_topk_quantized_appended",
    "sim_ivf_topk_quantized_deleted", "sim_ivf_topk_quantized_rerank",
    "stream_ivf_q_ingest_e2e", "text_lm_score", "text_quality",
    "udf_grouped_map", "udf_table_function", "win_range_frame",
]

def _driver_order(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_FIRST if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def all_queries():
    return _driver_order(dict(QUERIES))


def all_oracles():
    return _driver_order(dict(ORACLES))


__all__ = ["QUERIES", "ORACLES", "query", "all_queries", "all_oracles"]
