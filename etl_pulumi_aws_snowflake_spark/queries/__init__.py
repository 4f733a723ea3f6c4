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
from . import llm_search  # noqa: E402,F401
from . import warehouse_ops  # noqa: E402,F401
from . import pipeline_e2e  # noqa: E402,F401
from . import streaming_e2e  # noqa: E402,F401


# The external correctness driver checks the FIRST 50 dict entries per
# round (CORRECTNESS_r01-r11 each recorded exactly queries()[:50] in
# order).  Round 12 rotates the window onto entries NOT sampled in r11
# (VERDICT r11 #8): (a) the EIGHT entries round 12 added lead
# (never-checked-entries-lead rule — the quantized-index
# append/delete pair, the IVF-ADC rerank serve + its recall pair, the
# real-PPM-decode entry, the ingest-shaped indexed curation e2e,
# truncation-free bin packing, and the quantized streaming ingest);
# then (b) the seven r08-stale stragglers the r11 note deferred; then
# (c) 35 of the 50 r09-stale entries, staleness-report order.  The 15
# deferred r09 entries, with why each can wait one more round:
# sample_exact_quota_dupkeys / sample_exact_quota_fail_loud (variants
# whose shared core is in-window via sample_exact_quota and fuzz-pinned
# in tests/test_exact_quota.py), agg_groupby_basic / agg_distinct
# (their surfaces recur inside the five in-window agg entries),
# join_cross / join_semi / join_right_outer (shape-mirrors of
# r11-green join entries with plan guards in test_plans.py),
# scalar_map / scalar_array_explode / udf_row_scalar (single-projection
# demos whose expressions recur inside in-window entries), sql_api_q5
# (same plan as r11-green q5_local_supplier_volume), text_langid /
# text_token_stats (untouched single-projection text family;
# text_quality + text_lm_score represent it in-window),
# mm_frame_sample (its fake-decode passthrough is byte-identical to
# in-window mm_binary_features' path and pytest-pinned; the module's
# r12 change — real PNM decode — is in-window via mm_decode_ppm), and
# scalar_json_typed (from_json/schema_of_json single projection;
# scalar_json was r11-green and the typed form is pytest-pinned).
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a0) NEW in r13 — first-ever driver evidence (full rotation
    # rewrite happens once the round's registry additions are final)
    "mm_decode_png", "cdc_merge_mor_e2e", "cdc_merge_mor_compact_e2e",
    "sim_ivf_topk_pq", "sim_ivf_topk_pq_rerank", "sim_ivf_recall_pq_rerank",
    # (a) NEW in r12 — first driver evidence recorded r12
    "sim_ivf_topk_quantized_appended", "sim_ivf_topk_quantized_deleted",
    "sim_ivf_topk_quantized_rerank", "sim_ivf_recall_quantized_rerank",
    "mm_decode_ppm", "curation_pipeline_indexed_e2e", "pack_bins",
    "stream_ivf_q_ingest_e2e",
    # (b) r08-stale stragglers (deferred by the r11 note — due now)
    "pivot_status_by_priority", "q17_small_qty_revenue",
    "scalar_conditional", "scalar_hilbert_key", "scalar_math",
    "scalar_string", "win_range_frame",
    # (c) r09-stale, staleness-report order (15 deferred, note above)
    "agg_collect", "agg_cube", "agg_grouping_sets", "agg_rollup",
    "agg_stats", "align_by_name_ci", "cdc_merge_pruned_e2e",
    "corpus_quality_filter", "corpus_split", "decontaminate",
    "dedup_exact", "dedup_fingerprint_groups", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "dq_audit", "join_salted",
    "layout_cluster_key", "merge_schema_evolution",
    "merge_upsert_customers", "mm_binary_features",
    "mm_resize", "pack_sequences", "pipeline_batch_e2e",
    "pipeline_stream_e2e", "sample_exact_quota", "sample_hash_bernoulli",
    "sample_stratified_by_lang", "sample_temperature_mixture",
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
