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
# round (CORRECTNESS_r01-r16 each recorded exactly queries()[:50] in
# order).  Round 17 rotates the window per the staleness rule
# (scripts/driver_staleness.py order): (a) the TWO entries round 17
# added lead (never-checked-entries-lead rule — semantic dedup over
# the persisted IVF index, and HTTP Content-Encoding decompression in
# the web tier); then (b) the first 48 of the 50-entry r13-stale
# cohort, stalest-first, exactly as the r16 note promised — the two
# that no longer fit (text_token_stats, udf_row_scalar) lead r18's
# window together with the rest of the r14 cohort.  (web_url_dedup
# gained tier-2 lanes this round but keeps its green r16 driver row;
# the 202-entry sf0.01 mirror sweep re-certifies its reshaped oracle.)
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) NEW in r17 — first-ever driver evidence
    "dedup_semantic_indexed", "web_content_encoding",
    # (b) the first 48 r13-stale entries, stalest-first — due now
    "agg_distinct",
    "agg_groupby_basic", "cdc_merge_mor_compact_e2e", "cdc_merge_mor_e2e",
    "cdc_merge_stream_e2e", "dedup_lsh_appended", "dedup_lsh_incremental",
    "dedup_spans", "join_cross", "join_right_outer", "join_semi",
    "mm_decode_png", "mm_frame_sample", "q11_important_parts",
    "q12_late_shipment_priority", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_count",
    "q19_disjunctive_revenue", "q20_excess_shippers",
    "q21_waiting_suppliers", "q22_global_sales_opportunity",
    "q2_min_cost_supplier", "q4_order_priority", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "sample_exact_quota_dupkeys", "sample_exact_quota_fail_loud",
    "scalar_array_explode", "scalar_json_typed", "scalar_map",
    "scalar_zorder_key", "scd2_user_state", "search_bm25_appended",
    "search_bm25_indexed", "search_bm25_topk", "search_hybrid_rrf",
    "sim_cosine_near_pairs", "sim_cosine_topk_blas",
    "sim_ivf_recall_pq_rerank", "sim_ivf_topk_pq",
    "sim_ivf_topk_pq_rerank", "sql_api_q5", "stream_ivf_pq_ingest_e2e",
    "text_langid",
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
