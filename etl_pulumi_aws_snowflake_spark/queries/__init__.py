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
# round (CORRECTNESS_r01-r12 each recorded exactly queries()[:50] in
# order).  Round 13 rotates the window onto the stalest evidence
# (scripts/driver_staleness.py order): (a) the SEVEN entries round 13
# added lead (never-checked-entries-lead rule — the from-scratch PNG
# decode, the merge-on-read CDC pair, and the IVF-PQ
# family's serve / rerank / recall / streamed-ingest quartet); then (b) the 15 r09-stale entries the r12 note
# deferred — all due now; then (c) 28 of the 49 r10-stale entries in
# staleness-report order.  The 21 deferred r10 entries, with why each
# can wait one more round (they lead r14's window):
# sim_ivf_recall / sim_ivf_recall_nlists / sim_ivf_topk /
# sim_ivf_topk_appended / sim_ivf_topk_indexed / sim_ivf_topk_nlists
# (the float-IVF family — untouched this round; the similarity
# surface that DID change is the PQ family, which leads the window
# with all four of its entries), snapshot_conflict_e2e /
# snapshot_skipping_e2e / snapshot_time_travel_e2e (the snapshot
# layer's r13 change is the MoR tier, in-window via both MoR entries;
# these exercise untouched paths with dedicated pytest suites),
# sql_api_q3 / sql_api_window (verbatim-SQL twins of mirror-green
# DataFrame plans), stream_interval_join_e2e / stream_lsh_ingest_e2e
# (streaming paths untouched; the lsh module's r13 change is a
# warning-only saturation guard, pytest-pinned), text_fingerprint /
# text_pii_redact / text_repetition (untouched single-projection text
# family), udf_grouped_agg / udf_pandas_scalar (untouched UDF demos),
# win_session / win_sliding / win_tumbling (streaming windows
# untouched; stream==batch parity pytest-pinned).
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) NEW in r13 — first-ever driver evidence
    "mm_decode_png", "cdc_merge_mor_e2e", "cdc_merge_mor_compact_e2e",
    "sim_ivf_topk_pq", "sim_ivf_topk_pq_rerank", "sim_ivf_recall_pq_rerank",
    "stream_ivf_pq_ingest_e2e",
    # (b) the 15 r09-stale entries deferred by the r12 note — due now
    "agg_distinct", "agg_groupby_basic", "join_cross", "join_right_outer",
    "join_semi", "mm_frame_sample", "sample_exact_quota_dupkeys",
    "sample_exact_quota_fail_loud", "scalar_array_explode",
    "scalar_json_typed", "scalar_map", "sql_api_q5", "text_langid",
    "text_token_stats", "udf_row_scalar",
    # (c) r10-stale, staleness-report order (21 deferred, note above)
    "cdc_merge_stream_e2e", "dedup_lsh_appended", "dedup_lsh_incremental",
    "dedup_spans", "q11_important_parts", "q12_late_shipment_priority",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_count", "q19_disjunctive_revenue",
    "q20_excess_shippers", "q21_waiting_suppliers",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "scalar_zorder_key",
    "scd2_user_state", "search_bm25_appended", "search_bm25_indexed",
    "search_bm25_topk", "search_hybrid_rrf", "sim_cosine_near_pairs",
    "sim_cosine_topk_blas",
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
