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
from . import llm_search  # noqa: E402,F401
from . import warehouse_ops  # noqa: E402,F401
from . import pipeline_e2e  # noqa: E402,F401
from . import streaming_e2e  # noqa: E402,F401


# The external correctness driver checks the FIRST 50 dict entries per
# round (CORRECTNESS_r01-r09 each recorded exactly queries()[:50] in
# order).  Round 10 executes VERDICT r09 #4's rotation: (a) the TWELVE
# entries round 10 added lead (never-checked-entries-lead rule — the
# fixed-nlists IVF family closing the r09 scale cliff per VERDICT r09
# #1 "the fixed-k mode needs its own green registry entry", the
# persisted-IVF-index lifecycle, the composed curation pipeline, the
# BM25/hybrid-RRF retrieval pair plus the persisted inverted-index
# build/append pair, and the incremental LSH dedup index), then
# (b) ALL 38 r07-stale entries, staleness-report order — after this
# round no entry's latest evidence is older than r08.  12 + 38 fill
# the window exactly; the trailing note records what that displaced.
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) NEW this round — first-ever driver evidence
    "search_bm25_indexed", "search_bm25_appended",
    "sim_ivf_topk_nlists", "sim_ivf_topk_indexed", "sim_ivf_recall_nlists",
    "sim_ivf_topk_appended", "curation_pipeline_e2e",
    "search_bm25_topk", "search_hybrid_rrf",
    "dedup_lsh_incremental", "dedup_lsh_appended", "stream_lsh_ingest_e2e",
    # (b) r07-stale, staleness-report order
    "cdc_merge_stream_e2e", "dedup_spans", "q11_important_parts",
    "q12_late_shipment_priority", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_count",
    "q19_disjunctive_revenue", "q20_excess_shippers",
    "q21_waiting_suppliers", "q22_global_sales_opportunity",
    "q2_min_cost_supplier", "q4_order_priority", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "scalar_zorder_key", "scd2_user_state", "sim_cosine_near_pairs",
    "sim_cosine_topk_blas", "sim_ivf_recall", "sim_ivf_topk",
    "snapshot_conflict_e2e", "snapshot_skipping_e2e",
    "snapshot_time_travel_e2e", "sql_api_q3", "sql_api_window",
    "stream_interval_join_e2e", "text_fingerprint", "text_pii_redact",
    "text_repetition", "udf_grouped_agg", "udf_pandas_scalar",
    "win_session", "win_sliding", "win_tumbling",
    # The late-round additions in (a) displaced, in order: the
    # sample_* family and the (d) r08 fill (the r10 sampling edits
    # touched only cold guard paths — raise-on-pathological-input —
    # that driver inputs never reach, and the family's r09 evidence is
    # green on the hot path), then the (c) code-touched
    # embedding-survivors pair (r08-green; the rewritten similarity
    # assignment tiers they route through ARE in-window via the five
    # sim_ivf_* entries, and the full 146-entry mirror run this round
    # re-checked the pair green at sf0.01).
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
