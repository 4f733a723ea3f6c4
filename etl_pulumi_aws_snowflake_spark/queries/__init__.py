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
from . import warehouse_ops  # noqa: E402,F401
from . import pipeline_e2e  # noqa: E402,F401
from . import streaming_e2e  # noqa: E402,F401


# The external correctness driver checks the FIRST 50 dict entries per
# round (CORRECTNESS_r01-r06 each recorded exactly queries()[:50] in
# order).  Round 7 executes VERDICT r06 #2's rotation: (a) all 32
# r04-stale entries lead (the planned remainder of the r06 rotation,
# staleness-report order — after this round no entry's latest evidence
# is older than r05), then (b) the 9 entries whose CODE round 7
# touched and which therefore need re-certification (the exact-quota
# under-catch fix; the zorder raw-value clamp; the span-dedup id-side
# range check; and every snapshot-manifest-backed entry, since commits
# now stamp + enforce the float-stats NaN contract), then (c) 9
# r05-stale entries as fill, staleness-report order.
# A new r07 entry (the Hilbert layout key) takes the final slot in
# place of one r05-stale fill, per the never-checked-entries-lead rule.
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # NEW this round — first-ever driver evidence
    "scalar_hilbert_key",
    # (a) r04-stale, staleness-report order
    "q11_important_parts", "q12_late_shipment_priority",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_count", "q19_disjunctive_revenue",
    "q20_excess_shippers", "q21_waiting_suppliers",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "scd2_user_state",
    "sim_cosine_near_pairs", "sim_cosine_topk_blas", "sim_ivf_recall",
    "sim_ivf_topk", "sql_api_q3", "sql_api_window",
    "stream_interval_join_e2e", "text_fingerprint", "text_pii_redact",
    "text_repetition", "udf_grouped_agg", "udf_pandas_scalar",
    "win_session", "win_sliding", "win_tumbling",
    # (b) round-7 code-touched: re-certify under the driver hash
    "sample_exact_quota", "scalar_zorder_key", "dedup_spans",
    "snapshot_skipping_e2e", "snapshot_time_travel_e2e",
    "snapshot_conflict_e2e", "cdc_merge_pruned_e2e", "cdc_merge_stream_e2e",
    "cdc_merge_compact_e2e",
    # (c) r05-stale fill, staleness-report order
    "agg_collect", "agg_cube", "agg_distinct", "agg_groupby_basic",
    "agg_grouping_sets", "agg_rollup", "agg_stats", "align_by_name_ci",
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
