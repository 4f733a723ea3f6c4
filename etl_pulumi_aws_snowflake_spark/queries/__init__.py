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
# round (CORRECTNESS_r01-r07 each recorded exactly queries()[:50] in
# order).  Round 8 executes VERDICT r07 #2's rotation: (a) the three
# NEW entries lead (never-checked-entries-lead rule — the adversarial
# duplicate-key exact-quota fixture and the loud-failure contract,
# VERDICT r07 #3/#4, plus the temperature-mixture sampler this round
# added), then (b) ALL 39 r05-stale entries,
# staleness-report order — after this round no entry's latest evidence
# is older than r06 — then (c) the 3 entries whose CODE round 8
# touched (the duplicate-key content tiebreaker in exact_quota_sample;
# the pandas-Hilbert NULL-propagation fix, re-certifying both the
# Hilbert key entry and the cluster_by-composing compaction e2e), then
# (d) 5 r06-stale entries as fill, staleness-report order.
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) NEW this round — first-ever driver evidence
    "sample_exact_quota_dupkeys", "sample_exact_quota_fail_loud",
    "sample_temperature_mixture",
    # (b) r05-stale, staleness-report order
    "dedup_embedding_survivors", "dedup_embedding_survivors_multi",
    "dedup_survivors", "join_anti", "join_asof", "join_broadcast",
    "join_full_outer", "join_inner", "join_left_outer", "join_range",
    "join_theta", "pivot_status_by_priority", "q10_returned_items",
    "q17_small_qty_revenue", "q18_large_volume_customer",
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "scalar_array", "scalar_conditional",
    "scalar_datetime", "scalar_json", "scalar_math", "scalar_string",
    "set_except", "set_intersect", "set_union_all", "set_union_by_name",
    "sort_limit_topn", "sort_multi_key", "stream_arbitrary_state_e2e",
    "stream_late_data_discard_e2e", "stream_replay_idempotence_e2e",
    "stream_stateful_dedup_e2e", "win_lag_lead", "win_range_frame",
    "win_rank_dense", "win_running_sum", "win_topk_per_group",
    # (c) round-8 code-touched: re-certify under the driver hash
    "sample_exact_quota", "scalar_hilbert_key", "cdc_merge_compact_e2e",
    # (d) r06-stale fill, staleness-report order
    "agg_approx_distinct", "agg_approx_quantile", "agg_conditional",
    "agg_median", "agg_salted_groupby",
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
