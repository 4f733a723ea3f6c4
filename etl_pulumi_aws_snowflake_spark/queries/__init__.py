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
# round (CORRECTNESS_r01-r14 each recorded exactly queries()[:50] in
# order).  Round 15 rotates the window per the staleness rule
# (scripts/driver_staleness.py order): (a) the EIGHT entries round 15
# added lead (never-checked-entries-lead rule — the four raw-web
# ingestion entries: WARC record walk, HTML extract, boilerplate
# removal, the WARC→HTTP-chunked→HTML→main-text pipeline; the three
# trainable-BPE entries: merge-table training, tokenization,
# BPE-budgeted packing; and the multi-writer rebase-and-retry e2e);
# then (b) ALL 37 r11-stale entries the r14 note deferred — due now,
# exactly as promised (the join family, the q* TPC-H heads, the
# scalar/set/sort families, the search trio, the int8-IVF trio, the
# six streaming e2es, text_chunk_windows, the win_* analytic trio);
# then (c) the first 5 r12-stale entries in staleness-report order
# (agg_collect / agg_cube / agg_grouping_sets / agg_rollup /
# agg_stats).  The 40 remaining r12 entries defer one round (they
# lead r16's window with the rest of the r12 cohort): align/cdc/
# corpus/curation/decontaminate/dedup/dq/join_salted/layout/merge/
# mm_* plumbing trio/pack/pipeline/pivot/q17/sample quartet/
# scalar_conditional/scalar_hilbert_key/scalar_math — every one an
# untouched family with r12 window evidence AND green r14 mirror +
# smoke + determinism sweeps at both scales.
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) NEW in r15 — first-ever driver evidence
    "web_html_extract", "web_main_content", "web_warc_records",
    "web_pipeline_e2e",
    "text_bpe_train", "text_bpe_tokenize", "pack_sequences_bpe",
    "snapshot_retry_e2e",
    # (b) ALL 37 r11-stale entries deferred by the r14 note — due now
    "join_broadcast", "join_full_outer", "join_inner",
    "join_left_outer", "join_range", "join_theta",
    "q10_returned_items", "q18_large_volume_customer",
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "scalar_array", "scalar_datetime",
    "scalar_json", "search_bm25_deleted", "search_hybrid_rrf_indexed",
    "search_phrase_indexed", "set_except", "set_intersect",
    "set_union_all", "set_union_by_name", "sim_ivf_recall_quantized",
    "sim_ivf_topk_deleted", "sim_ivf_topk_quantized",
    "sort_limit_topn", "sort_multi_key", "stream_arbitrary_state_e2e",
    "stream_bm25_ingest_e2e", "stream_ivf_ingest_e2e",
    "stream_late_data_discard_e2e", "stream_replay_idempotence_e2e",
    "stream_stateful_dedup_e2e", "text_chunk_windows", "win_lag_lead",
    "win_rank_dense", "win_running_sum", "win_topk_per_group",
    # (c) r12-stale, staleness-report order (40 deferred, note above)
    "agg_collect", "agg_cube", "agg_grouping_sets", "agg_rollup",
    "agg_stats",
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
