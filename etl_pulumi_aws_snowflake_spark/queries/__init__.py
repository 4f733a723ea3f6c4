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
# round (CORRECTNESS_r01-r17 each recorded exactly queries()[:50] in
# order).  Round 18 rotates the window per the staleness rule
# (scripts/driver_staleness.py order): (a) the FOUR entries round 18
# added lead (never-checked-entries-lead rule — the hi-recall
# symmetric semantic-dedup serve, its hash-judged recall measurement,
# and the trained quality model's fitted-statistics and
# scored-classifier entries); then (b) the two r13-stale entries the
# r17 rotation promised would lead (text_token_stats, udf_row_scalar);
# then (c) the first 44 of the 50-entry r14-stale cohort,
# stalest-first — the six that no longer fit (text_repetition,
# udf_grouped_agg, udf_pandas_scalar, win_session, win_sliding,
# win_tumbling) lead r19's window with the r15 cohort.  (The r18
# window happens to re-certify curation_pipeline_e2e right after its
# quality stage gained the trained-model arm — the composition's new
# hash gets driver evidence the same round it changed.)
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) NEW in r18 — first-ever driver evidence
    "dedup_semantic_hi_recall", "dedup_semantic_recall",
    "text_quality_model", "text_quality_classifier",
    # (b) the two r13-stale spillovers the r17 note promised
    "text_token_stats", "udf_row_scalar",
    # (c) the first 44 r14-stale entries, stalest-first — due now
    "agg_approx_distinct", "agg_approx_quantile", "agg_conditional",
    "agg_median", "agg_salted_groupby", "cdc_merge_compact_e2e",
    "curation_pipeline_e2e", "dedup_embedding_survivors",
    "dedup_embedding_survivors_multi", "dedup_lsh_deleted",
    "dedup_survivors", "join_anti", "join_asof", "mm_audio_features",
    "mm_decode_alaw", "mm_decode_bmp", "mm_decode_jpeg",
    "mm_decode_jpeg_color", "mm_decode_mulaw", "mm_decode_png_palette",
    "mm_decode_wav", "mm_video_frames", "mm_video_meta", "mm_wav_frames",
    "sim_ivf_recall", "sim_ivf_recall_nlists",
    "sim_ivf_recall_pq_residual", "sim_ivf_topk", "sim_ivf_topk_appended",
    "sim_ivf_topk_indexed", "sim_ivf_topk_nlists",
    "sim_ivf_topk_pq_residual", "sim_ivf_topk_pq_trained",
    "snapshot_conflict_e2e", "snapshot_skipping_e2e",
    "snapshot_time_travel_e2e", "sql_api_ddl_dml", "sql_api_q3",
    "sql_api_window", "stream_interval_join_e2e", "stream_lsh_ingest_e2e",
    "stream_media_features_e2e", "text_fingerprint", "text_pii_redact",
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
