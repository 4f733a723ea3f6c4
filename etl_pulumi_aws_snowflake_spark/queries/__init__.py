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
# round (CORRECTNESS_r01-r08 each recorded exactly queries()[:50] in
# order).  Round 9 executes VERDICT r08 #1's rotation: (a) the one NEW
# entry leads (never-checked-entries-lead rule — layout_cluster_key,
# the measured curve-choice dispatch made driver-visible, VERDICT r08
# #3), then (b) ALL 36 r06-stale entries, staleness-report order —
# after this round no entry's latest evidence is older than r07 —
# then (c) the 4 entries whose CODE round 9 touched (the
# temperature-mixture overflow/overshoot/all-map hardening lives in
# the shared operators/sampling.py core every sample_exact_quota*
# entry exercises), then (d) 9 r07-stale entries as fill,
# staleness-report order.
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) NEW this round — first-ever driver evidence
    "layout_cluster_key",
    # (b) r06-stale, staleness-report order
    "corpus_quality_filter", "corpus_split", "decontaminate",
    "dedup_exact", "dedup_fingerprint_groups", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "dq_audit", "join_cross",
    "join_right_outer", "join_salted", "join_semi",
    "merge_schema_evolution", "merge_upsert_customers",
    "mm_binary_features", "mm_frame_sample", "mm_resize",
    "pack_sequences", "pipeline_batch_e2e", "pipeline_stream_e2e",
    "sample_hash_bernoulli", "sample_stratified_by_lang",
    "scalar_array_explode", "scalar_json_typed", "scalar_map",
    "set_distinct_rows", "sim_cosine_topk", "sql_api_q5",
    "text_langid", "text_lm_score", "text_quality", "text_token_stats",
    "udf_grouped_map", "udf_row_scalar", "udf_table_function",
    # (c) round-9 code-touched: re-certify under the driver hash
    "sample_temperature_mixture", "sample_exact_quota",
    "sample_exact_quota_dupkeys", "sample_exact_quota_fail_loud",
    # (d) r07-stale fill, staleness-report order
    "agg_collect", "agg_cube", "agg_distinct", "agg_groupby_basic",
    "agg_grouping_sets", "agg_rollup", "agg_stats", "align_by_name_ci",
    "cdc_merge_pruned_e2e",
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
