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
# round (CORRECTNESS_r01-r05 each recorded exactly queries()[:50] in
# order).  Round 6 executes VERDICT r05 #1's rotation verbatim, in
# scripts/driver_staleness.py's stalest-first order: (a) the 6 entries
# NEW this round (snapshot time travel, conflict detection — the r05
# pass-local → driver conversions — the Z-order layout key, the
# exact-quota stratified sampler, the corpus-LM quality score, and
# span-level dedup), then (b) the 3 r05 additions that
# landed after the r05 window was spent and were never driver-checked,
# then (c) the 8 r01-stale + 11 r02-stale + 6 r03-stale entries, then
# (d) the 3 snapshot-backed CDC entries whose commit path r06's
# pointer-store seam touches, and (e) 13 of the 45 r04-stale entries
# as fill (the remaining 32 lead the r07 window).
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# now FAILS if a registry entry without any CORRECTNESS row sits
# outside the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) new this round — first-ever driver evidence
    "snapshot_time_travel_e2e", "snapshot_conflict_e2e",
    "scalar_zorder_key", "sample_exact_quota", "text_lm_score",
    "dedup_spans",
    # (b) landed after the r05 window was spent; never driver-checked
    "udf_table_function", "merge_schema_evolution", "snapshot_skipping_e2e",
    # (c) stalest certifications: r01
    "agg_conditional", "agg_median", "join_cross", "join_right_outer",
    "join_semi", "scalar_array_explode", "scalar_json_typed",
    "set_distinct_rows",
    # (c) r02
    "agg_approx_distinct", "corpus_quality_filter", "mm_binary_features",
    "mm_frame_sample", "sample_hash_bernoulli", "sample_stratified_by_lang",
    "scalar_map", "sql_api_q5", "text_langid", "text_quality",
    "text_token_stats",
    # (c) r03
    "dedup_exact", "dedup_fingerprint_groups", "dedup_simhash",
    "sim_cosine_topk", "udf_grouped_map", "udf_row_scalar",
    # (d) r06 code-touched: snapshot pointer-store seam on the commit path
    "cdc_merge_pruned_e2e", "cdc_merge_stream_e2e", "cdc_merge_compact_e2e",
    # (e) r04-stale fill, staleness-report order
    "agg_approx_quantile", "agg_salted_groupby", "corpus_split",
    "decontaminate", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dq_audit", "join_salted", "merge_upsert_customers", "mm_resize",
    "pack_sequences", "pipeline_batch_e2e", "pipeline_stream_e2e",
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
