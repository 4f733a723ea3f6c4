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
# round (CORRECTNESS_r01-r13 each recorded exactly queries()[:50] in
# order).  Round 14 rotates the window per the staleness rule
# (scripts/driver_staleness.py order): (a) the SIXTEEN entries round
# 14 added lead (never-checked-entries-lead rule — the SQL DDL/DML
# twin, the two from-scratch JPEG decode entries, the PQ residual pair
# + Lloyd-trained entry, the three from-scratch WAV audio entries, the
# two G.711 A-law/mu-law entries, the BMP decode entry, the palette-
# PNG entry, the two from-scratch Y4M video entries, and the
# decode-at-ingest streaming e2e); then (b) ALL 21 r10-stale entries
# the r13 note deferred — due now, exactly as promised (the float-IVF
# six, the snapshot e2e trio, the sql_api twins, the two streaming
# e2es, the text trio, the UDF pair, the streaming-window trio); then
# (c) the first 13 r11-stale entries in staleness-report order.  The
# 37 deferred r11 entries (they lead r15's window), grouped with why
# each can wait one more round: join_broadcast / join_full_outer /
# join_inner / join_left_outer / join_range /
# join_theta / q10 / q18 / q1 / q3 / q5_local_supplier_volume and
# further q* siblings beyond the 13 cut plus scalar_array / scalar_datetime /
# scalar_json / set_* (untouched single-shape relational/scalar
# families with r11 evidence AND green r13/r14 mirror+smoke sweeps),
# search_bm25_deleted / search_phrase_indexed /
# search_hybrid_rrf_indexed (search family untouched in r14; its
# freshest members were window-checked in r13),
# sim_ivf_recall_quantized / sim_ivf_topk_deleted /
# sim_ivf_topk_quantized* (int8 family untouched in r14 — the
# similarity surface that DID change is the PQ family, which leads
# this window), stream_* e2es with r11 evidence (streaming engine
# untouched in r14 beyond MoR, whose entries were r13-window-green and
# re-verified this round), udf_* remainder (untouched demos).
# tests/test_docs.py::test_never_driver_checked_entries_lead_the_window
# FAILS if a registry entry without any CORRECTNESS row sits outside
# the first 50 — the r05 process miss cannot recur silently.
_DRIVER_FIRST = [
    # (a) NEW in r14 — first-ever driver evidence
    "sql_api_ddl_dml", "mm_decode_jpeg", "mm_decode_jpeg_color",
    "sim_ivf_topk_pq_residual", "sim_ivf_recall_pq_residual",
    "sim_ivf_topk_pq_trained",
    "mm_decode_wav", "mm_audio_features", "mm_wav_frames",
    "mm_decode_mulaw", "mm_decode_alaw", "mm_decode_bmp",
    "mm_decode_png_palette",
    "mm_video_frames", "mm_video_meta", "stream_media_features_e2e",
    # (b) the 21 r10-stale entries deferred by the r13 note — due now
    "sim_ivf_recall", "sim_ivf_recall_nlists", "sim_ivf_topk",
    "sim_ivf_topk_appended", "sim_ivf_topk_indexed", "sim_ivf_topk_nlists",
    "snapshot_conflict_e2e", "snapshot_skipping_e2e",
    "snapshot_time_travel_e2e", "sql_api_q3", "sql_api_window",
    "stream_interval_join_e2e", "stream_lsh_ingest_e2e",
    "text_fingerprint", "text_pii_redact", "text_repetition",
    "udf_grouped_agg", "udf_pandas_scalar", "win_session",
    "win_sliding", "win_tumbling",
    # (c) r11-stale, staleness-report order (37 deferred, note above)
    "agg_approx_distinct", "agg_approx_quantile", "agg_conditional",
    "agg_median", "agg_salted_groupby", "cdc_merge_compact_e2e",
    "curation_pipeline_e2e", "dedup_embedding_survivors",
    "dedup_embedding_survivors_multi", "dedup_lsh_deleted",
    "dedup_survivors", "join_anti", "join_asof",
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
