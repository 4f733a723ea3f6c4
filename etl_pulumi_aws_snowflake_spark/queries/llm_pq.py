"""IVF-PQ queries (SURVEY.md §2.10 similarity family, VERDICT r12
#7).  The oracles re-derive EVERYTHING from the base table — hash-rank
seed pick, coarse assignment, the hash-rank codebooks, per-subspace
argmin encoding, and the ADC fold — with every double produced by the
same strict left folds the engine uses, so ``pcos`` is judged EXACTLY
(no tolerance), like the int8 family's ``qcos``.

The judged build freezes hash-rank codebooks (deterministic, SQL-
replayable); the Lloyd-trained path (``operators/pq.train_pq_codebooks``)
is pytest-verified only — the same reproducibility split as IVF's
seeded vs KMeans centroids."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import pq as PQ
from ..operators.similarity import seed_rank_hash
from ._util import t
from .llm_similarity import (
    _E,
    _NLISTS,
    _PROBE_STRIDE,
    _SEEDS_NLISTS,
    _cos,
    _probes,
    _recall_of,
    _recall_tail,
)
from .registry import query

#: PQ geometry for the judged entries: 64-dim embeddings → 8 subspaces
#: of 8 dims, 32 codewords each (fixture-tuned so ADC approximation is
#: meaningful on the synthetic near-random vectors; production dims
#: use 256 codes = 1 byte).  Payload: 8 small ints + 1 norm vs 64
#: int8s — the next ~8x IO rung below int8.
_M, _CODES, _SD, _DIM = 8, 32, 8, 64

#: Survivor multiplier for the judged re-rank serve: the PQ cut keeps
#: m·k = 15 candidates per probe for the float re-score.  Wider than
#: the int8 family's 3 because PQ's coarser estimate needs more slack
#: to keep the true top-k in the survivor set (measured: recall@3
#: reaches 5/6 of the nprobe routing ceiling at this setting on the
#: fixture's random vectors; the ceiling itself is the float path's).
_PQ_RERANK_M = 5


def _dfold(products: str) -> str:
    """DuckDB strict left fold from 0.0 — the dialect twin of Spark's
    ``aggregate(..., 0D, (acc, x) -> acc + x)``."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {products}), "
        f"(acc, x) -> acc + x)"
    )


def _ddot(a: str, b: str, n: int) -> str:
    return _dfold(
        f"list_transform(generate_series(1, {n}), i -> ({a})[i] * ({b})[i])"
    )


def _dd2(a: str, b: str, n: int) -> str:
    return _dfold(
        f"list_transform(generate_series(1, {n}), "
        f"i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i]))"
    )


def _pq_ctes(
    seeds_sql: str, corpus_where: str = "TRUE", cb_where: str = "TRUE"
) -> str:
    """The IVF-PQ pipeline as DuckDB CTEs mirroring operators/pq.py
    exactly: seeded assignment, hash-rank codebooks, per-subspace
    argmin-L2² encoding (ties to the smallest code id — the engine's
    array_sort struct rule == ORDER BY d2, code_id), and ADC scoring
    as an ascending-subspace strict fold of strict-fold subvector
    dots.  Ends with ``ranked`` carrying (probe_id, vec_id, pcos,
    rank); ``lists`` holds the full-precision vectors for the re-rank
    tail.  ``cb_where`` restricts WHICH vectors the hash-rank
    codebook pick ranks over (a base-half build freezes codebooks
    from the base half, like its seeds)."""
    psub = f"list_slice(pv, (w.sub_id-1)*{_SD}+1, w.sub_id*{_SD})"
    return f"""{_E},
    seeds AS ({seeds_sql}),
    assign AS (
        SELECT e.vec_id, e.v, seed_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos('sv', 'v')} DESC, seed_id) AS rn
        FROM e CROSS JOIN seeds
    ),
    lists AS (SELECT vec_id, v, seed_id AS list_id FROM assign
              WHERE rn = 1 AND ({corpus_where})),
    nz AS (
        SELECT vec_id, v, list_id, sqrt({_ddot('v', 'v', _DIM)}) AS vnrm
        FROM lists
        WHERE sqrt({_ddot('v', 'v', _DIM)}) > 0
    ),
    cbpick AS (
        SELECT v, ROW_NUMBER() OVER (
            ORDER BY {seed_rank_hash('vec_id')}, vec_id) AS code_id
        FROM e WHERE ({cb_where})
    ),
    cb AS (
        SELECT js.sub_id, code_id,
               list_slice(v, (js.sub_id-1)*{_SD}+1, js.sub_id*{_SD}) AS cv
        FROM cbpick CROSS JOIN generate_series(1, {_M}) AS js(sub_id)
        WHERE code_id <= {_CODES}
    ),
    subs AS (
        SELECT vec_id, js.sub_id,
               list_slice(v, (js.sub_id-1)*{_SD}+1, js.sub_id*{_SD}) AS sv2
        FROM nz CROSS JOIN generate_series(1, {_M}) AS js(sub_id)
    ),
    enc AS (
        SELECT vec_id, sub_id, cv,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                  ORDER BY {_dd2('sv2', 'cv', _SD)}, code_id) AS rn2
        FROM subs JOIN cb USING (sub_id)
    ),
    win AS (SELECT vec_id, sub_id, cv FROM enc WHERE rn2 = 1),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM e
          WHERE vec_id % {_PROBE_STRIDE} = 0),
    plists AS (
        SELECT probe_id, pv, list_id FROM (
            SELECT probe_id, pv, seed_id AS list_id,
                   ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY {_cos('pv', 'sv')} DESC, seed_id) AS lr
            FROM p CROSS JOIN seeds
        ) WHERE lr <= 2
    ),
    cand AS (
        SELECT probe_id, pv, nz.vec_id AS vec_id, w.sub_id, nz.vnrm,
               {_ddot(psub, 'w.cv', _SD)} AS dsub
        FROM plists
        JOIN nz ON plists.list_id = nz.list_id AND probe_id != nz.vec_id
        JOIN win w ON w.vec_id = nz.vec_id
    ),
    scored AS (
        SELECT probe_id, vec_id, MAX(vnrm) AS vnrm,
               {_dfold('list(dsub ORDER BY sub_id)')} AS adc
        FROM cand GROUP BY probe_id, vec_id
    ),
    ranked AS (
        SELECT probe_id, vec_id,
               adc / (sqrt({_ddot('pv', 'pv', _DIM)}) * vnrm) AS pcos,
               ROW_NUMBER() OVER (
                   PARTITION BY probe_id
                   ORDER BY adc / (sqrt({_ddot('pv', 'pv', _DIM)}) * vnrm)
                            DESC, vec_id) AS rank
        FROM scored JOIN p USING (probe_id)
    )"""


def _pq_rerank_tail(mk: int) -> str:
    """Refine phase after :func:`_pq_ctes`'s ``ranked``: cut at ``mk``
    per probe, full-precision re-score, re-rank — ends with
    ``reranked`` (identical shape to the int8 family's tail)."""
    return f""",
    cut AS (SELECT probe_id, vec_id FROM ranked WHERE rank <= {mk}),
    rescore AS (
        SELECT cut.probe_id, cut.vec_id, {_cos('pv', 'v')} AS cos
        FROM cut
        JOIN p ON cut.probe_id = p.probe_id
        JOIN nz l ON cut.vec_id = l.vec_id
    ),
    reranked AS (
        SELECT probe_id, vec_id, cos,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY cos DESC, vec_id) AS rank
        FROM rescore
    )"""


def _pq_ctes_res(
    seeds_sql: str, corpus_where: str = "TRUE", cb_where: str = "TRUE"
) -> str:
    """The RESIDUAL IVF-PQ pipeline (r14, VERDICT r13 #3) as DuckDB
    CTEs mirroring ``operators/pq.py`` with ``residual=True``: the
    codebooks are picked over (and the codes encode) ``rv = v −
    centroid(list)`` — an exact per-element subtraction — and scoring
    adds the exact probe·centroid dot before the ADC fold:
    ``pcos = (cdot + adc) / (‖p‖·‖v‖)``.  Every double is the same
    strict fold chain the engine runs, so residual pcos is judged
    EXACTLY too."""
    psub = f"list_slice(pv, (w.sub_id-1)*{_SD}+1, w.sub_id*{_SD})"
    return f"""{_E},
    seeds AS ({seeds_sql}),
    assign AS (
        SELECT e.vec_id, e.v, seed_id, sv,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos('sv', 'v')} DESC, seed_id) AS rn
        FROM e CROSS JOIN seeds
    ),
    res AS (
        SELECT vec_id, v, seed_id AS list_id, sv,
               list_transform(generate_series(1, {_DIM}),
                              i -> v[i] - sv[i]) AS rv
        FROM assign WHERE rn = 1
    ),
    lists AS (SELECT vec_id, v, list_id, sv, rv FROM res
              WHERE ({corpus_where})),
    nz AS (
        SELECT vec_id, v, list_id, sv, rv,
               sqrt({_ddot('v', 'v', _DIM)}) AS vnrm
        FROM lists
        WHERE sqrt({_ddot('v', 'v', _DIM)}) > 0
    ),
    cbpick AS (
        SELECT rv, ROW_NUMBER() OVER (
            ORDER BY {seed_rank_hash('vec_id')}, vec_id) AS code_id
        FROM res WHERE ({cb_where})
    ),
    cb AS (
        SELECT js.sub_id, code_id,
               list_slice(rv, (js.sub_id-1)*{_SD}+1, js.sub_id*{_SD}) AS cv
        FROM cbpick CROSS JOIN generate_series(1, {_M}) AS js(sub_id)
        WHERE code_id <= {_CODES}
    ),
    subs AS (
        SELECT vec_id, js.sub_id,
               list_slice(rv, (js.sub_id-1)*{_SD}+1, js.sub_id*{_SD}) AS sv2
        FROM nz CROSS JOIN generate_series(1, {_M}) AS js(sub_id)
    ),
    enc AS (
        SELECT vec_id, sub_id, cv,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                  ORDER BY {_dd2('sv2', 'cv', _SD)}, code_id) AS rn2
        FROM subs JOIN cb USING (sub_id)
    ),
    win AS (SELECT vec_id, sub_id, cv FROM enc WHERE rn2 = 1),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM e
          WHERE vec_id % {_PROBE_STRIDE} = 0),
    plists AS (
        SELECT probe_id, pv, list_id FROM (
            SELECT probe_id, pv, seed_id AS list_id,
                   ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY {_cos('pv', 'sv')} DESC, seed_id) AS lr
            FROM p CROSS JOIN seeds
        ) WHERE lr <= 2
    ),
    cand AS (
        SELECT probe_id, pv, nz.vec_id AS vec_id, w.sub_id, nz.vnrm,
               {_ddot('pv', 'nz.sv', _DIM)} AS cdot,
               {_ddot(psub, 'w.cv', _SD)} AS dsub
        FROM plists
        JOIN nz ON plists.list_id = nz.list_id AND probe_id != nz.vec_id
        JOIN win w ON w.vec_id = nz.vec_id
    ),
    scored AS (
        SELECT probe_id, vec_id, MAX(vnrm) AS vnrm, MAX(cdot) AS cdot,
               {_dfold('list(dsub ORDER BY sub_id)')} AS adc
        FROM cand GROUP BY probe_id, vec_id
    ),
    ranked AS (
        SELECT probe_id, vec_id,
               (cdot + adc) / (sqrt({_ddot('pv', 'pv', _DIM)}) * vnrm) AS pcos,
               ROW_NUMBER() OVER (
                   PARTITION BY probe_id
                   ORDER BY (cdot + adc) /
                            (sqrt({_ddot('pv', 'pv', _DIM)}) * vnrm)
                            DESC, vec_id) AS rank
        FROM scored JOIN p USING (probe_id)
    )"""


@query(
    "sim_ivf_topk_pq_residual",
    oracle=f"""
    WITH {_pq_ctes_res(_SEEDS_NLISTS)}
    SELECT probe_id, rank, vec_id, pcos FROM ranked WHERE rank <= 3
    """,
)
def sim_ivf_topk_pq_residual(spark, sf_dir):
    """RESIDUAL-encoded IVF-PQ serving (r14, VERDICT r13 #3 — the
    FAISS-default form): codebooks quantize ``v − centroid(list)``
    instead of the raw vector.  Residuals cluster tightly around zero
    while raw vectors spread over the sphere, so the same (m=8,
    codes=32) geometry spends its codewords on a smaller cloud — the
    recall pair measures the sharpening.  Serving adds the exact
    probe·centroid dot per routed list (seeds already broadcast for
    routing; nlists-bounded): still zero Python, zero extra shuffle,
    and ``pcos`` stays EXACTLY judged — the oracle re-derives the
    residuals, the residual codebooks, and the (cdot + adc) fold
    chain from the base table."""
    from .pipeline_e2e import _workdir

    probes, corpus = _probes(spark, sf_dir)
    root = _workdir(sf_dir, "ivf_index_pq_res")
    PQ.ivf_build_index_pq(
        corpus, root, nlists=_NLISTS, m=_M, codes=_CODES, residual=True
    )
    return PQ.ivf_topk_indexed_pq(probes, root, k=3, nprobe=2)


@query(
    "sim_ivf_recall_pq_residual",
    oracle=f"""WITH {_pq_ctes_res(_SEEDS_NLISTS)}"""
    f"""{_pq_rerank_tail(_PQ_RERANK_M * 3)}{_recall_tail('reranked')}""",
)
def sim_ivf_recall_pq_residual(spark, sf_dir):
    """Per-probe recall@3 of the RESIDUAL PQ re-rank serve against the
    exact brute-force top-3 — the recall pair for the residual tier at
    IDENTICAL geometry to ``sim_ivf_recall_pq_rerank`` (same m, codes,
    nlists, nprobe, survivor cut).  Measured honestly: residual wins
    where coarse centroids capture cluster structure —
    tests/test_pq.py pins residual recall ≥ raw (rerank AND ADC-only)
    on a CLUSTERED corpus at this geometry, and pins the distortion
    inverse on this repo's near-uniform synthetic embeddings (residual
    = difference of ~independent draws ⇒ ~2x the variance; see
    ``pq_distortion``).  The tier is correct either way — this entry
    judges it — and the metric chooses it per corpus."""
    from .pipeline_e2e import _workdir

    probes, corpus = _probes(spark, sf_dir)
    root = _workdir(sf_dir, "ivf_index_pq_res_recall")
    PQ.ivf_build_index_pq(
        corpus,
        root,
        nlists=_NLISTS,
        m=_M,
        codes=_CODES,
        residual=True,
        rerank_payload=True,
    )
    ann = PQ.ivf_topk_indexed_pq_rerank(
        probes, root, k=3, nprobe=2, m=_PQ_RERANK_M
    )
    return _recall_of(ann, probes, corpus)


#: Lloyd iterations for the judged trained entry: ONE step (the oracle
#: unrolls the same count; more steps = mechanically longer SQL, same
#: arithmetic — pytest covers multi-iteration convergence).
_TRAIN_ITER = 1


def _trained_cb_ctes() -> str:
    """Hash-rank init + ONE vec_id-ordered-fold Lloyd step as DuckDB
    CTEs — the exact replay of ``train_pq_codebooks_fold(n_iter=1)``:
    assignment is argmin-L2² with ties to the smallest code_id, the
    update is a strict fold over members SORTED BY vec_id divided by
    the count (the order pin that makes a float mean engine-exact),
    and empty codewords keep their init position.  Ends with ``cb``."""
    return f"""
    cb0pick AS (
        SELECT v, ROW_NUMBER() OVER (
            ORDER BY {seed_rank_hash('vec_id')}, vec_id) AS code_id
        FROM e
    ),
    cb0 AS (
        SELECT js.sub_id, code_id,
               list_slice(v, (js.sub_id-1)*{_SD}+1, js.sub_id*{_SD}) AS cv
        FROM cb0pick CROSS JOIN generate_series(1, {_M}) AS js(sub_id)
        WHERE code_id <= {_CODES}
    ),
    tsubs AS (
        SELECT vec_id, js.sub_id,
               list_slice(v, (js.sub_id-1)*{_SD}+1, js.sub_id*{_SD}) AS sv2
        FROM e CROSS JOIN generate_series(1, {_M}) AS js(sub_id)
    ),
    ta AS (
        SELECT vec_id, sub_id, sv2, code_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                  ORDER BY {_dd2('sv2', 'cv', _SD)}, code_id) AS rn3
        FROM tsubs JOIN cb0 USING (sub_id)
    ),
    mem AS (SELECT vec_id, sub_id, sv2, code_id FROM ta WHERE rn3 = 1),
    upd AS (
        SELECT sub_id, code_id, g.i AS i,
               {_dfold('list(sv2[g.i] ORDER BY vec_id)')} / COUNT(*) AS comp
        FROM mem CROSS JOIN generate_series(1, {_SD}) AS g(i)
        GROUP BY sub_id, code_id, g.i
    ),
    cb1 AS (SELECT sub_id, code_id, list(comp ORDER BY i) AS cv
            FROM upd GROUP BY sub_id, code_id),
    cb AS (
        SELECT cb0.sub_id, cb0.code_id, COALESCE(cb1.cv, cb0.cv) AS cv
        FROM cb0 LEFT JOIN cb1 USING (sub_id, code_id)
    )"""


def _pq_serve_ctes_given_cb(seeds_sql: str) -> str:
    """Encode + route + ADC-score against an ALREADY-DEFINED ``cb``
    CTE (the serve half of :func:`_pq_ctes`, shared by the trained
    oracle) — ends with ``ranked``."""
    psub = f"list_slice(pv, (w.sub_id-1)*{_SD}+1, w.sub_id*{_SD})"
    return f"""
    seeds AS ({seeds_sql}),
    assign AS (
        SELECT e.vec_id, e.v, seed_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos('sv', 'v')} DESC, seed_id) AS rn
        FROM e CROSS JOIN seeds
    ),
    lists AS (SELECT vec_id, v, seed_id AS list_id FROM assign WHERE rn = 1),
    nz AS (
        SELECT vec_id, v, list_id, sqrt({_ddot('v', 'v', _DIM)}) AS vnrm
        FROM lists
        WHERE sqrt({_ddot('v', 'v', _DIM)}) > 0
    ),
    subs AS (
        SELECT vec_id, js.sub_id,
               list_slice(v, (js.sub_id-1)*{_SD}+1, js.sub_id*{_SD}) AS sv2
        FROM nz CROSS JOIN generate_series(1, {_M}) AS js(sub_id)
    ),
    enc AS (
        SELECT vec_id, sub_id, cv,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub_id
                                  ORDER BY {_dd2('sv2', 'cv', _SD)}, code_id) AS rn2
        FROM subs JOIN cb USING (sub_id)
    ),
    win AS (SELECT vec_id, sub_id, cv FROM enc WHERE rn2 = 1),
    p AS (SELECT vec_id AS probe_id, v AS pv FROM e
          WHERE vec_id % {_PROBE_STRIDE} = 0),
    plists AS (
        SELECT probe_id, pv, list_id FROM (
            SELECT probe_id, pv, seed_id AS list_id,
                   ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY {_cos('pv', 'sv')} DESC, seed_id) AS lr
            FROM p CROSS JOIN seeds
        ) WHERE lr <= 2
    ),
    cand AS (
        SELECT probe_id, pv, nz.vec_id AS vec_id, w.sub_id, nz.vnrm,
               {_ddot(psub, 'w.cv', _SD)} AS dsub
        FROM plists
        JOIN nz ON plists.list_id = nz.list_id AND probe_id != nz.vec_id
        JOIN win w ON w.vec_id = nz.vec_id
    ),
    scored AS (
        SELECT probe_id, vec_id, MAX(vnrm) AS vnrm,
               {_dfold('list(dsub ORDER BY sub_id)')} AS adc
        FROM cand GROUP BY probe_id, vec_id
    ),
    ranked AS (
        SELECT probe_id, vec_id,
               adc / (sqrt({_ddot('pv', 'pv', _DIM)}) * vnrm) AS pcos,
               ROW_NUMBER() OVER (
                   PARTITION BY probe_id
                   ORDER BY adc / (sqrt({_ddot('pv', 'pv', _DIM)}) * vnrm)
                            DESC, vec_id) AS rank
        FROM scored JOIN p USING (probe_id)
    )"""


@query(
    "sim_ivf_topk_pq_trained",
    oracle=f"""
    WITH {_E},{_trained_cb_ctes()},{_pq_serve_ctes_given_cb(_SEEDS_NLISTS)}
    SELECT probe_id, rank, vec_id, pcos FROM ranked WHERE rank <= 3
    """,
)
def sim_ivf_topk_pq_trained(spark, sf_dir):
    """IVF-PQ serving with LLOYD-TRAINED codebooks, fully judged (r14,
    VERDICT r13 #6 — the trained path finally under the driver hash):
    ``train_pq_codebooks_fold`` runs hash-rank init + {_TRAIN_ITER}
    Lloyd step(s) whose member means are strict folds over vec_id-
    sorted members — the order pin that makes a float mean bit-exact
    on any partitioning AND SQL-replayable, which pyspark.ml KMeans
    (k-means|| init, unordered aggregation) cannot give.  The oracle
    re-derives the init, the assignment, the ordered-fold update, and
    the full ADC serve; ``pcos`` is judged EXACTLY."""
    from .pipeline_e2e import _workdir

    probes, corpus = _probes(spark, sf_dir)
    root = _workdir(sf_dir, "ivf_index_pq_trained")
    cb = PQ.train_pq_codebooks_fold(corpus, _M, _CODES, n_iter=_TRAIN_ITER)
    PQ.ivf_build_index_pq(
        corpus, root, nlists=_NLISTS, m=_M, codes=_CODES, codebooks=cb
    )
    return PQ.ivf_topk_indexed_pq(probes, root, k=3, nprobe=2)


@query(
    "sim_ivf_topk_pq",
    oracle=f"""
    WITH {_pq_ctes(_SEEDS_NLISTS)}
    SELECT probe_id, rank, vec_id, pcos FROM ranked WHERE rank <= 3
    """,
)
def sim_ivf_topk_pq(spark, sf_dir):
    """ANN top-3 against the PRODUCT-QUANTIZED persisted index — the
    compression rung below int8: the routed lists' payload is m=8
    codeword ids + a norm per vector instead of 64 int8s (~8x less
    routed IO; d/m in general).  Scoring is ADC — the probe stays
    full-precision and the dot assembles per subspace against the
    codeword via deterministic strict folds, so ``pcos`` is judged
    EXACTLY.  Approximation quality is the paired recall entry;
    serving-grade recall is the re-rank entry's job."""
    from .pipeline_e2e import _workdir

    probes, corpus = _probes(spark, sf_dir)
    root = _workdir(sf_dir, "ivf_index_pq")
    PQ.ivf_build_index_pq(corpus, root, nlists=_NLISTS, m=_M, codes=_CODES)
    return PQ.ivf_topk_indexed_pq(probes, root, k=3, nprobe=2)


@query(
    "sim_ivf_topk_pq_rerank",
    oracle=f"""
    WITH {_pq_ctes(_SEEDS_NLISTS)}{_pq_rerank_tail(_PQ_RERANK_M * 3)}
    SELECT probe_id, rank, vec_id, cos FROM reranked WHERE rank <= 3
    """,
)
def sim_ivf_topk_pq_rerank(spark, sf_dir):
    """PQ-ADC two-tier serving: the PQ payload cuts candidates to the
    per-probe top-15 by ADC estimate; only those survivors re-score
    at full precision (pruned to the survivors' lists + pushed
    ``vec_id IN`` filter), final top-3 by EXACT cosine.  The wider
    survivor cut (m=5 vs int8's 3) is what buys back PQ's coarser
    estimate — the oracle replays both phases."""
    from .pipeline_e2e import _workdir

    probes, corpus = _probes(spark, sf_dir)
    root = _workdir(sf_dir, "ivf_index_pq_rerank")
    PQ.ivf_build_index_pq(
        corpus, root, nlists=_NLISTS, m=_M, codes=_CODES, rerank_payload=True
    )
    return PQ.ivf_topk_indexed_pq_rerank(
        probes, root, k=3, nprobe=2, m=_PQ_RERANK_M
    )


_SEEDS_NLISTS_BASE_PQ = (
    f"SELECT vec_id AS seed_id, v AS sv FROM e WHERE vec_id % 2 = 0 "
    f"ORDER BY {seed_rank_hash('vec_id')}, vec_id LIMIT {_NLISTS}"
)


@query(
    "stream_ivf_pq_ingest_e2e",
    oracle=f"""
    WITH {_pq_ctes(_SEEDS_NLISTS_BASE_PQ, cb_where="vec_id % 2 = 0")}
    {_pq_rerank_tail(_PQ_RERANK_M * 3)}
    SELECT probe_id, rank, vec_id, cos FROM reranked WHERE rank <= 3
    """,
)
def stream_ivf_pq_ingest_e2e(spark, sf_dir):
    """Streaming index-at-ingest for the IVF-PQ family, end to end
    under the driver hash (r13 — lifecycle parity with the float and
    int8/ADC families): the even half of the corpus seeds a
    rerank-payload PQ index (hash-rank seeds AND codebooks frozen from
    the base half), the odd half lands as THREE parquet files streamed
    one per microbatch (maxFilesPerTrigger=1, AvailableNow,
    checkpointed), each assigned against the frozen seeds, ENCODED
    with the frozen codebooks, and pruned-MERGEd into BOTH payloads in
    lockstep — then the grown index serves the two-tier PQ-ADC
    search.  Must equal a build-over-everything with those freezes,
    replayed through the PQ cut + full-precision re-rank.  No epoch
    bookkeeping: codebook encoding is a per-vector pure function and
    both MERGEs are keyed, the same replay-idempotence argument as
    the int8 stream (streaming/ivf_ingest.py)."""
    import os

    from ..streaming.ivf_ingest import stream_ivf_ingest
    from .pipeline_e2e import _workdir

    probes, corpus = _probes(spark, sf_dir)
    work = _workdir(sf_dir, "ivf_pq_stream")
    root = os.path.join(work, "index")
    PQ.ivf_build_index_pq(
        corpus.filter(F.col("vec_id") % 2 == 0),
        root,
        nlists=_NLISTS,
        m=_M,
        codes=_CODES,
        rerank_payload=True,
    )
    landing = os.path.join(work, "landing")
    new = corpus.filter(F.col("vec_id") % 2 == 1)
    for part in range(3):
        new.filter(F.expr(f"((vec_id - 1) div 2) % 3 = {part}")).coalesce(
            1
        ).write.mode("append").parquet(landing)
    stream_ivf_ingest(
        spark,
        landing,
        new.schema,
        root,
        os.path.join(work, "ckpt"),
        max_files_per_trigger=1,
        pq=True,
    )
    return PQ.ivf_topk_indexed_pq_rerank(
        probes, root, k=3, nprobe=2, m=_PQ_RERANK_M
    )


@query(
    "sim_ivf_recall_pq_rerank",
    oracle=f"""WITH {_pq_ctes(_SEEDS_NLISTS)}"""
    f"""{_pq_rerank_tail(_PQ_RERANK_M * 3)}{_recall_tail('reranked')}""",
)
def sim_ivf_recall_pq_rerank(spark, sf_dir):
    """Per-probe recall@3 of the PQ re-rank serve against the exact
    brute-force top-3 — the recall pair VERDICT r12 #7 asks for:
    tests/test_pq.py asserts this frame against the int8 rerank
    entry's (PQ's wider survivor cut must keep it within the same
    routing-ceiling band) and against the exact baseline.  Same
    intersection protocol as every recall entry."""
    from .pipeline_e2e import _workdir

    probes, corpus = _probes(spark, sf_dir)
    root = _workdir(sf_dir, "ivf_index_pq_recall")
    PQ.ivf_build_index_pq(
        corpus, root, nlists=_NLISTS, m=_M, codes=_CODES, rerank_payload=True
    )
    ann = PQ.ivf_topk_indexed_pq_rerank(
        probes, root, k=3, nprobe=2, m=_PQ_RERANK_M
    )
    return _recall_of(ann, probes, corpus)
