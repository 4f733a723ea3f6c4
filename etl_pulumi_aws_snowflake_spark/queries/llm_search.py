"""Retrieval queries (SURVEY.md §2.10): BM25 keyword search over the
documents table and hybrid keyword+vector retrieval fused by RRF.

Oracles are generated from the SAME dialect templates the Spark side
uses (operators/search.py builds its score SQL dialect-neutral), so
the two engines cannot drift.  The BM25 entry judges RANKS only — its
``ln`` differs from DuckDB's in the last ulp (measured: 1 of 19 idf
values, ~7% of composed scores at 1 ulp), exactly the
``sim_cosine_topk_blas`` contract; scores are tolerance-compared in
tests/test_llm_ops.py.  The RRF entry has no transcendentals, so its
fused doubles are judged exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import vectors as V
from ..operators import search as SR
from ..operators import similarity as S
from ._util import t
from .registry import query

#: Fixed keyword query for the BM25 entry — terms from the corpus
#: vocabulary with distinct document-frequency profiles.
BM25_TERMS = ("vector", "merge", "customer", "spark")
_BM25_K = 10

#: Probe stride for hybrid retrieval: every 250th id that has BOTH a
#: document row and an embedding row (the two tables share an id
#: domain but not a row count at every SF).
_HYBRID_STRIDE = 250
_ARM_N = 20
_RRF_K = 5

_WORDS = H.words("text").duck


def _bm25_oracle(where: str = "TRUE") -> str:
    """Full-relational BM25 oracle, parameterized on WHICH documents
    the (possibly appended-to / deleted-from) index holds — stats and
    ranks are both recomputed over exactly that corpus."""
    tfs = ",\n           ".join(
        f"{SR._tf(term).duck} AS tf_{i}" for i, term in enumerate(BM25_TERMS)
    )
    dfs = ",\n           ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    return f"""
    WITH d AS (SELECT doc_id, {_WORDS} AS ws FROM documents WHERE {where}),
    base AS (
        SELECT doc_id, len(ws) AS dl,
           {tfs}
        FROM d
    ),
    stats AS (
        SELECT COUNT(*) AS n, SUM(dl) AS sum_dl,
           {dfs}
        FROM base
    ),
    joined AS (
        SELECT base.*, stats.*,
               cast(sum_dl as double) / cast(n as double) AS avgdl
        FROM base CROSS JOIN stats
    ),
    scored AS (
        SELECT doc_id, {SR.bm25_score_expr(len(BM25_TERMS))} AS score
        FROM joined
    ),
    ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
        FROM scored
    )
    SELECT rank, doc_id FROM ranked WHERE rank <= {_BM25_K}
    """


@query("search_bm25_topk", oracle=_bm25_oracle())
def search_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-10 for a fixed keyword query — the keyword
    retrieval arm a curation pipeline uses for targeted corpus probes
    and contamination sweeps.  Two column-pruned corpus scans (per-row
    tf/dl in codegen, no explode), a 1-row stats aggregate broadcast
    back, a TakeOrderedAndProject top-k: nothing corpus-sized ever
    shuffles.
    Judged rank-only (ulp caveat in operators/search.py); scores
    checked at 1e-9 in tests/test_llm_ops.py."""
    return SR.bm25_topk(
        t(spark, sf_dir, "documents"), BM25_TERMS, k=_BM25_K
    ).select("rank", "doc_id")


@query("search_bm25_indexed", oracle=_bm25_oracle())
def search_bm25_indexed(spark, sf_dir):
    """BM25 top-10 against the PERSISTED inverted index — the served
    query path: ``bm25_build_index`` lands (term, doc, dl, tf) postings
    partitioned by term bucket plus a 1-row corpus-stats snapshot, and
    ``bm25_topk_indexed`` reads ONLY the query terms' routed buckets
    (manifest pruning + in-bucket term pushdown).  Bit-identical to
    :func:`search_bm25_topk` (same score expression over the same
    tf/dl/n/df/avgdl values — property-tested), so the oracle is the
    same full-corpus SQL: the entry certifies the round trip through
    the index layer preserves results exactly.  Judged rank-only (the
    ``ln`` ulp contract of the scan entry)."""
    from .pipeline_e2e import _workdir

    root = _workdir(sf_dir, "bm25_index")
    SR.bm25_build_index(t(spark, sf_dir, "documents"), root, n_buckets=16)
    return SR.bm25_topk_indexed(spark, root, BM25_TERMS, k=_BM25_K).select(
        "rank", "doc_id"
    )


@query("search_bm25_appended", oracle=_bm25_oracle())
def search_bm25_appended(spark, sf_dir):
    """Index maintenance under the driver hash: build the inverted
    index from 90% of the corpus, ``bm25_index_append`` the held-out
    batch (partition-pruned MERGE of its postings + a corpus-stats
    advance), then search — the result must equal a search over an
    index built from EVERYTHING, i.e. the scan oracle's full-corpus
    ranks.  This pins the append's df/n/avgdl bookkeeping: any drift
    in the merged postings or the meta advance moves BM25 scores and
    fails the hash."""
    from .pipeline_e2e import _workdir

    docs = t(spark, sf_dir, "documents")
    root = _workdir(sf_dir, "bm25_index_app")
    SR.bm25_build_index(docs.filter(F.col("doc_id") % 10 != 0), root, n_buckets=16)
    SR.bm25_index_append(docs.filter(F.col("doc_id") % 10 == 0), root)
    return SR.bm25_topk_indexed(spark, root, BM25_TERMS, k=_BM25_K).select(
        "rank", "doc_id"
    )


#: Fixed phrase for the positional-index entry — 3 contiguous tokens
#: that occur in ~7 fixture documents, exercising the k-way positional
#: intersection (a 2-term phrase would only test one intersect).
_PHRASE = ("stream", "table", "hash")


def _phrase_oracle() -> str:
    k = len(_PHRASE)
    conj = " AND ".join(
        f"ws[i + {i}] = '{t}'" for i, t in enumerate(_PHRASE)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    m AS (
        SELECT doc_id,
               len(list_filter(generate_series(1, len(ws) - {k - 1}),
                   i -> {conj})) AS n_matches
        FROM toks WHERE len(ws) >= {k}
    )
    SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches
    FROM m WHERE n_matches > 0
    """


@query("search_phrase_indexed", oracle=_phrase_oracle())
def search_phrase_indexed(spark, sf_dir):
    """Exact PHRASE search against the positional inverted index:
    (doc_id, n_matches) for every document containing the fixed
    3-token phrase contiguously — the capability that separates a
    keyword index from a search engine.  ``bm25_build_index(positions=
    True)`` adds each term's sorted token positions to its postings
    rows (same routed-bucket layout); the query reads ONLY the
    phrase's ≤3 routed buckets and intersects position arrays
    (P₀ ∩ P₁−1 ∩ P₂−2) entirely in codegen — the corpus text is never
    read at query time.  The oracle counts contiguous-subsequence
    starts by scanning the token arrays relationally, so the postings'
    positions, the pivot, and the intersection arithmetic are all
    hash-certified, match COUNTS included (overlapping matches
    property-tested)."""
    from .pipeline_e2e import _workdir

    docs = t(spark, sf_dir, "documents")
    root = _workdir(sf_dir, "bm25_index_pos")
    SR.bm25_build_index(docs, root, n_buckets=16, positions=True)
    return SR.phrase_search_indexed(spark, root, _PHRASE)


@query("stream_bm25_ingest_e2e", oracle=_bm25_oracle())
def stream_bm25_ingest_e2e(spark, sf_dir):
    """Streaming index-at-ingest end-to-end under the driver hash: the
    standing corpus (doc_id % 10 != 0) seeds the persisted inverted
    index; the % 10 == 0 docs land as THREE parquet files streamed one
    per microbatch (maxFilesPerTrigger=1, AvailableNow, checkpointed),
    each appended via the pruned postings MERGE with the epoch-stamped
    meta advance.  The final search must equal the FULL-corpus scan
    oracle — which certifies the streaming loop, the per-batch pruned
    append, AND the n/Σdl/df bookkeeping across epochs in one row
    (streaming/bm25_ingest.py has the batching-independence
    argument)."""
    import os

    from ..streaming.bm25_ingest import stream_bm25_ingest
    from .pipeline_e2e import _workdir

    work = _workdir(sf_dir, "bm25_stream")
    docs = t(spark, sf_dir, "documents")
    root = os.path.join(work, "index")
    SR.bm25_build_index(docs.filter(F.col("doc_id") % 10 != 0), root, n_buckets=16)

    landing = os.path.join(work, "landing")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    for part in range(3):
        new.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    stream_bm25_ingest(
        spark,
        landing,
        new.schema,
        root,
        os.path.join(work, "ckpt"),
        max_files_per_trigger=1,
    )
    return SR.bm25_topk_indexed(spark, root, BM25_TERMS, k=_BM25_K).select(
        "rank", "doc_id"
    )


@query("search_bm25_deleted", oracle=_bm25_oracle("doc_id % 10 != 0"))
def search_bm25_deleted(spark, sf_dir):
    """Index DELETION under the driver hash: build the inverted index
    from the full corpus, ``bm25_index_delete`` the doc_id % 10 == 0
    batch (postings recomputed from the original text route the
    pruned MERGE; ``meta`` retreats by the batch's count/Σdl — the
    exact inverse of the append's advance), then search.  The oracle
    recomputes stats AND ranks over only the surviving documents, so
    a stale posting, a missed one, or a drifted n/sum_dl/df all move
    BM25 scores and fail the hash."""
    from .pipeline_e2e import _workdir

    docs = t(spark, sf_dir, "documents")
    root = _workdir(sf_dir, "bm25_index_del")
    SR.bm25_build_index(docs, root, n_buckets=16)
    SR.bm25_index_delete(docs.filter(F.col("doc_id") % 10 == 0), root)
    return SR.bm25_topk_indexed(spark, root, BM25_TERMS, k=_BM25_K).select(
        "rank", "doc_id"
    )


_E = "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"


def _cos(a: str, b: str) -> str:
    return V.cosine(V.X("", a), V.X("", b)).duck


_SHINGLES = H.shingle_hashes(H.word_hashes("text"), k=3).duck


def _hybrid_oracle() -> str:
    return f"""
    WITH {_E},
    sets AS (
        SELECT doc_id, list_distinct({_SHINGLES}) AS shingles
        FROM documents
    ),
    sized AS (SELECT doc_id, shingles, len(shingles) AS n FROM sets),
    nonempty AS (SELECT * FROM sized WHERE n > 0),
    ids AS (
        SELECT doc_id FROM documents
        WHERE doc_id % {_HYBRID_STRIDE} = 0
          AND doc_id IN (SELECT vec_id FROM embeddings)
    ),
    lexpairs AS (
        SELECT i.doc_id AS probe_id, c.doc_id AS doc_id,
               CAST(len(list_intersect(p.shingles, c.shingles)) AS DOUBLE)
                 / CAST(p.n + c.n
                        - len(list_intersect(p.shingles, c.shingles)) AS DOUBLE)
                 AS jac
        FROM ids i
        JOIN nonempty p ON p.doc_id = i.doc_id
        JOIN nonempty c ON c.doc_id != i.doc_id
    ),
    lex AS (
        SELECT probe_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY jac DESC, doc_id) AS r
        FROM lexpairs QUALIFY r <= {_ARM_N}
    ),
    vecpairs AS (
        SELECT i.doc_id AS probe_id, e.vec_id AS doc_id,
               {_cos('pe.v', 'e.v')} AS cos
        FROM ids i
        JOIN e pe ON pe.vec_id = i.doc_id
        CROSS JOIN e
        WHERE e.vec_id != i.doc_id
    ),
    vec AS (
        SELECT probe_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY cos DESC, doc_id) AS r
        FROM vecpairs QUALIFY r <= {_ARM_N}
    ),
    tagged AS (
        SELECT probe_id, doc_id, r, 0 AS arm FROM lex
        UNION ALL
        SELECT probe_id, doc_id, r, 1 AS arm FROM vec
    ),
    piv AS (
        SELECT probe_id, doc_id,
               MAX(CASE WHEN arm = 0 THEN r END) AS r_0,
               MAX(CASE WHEN arm = 1 THEN r END) AS r_1
        FROM tagged GROUP BY probe_id, doc_id
    ),
    fused AS (
        SELECT probe_id, doc_id,
               coalesce(1.0 / (cast(60 + r_0 as double)), 0.0)
                 + coalesce(1.0 / (cast(60 + r_1 as double)), 0.0) AS rrf
        FROM piv
    ),
    ranked AS (
        SELECT probe_id, doc_id, rrf,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY rrf DESC, doc_id) AS rank
        FROM fused
    )
    SELECT probe_id, rank, doc_id, rrf FROM ranked WHERE rank <= {_RRF_K}
    """


@query("search_hybrid_rrf", oracle=_hybrid_oracle())
def search_hybrid_rrf(spark, sf_dir):
    """Hybrid "more like this" retrieval: for each probe id present in
    BOTH tables, rank the corpus lexically (3-gram shingle Jaccard,
    top-20) and by embedding cosine (top-20), fuse with reciprocal-rank
    fusion (k=60), judge the fused top-5 per probe.

    RRF is the standard calibration-free fusion — it needs only ranks,
    which here are bit-deterministic in both arms (exact integer set
    math; strict cosine fold), so the fused doubles are judged EXACTLY.
    Both arms keep their scale shapes: probes broadcast, the corpus
    side one narrow projection; fusion joins probe×top-N rank tables,
    never anything corpus-sized."""
    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    ids = (
        docs.select("doc_id")
        .filter(F.col("doc_id") % _HYBRID_STRIDE == 0)
        .join(
            emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "semi"
        )
    )
    probe_docs = docs.join(F.broadcast(ids), "doc_id")
    probe_emb = emb.join(
        F.broadcast(ids.withColumnRenamed("doc_id", "vec_id")), "vec_id"
    )
    lex = SR.jaccard_rank(probe_docs, docs, n=_ARM_N)
    vec = S.cosine_topk(probe_emb, emb, k=_ARM_N).select(
        "probe_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    return SR.rrf_fuse([lex, vec], k=_RRF_K, k_const=60)


def _hybrid_indexed_oracle() -> str:
    """BM25 arm (full-corpus scan ranks — equal to the indexed ranks
    whenever ≥ ARM_N docs match a term, same argument as the
    search_bm25_indexed entry) × the exact IVF replication from
    llm_similarity, fused by the same pinned-order RRF sum."""
    from .llm_similarity import _PROBE_STRIDE, _SEEDS_NLISTS, _ivf_ctes

    tfs = ",\n           ".join(
        f"{SR._tf(term).duck} AS tf_{i}" for i, term in enumerate(BM25_TERMS)
    )
    dfs = ",\n           ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    # _ivf_ctes binds e/seeds/assign/lists/p/plists/cand/ranked with
    # probes at vec_id % _PROBE_STRIDE — the vector arm.  The keyword
    # arm's CTEs are b-prefixed to avoid capture.
    assert _PROBE_STRIDE == 50
    return f"""
    WITH {_ivf_ctes(_SEEDS_NLISTS)},
    bd AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
    bbase AS (
        SELECT doc_id, len(ws) AS dl,
           {tfs}
        FROM bd
    ),
    bstats AS (
        SELECT COUNT(*) AS n, SUM(dl) AS sum_dl,
           {dfs}
        FROM bbase
    ),
    bjoined AS (
        SELECT bbase.*, bstats.*,
               cast(sum_dl as double) / cast(n as double) AS avgdl
        FROM bbase CROSS JOIN bstats
    ),
    bscored AS (
        SELECT doc_id, {SR.bm25_score_expr(len(BM25_TERMS))} AS score
        FROM bjoined
    ),
    branked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
        FROM bscored QUALIFY r <= {_ARM_N}
    ),
    barm AS (
        SELECT p.probe_id, branked.doc_id, branked.r
        FROM branked CROSS JOIN p
    ),
    varm AS (
        SELECT probe_id, vec_id AS doc_id, rank AS r
        FROM ranked WHERE rank <= {_ARM_N}
    ),
    tagged AS (
        SELECT probe_id, doc_id, r, 0 AS arm FROM barm
        UNION ALL
        SELECT probe_id, doc_id, r, 1 AS arm FROM varm
    ),
    piv AS (
        SELECT probe_id, doc_id,
               MAX(CASE WHEN arm = 0 THEN r END) AS r_0,
               MAX(CASE WHEN arm = 1 THEN r END) AS r_1
        FROM tagged GROUP BY probe_id, doc_id
    ),
    fused AS (
        SELECT probe_id, doc_id,
               coalesce(1.0 / (cast(60 + r_0 as double)), 0.0)
                 + coalesce(1.0 / (cast(60 + r_1 as double)), 0.0) AS rrf
        FROM piv
    ),
    frank AS (
        SELECT probe_id, doc_id, rrf,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY rrf DESC, doc_id) AS rank
        FROM fused
    )
    SELECT probe_id, rank, doc_id, rrf FROM frank WHERE rank <= {_RRF_K}
    """


@query("search_hybrid_rrf_indexed", oracle=_hybrid_indexed_oracle())
def search_hybrid_rrf_indexed(spark, sf_dir):
    """Hybrid retrieval SERVED FROM THE PERSISTED INDEXES — the 100 TB
    query path (VERDICT r10 #3): the keyword arm is
    ``bm25_topk_indexed`` (postings read pruned to the query terms'
    routed buckets), the vector arm is ``ivf_topk_indexed`` (corpus
    read pruned to each probe's nprobe routed lists), fused by the
    same pinned-order RRF sum as the scan-path entry.  NEITHER corpus
    table is scanned at serve time (plan-guarded): the only
    corpus-sized reads are the two index builds this entry performs to
    certify the full round trip — at 100 TB those are standing
    artifacts and a query touches only routed index partitions.

    RRF needs only ranks; both arms' ranks are engine-stable (BM25
    rank tiebreak by doc_id; IVF's strict cosine fold), so the fused
    doubles are judged EXACTLY, per-probe top-{_RRF_K}."""
    from .llm_similarity import _NLISTS, _PROBE_STRIDE
    from .pipeline_e2e import _workdir

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    bm_root = _workdir(sf_dir, "bm25_index_hybrid")
    ivf_root = _workdir(sf_dir, "ivf_index_hybrid")
    # The two builds touch disjoint inputs and roots — submit them as
    # concurrent driver jobs (guide §2.6) so the postings build's tail
    # back-fills with the IVF build's tasks instead of serializing two
    # full build pipelines end to end.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fb = pool.submit(SR.bm25_build_index, docs, bm_root, n_buckets=16)
        fv = pool.submit(S.ivf_build_index, emb, ivf_root, nlists=_NLISTS)
        fb.result(), fv.result()

    probes = emb.filter(F.col("vec_id") % _PROBE_STRIDE == 0)
    probe_ids = probes.select(F.col("vec_id").alias("probe_id"))
    # The two SERVE arms also overlap (r19, guide §2.6): each arm's
    # construction runs sequential driver collects (BM25: meta +
    # in-bucket stats; IVF: probe routing), so building them from the
    # same 2-thread pool as the builds lets one arm's routing jobs
    # back-fill the other's collect latency — measured 1.64 -> 1.33 s
    # median on the serve phase (interleaved, identical rows).
    with ThreadPoolExecutor(max_workers=2) as pool:
        fb2 = pool.submit(
            lambda: SR.bm25_topk_indexed(spark, bm_root, BM25_TERMS, k=_ARM_N)
            .select("doc_id", "rank")
            .crossJoin(F.broadcast(probe_ids))
        )
        fv2 = pool.submit(
            lambda: S.ivf_topk_indexed(
                probes, ivf_root, k=_ARM_N, nprobe=2
            ).select("probe_id", F.col("vec_id").alias("doc_id"), "rank")
        )
        barm, varm = fb2.result(), fv2.result()
    return SR.rrf_fuse([barm, varm], k=_RRF_K, k_const=60)
