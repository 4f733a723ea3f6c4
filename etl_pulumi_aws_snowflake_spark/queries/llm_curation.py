"""The training-data curation pipeline END-TO-END (SURVEY.md §2.10
family, composed): exact dedup keep-one → quality filter →
benchmark decontamination → train-split gate → sequence packing, one
entry whose output is the final context-window assignment of every
surviving document — the artifact a 100 TB pre-training run actually
consumes.

Every stage is the already-certified operator; the value of this entry
is certifying their COMPOSITION: the packed offsets depend on the
exact surviving id set in order, so any drift in any stage (a survivor
rule, a threshold, a gate, a shingle) changes the hash.  The DuckDB
oracle replays the identical five-stage chain from the same expression
templates.

100 TB shape of the whole chain (each stage's audit is in its own
entry's docstring): the corpus body crosses the wire ZERO times —
dedup shuffles (digest, id) pairs, quality is a scan-side predicate,
decontamination broadcasts the eval suite's shingles, the split gates
at the scan, and packing shuffles (id, n_tokens) pairs through the
range repartition with K driver scalars.  The only full-width corpus
movement in the whole pipeline is the final filtered write a caller
appends.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T
from ..operators import dedup as D
from ..operators import packing as P
from ..operators.decontam import contamination
from ..operators.quality_model import (
    quality_margin,
    quality_margin_duck,
    quality_model_ctes_duck,
    train_quality_lda,
)
from ._util import t
from .llm_packing import _BUDGET, _NTOK_DUCK, _NTOK_SPARK
from .llm_sampling import hash_gate_duck, hash_gate_spark
from .registry import query

_SH5 = H.shingle_hashes(H.word_hashes("text"), k=5).duck

#: Near-dup stage templates — the SAME parameterization as the
#: certified ``dedup_survivors`` entry (llm_dedup.py): 3-gram shingles,
#: 16 minhashes, 8 bands of 2 rows, Jaccard >= 0.8.
_SH3 = H.shingle_hashes(H.word_hashes("text"), k=3).duck
_SIG = H.minhash_signature(H.X("", "shingles"), k=16).duck
_BANDS = H.band_keys(H.X("", "sig"), bands=8, rows=2).duck

_QUALITY_DUCK = (
    f"({T.n_words().duck} >= 20 AND {T.stopword_ratio().duck} >= 0.05 "
    f"AND {T.distinct_ratio().duck} >= 0.3 AND {T.punct_ratio().duck} <= 0.2)"
)

_CURATION_ORACLE = f"""
    WITH RECURSIVE {quality_model_ctes_duck("documents")},
    keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
    ),
    dd AS (
        SELECT d.doc_id, d.text FROM documents d JOIN keepers USING (doc_id)
    ),
    nsets AS (
        SELECT doc_id, list_distinct({_SH3}) AS shingles FROM dd
    ),
    nsized AS (SELECT doc_id, shingles, len(shingles) AS n FROM nsets),
    nnonempty AS (SELECT * FROM nsized WHERE n > 0),
    nsig AS (SELECT doc_id, shingles, n, {_SIG} AS sig FROM nnonempty),
    nkeys AS (SELECT doc_id, shingles, n, {_BANDS} AS bandkeys FROM nsig),
    nbanded AS (
        SELECT doc_id, g.j AS band, bandkeys[g.j + 1] AS key
        FROM nkeys CROSS JOIN generate_series(0, 7) g(j)
    ),
    ncand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM nbanded a
        JOIN nbanded b ON a.band = b.band AND a.key = b.key
                      AND a.doc_id < b.doc_id
    ),
    npairs AS (
        SELECT doc_a, doc_b
        FROM ncand
        JOIN nnonempty sa ON sa.doc_id = doc_a
        JOIN nnonempty sb ON sb.doc_id = doc_b
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / CAST(sa.n + sb.n
                       - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                >= 0.8
    ),
    nedges AS (
        SELECT doc_a AS a, doc_b AS b FROM npairs
        UNION SELECT doc_b, doc_a FROM npairs
    ),
    nreach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM nedges)
        UNION
        SELECT r.a, e2.b FROM nreach r JOIN nedges e2 ON r.b = e2.a
    ),
    ncomp AS (SELECT a AS doc_id, MIN(b) AS keep_id FROM nreach GROUP BY a),
    nd AS (
        SELECT dd.doc_id, dd.text
        FROM dd LEFT JOIN ncomp c USING (doc_id)
        WHERE COALESCE(c.keep_id, dd.doc_id) = dd.doc_id
    ),
    quality AS (
        SELECT doc_id, text FROM nd CROSS JOIN qweights
        WHERE {_QUALITY_DUCK}
          AND ({quality_margin_duck("text")}) > 0
    ),
    bi AS (
        SELECT doc_id AS bench_id, unnest(list_distinct({_SH5})) AS sh
        FROM documents WHERE {hash_gate_duck('doc_id', 10)}
    ),
    ti AS (
        SELECT doc_id, unnest(list_distinct({_SH5})) AS sh
        FROM quality WHERE NOT {hash_gate_duck('doc_id', 10)}
    ),
    flagged AS (SELECT DISTINCT ti.doc_id FROM ti JOIN bi USING (sh)),
    clean AS (
        SELECT doc_id, text FROM quality
        WHERE NOT {hash_gate_duck('doc_id', 10)}
          AND doc_id NOT IN (SELECT doc_id FROM flagged)
          AND {hash_gate_duck('doc_id', 80)}
    ),
    toks AS (SELECT doc_id, {_NTOK_DUCK} AS n_tokens FROM clean),
    o AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tok_off
        FROM toks WHERE n_tokens > 0
    ),
    e AS (
        SELECT doc_id, tok_off, n_tokens,
               UNNEST(generate_series(tok_off // {_BUDGET},
                   (tok_off + n_tokens - 1) // {_BUDGET})) AS chunk_id
        FROM o
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(GREATEST(tok_off, chunk_id * {_BUDGET}) AS BIGINT) AS tok_start,
           CAST(LEAST(tok_off + n_tokens, (chunk_id + 1) * {_BUDGET}) AS BIGINT)
               AS tok_end
    FROM e
"""


@query("curation_pipeline_e2e", oracle=_CURATION_ORACLE)
def curation_pipeline_e2e(spark, sf_dir):
    """Exact dedup → NEAR-dup keep-one → quality (heuristic gates AND
    the trained model) → decontaminate → split → pack, end-to-end:
    (doc_id, chunk_id, tok_start, tok_end) for every surviving train
    document at the 512-token context budget.  The survivor set and
    the offsets are both hash-judged, so the entry certifies the whole
    chain's composition, not just each stage alone.

    The near-dup stage (added r11, VERDICT r10 #4) is the certified
    ``dedup_survivors`` operator — MinHash-LSH pairs over the
    exact-deduped set, connected components, keep each component's
    minimum id — which is what a production 100 TB curation chain
    actually runs between exact dedup and quality filtering.  Its
    scale shape is unchanged by the composition: only (digest, id) /
    (id, band-key) pairs shuffle; the corpus body still never crosses
    the wire (plan-guarded).

    The quality stage is CCNet-shaped since r18 (VERDICT r17 #6): the
    heuristic thresholds AND the trained diagonal-LDA filter
    (operators/quality_model.py), fitted on the full corpus vs its
    corruption twins before the chain runs — one extra integer
    aggregation pass; scoring rides the same scan-side predicate."""
    docs = t(spark, sf_dir, "documents")
    gate10 = F.expr(hash_gate_spark("doc_id", 10))
    # The model fit (one integer-aggregation job, no persists) shares
    # no input with the dedup chain below, whose keep-one stage runs a
    # SEQUENCE of small eager jobs (the connected-components loop) that
    # never fills the cluster on its own — overlap them (guide §2.6) so
    # the training pass back-fills the loop rounds' idle executors
    # instead of serializing in front of the whole chain.
    from concurrent.futures import ThreadPoolExecutor

    from ..cache import deferred_persist

    with ThreadPoolExecutor(max_workers=1) as pool:
        fmodel = pool.submit(train_quality_lda, docs)

        # The exact-dedup keep set is read THREE times — the eager LSH
        # checkpoint, dedup_survivors' id projection, and the final
        # chain's rejoin — and each read re-runs the corpus-wide sha256
        # aggregation.  Persist the NARROW id table (never the text
        # payload: at 100 TB the decision table is the only thing worth
        # holding), so the digest pass runs once; the deferred pool
        # releases it at the next query boundary.
        keep = deferred_persist(
            D.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
        )
        deduped = docs.join(keep, "doc_id")
        npairs = D.minhash_lsh_pairs(
            deduped, k=3, num_hashes=16, bands=8, threshold=0.8
        )
        nkeep = (
            D.dedup_survivors(deduped, npairs)
            .filter(~F.col("is_dup"))
            .select("doc_id")
        )
        deduped = deduped.join(nkeep, "doc_id")
        model = fmodel.result()
    quality = deduped.filter(
        (F.expr(T.n_words().spark) >= 20)
        & (F.expr(T.stopword_ratio().spark) >= 0.05)
        & (F.expr(T.distinct_ratio().spark) >= 0.3)
        & (F.expr(T.punct_ratio().spark) <= 0.2)
        & (quality_margin(model) > F.lit(0.0))
    )
    bench = docs.filter(gate10)
    train = quality.filter(~gate10)
    flagged = contamination(train, bench, k=5).select("doc_id")
    clean = train.join(flagged, "doc_id", "left_anti").filter(
        F.expr(hash_gate_spark("doc_id", 80))
    )
    toks = clean.select("doc_id", F.expr(_NTOK_SPARK).alias("n_tokens"))
    return P.pack_chunks(toks, _BUDGET, size_col="n_tokens", id_col="doc_id")


#: The indexed variant's corpus/batch split: every 5th document is the
#: arriving ingest batch; the rest is the already-curated corpus the
#: persisted LSH index holds.
_BATCH_WHERE = "doc_id % 5 = 0"

_CURATION_IDX_ORACLE = f"""
    WITH keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM documents
        WHERE {_BATCH_WHERE} GROUP BY sha256(text)
    ),
    bd AS (
        SELECT d.doc_id, d.text FROM documents d JOIN keepers USING (doc_id)
    ),
    corp AS (SELECT doc_id, text FROM documents WHERE NOT ({_BATCH_WHERE})),
    nsets AS (SELECT doc_id, list_distinct({_SH3}) AS shingles FROM bd),
    nsized AS (SELECT doc_id, shingles, len(shingles) AS n FROM nsets),
    nnonempty AS (SELECT * FROM nsized WHERE n > 0),
    nsig AS (SELECT doc_id, shingles, n, {_SIG} AS sig FROM nnonempty),
    nkeys AS (SELECT doc_id, shingles, n, {_BANDS} AS bandkeys FROM nsig),
    nbanded AS (
        SELECT doc_id, g.j AS band, bandkeys[g.j + 1] AS key
        FROM nkeys CROSS JOIN generate_series(0, 7) g(j)
    ),
    osets AS (SELECT doc_id, list_distinct({_SH3}) AS shingles FROM corp),
    osized AS (SELECT doc_id, shingles, len(shingles) AS n FROM osets),
    ononempty AS (SELECT * FROM osized WHERE n > 0),
    osig AS (SELECT doc_id, shingles, n, {_SIG} AS sig FROM ononempty),
    okeys AS (SELECT doc_id, shingles, n, {_BANDS} AS bandkeys FROM osig),
    obanded AS (
        SELECT doc_id, g.j AS band, bandkeys[g.j + 1] AS key
        FROM okeys CROSS JOIN generate_series(0, 7) g(j)
    ),
    ncand AS (
        SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_old
        FROM nbanded a
        JOIN obanded b ON a.band = b.band AND a.key = b.key
    ),
    flaggednd AS (
        SELECT DISTINCT doc_new
        FROM ncand
        JOIN nnonempty sa ON sa.doc_id = doc_new
        JOIN ononempty sb ON sb.doc_id = doc_old
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / CAST(sa.n + sb.n
                       - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                >= 0.8
    ),
    nd AS (
        SELECT doc_id, text FROM bd
        WHERE doc_id NOT IN (SELECT doc_new FROM flaggednd)
    ),
    quality AS (
        SELECT doc_id, text FROM nd
        WHERE {_QUALITY_DUCK}
    ),
    bi AS (
        SELECT doc_id AS bench_id, unnest(list_distinct({_SH5})) AS sh
        FROM documents WHERE {hash_gate_duck('doc_id', 10)}
    ),
    ti AS (
        SELECT doc_id, unnest(list_distinct({_SH5})) AS sh
        FROM quality WHERE NOT {hash_gate_duck('doc_id', 10)}
    ),
    flagged AS (SELECT DISTINCT ti.doc_id FROM ti JOIN bi USING (sh)),
    clean AS (
        SELECT doc_id, text FROM quality
        WHERE NOT {hash_gate_duck('doc_id', 10)}
          AND doc_id NOT IN (SELECT doc_id FROM flagged)
          AND {hash_gate_duck('doc_id', 80)}
    ),
    toks AS (SELECT doc_id, {_NTOK_DUCK} AS n_tokens FROM clean),
    o AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tok_off
        FROM toks WHERE n_tokens > 0
    ),
    e AS (
        SELECT doc_id, tok_off, n_tokens,
               UNNEST(generate_series(tok_off // {_BUDGET},
                   (tok_off + n_tokens - 1) // {_BUDGET})) AS chunk_id
        FROM o
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(GREATEST(tok_off, chunk_id * {_BUDGET}) AS BIGINT) AS tok_start,
           CAST(LEAST(tok_off + n_tokens, (chunk_id + 1) * {_BUDGET}) AS BIGINT)
               AS tok_end
    FROM e
"""


def indexed_curation_chain(batch, bench, root: str):
    """The ingest-shaped curate step as ONE function — exact dedup
    within the batch → drop batch docs near-dup to the PERSISTED LSH
    index at ``root`` (``lsh_index_check``, threshold 0.8) → quality
    filter → decontaminate ``train`` against ``bench`` → train-split
    gate → pack — shared verbatim by the hash-certified registry entry
    and the scale-curve op (review r12: the chain was duplicated in
    scripts/scale_curve.py; a threshold tweak in one would silently
    desynchronize what the curve measures from what the driver
    certifies).  Returns the packed (doc_id, chunk_id, tok_start,
    tok_end) assignment of the surviving batch documents."""
    from ..cache import deferred_persist
    from ..operators.dedup import lsh_index_check

    gate10 = F.expr(hash_gate_spark("doc_id", 10))
    # Same narrow-decision persist as the e2e chain: the batch keep set
    # feeds the routed index check AND the survivor rejoin, so without
    # it the batch sha256 aggregation runs once per consumer.
    keep = deferred_persist(
        D.exact_dedup(batch).select(F.col("keep_id").alias("doc_id"))
    )
    deduped = batch.join(keep, "doc_id")
    flagged_nd = (
        lsh_index_check(deduped, root, threshold=0.8)
        .select(F.col("doc_new").alias("doc_id"))
        .distinct()
    )
    survivors = deduped.join(flagged_nd, "doc_id", "left_anti")
    quality = survivors.filter(
        (F.expr(T.n_words().spark) >= 20)
        & (F.expr(T.stopword_ratio().spark) >= 0.05)
        & (F.expr(T.distinct_ratio().spark) >= 0.3)
        & (F.expr(T.punct_ratio().spark) <= 0.2)
    )
    train = quality.filter(~gate10)
    flagged = contamination(train, bench, k=5).select("doc_id")
    clean = train.join(flagged, "doc_id", "left_anti").filter(
        F.expr(hash_gate_spark("doc_id", 80))
    )
    toks = clean.select("doc_id", F.expr(_NTOK_SPARK).alias("n_tokens"))
    return P.pack_chunks(toks, _BUDGET, size_col="n_tokens", id_col="doc_id")


@query("curation_pipeline_indexed_e2e", oracle=_CURATION_IDX_ORACLE)
def curation_pipeline_indexed_e2e(spark, sf_dir):
    """The INGEST-shaped curation chain (VERDICT r11 #4) — the 100 TB
    near-dup stage a continuously-growing corpus actually runs: the
    already-curated corpus lives behind a PERSISTED LSH index
    (``lsh_build_index``, built once), and each arriving batch is
    checked against it with ``lsh_index_check`` — O(batch) pruned
    reads of only the band/doc buckets the batch routes to — instead
    of re-running all-pairs MinHash over everything per batch (the
    ``curation_pipeline_e2e`` shape, right for one-shot curation,
    quadratic-in-corpus for ingest).

    Chain: exact dedup WITHIN the batch → drop batch docs near-dup to
    the INDEXED corpus (Jaccard ≥ 0.8 on the same 3-gram/16-hash/
    8-band parameterization, frozen in the index meta) → quality →
    decontaminate vs the benchmark gate → train-split gate → pack.
    Output is the packed context-window assignment of the surviving
    BATCH documents — hash-judged, so any drift in the index build,
    the routed check, or any downstream stage fails the hash.
    Batch-internal near-dup pairs are out of scope here by design
    (that is the e2e entry's keep-one stage; an ingest deployment runs
    ``lsh_index_append`` after this check, which makes later batches
    see this batch's survivors)."""
    from ..operators.dedup import lsh_build_index
    from .pipeline_e2e import _workdir

    docs = t(spark, sf_dir, "documents")
    batch = docs.filter(F.expr(_BATCH_WHERE))
    corpus = docs.filter(~F.expr(_BATCH_WHERE))
    root = _workdir(sf_dir, "curation_lsh_index")
    lsh_build_index(corpus, root, k=3, num_hashes=16, bands=8)
    bench = docs.filter(F.expr(hash_gate_spark("doc_id", 10)))
    return indexed_curation_chain(batch, bench, root)
