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
from ._util import t
from .llm_packing import _BUDGET, _NTOK_DUCK, _NTOK_SPARK
from .llm_sampling import hash_gate_duck, hash_gate_spark
from .registry import query

_SH5 = H.shingle_hashes(H.word_hashes("text"), k=5).duck

_QUALITY_DUCK = (
    f"({T.n_words().duck} >= 20 AND {T.stopword_ratio().duck} >= 0.05 "
    f"AND {T.distinct_ratio().duck} >= 0.3 AND {T.punct_ratio().duck} <= 0.2)"
)

_CURATION_ORACLE = f"""
    WITH keepers AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
    ),
    quality AS (
        SELECT d.doc_id, d.text FROM documents d JOIN keepers USING (doc_id)
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


@query("curation_pipeline_e2e", oracle=_CURATION_ORACLE)
def curation_pipeline_e2e(spark, sf_dir):
    """Dedup → quality → decontaminate → split → pack, end-to-end:
    (doc_id, chunk_id, tok_start, tok_end) for every surviving train
    document at the 512-token context budget.  The survivor set and
    the offsets are both hash-judged, so the entry certifies the whole
    chain's composition, not just each stage alone."""
    docs = t(spark, sf_dir, "documents")
    gate10 = F.expr(hash_gate_spark("doc_id", 10))

    keep = D.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    deduped = docs.join(keep, "doc_id")
    quality = deduped.filter(
        (F.expr(T.n_words().spark) >= 20)
        & (F.expr(T.stopword_ratio().spark) >= 0.05)
        & (F.expr(T.distinct_ratio().spark) >= 0.3)
        & (F.expr(T.punct_ratio().spark) <= 0.2)
    )
    bench = docs.filter(gate10)
    train = quality.filter(~gate10)
    flagged = contamination(train, bench, k=5).select("doc_id")
    clean = train.join(flagged, "doc_id", "left_anti").filter(
        F.expr(hash_gate_spark("doc_id", 80))
    )
    toks = clean.select("doc_id", F.expr(_NTOK_SPARK).alias("n_tokens"))
    return P.pack_chunks(toks, _BUDGET, size_col="n_tokens", id_col="doc_id")
