"""Deterministic sampling + corpus filtering (training-data pipeline
operators, SURVEY.md §2.10 family).

``df.sample(seed=...)`` is reproducible only within one Spark version &
partitioning — useless as a data contract.  Hash-gate sampling
(``hash(id) % N < k``) is the scale-correct form: stable across
engines, reruns, repartitions; a row's fate depends only on its key.
Both engines compute the same 60-bit integer from the md5 hex prefix,
so the gates agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as T
from ._util import t
from .registry import query


def hash_gate_spark(key_expr: str, pct: int) -> str:
    """Spark boolean expr: deterministic ~pct% gate on any key."""
    return (
        f"cast(conv(substring(md5(cast({key_expr} as string)), 1, 15), 16, 10) "
        f"as bigint) % 100 < {pct}"
    )


def hash_gate_duck(key_expr: str, pct: int) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({key_expr} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % 100 < {pct}"
    )


@query(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {hash_gate_duck('doc_id', 10)}
    """,
)
def sample_hash_bernoulli(spark, sf_dir):
    """~10% deterministic sample of the corpus keyed on doc_id.  A
    pure scan-side filter: pushes to parquet row groups as a post-scan
    predicate, no shuffle, and the SAME rows are selected on any
    engine, cluster size, or rerun — the property seeded ``sample()``
    cannot give across repartitions."""
    return (
        t(spark, sf_dir, "documents")
        .filter(F.expr(hash_gate_spark("doc_id", 10)))
        .select("doc_id", "lang")
    )


@query(
    "sample_stratified_by_lang",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_sampled
    FROM documents
    WHERE CASE WHEN lang = 'en' THEN {hash_gate_duck('doc_id', 50)}
               ELSE {hash_gate_duck('doc_id', 10)} END
    GROUP BY lang
    """,
)
def sample_stratified_by_lang(spark, sf_dir):
    """Stratified deterministic sampling: 50% of English, 10% of every
    other language — the up/down-weighting step of corpus mixing.  Same
    hash-gate mechanics, per-stratum rate; still a narrow filter."""
    gate = F.when(
        F.col("lang") == "en", F.expr(hash_gate_spark("doc_id", 50))
    ).otherwise(F.expr(hash_gate_spark("doc_id", 10)))
    return (
        t(spark, sf_dir, "documents")
        .filter(gate)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@query(
    "corpus_quality_filter",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE keep) AS n_keep
    FROM (
        SELECT lang,
               ({T.n_words().duck} >= 20
                AND {T.stopword_ratio().duck} >= 0.05
                AND {T.distinct_ratio().duck} >= 0.3
                AND {T.punct_ratio().duck} <= 0.2) AS keep
        FROM documents
    )
    GROUP BY lang
    """,
)
def corpus_quality_filter(spark, sf_dir):
    """The composed pre-training filter: length + stopword density +
    token diversity + punctuation load thresholds folded into one
    keep/drop decision, reported per language.  One narrow projection
    + a tiny aggregation — the decision column is computed in the same
    pass that would write the filtered corpus."""
    keep = (
        (F.expr(T.n_words().spark) >= 20)
        & (F.expr(T.stopword_ratio().spark) >= 0.05)
        & (F.expr(T.distinct_ratio().spark) >= 0.3)
        & (F.expr(T.punct_ratio().spark) <= 0.2)
    )
    return (
        t(spark, sf_dir, "documents")
        .select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("keep")).alias("n_keep"),
        )
    )


@query(
    "sample_exact_quota",
    oracle="""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS
                       VARCHAR)), 1, 15)) AS BIGINT), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 75
    """,
)
def sample_exact_quota(spark, sf_dir):
    """Exact-quota stratified sampling: EXACTLY min(75, |lang|)
    documents per language, selected as the smallest (md5-hash, key)
    pairs — a pure function of the keys.  The operator
    (``operators/sampling.py``) refuses the naive per-stratum global
    sort: a count pass derives per-stratum hash THRESHOLDS (prefix of
    the rank order, by uniformity), a narrow gate filter drops
    ~(1 - 2k/n) of each big stratum at the scan, and the exact window
    runs over ~2k survivors per stratum — with a loud under-catch
    check, never a probabilistic result.  The oracle is the naive
    full-sort spelling: both must select the identical rows (the
    fixture's strata straddle the quota — en > 75 > fr — so the
    hash-threshold path AND the take-whole-stratum path are both under
    the driver hash)."""
    from ..operators.sampling import exact_quota_sample

    return exact_quota_sample(
        t(spark, sf_dir, "documents"), "lang", "doc_id", 75
    ).select("doc_id", "lang")
