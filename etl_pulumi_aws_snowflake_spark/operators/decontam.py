"""Benchmark decontamination (training-data pipeline): flag training
documents that share word-k-gram shingles with an evaluation/benchmark
set — the standard guard against test-set leakage into pretraining
corpora.

Scale shape: the TRAIN side (the 100 TB one) is an inverted-index
projection that never shuffles document text — only (doc_id, shingle
hash) pairs.  The BENCH side is an eval suite: thousands of documents,
not billions — its exploded shingle list is broadcast, so the whole
check is a broadcast hash join against the train-side stream followed
by a partial+final aggregate on doc_id.  No sort-merge, no corpus
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_sets


def contamination(
    train: DataFrame,
    bench: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per contaminated train document: (doc_id, n_eval_docs,
    n_shared_shingles) — how many benchmark docs it collides with and
    how many distinct k-gram shingles it shares.  Documents with no
    overlap are absent (anti-join against this result = the clean set).

    ``k`` trades recall for precision: small k flags common phrases,
    large k only verbatim spans ≥ k words.  k=5 is a usual middle
    ground for contamination auditing.
    """
    ti = shingle_sets(train, k, text_col, id_col).select(
        F.col(id_col), F.explode("shingles").alias("sh")
    )
    bi = shingle_sets(bench, k, text_col, id_col).select(
        F.col(id_col).alias("bench_id"), F.explode("shingles").alias("sh")
    )
    return (
        ti.join(F.broadcast(bi), "sh")
        .groupBy(id_col)
        .agg(
            F.countDistinct("bench_id").alias("n_eval_docs"),
            F.countDistinct("sh").alias("n_shared_shingles"),
        )
    )
