"""Corpus-LM quality scoring (SURVEY.md §2.10 family): score every
document by how "natural" its character trigrams are under a model
fitted on the corpus itself — the CCNet/Gopher-style LM-filter shape
(fit a cheap LM on the corpus or a reference corpus, drop the
lowest-likelihood tail) as a two-pass DataFrame program.

Deliberately INTEGER-EXACT instead of log-probability: the score is
``Σ model_count(trigram)`` over the document's trigrams (plus the
trigram total, so callers can normalize).  Per-trigram it is monotone
in probability, so tail-filtering ranks documents the same way a
unigram-over-trigrams log model would up to the aggregation, while
every intermediate stays a bigint — bit-identical across engines,
partitionings, and the DuckDB oracle.  A deployment wanting true
perplexity (KenLM etc.) swaps the scoring expression for a Pandas-UDF
scorer; the two-pass structure (bounded model → broadcast lookup)
is the part that matters at scale.

Scale shape:

- pass 1 (model): explode trigrams → count → take the top-K by
  ``(count DESC, trigram)``.  The shuffle key domain is |distinct
  trigrams| (bounded by the alphabet, not the corpus), map-side
  combined; ``TakeOrdered`` returns exactly K rows to the driver —
  the same bounded-literal budget as the IVF centroid tier
  (``operators/similarity.py``).
- pass 2 (score): trigram positions explode against the BROADCAST
  K-row model (codegen hash join — the build side is K rows, the
  corpus never shuffles for the join) and partial+final aggregate
  back to one row per document, so the only exchange carries
  |documents| pre-aggregated rows, not trigram positions.
  Out-of-model trigrams contribute 0 via the left join — exactly the
  "unnatural" mass the filter exists to catch.

  A zero-shuffle spelling exists — fold the trigram array through
  ``aggregate(...)`` with a literal-map lookup — and was MEASURED
  2.8× slower at sf0.1 (SCALE.md "LM scoring"): Spark evaluates
  higher-order-function lambdas interpreted, re-evaluating the map
  construction per element, while the join path stays inside
  whole-stage codegen end-to-end.  Saving one |documents|-row
  exchange never pays for leaving codegen on every trigram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.localrel import local_frame
from ..functions.text import char_trigrams

#: Driver-side model cap: K (count, trigram) pairs are collected and
#: re-emitted as one folded literal — 2 MB-ish at the max, far below
#: broadcast budgets but enforced so a caller cannot turn the model
#: pass into a driver-side data collect.
MAX_MODEL_TERMS = 65536


def trigram_frequency_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 256,
) -> DataFrame:
    """Per-document corpus-naturalness score: ``(id_col, score_raw,
    n_tri)`` where ``score_raw = Σ top-K-model count`` over the doc's
    trigrams and ``n_tri`` its trigram total (documents shorter than
    one trigram are dropped — they carry no evidence either way).
    Ranking ``score_raw / n_tri`` ascending surfaces the gibberish
    tail.  Deterministic by construction: the model's top-K is totally
    ordered by ``(count DESC, trigram)``."""
    if not 1 <= top_k <= MAX_MODEL_TERMS:
        raise ValueError(
            f"top_k must be in [1, {MAX_MODEL_TERMS}], got {top_k} — the "
            "model is a driver-side literal, not a distributed table"
        )
    tri = F.expr(char_trigrams(text_col).spark)
    top = (
        docs.select(F.explode(tri).alias("tg"))
        .groupBy("tg")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tg")
        .limit(top_k)
        .collect()
    )
    if not top:
        raise ValueError(
            f"no trigrams in {text_col!r} — every document is shorter "
            "than 3 characters; nothing to model"
        )
    model = local_frame(
        docs.sparkSession, [(r["tg"], int(r["c"])) for r in top],
        "tg string, c long",
    )
    return (
        docs.select(id_col, F.explode(tri).alias("tg"))
        .join(F.broadcast(model), "tg", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("score_raw"),
            F.count(F.lit(1)).cast("long").alias("n_tri"),
        )
    )
