"""Model-based quality filtering (SURVEY.md §2.10; VERDICT r17 #6):
a TRAINED linear quality classifier beside the heuristic threshold
stack — the CCNet/Gopher "second stage" (fit a cheap classifier on
known-good vs known-bad text, keep what it scores as good), as a
closed-form, oracle-replayable DataFrame program.

The model is a two-class Gaussian discriminant with pooled per-feature
variance (diagonal LDA — a linear decision function, the same family a
fastText/logistic quality filter lands in, but with CLOSED-FORM
training: one aggregation pass computes the class sums; no iterative
fitting to replay).  Everything is engineered for judge-exactness:

* **Features are integer per-mille rates** (functions/text.py:
  ``vowel_permille``, ``stopword_permille``, ``distinct_permille``,
  ``dup_bigram_permille``) — the training aggregation sums BIGINTs,
  so the fitted statistics are bit-stable under any partitioning
  (a double-sum training pass would be order-dependent).
* **Training data is deterministic**: positives are the corpus
  documents, negatives their ``corrupt_text`` twins (vowel-stripped
  gibberish on even ids, first-two-words boilerplate on odd — the
  ``pii_inject`` recipe: synthesize the defect, learn to catch it).
  A production deployment passes a real known-good/known-bad corpus
  pair (Wikipedia vs raw crawl — the CCNet setup); the trainer only
  sees two labeled frames.
* **The fitted weights are fixed-order IEEE-double expressions of the
  integer sums**, written identically here (Python, for the Spark
  literals) and in the oracle CTE (SQL) — float() casts mirror the
  SQL CASTs operation-for-operation, so both engines land on the
  same 64-bit values and the scored margins hash-match exactly.

100 TB shape: training is ONE partial+final aggregation over the
labeled union (integer sums; 18 scalars to the driver — no corpus
collect), scoring is a per-row codegen projection (zero shuffle).
The int64 headroom on the sum-of-squares (feature ≤ 1000 → 1e6 per
row) holds to ~9e12 documents.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

__all__ = [
    "QUALITY_FEATURES",
    "FeatureModel",
    "train_quality_lda",
    "quality_margin",
    "model_rows",
    "quality_model_ctes_duck",
    "quality_margin_duck",
]

#: (name, template builder) — ORDER IS THE MODEL: the margin sums its
#: terms left-to-right in this order in both engines.
QUALITY_FEATURES = (
    ("vowel_permille", T.vowel_permille),
    ("stopword_permille", T.stopword_permille),
    ("distinct_permille", T.distinct_permille),
    ("dup_bigram_permille", T.dup_bigram_permille),
)


@dataclass(frozen=True)
class FeatureModel:
    """One feature's fitted statistics.  ``center``/``weight`` are the
    scoring constants: margin contribution = (x - center) * weight."""

    name: str
    n_pos: int
    n_neg: int
    sum_pos: int
    sum_neg: int
    sumsq_pos: int
    sumsq_neg: int
    mu_pos: float
    mu_neg: float
    pooled_var: float
    weight: float

    @property
    def center(self) -> float:
        return (self.mu_pos + self.mu_neg) / 2.0


def _labeled(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(f1..f4, y): the corpus as +1, its corruption twins as -1."""
    pos = docs.select(
        *[
            F.expr(b(text_col).spark).alias(f"f{i + 1}")
            for i, (_, b) in enumerate(QUALITY_FEATURES)
        ],
        F.lit(1).alias("y"),
    )
    neg = (
        docs.select(F.expr(T.corrupt_text(text_col, id_col).spark).alias("t"))
        .select(
            *[
                F.expr(b("t").spark).alias(f"f{i + 1}")
                for i, (_, b) in enumerate(QUALITY_FEATURES)
            ],
            F.lit(-1).alias("y"),
        )
    )
    return pos.unionAll(neg)


def train_quality_lda(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> list[FeatureModel]:
    """Fit the diagonal-LDA quality model: one integer aggregation pass
    over the labeled union, then closed-form per-feature statistics.

    Every float below is computed with explicit ``float()`` conversions
    in EXACTLY the operation order the oracle CTE uses (CAST-then-
    divide, left-associated sums, ``+ 1.0`` variance smoothing), so
    the Spark literals and the SQL-computed model are bit-identical."""
    lab = _labeled(docs, text_col, id_col)
    aggs = []
    for i in range(len(QUALITY_FEATURES)):
        f = F.col(f"f{i + 1}")
        y1 = F.col("y") == 1
        aggs += [
            F.sum(F.when(y1, f).otherwise(F.lit(0))).alias(f"sp{i + 1}"),
            F.sum(F.when(y1, f * f).otherwise(F.lit(0))).alias(f"ssp{i + 1}"),
            F.sum(F.when(~y1, f).otherwise(F.lit(0))).alias(f"sn{i + 1}"),
            F.sum(F.when(~y1, f * f).otherwise(F.lit(0))).alias(f"ssn{i + 1}"),
        ]
    aggs += [
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("np"),
        F.sum(F.when(F.col("y") == -1, 1).otherwise(0)).alias("nn"),
    ]
    r = lab.agg(*aggs).first()
    # SUM over zero rows is NULL in both engines
    np_, nn = int(r["np"] or 0), int(r["nn"] or 0)
    if np_ == 0 or nn == 0:
        raise ValueError(
            f"train_quality_lda needs both classes populated; got "
            f"{np_} positives / {nn} negatives"
        )
    out = []
    for i, (name, _) in enumerate(QUALITY_FEATURES):
        sp, ssp = int(r[f"sp{i + 1}"]), int(r[f"ssp{i + 1}"])
        sn, ssn = int(r[f"sn{i + 1}"]), int(r[f"ssn{i + 1}"])
        mu_p = float(sp) / float(np_)
        mu_n = float(sn) / float(nn)
        var = (
            float(ssp)
            - float(sp) * float(sp) / float(np_)
            + float(ssn)
            - float(sn) * float(sn) / float(nn)
        ) / float(np_ + nn) + 1.0
        out.append(
            FeatureModel(
                name, np_, nn, sp, sn, ssp, ssn,
                mu_p, mu_n, var, (mu_p - mu_n) / var,
            )
        )
    return out


def quality_margin(
    model: list[FeatureModel], text_col: str = "text"
) -> Column:
    """The scoring expression: ``Σ_f (x_f − center_f) · weight_f`` with
    the fitted constants as double literals — per-row codegen, summed
    left-to-right in QUALITY_FEATURES order (the oracle's order)."""
    total = None
    for fm, (_, b) in zip(model, QUALITY_FEATURES):
        x = F.expr(b(text_col).spark).cast("double")
        term = (x - F.lit(fm.center)) * F.lit(fm.weight)
        total = term if total is None else total + term
    return total


def model_rows(model: list[FeatureModel]) -> list[tuple]:
    """The fitted model as judged-entry rows."""
    return [
        (
            fm.name, fm.n_pos, fm.n_neg, fm.sum_pos, fm.sum_neg,
            fm.sumsq_pos, fm.sumsq_neg, fm.mu_pos, fm.mu_neg,
            fm.pooled_var, fm.weight,
        )
        for fm in model
    ]


MODEL_SCHEMA = (
    "feature string, n_pos long, n_neg long, sum_pos long, sum_neg long, "
    "sumsq_pos long, sumsq_neg long, mu_pos double, mu_neg double, "
    "pooled_var double, weight double"
)


# ---------------------------------------------------------------------------
# Oracle (DuckDB) spellings — the same training recurrence as SQL CTEs.
# ---------------------------------------------------------------------------


def quality_model_ctes_duck(
    source: str = "documents", text: str = "text", id_col: str = "doc_id"
) -> str:
    """CTE bodies (``qcorrupt, qlab, qstats, qmodel``) replaying the
    trainer: corruption twin → labeled union → integer sums → fitted
    doubles.  Splice after ``WITH`` and cross-join ``qmodel`` where the
    margin is scored."""
    feats = ", ".join(
        f"{b(text).duck} AS f{i + 1}"
        for i, (_, b) in enumerate(QUALITY_FEATURES)
    )
    feats_t = ", ".join(
        f"{b('t').duck} AS f{i + 1}"
        for i, (_, b) in enumerate(QUALITY_FEATURES)
    )
    sums = ", ".join(
        f"SUM(CASE WHEN y = 1 THEN f{i + 1} ELSE 0 END) AS sp{i + 1}, "
        f"SUM(CASE WHEN y = 1 THEN f{i + 1} * f{i + 1} ELSE 0 END) AS ssp{i + 1}, "
        f"SUM(CASE WHEN y = -1 THEN f{i + 1} ELSE 0 END) AS sn{i + 1}, "
        f"SUM(CASE WHEN y = -1 THEN f{i + 1} * f{i + 1} ELSE 0 END) AS ssn{i + 1}"
        for i in range(len(QUALITY_FEATURES))
    )
    fitted = ", ".join(
        f"CAST(sp{i + 1} AS DOUBLE) / CAST(np AS DOUBLE) AS mp{i + 1}, "
        f"CAST(sn{i + 1} AS DOUBLE) / CAST(nn AS DOUBLE) AS mn{i + 1}, "
        f"(CAST(ssp{i + 1} AS DOUBLE) "
        f"- CAST(sp{i + 1} AS DOUBLE) * CAST(sp{i + 1} AS DOUBLE) "
        f"/ CAST(np AS DOUBLE) "
        f"+ CAST(ssn{i + 1} AS DOUBLE) "
        f"- CAST(sn{i + 1} AS DOUBLE) * CAST(sn{i + 1} AS DOUBLE) "
        f"/ CAST(nn AS DOUBLE)) / CAST(np + nn AS DOUBLE) + 1.0 AS v{i + 1}"
        for i in range(len(QUALITY_FEATURES))
    )
    weights = ", ".join(
        f"(mp{i + 1} - mn{i + 1}) / v{i + 1} AS w{i + 1}"
        for i in range(len(QUALITY_FEATURES))
    )
    return f"""
    qcorrupt AS (
        SELECT {id_col}, {T.corrupt_text(text, id_col).duck} AS t
        FROM {source}
    ),
    qlab AS (
        SELECT {feats}, 1 AS y FROM {source}
        UNION ALL
        SELECT {feats_t}, -1 AS y FROM qcorrupt
    ),
    qstats AS (
        SELECT {sums},
               SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS np,
               SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS nn
        FROM qlab
    ),
    qmodel AS (
        SELECT np, nn,
               {", ".join(f"sp{i + 1}, sn{i + 1}, ssp{i + 1}, ssn{i + 1}"
                          for i in range(len(QUALITY_FEATURES)))},
               {fitted}
        FROM qstats
    ),
    qweights AS (SELECT *, {weights} FROM qmodel)
    """


def quality_margin_duck(text: str = "text") -> str:
    """The margin expression against a cross-joined ``qweights`` row —
    term order and arithmetic identical to :func:`quality_margin`."""
    return " + ".join(
        f"(CAST({b(text).duck} AS DOUBLE) "
        f"- (mp{i + 1} + mn{i + 1}) / 2.0) * w{i + 1}"
        for i, (_, b) in enumerate(QUALITY_FEATURES)
    )
