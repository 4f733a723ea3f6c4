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
from ..functions.localrel import local_frame
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


@query(
    "sample_exact_quota_dupkeys",
    oracle="""
    WITH base AS (
        SELECT CASE WHEN doc_id < 3 THEN 'tiny'
                    WHEN doc_id < 33 THEN 'dup'
                    ELSE lang END AS stratum,
               CASE WHEN doc_id >= 3 AND doc_id < 33 THEN 'dupkey-5'
                    ELSE CAST(doc_id % 97 AS VARCHAR) END AS skey
        FROM documents
    )
    SELECT stratum, skey FROM (
        SELECT stratum, skey,
               ROW_NUMBER() OVER (
                   PARTITION BY stratum
                   ORDER BY CAST(('0x' || substring(md5(skey), 1, 15))
                                 AS BIGINT), skey
               ) AS rn
        FROM base
    ) WHERE rn <= 5
    """,
)
def sample_exact_quota_dupkeys(spark, sf_dir):
    """Exact-quota sampling under the ADVERSARIAL fixture shape that
    hid the round-6 under-catch bug from the driver for two rounds
    (VERDICT r07 #3): duplicate keys AND a stratum whose single shared
    key hashes into the top of the range.

    The derived fixture (pure function of ``documents``, both
    dialects): stratum 'tiny' = doc_id 0-2 (3 rows < quota 5 — the
    take-whole-stratum path); stratum 'dup' = doc_id 3-32, ALL 30 rows
    sharing the literal key 'dupkey-5', chosen because
    hash60('dupkey-5')/2^60 = 0.993 — on the r06 code (gate fraction
    from the ROW count, no small-k floor: t = 2k/30 = 0.33 of the
    range) the gate catches ZERO of these rows, the survivor-side
    check never sees the stratum, and the result silently misses all 5
    quota rows: a driver hash MISMATCH.  On the fixed code
    (``countDistinct`` gate: d=1 so frac >= 1) the whole stratum
    survives and the quota-side left-join check proves it.  The lang
    strata keep ~2 rows per key (doc_id % 97) so the distinct-vs-row
    gate distinction stays live; every stratum's catch is
    deterministic (fixed md5 values — verified >= quota at sf0.001 and
    sf0.01).  Output is (stratum, skey) WITH multiplicity: the
    selected key multiset is exactly deterministic under duplicate
    keys (ties only form between rows sharing a key), so the oracle's
    arbitrary ROW_NUMBER tie pick hashes identically."""
    from ..operators.sampling import exact_quota_sample

    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        F.when(F.col("doc_id") < 3, F.lit("tiny"))
        .when(F.col("doc_id") < 33, F.lit("dup"))
        .otherwise(F.col("lang"))
        .alias("stratum"),
        F.when(
            (F.col("doc_id") >= 3) & (F.col("doc_id") < 33),
            F.lit("dupkey-5"),
        )
        .otherwise((F.col("doc_id") % 97).cast("string"))
        .alias("skey"),
    )
    return exact_quota_sample(base, "stratum", "skey", 5)


@query(
    "sample_exact_quota_fail_loud",
    oracle="""
    SELECT 'under_catch' AS contract, true AS raised
    UNION ALL SELECT 'null_stratum', true
    UNION ALL SELECT 'null_key', true
    UNION ALL SELECT 'bad_quota', true
    """,
)
def sample_exact_quota_fail_loud(spark, sf_dir):
    """The exact-quota LOUD-FAILURE contract, driver-visible (VERDICT
    r07 #4: the ValueError paths were pytest-only).  Each row asserts
    one failure mode actually raised with its documented message: an
    explicit sub-1 oversample under-gates every stratum (deterministic
    here: oversample=1e-6 puts the threshold below every fixed md5
    value in the fixture); a NULL stratum value is rejected before the
    equi-join would silently drop it; a NULL key is rejected before
    the gate would silently drop it while the quota counts it; k < 1
    is rejected.  A row hashes green ONLY if the matching ValueError
    fired — on a regression that stops raising (or raises the wrong
    error) the value flips to false and the driver row goes red."""
    from ..operators.sampling import exact_quota_sample

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")

    def _raises(needle, fn):
        try:
            fn()
        except ValueError as e:
            return needle in str(e)
        except Exception:
            return False
        return False

    outcomes = [
        (
            "under_catch",
            _raises(
                "under-caught",
                lambda: exact_quota_sample(
                    docs, "lang", "doc_id", 5, oversample=1e-6
                ),
            ),
        ),
        (
            "null_stratum",
            _raises(
                "contains NULL",
                lambda: exact_quota_sample(
                    docs.withColumn(
                        "lang",
                        F.when(F.col("doc_id") != 0, F.col("lang")),
                    ),
                    "lang",
                    "doc_id",
                    5,
                ),
            ),
        ),
        (
            "null_key",
            _raises(
                "is NULL",
                lambda: exact_quota_sample(
                    docs.withColumn(
                        "doc_id",
                        F.when(F.col("doc_id") != 0, F.col("doc_id")),
                    ),
                    "lang",
                    "doc_id",
                    5,
                ),
            ),
        ),
        (
            "bad_quota",
            _raises(
                "quota k must be",
                lambda: exact_quota_sample(docs, "lang", "doc_id", 0),
            ),
        ),
    ]
    return local_frame(spark, outcomes, "contract string, raised boolean")


@query(
    "sample_temperature_mixture",
    oracle="""
    WITH counts AS (
        SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
        FROM documents GROUP BY lang
    ),
    q AS (
        SELECT lang,
               CAST(FLOOR(150 * sqrt(n) /
                    (SELECT SUM(sqrt(n)) FROM counts) + 0.5) AS BIGINT)
                   AS quota
        FROM counts
    ),
    ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS
                       VARCHAR)), 1, 15)) AS BIGINT), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang FROM ranked JOIN q USING (lang) WHERE rn <= quota
    """,
)
def sample_temperature_mixture(spark, sf_dir):
    """Temperature-reweighted corpus mixing (alpha=0.5, budget=150):
    the multilingual-LM alpha-sampling rule applied EXACTLY —
    per-language quotas ``floor(budget * sqrt(n_lang) / sum sqrt(n) +
    0.5)``, each taken as the quota smallest (md5-hash, key) rows via
    the exact-quota machinery (count pass -> hash-threshold scan gate
    -> windowed trim; never a per-stratum global sort).  sqrt(218)
    ~ 2.4x sqrt's flattening: 'en' holds 44% of the corpus but only
    ~30% of the sample, the low-resource languages each gain — the
    exact effect alpha-mixing exists for.  The oracle recomputes the
    quotas in SQL (sqrt + FLOOR(x+0.5) — DuckDB's own SUM order and
    sqrt may diverge from Python's sorted-order ``** 0.5`` sum by an
    ulp, which can only flip a quota whose rounding input sits exactly
    on a .5 boundary; this fixture's inputs sit >= 0.01 from every
    boundary at both driver SFs, guard-tested in
    tests/test_exact_quota.py so data regen cannot silently create a
    flaky boundary) and spells the selection as the naive full-sort —
    both must pick identical rows."""
    from ..operators.sampling import sample_temperature_mixture as _mix

    return _mix(
        t(spark, sf_dir, "documents"), "lang", "doc_id", 150, alpha=0.5
    ).select("doc_id", "lang")
