"""Exact-quota deterministic stratified sampling (SURVEY.md §2.10
family): take EXACTLY ``min(k, |stratum|)`` rows per stratum — "1000
documents per language", the fixed-budget curation op — with the same
engine/partitioning-stable determinism as the hash-gate samplers in
``queries/llm_sampling.py``.

The selection RULE is pure: a stratum's sample is its ``k`` smallest
rows by ``(md5-hash(key), key)``.  The naive spelling —
``row_number() OVER (PARTITION BY stratum ORDER BY hash)`` — sorts
every stratum end-to-end: one task per stratum value, each sorting
|stratum| rows, which at 100 TB is a handful of tasks sorting billions
of rows each (the known per-stratum skew killer, exactly what this
package's salted operators exist to avoid).  This instead exploits the
hash's uniformity the way top-k-by-random-key engines do:

1. one column-pruned count per stratum (map-side-combined agg; the
   per-stratum totals are ``|strata|`` scalars to the driver, the same
   bounded-collect budget as ``packing.global_offsets``);
2. a per-stratum hash THRESHOLD ``t = H * min(1, target/d)`` where
   ``d = countDistinct(key)`` (NOT the row count: duplicate keys share
   one md5 value, so the gate's Bernoulli trials are the DISTINCT
   keys — counting rows would silently shrink the effective
   oversample on duplicate-heavy data) and ``target =
   max(oversample*k, k + 4*sqrt(k) + 12)``: because selection ranks
   by the hash value itself, ``h < t`` is a PREFIX of the sort order,
   so the gated rows are a superset of the true sample whenever the
   gate catches >= quota rows — a narrow scan filter that drops
   ~(1 - target/d) of every big stratum before anything shuffles;
3. the exact window runs on the survivors only (~target rows per
   stratum), where the per-stratum sort is trivial.

Correctness is never probabilistic: the quota table is left-joined to
the survivor counts and the call fails loudly if ANY stratum's gate
under-caught — including a stratum the gate caught ZERO rows of,
which produces no survivor group at all and is exactly why the check
must be driven from the quota side, never by grouping survivors.
The ``k + 4*sqrt(k) + 12`` floor on the gate target exists because
the plain Chernoff bound ``exp(-k(oversample-1)^2/(2*oversample))``
is only "astronomical" for large k (at ``k=1, oversample=2`` the
under-catch probability is ~0.14 per large stratum); with the floor
the per-stratum miss probability is < ~4e-8 uniformly in k (Poisson
tail at mean >= k + 4*sqrt(k) + 12).  An explicit ``oversample < 1``
is honored verbatim as a deliberate under-gate (it cannot satisfy
the quota in expectation; tests use it to exercise the loud-failure
path).  NULL stratum values are rejected loudly up front — the gate
join is an equi-join and would otherwise silently drop them.
The survivor set is pinned via ``cache.tracked_local_checkpoint`` so
the check and the returned rows see the same materialization — the
same boundary-sweep contract (and loud CHECKPOINT_RDD_BLOCK_ID_NOT_
FOUND failure mode) as ``packing.global_offsets``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.localrel import local_frame

#: 15 md5 hex chars = 60 bits — matches queries/llm_sampling.py's
#: hash-gate integer, so every sampler ranks rows identically.
HASH_BITS = 60
_H_MAX = 1 << HASH_BITS


#: Driver-side cap on collected per-stratum scalars.  Strata are
#: designed to be LANGUAGE/SOURCE-level groupings (tens to thousands);
#: someone stratifying on a high-cardinality column (a doc id, a hash)
#: would silently collect the corpus's key space to the driver — the
#: same failure class max_pruned_partitions guards in
#: operators/warehouse.py, closed the same loud way (VERDICT r11 #5).
MAX_STRATA = 100_000


def hash60_spark(key_expr: str) -> str:
    """The shared 60-bit md5-prefix integer (Spark SQL dialect)."""
    return (
        f"cast(conv(substring(md5(cast({key_expr} as string)), 1, 15), "
        "16, 10) as bigint)"
    )


def exact_quota_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
    oversample: float = 2.0,
    max_strata: int = MAX_STRATA,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum — the rows with
    the ``k`` smallest ``(hash60(key), key)`` pairs, so the sample is a
    pure function of the keys (stable across engines, reruns, and
    repartitions).  Unique keys never tie (``key`` breaks the hash).
    DUPLICATE keys tie completely on ``(hash60, key)``, so the window
    adds a final tiebreaker — ``xxhash64`` over every (hashable)
    column of the row — making the boundary pick a pure function of
    row CONTENT too: across repartitions the same rows win, up to
    (a) fully identical duplicate rows, which are interchangeable (the
    value-level result is the same multiset either way), and (b) a
    64-bit tiebreaker collision between distinct same-key rows exactly
    at the quota boundary (~2^-64 per boundary pair).  The selected
    KEY multiset is exactly deterministic regardless — ties only ever
    form between rows sharing a key.  Map-typed columns are excluded
    from the tiebreaker (Spark's hash functions reject MapType);
    same-key rows differing only in a map column fall back to an
    arbitrary-but-value-hashable boundary pick.

    Raises ``ValueError`` if any stratum's oversampled gate caught
    fewer rows than its quota (< ~4e-8 per stratum at any ``k`` with
    the default ``oversample=2``, thanks to the ``k + 4*sqrt(k) + 12``
    gate floor; raise ``oversample`` rather than retrying — the hash
    is deterministic, a rerun cannot differ), or if any stratum value
    is NULL (the gate join is an equi-join; NULLs would silently
    vanish instead of sampling).  Returns ``df``'s columns
    unchanged."""
    if k < 1:
        raise ValueError(f"quota k must be >= 1, got {k}")
    counts = _stratum_counts(
        df, stratum_col, key_col, "exact_quota_sample", max_strata
    )
    quota_by = {r[stratum_col]: min(k, r["_n"]) for r in counts}
    return _take_exact(
        df, stratum_col, key_col, counts, quota_by, oversample,
        "exact_quota_sample",
    )


def sample_temperature_mixture(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    budget: int,
    alpha: float = 0.5,
    oversample: float = 2.0,
    max_strata: int = MAX_STRATA,
) -> DataFrame:
    """Temperature-reweighted corpus mixing — the multilingual-LM
    alpha-sampling rule (sample stratum ``s`` proportionally to
    ``n_s^alpha``; ``alpha < 1`` flattens the head and upweights
    low-resource strata, ``alpha = 1`` is natural proportions) applied
    EXACTLY: per-stratum quotas

        ``q_s = min(n_s, floor(budget * n_s^alpha / sum_t n_t^alpha + 0.5))``

    each taken as the ``q_s`` smallest ``(hash60(key), key)`` rows —
    the same deterministic selection rule, threshold-gate scale path,
    loud under-catch check, and duplicate-key tiebreaker as
    :func:`exact_quota_sample` (this IS that operator with weighted
    quotas).  Downsampling-only by construction: a quota never exceeds
    the stratum (no replication — the sampling-without-replacement
    variant; strata smaller than their share contribute whole, so the
    realized total can undershoot ``budget``).  The total can also
    OVERSHOOT ``budget``: per-stratum ``floor(x + 0.5)`` rounding is
    independent, so the quota sum can exceed the budget by up to
    ~``|strata| / 2`` rows (e.g. ``budget=12`` over shares
    ``10.57 + 0.71 + 0.71`` yields ``11 + 1 + 1 = 13``) — ``budget``
    is a rounding target, not a hard cap; callers needing a hard cap
    should trim the result themselves.  A stratum whose share
    rounds to zero is excluded entirely (its gate threshold is 0 — no
    scan survivors, no shuffle).  The weight sum runs over strata in
    SORTED order so THIS function is bit-deterministic across reruns
    and partitionings; an external recomputation (e.g. a SQL oracle)
    aggregates in its own engine-chosen order and its ``sqrt`` need
    not be bit-identical to ``** 0.5``, so cross-engine quota equality
    additionally requires every ``budget * w_s`` to sit away from a
    ``.5`` rounding boundary (a 1-ulp float divergence can only flip
    ``floor(x + 0.5)`` exactly at the boundary — the registry entry's
    fixture margin is guard-tested in tests/test_exact_quota.py).
    ``floor(x + 0.5)`` is the rounding spelling because SQL ``ROUND``
    halves-away while Python ``round`` banker's-rounds.

    At 100 TB this costs exactly what exact-quota costs: one
    column-pruned count pass, |strata| driver scalars, a narrow
    hash-gate scan filter, and a windowed trim over ~oversample*q_s
    survivors per stratum — never a per-stratum global sort."""
    import math

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = _stratum_counts(
        df, stratum_col, key_col, "sample_temperature_mixture", max_strata
    )
    ordered = sorted(counts, key=lambda r: str(r[stratum_col]))
    weights = {}
    for r in ordered:
        try:
            w = float(r["_n"]) ** alpha
        except OverflowError:
            w = math.inf
        if not math.isfinite(w):
            raise ValueError(
                f"sample_temperature_mixture: n^alpha overflows for "
                f"stratum {r[stratum_col]!r} (n={r['_n']}, "
                f"alpha={alpha}) — the weight is not a finite float, "
                "so quotas would be NaN.  Lower alpha (the mixing "
                "rule is scale-free in alpha only while n^alpha stays "
                "within float range)"
            )
        weights[r[stratum_col]] = w
    tot = sum(weights[r[stratum_col]] for r in ordered)
    if ordered and tot == 0:
        # Defensive mirror of the overflow guard above: with the
        # current domain (n >= 1, alpha > 0) every weight is >= 1, but
        # if the weight rule ever admits underflow (n**alpha -> 0.0)
        # the quota division below would raise an opaque
        # ZeroDivisionError — fail in this operator's own loud style.
        raise ValueError(
            f"sample_temperature_mixture: every stratum weight "
            f"underflowed to 0.0 (alpha={alpha}) — quotas are "
            "undefined when the weight total is zero"
        )
    quota_by = {
        r[stratum_col]: min(
            r["_n"],
            int(math.floor(budget * weights[r[stratum_col]] / tot + 0.5)),
        )
        for r in ordered
    }
    return _take_exact(
        df, stratum_col, key_col, counts, quota_by, oversample,
        "sample_temperature_mixture",
    )


def _stratum_counts(
    df, stratum_col: str, key_col: str, opname: str, max_strata: int = MAX_STRATA
):
    """One column-pruned count pass: per-stratum row count, distinct
    keys, and NULL-key count (all in the same map-side-combined agg);
    NULL strata/keys rejected loudly — the gate join is an equi-join
    and would silently drop them.  The collect is O(#strata) driver
    rows, bounded by ``max_strata`` (the LIMIT caps what reaches the
    driver BEFORE the guard fires, so an accidental id-column stratum
    costs one truncated collect, not an OOM)."""
    counts = (
        df.groupBy(stratum_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.countDistinct(key_col).alias("_d"),
            # NULL keys hash to NULL and would silently fall out of the
            # gate while still counting toward _n — detected in this
            # same pass (no extra scan) and rejected loudly below.
            F.sum(F.col(key_col).isNull().cast("long")).alias("_nulls"),
        )
        .limit(max_strata + 1)
        .collect()
    )
    if len(counts) > max_strata:
        raise ValueError(
            f"{opname}: more than max_strata={max_strata} distinct "
            f"values in stratum column {stratum_col!r} — per-stratum "
            "quotas are driver-side scalars, so strata must be a "
            "bounded grouping (language, source), not a key-like "
            "column.  Re-stratify on a coarser column."
        )
    for r in counts:
        if r[stratum_col] is None:
            raise ValueError(
                f"{opname}: stratum column {stratum_col!r} "
                "contains NULL; the gate join is an equi-join and "
                "would silently drop those rows — filter or fill "
                "NULL strata first"
            )
        if r["_nulls"]:
            raise ValueError(
                f"{opname}: key column {key_col!r} is NULL "
                f"for {r['_nulls']} row(s) of stratum "
                f"{r[stratum_col]!r}; a NULL key has no hash order — "
                "the selection rule is undefined for it, and the gate "
                "would silently drop it while the quota still counts "
                "it.  Filter or fill NULL keys first"
            )
    return counts


def _take_exact(
    df, stratum_col, key_col, counts, quota_by, oversample, opname
) -> DataFrame:
    """Shared exact-selection core (see :func:`exact_quota_sample`'s
    docstring for the full contract): per-stratum hash-threshold
    prefix gate sized from ``countDistinct``, quota-side under-catch
    check, windowed trim with the duplicate-key content tiebreaker."""
    from ..cache import tracked_local_checkpoint

    reserved = {"_h", "_t", "_quota", "_rn", "_tb"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"{opname}: input columns {sorted(reserved)} collide with "
            "this operator's internal working columns — rename them "
            "first (withColumn would silently overwrite, then the "
            "final drop would lose the user column)"
        )
    if df.schema.fields and all(
        _contains_map(f.dataType) for f in df.schema.fields
    ):
        # Unreachable through the public entry points today (groupBy /
        # countDistinct already reject map-typed stratum/key columns),
        # but the invariant the tiebreaker relies on — "at least one
        # hashable column exists" — should fail in this operator's own
        # loud style BEFORE any job runs, not as an opaque
        # AnalysisException from a zero-arg xxhash64() deep in the plan.
        raise ValueError(
            f"{opname}: every input column nests a MapType, so no "
            "column is hashable for the duplicate-key content "
            "tiebreaker (Spark's hash expressions reject maps) — "
            "add or derive at least one map-free column"
        )
    spark = df.sparkSession
    rows = []
    for r in counts:
        q = quota_by[r[stratum_col]]
        if q == 0:
            # excluded stratum: nothing survives the scan gate, and
            # the under-catch check trivially passes (0 >= 0)
            rows.append((r[stratum_col], 0, 0))
            continue
        # A sub-1 oversample is an explicit, deliberate under-gate (it
        # cannot satisfy the quota in expectation) — honored verbatim
        # so the loud-failure path stays testable.  At >= 1, floor the
        # gate target so the small-q Poisson tail is uniformly
        # negligible.
        target = oversample * q
        if oversample >= 1.0:
            target = max(target, q + 4.0 * q**0.5 + 12.0)
        frac = target / r["_d"]
        t = _H_MAX if frac >= 1.0 else int(_H_MAX * frac) + 1
        rows.append((r[stratum_col], t, q))
    th = local_frame(
        spark,
        rows,
        T.StructType(
            [
                df.schema[stratum_col],
                T.StructField("_t", T.LongType()),
                T.StructField("_quota", T.LongType()),
            ]
        ),
    )
    survivors = tracked_local_checkpoint(
        df.withColumn("_h", F.expr(hash60_spark(key_col)))
        .join(F.broadcast(th), stratum_col)
        .filter(F.col("_h") < F.col("_t"))
    )
    # Drive the under-catch check from the QUOTA side: a stratum whose
    # gate caught zero rows yields no survivor group at all, so
    # grouping survivors alone can never see it (the round-6 bug,
    # caught by tests/test_exact_quota.py's hypothesis fuzz).
    short = (
        th.join(
            survivors.groupBy(stratum_col).agg(
                F.count(F.lit(1)).alias("_caught")
            ),
            stratum_col,
            "left",
        )
        .withColumn("_caught", F.coalesce(F.col("_caught"), F.lit(0)))
        .filter(F.col("_caught") < F.col("_quota"))
        .collect()
    )
    if short:
        detail = ", ".join(
            f"{r[stratum_col]}: caught {r['_caught']} < quota {r['_quota']}"
            for r in short
        )
        raise ValueError(
            f"{opname} gate under-caught ({detail}); the "
            f"oversample factor {oversample} left a stratum short — "
            "raise it (a rerun cannot differ: the hash is deterministic)"
        )
    # Content tiebreaker for duplicate keys (docstring): computed on
    # survivors only (~target rows per stratum), so the full-row hash
    # never touches the unsampled bulk.
    tb_cols = [
        f.name for f in df.schema.fields if not _contains_map(f.dataType)
    ]
    w = Window.partitionBy(stratum_col).orderBy("_h", key_col, "_tb")
    return (
        survivors.withColumn("_tb", F.xxhash64(*tb_cols))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_h", "_t", "_quota", "_rn", "_tb")
        .select(*df.columns)
    )


def _contains_map(dtype) -> bool:
    """True if ``dtype`` nests a MapType anywhere — Spark's hash
    expressions (xxhash64 included) reject maps at analysis time."""
    if isinstance(dtype, T.MapType):
        return True
    if isinstance(dtype, T.ArrayType):
        return _contains_map(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return any(_contains_map(f.dataType) for f in dtype.fields)
    return False
