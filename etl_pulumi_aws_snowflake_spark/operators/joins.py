"""Join operators Spark lacks natively: as-of and range/interval
(skew-salted joins live in operators/skew.py).

SURVEY.md §2.3 — the reference has no joins at all; these are the EXT
surface's hard cases, built as compositions of DataFrame ops so Catalyst
still owns the physical strategy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (inclusive), matched within ``by`` keys.

    Implementation is the union-and-carry-forward trick: tag both
    sides, union, and per ``by``-partition ordered by (``on``, side)
    run ``last(payload, ignorenulls=True)`` over an unbounded-preceding
    frame, where ``payload`` is ONE struct of all carried right columns.
    Carrying a single struct (not per-column ``last``) matters for
    correctness: a struct row is non-NULL even when every field inside
    it is NULL, so a right row whose payload value is genuinely NULL
    still wins the carry (no skipping back to an older non-null value),
    and all carried fields always come from the SAME most-recent right
    row (no column tearing across rows) — matching DuckDB ``ASOF JOIN``
    semantics when right-side payload columns contain NULLs.

    ONE shuffle on the ``by`` keys — no row explosion, no nested-loop —
    so it scales linearly; a merge-join-per-key (pandas ``merge_asof``
    via applyInPandas) would force every group through Python.

    Right-side ties on ``on`` resolve to the right row (side sorts
    before left at equal timestamps), matching inclusive as-of
    semantics (DuckDB ``ASOF JOIN ... ON r.ts <= l.ts``).
    """
    from pyspark.sql.types import StructField, StructType

    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]
    carried = [f"{c}{suffix}" for c in right_cols]
    payload_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_cols]
    )

    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(payload_type)
    )
    rhs = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__payload"),
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = lhs.unionByName(rhs.select(lhs.columns))
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn(
        "__payload", F.last("__payload", ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col("__side") == 1)
    for c, cc in zip(right_cols, carried):
        out = out.withColumn(cc, F.col("__payload").getField(c))
    return out.drop("__side", "__payload")


def range_join(
    left: DataFrame,
    bands: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Join each left row to the band where ``lo <= value < hi``.

    Band tables are small by construction, so the right strategy at any
    scale is an explicit broadcast (BroadcastNestedLoopJoin over a
    handful of band rows ≈ a map-side lookup; a shuffle range-join
    would be strictly worse).  For large range tables, bucketize both
    sides and equi-join on bucket instead.
    """
    cond = (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi))
    return left.join(F.broadcast(bands), cond, "left")


def range_join_bucketed(
    left: DataFrame,
    ranges: DataFrame,
    value: str,
    lo: str = "lo",
    hi: str = "hi",
    bucket_width: float = 1.0,
) -> DataFrame:
    """Inner range join for LARGE range tables — the scale path the
    broadcast form can't take (SURVEY.md §2.3 "bucketize then equi-join
    on bucket + refine").

    Both sides map to integer buckets of ``bucket_width``: a left row
    lands in exactly one bucket, a range is exploded into every bucket
    it spans.  The join is then a plain EQUI-join on bucket (shuffled,
    AQE-managed, no nested loop) with the range predicate re-applied as
    a refine filter.  Each matching (row, range) pair meets in exactly
    one bucket — the row's — so no dedup is needed.  Cost scales with
    ranges × (span/bucket_width): pick the width near the median range
    span so each range explodes to O(1) buckets.
    """
    b = F.lit(bucket_width)
    lhs = left.withColumn("__bucket", F.floor(F.col(value) / b))
    rhs = ranges.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(F.col(lo) / b), F.floor(F.col(hi) / b))),
    )
    refine = (F.col(value) >= F.col(lo)) & (F.col(value) < F.col(hi))
    return lhs.join(rhs, "__bucket").filter(refine).drop("__bucket")


# Skew-salted join/groupBy live in operators/skew.py — the salt there is
# deterministic (pmod(xxhash64(row id), n)), which a rand()-based salt is
# not: task retries and speculative execution would re-roll assignments
# and break exactly-once sinks.
