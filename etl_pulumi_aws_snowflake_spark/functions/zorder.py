"""Z-order (Morton) keys for multi-dimensional data layout.

:func:`..streaming.snapshot.snapshot_compact`'s ``cluster_by`` gives
linear (1-D) clustering: perfect row-group pruning on ONE column, none
on the others.  When a table is range-scanned on TWO OR MORE columns
(the classic lakehouse case: time AND tenant, user AND day), sort by
the interleaved-bit Morton key instead: points close in the
k-dimensional box stay close in the 1-D sort order, so parquet
row-group min/max stay tight on EVERY interleaved dimension at once —
Delta's ``OPTIMIZE ZORDER BY``, reproduced as a pure expression.

Everything here is JVM-side integer arithmetic inside whole-stage
codegen (shifts, masks, adds — no UDF, no shuffle of its own), built
with this package's dual-dialect :class:`.hashing.X` convention so
every key stays DuckDB-oracle-checkable bit-for-bit.

Usage (layout maintenance)::

    from etl_pulumi_aws_snowflake_spark.functions import zorder as Z
    key = Z.zorder_key([Z.bucket("user_id", 0, 10_000, 8),
                        Z.bucket("event_id", 0, 1_000_000, 8)])
    snapshot_compact(spark, root, cluster_by=[F.expr(key.spark)])

Design constraints, stated rather than assumed:

- ``bucket`` quantizes an INTEGER column into ``2^bits`` equal-width
  cells over caller-supplied ``[lo, hi]`` bounds (clamped outside).
  Bounds are the caller's statistics call — data-dependent
  normalization inside the expression would make the key
  non-deterministic across commits, breaking oracle checks and
  incremental maintenance (two compactions of the same rows MUST
  produce the same order).  Integer-only on purpose: the equal-width
  integer math is exact and identical in both engines, while a
  float normalization would invite rounding drift at cell edges.
- Total key width ``sum(bits)`` must fit in 62 bits (signed BIGINT
  headroom) — enforced.
- Skewed dimensions quantize badly with equal-width cells (most rows
  land in few cells, interleaving degenerates toward 1-D).  That is a
  property of Z-ordering itself, not this implementation; pre-map the
  column (e.g. rank-bucket it in a maintenance pass) when its
  distribution is heavy-tailed.
"""

from __future__ import annotations

from .hashing import X, let

#: Signed-BIGINT headroom for the interleaved key.
MAX_KEY_BITS = 62


def bucket(col: str, lo: int, hi: int, bits: int) -> X:
    """Quantize integer expression ``col`` into ``[0, 2^bits)`` by
    equal-width cells over ``[lo, hi]``, clamping outliers to the edge
    cells.  Exact integer arithmetic, identical in both dialects
    (``hi > lo`` required).

    The clamp happens on the RAW value, before the multiply: clamping
    only the quotient would let an outlier beyond ~2^(63-bits) of the
    bounds overflow ``(col - lo) * (2^bits - 1)`` first — silently
    wrapping into a wrong cell in non-ANSI Spark while DuckDB raises,
    breaking both the edge-cell contract and dialect parity."""
    if hi <= lo:
        raise ValueError(f"bucket bounds must satisfy lo < hi, got [{lo}, {hi}]")
    if not 1 <= bits <= MAX_KEY_BITS:
        raise ValueError(f"bits must be in [1, {MAX_KEY_BITS}], got {bits}")
    n = (1 << bits) - 1
    if (hi - lo) * n >= (1 << 63):
        raise ValueError(
            f"bucket bounds span {hi - lo} x {n} cells overflows BIGINT; "
            "narrow [lo, hi] or lower bits"
        )
    clamped_s = f"least(greatest(cast({col} as bigint), {lo}L), {hi}L)"
    clamped_d = f"least(greatest(CAST({col} AS BIGINT), {lo}), {hi})"
    return X(
        f"({clamped_s} - {lo}) * {n} div {hi - lo}",
        f"(({clamped_d} - {lo}) * {n}) // {hi - lo}",
    )


def zorder_key(buckets: list[X], bits: int = 8) -> X:
    """Interleave the ``bits`` low bits of each bucket expression into
    one Morton key: bit ``b`` of dimension ``i`` lands at position
    ``b*k + (k-1-i)`` (dimension 0 takes the most-significant slot of
    each group, the conventional Z-curve).  Disjoint bit positions sum
    instead of OR-ing — same value, and ``+`` keeps the expression in
    plain arithmetic both engines fold identically.

    Each bucket expression is bound ONCE via :func:`.hashing.let`
    before its bits are picked apart — the same duplication guard the
    hashing templates need: Spark's interpreted higher-order paths
    re-evaluate textual copies, and a bucket referenced ``bits`` times
    would otherwise cost ``bits×`` its arithmetic."""
    k = len(buckets)
    if k < 2:
        raise ValueError("zorder_key needs >= 2 dimensions; use plain "
                         "cluster_by for 1-D layout")
    if k * bits > MAX_KEY_BITS:
        raise ValueError(
            f"{k} dims x {bits} bits = {k * bits} key bits; max "
            f"{MAX_KEY_BITS} (lower bits or drop a dimension)"
        )
    names = [f"zb{i}" for i in range(k)]
    terms_s, terms_d = [], []
    for i, var in enumerate(names):
        for b in range(bits):
            shift = b * k + (k - 1 - i)
            terms_s.append(f"shiftleft(shiftright({var}, {b}) & 1, {shift})")
            terms_d.append(f"((({var} >> {b}) & 1) << {shift})")
    body = X(" + ".join(terms_s), " + ".join(terms_d))
    for var, bx in zip(reversed(names), reversed(buckets)):
        body = let(bx, var, body)
    return body
