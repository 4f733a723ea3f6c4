"""Hilbert-curve keys for 2-D data layout — the CONTINUOUS companion
to :mod:`.zorder`.

Both curves interleave two quantized dimensions into one sort key so
parquet row-group min/max stay tight on each dimension;
:func:`.zorder.zorder_key` is the cheaper bit-interleave, but the Z
curve JUMPS (consecutive keys can sit a whole half-grid apart — the
big Z diagonal), so a range scan that clips a Z box drags in the cells
under each jump.  The Hilbert curve is continuous: **consecutive keys
are always edge-adjacent cells** (Manhattan distance exactly 1, pinned
by test) — the clustering-properties result of Moon et al. (IEEE TKDE
2001) that made Hilbert the curve behind Databricks liquid clustering:
measurably tighter per-row-group bounding boxes than Morton for the
same sort budget.  Use Z-order when the key must also be cheap to
compute at read time; use Hilbert for layout maintenance, where the
encode runs once per compaction and scan locality is the entire point.

The encode is the classic per-level rotate-and-accumulate walk
(Wikipedia's ``xy2d``), unrolled over the ``bits`` levels as one
dual-dialect expression: each level rebinds the rotated ``(x, y)``
state through :func:`.hashing.let` (array-valued binding, evaluated
once per level) and accumulates the quadrant index arithmetically —
``(3*rx) XOR ry`` is spelled ``3*rx + ry - 2*rx*ry`` so both engines
fold the same integer arithmetic (DuckDB's ``^`` is exponentiation,
not XOR; the arithmetic form sidesteps the dialect trap entirely).
Everything stays integer-exact in both engines, so the key is
DuckDB-oracle-checkable bit-for-bit like every expression in this
package.

Scale shape: the rendered expression is a per-row scalar projection —
no shuffle, no UDF, no state.  Spark evaluates the nested
``transform`` bindings on the interpreted path (the :func:`let`
caveat): measured ~24 µs/row at sf0.1 (SCALE.md), ~7× the Z encode —
fine for the oracle-checked entry and small maintenance passes.  For
big compactions use :func:`hilbert_key_pandas`, the numpy-vectorized
Arrow batch form of the SAME walk (equality pinned in
tests/test_hilbert.py): one Python worker round-trip per batch instead
of per-row interpreted evaluation, the same baseline-vs-scale-path
split as ``sim_cosine_topk`` vs its BLAS form.

2-D only, deliberately: the d-dimensional Hilbert generalization
(Butz/Lawder) needs Gray-code reflections that do not unroll cleanly,
and the dominant lakehouse case is exactly two range dimensions
(time × tenant, user × day).  For 3+ dimensions fall back to
:func:`.zorder.zorder_key`, which generalizes trivially.

Usage (layout maintenance)::

    from etl_pulumi_aws_snowflake_spark.functions import hilbert as Hb
    from etl_pulumi_aws_snowflake_spark.functions import zorder as Z
    key = Hb.hilbert_key(Z.bucket("user_id", 0, 10_000, 8),
                         Z.bucket("event_id", 0, 1_000_000, 8), bits=8)
    snapshot_compact(spark, root, cluster_by=[F.expr(key.spark)])
"""

from __future__ import annotations

import pandas as pd  # module-level: pyspark resolves the stringified
# pandas_udf type hints (PEP 563, active here) in THIS module's globals

from .hashing import X, let

#: Key budget: d < 4^bits must fit signed BIGINT.
MAX_BITS = 31


def hilbert_key(xb: X, yb: X, bits: int = 8) -> X:
    """Hilbert ``d`` index of the cell ``(xb, yb)`` on the
    ``2^bits x 2^bits`` grid — ``xb``/``yb`` are already-quantized
    integer expressions in ``[0, 2^bits)`` (use :func:`.zorder.bucket`).

    Classic ``xy2d``, one unrolled level per bit from the top: at level
    ``i`` (cell size ``s = 2^i``) the quadrant index
    ``q = (3*rx) XOR ry`` contributes ``s*s*q`` to ``d``, then the
    lower levels see the (x, y) state rotated into that quadrant's
    frame: when ``ry == 0`` the frame is mirrored-and-swapped (the
    mirror only when ``rx == 1``).  Values outside ``[0, 2^bits)`` are
    the CALLER's bug (bucket() clamps); the walk masks to the low
    ``bits`` so the result is still a valid cell rather than garbage.
    """
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}], got {bits}")
    n1 = (1 << bits) - 1  # n - 1, the mirror constant

    # The walk runs levels HIGH → LOW (xy2d's `for s = n/2 .. 1`), so
    # the binding for level i consumes the state produced by level i+1
    # (the top level consumes the seed).  Built inside-out: innermost
    # is the d extraction from the level-0 state, each _wrap_level adds
    # one binding around it, outermost binds the seed.
    body = X("element_at(hs0, 3)", "hs0[3]")
    for i in range(bits):
        in_var = f"hs{i + 1}" if i + 1 < bits else "hseed"
        body = _wrap_level(body, i, f"hs{i}", in_var, n1)
    # seed: mask inputs to the grid and zero the accumulator, bound once
    seed = X(
        f"array(cast({xb.spark} as bigint) & {n1}L, "
        f"cast({yb.spark} as bigint) & {n1}L, 0L)",
        f"[CAST({xb.duck} AS BIGINT) & {n1}, "
        f"CAST({yb.duck} AS BIGINT) & {n1}, 0]",
    )
    return let(seed, "hseed", body)


def hilbert_key_pandas(x_col, y_col, bits: int = 8):
    """Arrow-vectorized form of :func:`hilbert_key` for the compaction
    hot path: a pandas UDF Column computing the identical walk with
    numpy bit ops over whole batches (no per-row interpreted lambda
    evaluation).  Inputs are integer columns; values are masked to the
    low ``bits`` exactly like the expression form, and NULL in either
    input yields NULL out exactly like the expression form (whose
    integer arithmetic propagates NULL) — so the two are
    interchangeable INCLUDING on NULL-dimension rows, and a compaction
    switching forms cannot reorder them (equality fuzzed, with NULLs,
    in tests/test_hilbert.py).  ``x_col``/``y_col`` are column names or
    already-quantized integer ``Column`` expressions — pass
    ``F.expr(bucket(...).spark)`` to compose grid bucketing with the
    Arrow encode (scripts/hilbert_vs_morton.py does exactly this).  Not
    oracle-expressible by construction (Python body) — the driver entry
    stays on the expression form; this exists for throughput."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}], got {bits}")
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def _encode(xs: pd.Series, ys: pd.Series) -> pd.Series:
        import numpy as np
        import pandas as pd

        n = 1 << bits
        mask = n - 1
        # NULL propagates like the expression form's integer
        # arithmetic: compute on 0-filled values, re-insert NA after.
        na = xs.isna().to_numpy() | ys.isna().to_numpy()
        x = xs.to_numpy(dtype=np.int64, na_value=0) & mask
        y = ys.to_numpy(dtype=np.int64, na_value=0) & mask
        d = np.zeros_like(x)
        s = n >> 1
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            swap = ry == 0
            flip = swap & (rx == 1)
            xf = np.where(flip, n - 1 - x, x)
            yf = np.where(flip, n - 1 - y, y)
            x = np.where(swap, yf, xf)
            y = np.where(swap, xf, yf)
            s >>= 1
        if not na.any():
            return pd.Series(d)
        out = pd.Series(d, dtype="Int64")
        out[na] = pd.NA
        return out

    from pyspark.sql import Column

    xc = x_col if isinstance(x_col, Column) else F.col(x_col)
    yc = y_col if isinstance(y_col, Column) else F.col(y_col)
    return _encode(xc.cast("bigint"), yc.cast("bigint"))


def _wrap_level(inner: X, i: int, out_var: str, in_var: str, n1: int) -> X:
    """Bind ``out_var`` = one rotate-and-accumulate step of the state
    ``in_var`` at level ``i`` around ``inner`` (see :func:`hilbert_key`)."""
    s = 1 << i
    rx_s = f"(shiftright(element_at({in_var}, 1), {i}) & 1)"
    rx_d = f"(({in_var}[1] >> {i}) & 1)"
    ry_s = f"(shiftright(element_at({in_var}, 2), {i}) & 1)"
    ry_d = f"(({in_var}[2] >> {i}) & 1)"
    q_s = f"(3 * {rx_s} + {ry_s} - 2 * {rx_s} * {ry_s})"
    q_d = f"(3 * {rx_d} + {ry_d} - 2 * {rx_d} * {ry_d})"
    fl_s = f"((1 - {ry_s}) * {rx_s})"
    fl_d = f"((1 - {ry_d}) * {rx_d})"
    x1_s = (
        f"({fl_s} * ({n1} - element_at({in_var}, 1)) + "
        f"(1 - {fl_s}) * element_at({in_var}, 1))"
    )
    x1_d = f"({fl_d} * ({n1} - {in_var}[1]) + (1 - {fl_d}) * {in_var}[1])"
    y1_s = (
        f"({fl_s} * ({n1} - element_at({in_var}, 2)) + "
        f"(1 - {fl_s}) * element_at({in_var}, 2))"
    )
    y1_d = f"({fl_d} * ({n1} - {in_var}[2]) + (1 - {fl_d}) * {in_var}[2])"
    nx_s = f"((1 - {ry_s}) * {y1_s} + {ry_s} * {x1_s})"
    nx_d = f"((1 - {ry_d}) * {y1_d} + {ry_d} * {x1_d})"
    ny_s = f"((1 - {ry_s}) * {x1_s} + {ry_s} * {y1_s})"
    ny_d = f"((1 - {ry_d}) * {x1_d} + {ry_d} * {y1_d})"
    nd_s = f"(element_at({in_var}, 3) + {s}L * {s}L * {q_s})"
    nd_d = f"({in_var}[3] + {s} * {s} * {q_d})"
    return let(
        X(f"array({nx_s}, {ny_s}, {nd_s})", f"[{nx_d}, {ny_d}, {nd_d}]"),
        out_var,
        inner,
    )
