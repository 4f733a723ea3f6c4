"""Embedding-vector expressions (cosine similarity) with DuckDB mirrors.

Similarity search (SURVEY.md §2.10) runs on ``array<float>`` columns.
All math is a strict left fold in double precision — Spark's
``aggregate`` and DuckDB's ``list_reduce`` both reduce left-to-right,
and IEEE ``+``/``*``/``/``/``sqrt`` are correctly rounded, so the two
engines produce bit-identical doubles (no tolerance needed in the
oracle check).

Scale path: these are per-row narrow expressions inside whole-stage
codegen.  A 100 TB kNN never crosses Python; the only shuffles are the
candidate-pair joins in operators/similarity.py.
"""

from __future__ import annotations

from .hashing import X, let


def as_double(col: str) -> X:
    """float32[] → double[] once, so all downstream math is double."""
    return X(f"cast({col} as array<double>)", f"CAST({col} AS DOUBLE[])")


def dot(a: X, b: X) -> X:
    """Σ aᵢ·bᵢ, strict left fold."""
    return X(
        f"aggregate(zip_with({a.spark}, {b.spark}, (x, y) -> x * y), 0D, "
        f"(acc, v) -> acc + v)",
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({a.duck})), "
        f"i -> ({a.duck})[i] * ({b.duck})[i])), (acc, v) -> acc + v)",
    )


def norm(a: X) -> X:
    d = dot(a, a)
    return X(f"sqrt({d.spark})", f"sqrt({d.duck})")


def dot_cols(a: str, b: str) -> str:
    """Spark-only dot of two ALREADY-double array columns — for the
    precomputed-norm path in operators/similarity.py (one fold per
    pair instead of three)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, "
        f"(acc, v) -> acc + v)"
    )


def cosine(a: X, b: X) -> X:
    """dot/(‖a‖·‖b‖) — identical operation order in both dialects.

    Both operands are let-bound (hashing.let) so the double-cast arrays
    are materialized once per pair, not once per fold that mentions
    them."""
    av, bv = X("av", "av"), X("bv", "bv")
    d, na, nb = dot(av, bv), norm(av), norm(bv)
    body = X(
        f"{d.spark} / ({na.spark} * {nb.spark})",
        f"{d.duck} / ({na.duck} * {nb.duck})",
    )
    return let(a, "av", let(b, "bv", body))
