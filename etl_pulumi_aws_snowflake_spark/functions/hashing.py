"""Deterministic text-hashing expressions with DuckDB mirrors.

Dedup at 100 TB (SURVEY.md §2.10) needs content hashes that are (a)
computed JVM-side inside whole-stage codegen — no Python in the hot
path — and (b) reproducible outside Spark so every operator stays
oracle-checkable.  Spark's ``xxhash64``/``hash`` seeds are
engine-internal, so instead the oracle-parity path uses a polynomial
rolling hash over code points, built from higher-order functions that
both Spark (``aggregate``/``transform``) and DuckDB
(``list_reduce``/``list_transform``) evaluate identically (verified
bit-for-bit in tests/test_llm_ops.py).

Every builder returns an :class:`X` pair — ``.spark`` is a Spark SQL
expression (use with ``F.expr``), ``.duck`` the equivalent DuckDB SQL —
generated from one template so the two dialects cannot drift.

Scale note: the polynomial fold is ~O(len) per word but stays inside
codegen (no shuffle, no Python).  For pure-Spark pipelines where
external reproducibility is not needed, swap in ``F.xxhash64`` via
:func:`xxhash_words` — same operator shape, cheaper per byte.
"""

from __future__ import annotations

from typing import NamedTuple

P = 1_000_000_007  # prime modulus — keeps products inside int64
B = 1_000_003  # combination base for k-gram / rolling hashes


class X(NamedTuple):
    """A Spark-SQL / DuckDB-SQL expression pair."""

    spark: str
    duck: str


def let(value: X, var: str, body: X) -> X:
    """Cross-engine let-binding: evaluate ``value`` ONCE per row and
    reference it as ``var`` inside ``body`` (single-element-array
    transform trick — the lambda variable is a cheap reference).

    Load-bearing for performance: composed templates would otherwise
    textually duplicate expensive sub-arrays (e.g. the word-hash array
    inside a per-shingle lambda), and Spark's interpreted higher-order
    functions re-evaluate every textual occurrence — measured 30×
    slowdowns at 5k docs before this binding, growing with document
    count × signature width.
    """
    return X(
        f"element_at(transform(array({value.spark}), {var} -> {body.spark}), 1)",
        f"(list_transform([{value.duck}], {var} -> {body.duck}))[1]",
    )


def words(text: str = "text") -> X:
    """Whitespace tokens, empties dropped (split of '' would hash)."""
    return X(
        f"filter(split({text}, ' '), w -> w != '')",
        f"list_filter(string_split({text}, ' '), w -> w != '')",
    )


def word_hash(w: str) -> X:
    """Polynomial hash of one string: fold over code points,
    ``acc*31 + codepoint (mod P)``.

    The fold runs over ``split(w, '')`` (per-code-point array) rather
    than indexed ``substring(w, i, 1)``: each substring call seeks from
    the string head under variable-width UTF-8, making the indexed form
    O(len²) per word — measured 40% slower end-to-end on the shingle
    pipeline at sf0.1.  Values are bit-identical (same code points,
    same arithmetic; both engines split '' per code point).  Callers
    must pre-filter empty tokens (``words()`` does) — the engines
    disagree on splitting ''."""
    return X(
        f"aggregate(split({w}, ''), 0L, "
        f"(acc, c) -> (acc * 31 + ascii(c)) % {P})",
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({w}, ''), "
        f"c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {P})",
    )


def word_hashes(text: str = "text") -> X:
    """Array of per-token hashes — one narrow projection, no shuffle."""
    ws = words(text)
    wh = word_hash("w")
    return X(
        f"transform({ws.spark}, w -> {wh.spark})",
        f"list_transform({ws.duck}, w -> {wh.duck})",
    )


def shingle_hashes(hs: X, k: int = 3) -> X:
    """Hashes of overlapping k-grams of an already-hashed token array:
    combine k consecutive word hashes with base-B polynomial (bounded by
    P*B ≈ 1e15, safely inside int64).  Documents shorter than k yield an
    empty array (Spark's ``sequence(1, 0)`` counts DOWN, so the guard is
    load-bearing)."""

    def combine(elem_at) -> str:
        expr = elem_at(0)
        for j in range(1, k):
            expr = f"(({expr}) * {B} + {elem_at(j)}) % {P}"
        return expr

    body = X(
        f"if(size(hsv) >= {k}, transform(sequence(1, size(hsv) - {k - 1}), "
        f"i -> {combine(lambda j: f'element_at(hsv, i + {j})')}), "
        f"cast(array() as array<bigint>))",
        f"CASE WHEN len(hsv) >= {k} THEN "
        f"list_transform(generate_series(1, len(hsv) - {k - 1}), "
        f"i -> {combine(lambda j: f'hsv[i + {j}]')}) "
        f"ELSE CAST([] AS BIGINT[]) END",
    )
    return let(hs, "hsv", body)


def minhash_signature(sh: X, k: int = 16) -> X:
    """MinHash signature: k universal-hash minima over the shingle set.

    Hash family ``h_i(s) = (a_i*s + b_i) mod P`` with ``a_i``, ``b_i``
    derived arithmetically from ``i`` (Knuth multiplicative constants) —
    no RNG, so any engine reproduces the signature.  Computed per-row
    with nested array transforms: the 100 TB plan is embarrassingly
    parallel, zero shuffle until the LSH band join."""
    a = f"(((i + 1) * 2654435761) % {P})"
    b = f"((((i + 1) * 40503) + 12345) % {P})"
    h = f"({a} * x + {b}) % {P}"
    body = X(
        f"transform(sequence(0, {k - 1}), "
        f"i -> array_min(transform(shv, x -> {h})))",
        f"list_transform(generate_series(0, {k - 1}), "
        f"i -> list_min(list_transform(shv, x -> {h})))",
    )
    return let(sh, "shv", body)


def band_keys(sig: X, bands: int, rows: int) -> X:
    """LSH banding: split the signature into ``bands`` groups of
    ``rows`` and combine each group into one int64 key (base P keeps
    r=2 keys < 1e18).  Docs sharing any (band index, key) become
    candidate pairs.

    ``rows > 2`` is rejected loudly (ADVICE r10): the base-P fold at
    r=3 reaches ~P³ ≈ 1e27, which Spark wraps silently in non-ANSI
    int64 arithmetic while DuckDB raises or diverges — silently
    engine-divergent, collision-prone keys.  Widening the banding
    means more BANDS, not more rows per key."""
    if rows > 2:
        raise ValueError(
            f"band_keys: rows={rows} overflows the base-P int64 key "
            f"combine (P^{rows} ≈ {float(P) ** rows:.1e} > int64 max); "
            "use rows <= 2 — i.e. num_hashes <= 2 * bands"
        )

    def combine(elem_at) -> str:
        expr = elem_at(0)
        for j in range(1, rows):
            expr = f"({expr}) * {P} + {elem_at(j)}"
        return expr

    body = X(
        f"transform(sequence(0, {bands - 1}), "
        f"b -> {combine(lambda j: f'element_at(sgv, b * {rows} + {j + 1})')})",
        f"list_transform(generate_series(0, {bands - 1}), "
        f"b -> {combine(lambda j: f'sgv[b * {rows} + {j + 1}]')})",
    )
    return let(sig, "sgv", body)


def simhash(hs: X, bits: int = 32) -> X:
    """SimHash: for each bit position, sum +1/-1 votes from every token
    hash, set the bit when the vote is positive.  Token multiplicity
    weights votes (classic SimHash), so near-identical word mixes land
    at small Hamming distance."""
    vote_spark = (
        "aggregate(hv, 0L, "
        "(acc, x) -> acc + if(shiftright(x, j) % 2 = 1, 1, -1))"
    )
    vote_duck = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(hv, x -> CAST(CASE WHEN ((x >> j) & 1) = 1 "
        "THEN 1 ELSE -1 END AS BIGINT))), (acc2, x2) -> acc2 + x2)"
    )
    body = X(
        f"aggregate(transform(sequence(0, {bits - 1}), "
        f"j -> if({vote_spark} > 0, shiftleft(1L, j), 0L)), 0L, (a2, v) -> a2 + v)",
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(0, {bits - 1}), "
        f"j -> CASE WHEN {vote_duck} > 0 THEN (CAST(1 AS BIGINT) << j) "
        f"ELSE CAST(0 AS BIGINT) END)), (a3, v3) -> a3 + v3)",
    )
    return let(hs, "hv", body)


def fingerprint(text: str = "text") -> X:
    """Order-sensitive document fingerprint: rolling base-B hash over
    the token-hash sequence (token-level rolling hash — reorderings
    change it, token multisets alone do not collide it)."""
    hs = word_hashes(text)
    return X(
        f"aggregate({hs.spark}, 0L, (acc, x) -> (acc * {B} + x) % {P})",
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {hs.duck}), "
        f"(acc, x) -> (acc * {B} + x) % {P})",
    )


def xxhash_words(text_col: str = "text"):
    """Scale-path token hashing (Spark-only, no oracle mirror):
    xxhash64 per token via one transform — cheaper than the polynomial
    fold when external reproducibility is not required."""
    from pyspark.sql import functions as F

    return F.expr(f"transform(split({text_col}, ' '), w -> xxhash64(w))")
