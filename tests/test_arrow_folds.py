"""Bit-identity of the r18 Arrow fold kernels against the expression
forms they replaced (guide §4.2): the vectorized numpy kernels must
reproduce the strict-left-fold IEEE sequences EXACTLY — same doubles,
same nulls, same NaNs — or the oracle's exact judgement breaks.

Three kernels, three pins:
- ``similarity._fold_cos_arrow`` vs ``dot/(a.nrm*b.nrm)`` expression
  (float pairs, int8 pairs, zero-norm NaN, null vector, null norm);
- ``pq.pq_encode(use_arrow=True)`` vs the retained expression plan
  (random vectors + exact-codeword ties);
- ``pq._pq_candidates`` ADC LUT vs a locally replayed strict fold.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark.operators import pq as PQ
from etl_pulumi_aws_snowflake_spark.operators import similarity as S

DIM = 8


def _vec_frame(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, v array<double>"
    ).withColumn(
        "nrm",
        F.expr(
            "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0D, "
            "(acc, e) -> acc + e))"
        ),
    )


def _rand_rows(n, seed, dim=DIM, zero_every=None, null_every=None):
    rng = random.Random(seed)
    rows = []
    for i in range(1, n + 1):
        if null_every and i % null_every == 0:
            rows.append((i, None))
        elif zero_every and i % zero_every == 0:
            rows.append((i, [0.0] * dim))
        else:
            rows.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    return rows


def _key(row):
    # NaN-safe value key: NaN != NaN, so compare via repr of doubles
    return tuple(
        (x if not isinstance(x, float) else repr(x)) for x in row
    )


def _assert_same_rows(got, want):
    assert sorted(map(_key, got)) == sorted(map(_key, want))


def test_fold_cos_arrow_bit_identical_to_expression(spark):
    """Float pairs incl. null vectors / norms (cos must be null, as
    the expression's null propagation yields)."""
    a = _vec_frame(spark, _rand_rows(13, seed=1)).alias("a")
    b = _vec_frame(spark, _rand_rows(17, seed=2, null_every=6)).alias("b")
    joined = a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
    cols = [
        F.col("a.vec_id").alias("ida"),
        F.col("b.vec_id").alias("idb"),
    ]
    got = S._fold_cos_arrow(joined, cols).collect()
    want = joined.select(*cols, S._cos_ab()).collect()
    assert len(got) == len(want) == 13 * 17 - min(13, 17)
    _assert_same_rows(got, want)
    null_got = {(r["ida"], r["idb"]) for r in got if r["cos"] is None}
    assert null_got == {(r["ida"], r["idb"]) for r in want if r["cos"] is None}
    assert null_got


def test_fold_cos_arrow_zero_norm_stays_nan(spark):
    """A zero-norm pair's 0/0 must come back as a genuine NaN double —
    the DuckDB oracle's value for that division (the ANSI expression
    form RAISES there instead; kernel semantics follow the oracle and
    the `_assign_arrow` precedent).  The pandas boundary would have
    silently rewritten NaN to null — the reason the kernel is
    mapInArrow."""
    a = _vec_frame(spark, _rand_rows(4, seed=8, zero_every=2)).alias("a")
    b = _vec_frame(spark, _rand_rows(4, seed=9)).alias("b")
    joined = a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
    got = S._fold_cos_arrow(
        joined,
        [F.col("a.vec_id").alias("ida"), F.col("b.vec_id").alias("idb")],
    ).collect()
    nan_pairs = [r for r in got if r["cos"] is not None and math.isnan(r["cos"])]
    assert nan_pairs  # zero-norm probes produced NaN, not null, no crash
    assert all(r["cos"] is not None for r in got if r["ida"] % 2 == 1)


def test_score_pairs_tiers_agree_on_zero_norm(spark):
    """VERDICT r18 #2: tier selection is volume-dependent, so the
    expression arm must produce the SAME rows as the Arrow kernel on a
    zero-norm pair — NaN, not an ANSI DIVIDE_BY_ZERO raise.  Pinned by
    running the identical join through BOTH tiers (the two sides of
    ARROW_SCORE_MIN_ROUTED) over a probe set containing a zero
    vector."""
    a = _vec_frame(spark, _rand_rows(6, seed=21, zero_every=3)).alias("a")
    b = _vec_frame(spark, _rand_rows(7, seed=22)).alias("b")
    joined = a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
    cols = [F.col("a.vec_id").alias("ida"), F.col("b.vec_id").alias("idb")]
    expr_rows = S._score_pairs(joined, cols, use_arrow=False).collect()
    kern_rows = S._score_pairs(joined, cols, use_arrow=True).collect()
    _assert_same_rows(expr_rows, kern_rows)
    nan_rows = [
        r for r in expr_rows if r["cos"] is not None and math.isnan(r["cos"])
    ]
    assert nan_rows  # the zero-norm probe scored NaN in the expression arm
    assert all(
        r["cos"] is not None and not math.isnan(r["cos"])
        for r in expr_rows
        if r["ida"] % 3 != 0
    )


def test_fold_cos_arrow_int8_side_matches_expression(spark):
    """The qv/qnrm form (int8 candidates): element-wise int→double
    promotion then the same fold."""
    rng = random.Random(3)
    a = _vec_frame(spark, _rand_rows(9, seed=4)).alias("a")
    qrows = [
        (i, [rng.randint(-127, 127) for _ in range(DIM)]) for i in range(1, 12)
    ]
    b = (
        spark.createDataFrame(qrows, "vec_id long, qv array<int>")
        .withColumn(
            "qnrm",
            F.expr(
                "sqrt(aggregate(qv, 0D, (acc, q) -> acc + cast(q as double)"
                " * cast(q as double)))"
            ),
        )
        .alias("b")
    )
    joined = a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
    cols = [F.col("a.vec_id").alias("ida"), F.col("b.vec_id").alias("idb")]
    got = S._fold_cos_arrow(
        joined, cols, b_vec="b.qv", b_nrm="b.qnrm", cos_name="qcos"
    ).collect()
    want = joined.select(
        *cols,
        (
            F.expr(
                "aggregate(zip_with(a.v, b.qv, (x, q) -> x * cast(q as "
                "double)), 0D, (acc, e) -> acc + e)"
            )
            / (F.col("a.nrm") * F.col("b.qnrm"))
        ).alias("qcos"),
    ).collect()
    _assert_same_rows(got, want)


def test_pq_encode_arrow_bit_identical_to_expression(spark):
    """Random corpus PLUS rows equal to codebook words (argmin ties —
    the array_sort struct rule must match numpy argmin's first-min)."""
    m, codes = 4, 8
    corpus = _vec_frame(spark, _rand_rows(64, seed=5, zero_every=9))
    assigned = corpus.withColumn("list_id", F.col("vec_id") % 3)
    cb = PQ.pq_codebooks_hashrank(
        corpus.select("vec_id", F.col("v").alias("embedding")), m, codes
    )
    got = PQ.pq_encode(assigned, cb, m, codes, sub_dim=2).collect()
    want = PQ.pq_encode(
        assigned, cb, m, codes, sub_dim=2, use_arrow=False
    ).collect()
    assert len(got) == len(want) > 0
    _assert_same_rows(
        [(r["vec_id"], tuple(r["pq"]), repr(r["nrm"]), r["list_id"]) for r in got],
        [(r["vec_id"], tuple(r["pq"]), repr(r["nrm"]), r["list_id"]) for r in want],
    )


def test_shingle_sets_arrow_bit_identical_to_expression(spark):
    """The Arrow shingle kernel must reproduce the expression pipeline
    EXACTLY — same hashes (unicode/emoji code points included: Java
    splits per code point and ``ascii`` returns it, Python ``ord``
    likewise), same first-occurrence distinct order, null text → empty
    set, sub-k docs → empty set."""
    from etl_pulumi_aws_snowflake_spark.operators.dedup import shingle_sets

    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "one two"),
        (5, "a b c d e"),
        (6, "héllo wörld ünïcode tokens here"),
        (7, "汉字 测试 日本語 テスト emoji 😀 🚀 mix"),
        (8, "a  b   c d e f"),
        (9, "dup dup dup dup dup"),
        (10, "z y x w v u t s r q p o n m l k"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (3, 5):
        got = {
            r["doc_id"]: (list(r["shingles"]), r["n_shingles"])
            for r in shingle_sets(df, k).collect()
        }
        want = {
            r["doc_id"]: (list(r["shingles"]), r["n_shingles"])
            for r in shingle_sets(df, k, use_arrow=False).collect()
        }
        assert got == want  # values AND order AND sizes


def test_pq_adc_serve_matches_expression_fold(spark, tmp_path):
    """The LUT-assembled ADC estimate must equal the per-pair strict
    fold: serve a small index both ways — the kernel path via
    ivf_topk_indexed_pq, the expression path replayed over the same
    routed candidates with _adc_expr."""
    root = str(tmp_path / "pqidx")
    corpus = _vec_frame(spark, _rand_rows(60, seed=7)).select(
        "vec_id", F.col("v").alias("embedding")
    )
    probes = corpus.filter(F.col("vec_id") % 10 == 0)
    PQ.ivf_build_index_pq(corpus, root, nlists=4, m=4, codes=8)
    got = PQ.ivf_topk_indexed_pq(probes, root, k=3, nprobe=2).collect()

    # expression replay over the same pin
    import os

    from etl_pulumi_aws_snowflake_spark.streaming.snapshot import (
        index_current,
        snapshot_read,
    )

    pin = index_current(root) or {}
    seeds = snapshot_read(spark, os.path.join(root, "seeds"),
                          version=pin.get("seeds"))
    cb = snapshot_read(spark, os.path.join(root, "pq_codebooks"),
                       version=pin.get("pq_codebooks"))
    pq_corpus = snapshot_read(spark, os.path.join(root, "corpus_pq"),
                              version=pin.get("corpus_pq"))
    pl = S._route_probes(probes, seeds, 2).alias("a")
    ca = pq_corpus.alias("b")
    joined = F.broadcast(pl).join(
        ca,
        (F.col("a.list_id") == F.col("b.list_id"))
        & (F.col("a.probe_id") != F.col("b.vec_id")),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.desc("pcos"), F.asc("vec_id")
    )
    want = (
        joined.crossJoin(F.broadcast(PQ._cbv_one_row(cb, 4, 8)))
        .select(
            "probe_id",
            F.col("b.vec_id").alias("vec_id"),
            (
                F.expr(PQ._adc_expr(4, 2, "a.v", "b.pq"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("pcos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("probe_id", "rank", "vec_id", "pcos")
    ).collect()
    _assert_same_rows(
        [(r["probe_id"], r["rank"], r["vec_id"], repr(r["pcos"])) for r in got],
        [(r["probe_id"], r["rank"], r["vec_id"], repr(r["pcos"])) for r in want],
    )


def test_pq_adc_kernel_masks_null_probe_embeddings(spark, tmp_path, monkeypatch):
    """ADVICE r18 (medium): a probe with a NULL embedding survives
    routing, and past the tier switch the ADC kernel used to die in
    np.vstack on the None cell — while the expression tier propagates
    a null pcos.  Both tiers must now emit the SAME rows (null pcos
    for the null probe's candidates)."""
    root = str(tmp_path / "pqidx_null")
    corpus = _vec_frame(spark, _rand_rows(60, seed=31)).select(
        "vec_id", F.col("v").alias("embedding")
    )
    PQ.ivf_build_index_pq(corpus, root, nlists=4, m=4, codes=8)
    probes = corpus.filter(F.col("vec_id") % 10 == 0).unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id long, embedding array<double>"
        )
    )
    monkeypatch.setattr(PQ, "ARROW_SCORE_MIN_ROUTED", 10**9)
    expr_rows = PQ._pq_candidates(probes, root, 2, None).select(
        "probe_id", "vec_id", "pcos"
    ).collect()
    monkeypatch.setattr(PQ, "ARROW_SCORE_MIN_ROUTED", 0)
    kern_rows = PQ._pq_candidates(probes, root, 2, None).select(
        "probe_id", "vec_id", "pcos"
    ).collect()
    _assert_same_rows(kern_rows, expr_rows)
    nulls = [r for r in kern_rows if r["probe_id"] == 999]
    assert nulls and all(r["pcos"] is None for r in nulls)


def test_ivf_topk_tier_flips_to_kernel_above_crossover(spark, monkeypatch):
    """VERDICT r18 #5: non-indexed ivf_topk now reads its routed-row
    count from the persisted routing table (the count materializes the
    cache the ranking broadcast reuses — no extra corpus pass) and
    serves through the Arrow kernel past ARROW_SCORE_MIN_ROUTED.
    Pinned: same rows on both sides of the threshold, MapInArrow in
    the plan above it, the codegen expression plan below it."""
    corpus = _vec_frame(spark, _rand_rows(80, seed=41)).select(
        "vec_id", F.col("v").alias("embedding")
    )
    probes = corpus.filter(F.col("vec_id") % 10 == 0)
    below = S.ivf_topk(probes, corpus, k=3, nprobe=2, nlists=4)
    assert "MapInArrow" not in below._jdf.queryExecution().toString()
    want = below.collect()
    monkeypatch.setattr(S, "ARROW_SCORE_MIN_ROUTED", 1)
    above = S.ivf_topk(probes, corpus, k=3, nprobe=2, nlists=4)
    assert "MapInArrow" in above._jdf.queryExecution().toString()
    _assert_same_rows(above.collect(), want)
