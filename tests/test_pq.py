"""IVF-PQ operator tests (operators/pq.py, VERDICT r12 #7) — the
properties the DuckDB oracle comparison can't express: lifecycle
parity, the payload-size claim, recall vs the int8 tier and the
routing ceiling, and the loud guards."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark.operators import pq as PQ
from etl_pulumi_aws_snowflake_spark.operators import similarity as S
from etl_pulumi_aws_snowflake_spark.sources import load_table
from etl_pulumi_aws_snowflake_spark.streaming.snapshot import snapshot_read

SF = "/root/testdata/sf0.001"


def _emb(spark):
    emb = load_table(spark, SF, "embeddings")
    return emb.filter(F.col("vec_id") % 100 == 0), emb


def test_pq_lifecycle_parity_and_dual_payload_lockstep(spark, tmp_path):
    """Append + delete on a rerank-enabled PQ index must serve exactly
    like a fresh build over the surviving set under the SAME frozen
    seeds and codebooks (encoding is a pure per-vector function of the
    freezes, so this is structural, and the test pins it)."""
    probes, emb = _emb(spark)
    grown = str(tmp_path / "grown")
    base = emb.filter(F.col("vec_id") % 4 != 3)
    PQ.ivf_build_index_pq(
        base, grown, nlists=8, m=8, codes=16, rerank_payload=True
    )
    PQ.ivf_index_append_pq(emb.filter(F.col("vec_id") % 4 == 3), grown)
    PQ.ivf_index_delete_pq(emb.filter(F.col("vec_id") % 4 == 1), grown)
    cent = [
        (r["seed_id"], r["v"])
        for r in snapshot_read(spark, os.path.join(grown, "seeds")).collect()
    ]
    cbs = [
        (r["sub_id"], r["code_id"], r["cv"])
        for r in snapshot_read(
            spark, os.path.join(grown, "pq_codebooks")
        ).collect()
    ]
    fresh = str(tmp_path / "fresh")
    PQ.ivf_build_index_pq(
        emb.filter(F.col("vec_id") % 4 != 1),
        fresh,
        centroids=cent,
        codebooks=cbs,
        m=8,
        codes=16,
        rerank_payload=True,
    )
    for serve in (
        lambda r: PQ.ivf_topk_indexed_pq(probes, r, k=3, nprobe=2),
        lambda r: PQ.ivf_topk_indexed_pq_rerank(probes, r, k=3, nprobe=2, m=5),
    ):
        got = sorted(map(tuple, serve(grown).collect()))
        want = sorted(map(tuple, serve(fresh).collect()))
        assert got == want and got


def test_pq_payload_is_smaller_than_int8(spark, tmp_path):
    """The reason this tier exists: the PQ corpus member's parquet
    bytes must be well under the int8 member's for the same corpus
    (m=8 codeword ids + a norm vs 64 int8s + a norm)."""
    _, emb = _emb(spark)
    pq_root = str(tmp_path / "pq")
    q_root = str(tmp_path / "q")
    PQ.ivf_build_index_pq(emb, pq_root, nlists=8, m=8, codes=16)
    S.ivf_build_index_quantized(emb, q_root, nlists=8)

    def parquet_bytes(root, member):
        total = 0
        for dirpath, _dirs, files in os.walk(os.path.join(root, member)):
            total += sum(
                os.path.getsize(os.path.join(dirpath, f))
                for f in files
                if f.endswith(".parquet")
            )
        return total

    pq_b = parquet_bytes(pq_root, "corpus_pq")
    q_b = parquet_bytes(q_root, "corpus_q")
    assert pq_b < q_b * 0.6, (pq_b, q_b)


def test_pq_rerank_recall_vs_int8_and_ceiling(spark, tmp_path):
    """The recall pair, engine-side: (a) PQ-rerank recall is positive
    and within the nprobe routing CEILING (the float path's hits — no
    tier can beat its own routing); (b) the rerank tier recovers at
    least the raw ADC ranking's hits (the survivor-set argument)."""
    probes, emb = _emb(spark)
    exact = S.cosine_topk(probes, emb, k=3).select("probe_id", "vec_id")

    def hits(ann):
        return ann.select("probe_id", "vec_id").join(
            exact, ["probe_id", "vec_id"]
        ).count()

    froot = str(tmp_path / "f")
    S.ivf_build_index(emb, froot, nlists=8)
    ceiling = hits(S.ivf_topk_indexed(probes, froot, k=3, nprobe=2))

    root = str(tmp_path / "pq")
    PQ.ivf_build_index_pq(
        emb, root, nlists=8, m=8, codes=32, rerank_payload=True
    )
    h_adc = hits(PQ.ivf_topk_indexed_pq(probes, root, k=3, nprobe=2))
    h_rr = hits(PQ.ivf_topk_indexed_pq_rerank(probes, root, k=3, nprobe=2, m=5))
    assert 0 < h_rr <= ceiling
    assert h_rr >= h_adc


def test_pq_trained_codebooks_build_and_serve(spark, tmp_path):
    """The Lloyd-trained codebook path (quality tier, pytest-only by
    design): trains m independent per-subspace codebooks, builds, and
    serves deterministically for a fixed session."""
    probes, emb = _emb(spark)
    cbs = PQ.train_pq_codebooks(emb, m=8, codes=8, max_iter=5)
    assert len(cbs) == 64 and all(len(cv) == 8 for _, _, cv in cbs)
    root = str(tmp_path / "trained")
    PQ.ivf_build_index_pq(emb, root, nlists=8, m=8, codes=8, codebooks=cbs)
    a = sorted(map(tuple, PQ.ivf_topk_indexed_pq(probes, root, k=3).collect()))
    b = sorted(map(tuple, PQ.ivf_topk_indexed_pq(probes, root, k=3).collect()))
    assert a == b and a


def test_pq_loud_guards(spark, tmp_path):
    probes, emb = _emb(spark)
    with pytest.raises(ValueError, match="divisible"):
        PQ.ivf_build_index_pq(emb, str(tmp_path / "bad"), nlists=8, m=7)
    # ADC-only build refuses the rerank serve instead of reading a
    # stale float dir (the pin-authoritative rule, ADVICE r12)
    root = str(tmp_path / "adc_only")
    PQ.ivf_build_index_pq(emb, root, nlists=8, m=8, codes=16)
    with pytest.raises(ValueError, match="rerank_payload"):
        PQ.ivf_topk_indexed_pq_rerank(probes, root, k=3, nprobe=2)
    # zero vectors are dropped at encode, matching the int8 rule
    z = spark.createDataFrame(
        [(999999, [0.0] * 64, 0)], "vec_id long, embedding array<float>, label int"
    )
    PQ.ivf_index_append_pq(z, root)
    served = PQ.ivf_topk_indexed_pq(probes, root, k=3, nprobe=8)
    assert served.filter(F.col("vec_id") == 999999).count() == 0


def test_pq_codebook_cardinality_guards(spark, tmp_path):
    """Review r13: _cbv_one_row indexes flat[(j-1)*codes + c], so an
    incomplete codebook grid silently misaligns lookups to the WRONG
    subspace's codewords — the build must validate loudly instead."""
    _, emb = _emb(spark)
    # corpus smaller than `codes`: the hash-rank pick comes up short
    tiny = emb.limit(10)
    with pytest.raises(ValueError, match="exactly one entry"):
        PQ.ivf_build_index_pq(tiny, str(tmp_path / "a"), nlists=4, m=8,
                              codes=32)
    # custom codebooks with a missing cell
    cbs = PQ.train_pq_codebooks(emb, m=8, codes=4, max_iter=2)
    with pytest.raises(ValueError, match="exactly one entry"):
        PQ.ivf_build_index_pq(
            emb, str(tmp_path / "b"), nlists=4, m=8, codes=4,
            codebooks=cbs[:-1],
        )
    # custom codebooks whose sub_dim does not tile the corpus dim
    bad = [(j, c, cv[:4]) for j, c, cv in cbs]
    with pytest.raises(ValueError, match="corpus is 64-dim"):
        PQ.ivf_build_index_pq(
            emb, str(tmp_path / "c"), nlists=4, m=8, codes=4, codebooks=bad
        )


def test_pq_rerank_guard_fires_before_empty_early_return(spark, tmp_path):
    """Review r13: an ADC-only build must raise the loud
    not-a-rerank-build error even when the probe set produces zero
    survivors — the empty early-return must not mask it."""
    probes, emb = _emb(spark)
    root = str(tmp_path / "adc_only")
    PQ.ivf_build_index_pq(emb, root, nlists=8, m=8, codes=16)
    empty_probes = probes.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="rerank_payload"):
        PQ.ivf_topk_indexed_pq_rerank(empty_probes, root, k=3, nprobe=2)


def test_stream_ivf_pq_ingest_split_independent_and_replay_safe(
    spark, tmp_path
):
    """The PQ stream's idempotence argument, pinned: (a) the grown
    index serves identically whatever the batch split (frozen seeds +
    frozen codebooks + keyed MERGEs); (b) replaying a batch is a
    wholesale no-op on search results (pure per-vector encoding, no
    stats to double-count)."""
    from etl_pulumi_aws_snowflake_spark.streaming.ivf_ingest import (
        ivf_ingest_batch,
    )

    probes, emb = _emb(spark)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)

    def serve(root):
        return sorted(
            map(
                tuple,
                PQ.ivf_topk_indexed_pq_rerank(
                    probes, root, k=3, nprobe=2, m=5
                ).collect(),
            )
        )

    # one-shot vs three-way split
    one = str(tmp_path / "one")
    PQ.ivf_build_index_pq(base, one, nlists=8, m=8, codes=16,
                          rerank_payload=True)
    ivf_ingest_batch(new, 0, one, pq=True)

    split = str(tmp_path / "split")
    PQ.ivf_build_index_pq(base, split, nlists=8, m=8, codes=16,
                          rerank_payload=True)
    parts = [new.filter(F.expr(f"((vec_id - 1) div 2) % 3 = {i}"))
             for i in range(3)]
    for i, p in enumerate(parts):
        ivf_ingest_batch(p, i, split, pq=True)
    want = serve(one)
    assert serve(split) == want and want

    # crash-replay of the middle batch: search results unchanged
    ivf_ingest_batch(parts[1], 1, split, pq=True)
    assert serve(split) == want
    # mode exclusivity guard
    with pytest.raises(ValueError, match="ONE of"):
        ivf_ingest_batch(parts[0], 0, split, quantized=True, pq=True)


def _clustered(spark, dim=64, nc=10, n=400, noise=0.05):
    """A corpus WITH real cluster structure: nc tight gaussian blobs —
    the regime residual encoding (FAISS default) is built for."""
    import random

    rng = random.Random(42)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(nc)]
    rows = [
        (
            i,
            [
                centers[i % nc][d] + rng.gauss(0, noise)
                for d in range(dim)
            ],
        )
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_residual_wins_recall_on_clustered_corpus(spark, tmp_path):
    """The residual tier's quality claim, pinned where it holds (r14,
    VERDICT r13 #3): on a clustered corpus at IDENTICAL geometry,
    residual encoding recalls at least as many exact-top-3 hits as raw
    — for the ADC-only serve AND the rerank serve — because the
    probe·centroid term is exact and quantization error is confined to
    the small intra-cluster residual."""
    emb = _clustered(spark)
    probes = emb.filter(F.col("vec_id") % 20 == 0)
    exact = S.cosine_topk(probes, emb, k=3).select("probe_id", "vec_id")

    def hits(ann):
        return (
            ann.select("probe_id", "vec_id")
            .join(exact, ["probe_id", "vec_id"])
            .count()
        )

    raw_root, res_root = str(tmp_path / "raw"), str(tmp_path / "res")
    for root, res in ((raw_root, False), (res_root, True)):
        PQ.ivf_build_index_pq(
            emb, root, nlists=10, m=8, codes=16,
            residual=res, rerank_payload=True,
        )
    h_raw_adc = hits(PQ.ivf_topk_indexed_pq(probes, raw_root, k=3, nprobe=2))
    h_res_adc = hits(PQ.ivf_topk_indexed_pq(probes, res_root, k=3, nprobe=2))
    h_raw_rr = hits(
        PQ.ivf_topk_indexed_pq_rerank(probes, raw_root, k=3, nprobe=2, m=5)
    )
    h_res_rr = hits(
        PQ.ivf_topk_indexed_pq_rerank(probes, res_root, k=3, nprobe=2, m=5)
    )
    assert h_res_adc >= h_raw_adc > 0, (h_res_adc, h_raw_adc)
    assert h_res_rr >= h_raw_rr > 0, (h_res_rr, h_raw_rr)
    # and strictly better somewhere — the structure is actually used
    assert h_res_adc + h_res_rr > h_raw_adc + h_raw_rr


def test_pq_residual_distortion_inverse_on_uniform_corpus(spark):
    """The OTHER regime, pinned so the docs stay honest: on the
    near-uniform synthetic embeddings with sample-picked centroids the
    residual is a difference of two ~independent draws (~2x the
    variance), so residual reconstruction distortion measures WORSE
    than raw — the tier is chosen per corpus by pq_distortion, not by
    default."""
    from etl_pulumi_aws_snowflake_spark.operators.pq import (
        _cb_frame_validate,
        _codebooks_hashrank_from,
        _residualize,
    )
    from etl_pulumi_aws_snowflake_spark.operators.similarity import (
        _seed_frame,
        ivf_assign,
    )

    _, emb = _emb(spark)
    assigned = ivf_assign(emb, nlists=8)
    seeds = _seed_frame(emb, 50, None, 8)
    resd = _residualize(assigned, seeds)
    cb_raw = _cb_frame_validate(
        _codebooks_hashrank_from(assigned, 8, 16, "v"), spark, 8, 16
    )
    cb_res = _cb_frame_validate(
        _codebooks_hashrank_from(resd, 8, 16, "rv"), spark, 8, 16
    )
    d_raw = PQ.pq_distortion(assigned, cb_raw, 8, 16, "v")
    d_res = PQ.pq_distortion(resd, cb_res, 8, 16, "rv")
    assert d_res > d_raw > 0, (d_res, d_raw)


def test_pq_residual_lifecycle_parity(spark, tmp_path):
    """Append + delete on a RESIDUAL rerank-enabled index serve exactly
    like a fresh residual build over the survivors under the same
    frozen seeds and codebooks — residualize-then-encode is still a
    pure per-vector function of the freezes (VERDICT r13 #3's
    lockstep requirement)."""
    probes, emb = _emb(spark)
    grown = str(tmp_path / "grown")
    base = emb.filter(F.col("vec_id") % 4 != 3)
    PQ.ivf_build_index_pq(
        base, grown, nlists=8, m=8, codes=16,
        residual=True, rerank_payload=True,
    )
    PQ.ivf_index_append_pq(emb.filter(F.col("vec_id") % 4 == 3), grown)
    PQ.ivf_index_delete_pq(emb.filter(F.col("vec_id") % 4 == 1), grown)
    cent = [
        (r["seed_id"], r["v"])
        for r in snapshot_read(spark, os.path.join(grown, "seeds")).collect()
    ]
    cbs = [
        (r["sub_id"], r["code_id"], r["cv"])
        for r in snapshot_read(
            spark, os.path.join(grown, "pq_codebooks")
        ).collect()
    ]
    fresh = str(tmp_path / "fresh")
    PQ.ivf_build_index_pq(
        emb.filter(F.col("vec_id") % 4 != 1),
        fresh,
        centroids=cent,
        codebooks=cbs,
        m=8,
        codes=16,
        residual=True,
        rerank_payload=True,
    )
    for serve in (
        lambda r: PQ.ivf_topk_indexed_pq(probes, r, k=3, nprobe=2),
        lambda r: PQ.ivf_topk_indexed_pq_rerank(probes, r, k=3, nprobe=2, m=5),
    ):
        got = sorted(map(tuple, serve(grown).collect()))
        want = sorted(map(tuple, serve(fresh).collect()))
        assert got == want and got


def test_pq_fold_trainer_monotone_and_partition_invariant(spark):
    """train_pq_codebooks_fold (r14, VERDICT r13 #6): (a) Lloyd steps
    never increase reconstruction distortion (assign-then-mean each
    weakly improves); (b) the vec_id-ordered strict-fold mean makes
    the result BIT-EXACT across different input partitionings — the
    property that lets the trained path be oracle-judged, and that
    pyspark.ml KMeans does not have."""
    from etl_pulumi_aws_snowflake_spark.operators.similarity import ivf_assign

    _, emb = _emb(spark)
    assigned = ivf_assign(emb, nlists=8)

    def dist(cbrows):
        cb = spark.createDataFrame(
            cbrows, "sub_id int, code_id int, cv array<double>"
        )
        return PQ.pq_distortion(assigned, cb, 8, 16, "v")

    cb0 = PQ.train_pq_codebooks_fold(emb, 8, 16, n_iter=0)
    cb1 = PQ.train_pq_codebooks_fold(emb, 8, 16, n_iter=1)
    cb2 = PQ.train_pq_codebooks_fold(emb, 8, 16, n_iter=2)
    d0, d1, d2 = dist(cb0), dist(cb1), dist(cb2)
    assert d1 <= d0 and d2 <= d1, (d0, d1, d2)
    assert d1 < d0  # the first step actually moves on this corpus

    cb1_rep = PQ.train_pq_codebooks_fold(emb.repartition(13), 8, 16, n_iter=1)
    assert cb1 == cb1_rep  # bit-exact, not approximately equal


def test_pq_trained_entry_serves_and_differs_from_hashrank(spark, tmp_path):
    """The judged trained entry's engine side: one fold-Lloyd step
    produces codebooks that differ from the init and serve a valid
    ADC ranking."""
    probes, emb = _emb(spark)
    cb1 = PQ.train_pq_codebooks_fold(emb, 8, 16, n_iter=1)
    cb0 = PQ.train_pq_codebooks_fold(emb, 8, 16, n_iter=0)
    assert cb1 != cb0
    root = str(tmp_path / "tr")
    PQ.ivf_build_index_pq(emb, root, nlists=8, m=8, codes=16, codebooks=cb1)
    out = PQ.ivf_topk_indexed_pq(probes, root, k=3, nprobe=2).collect()
    assert out and all(r["rank"] in (1, 2, 3) for r in out)
