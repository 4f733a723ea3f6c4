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
