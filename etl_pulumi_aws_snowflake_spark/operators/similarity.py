"""Embedding similarity search (SURVEY.md §2.10).

Three tiers, correctness-first then scale:

- **brute-force top-k** — probes × corpus cosine via a broadcast join;
  exact, the recall baseline.  At 100 TB the corpus side stays
  partitioned and only the (small) probe set is broadcast, so the scan
  is embarrassingly parallel with no shuffle of the corpus.
- **threshold pairs** (embedding-space near-dup) — same broadcast
  shape, filter instead of top-k.
- **IVF (seeded)** — coarse quantization: corpus vectors are assigned
  to their nearest seed centroid once (narrow after a broadcast of the
  seed list), probes search only the ``nprobe`` closest inverted lists.
  Seeds here are deterministic corpus members (``vec_id % stride = 0``)
  rather than k-means output, which keeps the operator reproducible and
  oracle-checkable; swapping in trained centroids changes recall, not
  the plan shape.  At scale: repartition corpus by ``list_id`` →
  probe-to-list join prunes ~(1 - nprobe/nlists) of the corpus.

All cosine math is the strict-left-fold double expression from
functions/vectors.py — JVM codegen, no Python, engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V

_COS = V.cosine(V.as_double("a.embedding"), V.as_double("b.embedding")).spark


def _pairs(probes: DataFrame, corpus: DataFrame) -> DataFrame:
    """(probe_id, vec_id, cos) for every probe×corpus pair, probe side
    broadcast.  Cosine left raw: the strict-left-fold double math is
    deterministic, and ties are broken by id downstream."""
    a = probes.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding")
    ).alias("a")
    b = corpus.alias("b")
    return (
        F.broadcast(a)
        .join(b, F.col("a.probe_id") != F.col("b.vec_id"))
        .select(
            "probe_id",
            F.col("b.vec_id").alias("vec_id"),
            F.expr(_COS).alias("cos"),
        )
    )


def cosine_topk(probes: DataFrame, corpus: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k nearest (cosine) corpus rows per probe:
    (probe_id, rank, vec_id, cos).  Ties broken by vec_id so the result
    is total-ordered; the window partitions by probe (few probes ⇒
    map-side partial top-k via AQE/codegen, final per-probe sort tiny).
    """
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        _pairs(probes, corpus)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "vec_id", "cos")
    )


def cosine_near_pairs(
    probes: DataFrame, corpus: DataFrame, threshold: float = 0.35
) -> DataFrame:
    """Embedding-space near-duplicates: probe/corpus pairs with cosine
    ≥ threshold — (probe_id, vec_id, cos)."""
    return _pairs(probes, corpus).filter(F.col("cos") >= threshold)


def ivf_assign(corpus: DataFrame, seed_stride: int = 50) -> DataFrame:
    """Assign every vector to its nearest seed centroid (vec_id %
    stride = 0 rows): corpus + (list_id, list_cos).  Deterministic
    argmax: highest cosine, then lowest seed id."""
    seeds = corpus.filter(F.col("vec_id") % seed_stride == 0).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding")
    )
    a = seeds.alias("a")
    b = corpus.alias("b")
    w = Window.partitionBy("vec_id").orderBy(F.desc("seed_cos"), F.asc("seed_id"))
    return (
        F.broadcast(a)
        .join(b)
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.col("b.embedding").alias("embedding"),
            F.col("a.seed_id").alias("seed_id"),
            F.expr(
                V.cosine(V.as_double("a.embedding"), V.as_double("b.embedding")).spark
            ).alias("seed_cos"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("seed_id").alias("list_id"))
    )


def ivf_topk(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    seed_stride: int = 50,
) -> DataFrame:
    """ANN top-k via inverted lists: each probe searches only its
    ``nprobe`` nearest lists — (probe_id, rank, vec_id, cos).

    Recall < 1 by design (that is the ANN trade); precision within the
    searched lists is exact.  The probe→list assignment reuses
    :func:`ivf_assign`'s ordering rule, so results are deterministic.
    """
    assigned = ivf_assign(corpus, seed_stride)
    seeds = corpus.filter(F.col("vec_id") % seed_stride == 0).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding")
    )
    # nprobe nearest lists per probe (probe may be a corpus member of
    # another list — search is over lists, membership is irrelevant).
    a = probes.select(F.col("vec_id").alias("probe_id"), "embedding").alias("a")
    b = seeds.alias("b")
    wl = Window.partitionBy("probe_id").orderBy(F.desc("list_cos"), F.asc("list_id"))
    probe_lists = (
        a.join(F.broadcast(b))
        .select(
            "probe_id",
            F.col("a.embedding").alias("p_embedding"),
            F.col("b.seed_id").alias("list_id"),
            F.expr(
                V.cosine(V.as_double("a.embedding"), V.as_double("b.embedding")).spark
            ).alias("list_cos"),
        )
        .withColumn("lr", F.row_number().over(wl))
        .filter(F.col("lr") <= nprobe)
        .select("probe_id", "p_embedding", "list_id")
    )
    pa = probe_lists.alias("a")
    ca = assigned.alias("b")
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        F.broadcast(pa)
        .join(ca, (F.col("a.list_id") == F.col("b.list_id")) & (F.col("a.probe_id") != F.col("b.vec_id")))
        .select(
            "probe_id",
            F.col("b.vec_id").alias("vec_id"),
            F.expr(
                V.cosine(V.as_double("a.p_embedding"), V.as_double("b.embedding")).spark
            ).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "vec_id", "cos")
    )
