"""Sequence packing for training-data pipelines (SURVEY.md §2.10
family): assign every document a GLOBAL token offset in a canonical
corpus order, then chunk the concatenated token stream at a fixed
context-window budget — the "concatenate then split" step GPT-style
pretraining uses to fill context windows without padding.

The core primitive is :func:`global_offsets`, a distributed exclusive
prefix sum.  The naive Spark spelling —
``sum(size).over(Window.orderBy(key))`` with no partitionBy — moves the
ENTIRE corpus through one task (Spark even warns: "No Partition Defined
for Window operation"); at 100 TB that is the canonical scale-killer.
This is instead the classic two-pass parallel scan:

1. range-repartition by the order key (partition i holds keys < every
   key of partition i+1) and sort within partitions;
2. per-partition totals — K rows (K = #partitions) to the driver, the
   only driver-side data, cumulated there into per-partition base
   offsets and broadcast back;
3. offset = partition base + within-partition running sum, each a
   partition-local window — embarrassingly parallel.

The intermediate is persisted so both passes see the SAME partition
ids; the driver-side collect is K longs, a scalar-sized exchange, not a
data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.localrel import local_frame


def global_offsets(
    df: DataFrame,
    order_col: str,
    size_col: str,
    offset_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive global prefix sum of ``size_col`` in ``order_col``
    order: input columns + ``offset_col`` (bigint), where a row's
    offset is the sum of all sizes strictly before it.

    ``order_col`` must be a unique key (ties would make the prefix sum
    order-ambiguous).  The range-partitioned intermediate goes through
    ``cache.tracked_local_checkpoint`` — NOT a plain persist: the
    per-partition bases collected in pass 1 are only correct for the
    exact physical partitioning pass 2 reads, and a persist that was
    released (the query-registry boundary sweeps the pool) would
    silently RECOMPUTE with a re-run range sampler, renumbering
    partitions against the stale bases — wrong offsets, no error.  A
    checkpoint's truncated lineage cannot recompute: a post-release
    re-materialization of the returned plan fails loudly instead
    (cache.py's release contract); compute offsets before running
    other registry queries, or re-call this function.

    **If you hit** ``SparkException: [CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND]
    Checkpoint block rdd_N_M not found!`` acting on this function's
    result, that IS the violated contract above — the boundary sweep
    released the pinned intermediate after your call but before your
    action (pinned by tests/test_packing.py, so the signature in this
    docstring cannot drift).  It cannot be re-raised with a nicer
    message here: the failure surfaces lazily at YOUR action, outside
    this module's stack.  Fix: act on (or persist) the result before
    the next registry-query boundary, or re-call ``global_offsets``.
    """
    from ..cache import tracked_local_checkpoint

    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = tracked_local_checkpoint(
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # Pass 1: per-partition totals.  K = #partitions rows — the
    # driver-side cumulation is over scalars, not data.  The eager
    # checkpoint above has already materialized and PINNED the
    # partitioning (and _pid) that pass 2 joins against.
    totals = {
        r["_pid"]: r["tot"]
        for r in part.groupBy("_pid").agg(F.sum(size_col).alias("tot")).collect()
    }
    bases, acc = [], 0
    for pid in range(n):
        bases.append((pid, acc))
        acc += int(totals.get(pid, 0) or 0)
    # Arrow-backed local relation (r19): the list-of-tuples spelling is
    # a pickled Python RDD re-entering Python workers on EVERY action
    # of the returned plan (~0.5 s each, functions/localrel.py) — the
    # broadcast side of pass 2 pays it per materialization.
    base_df = local_frame(spark, bases, "_pid int, _base bigint")
    # Pass 2: partition-local running sum + broadcast base join.
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        part.join(F.broadcast(base_df), "_pid")
        .withColumn(
            offset_col,
            (F.col("_base") + F.coalesce(F.sum(size_col).over(w), F.lit(0))).cast(
                "bigint"
            ),
        )
        .drop("_pid", "_base")
    )


def pack_chunks(
    docs: DataFrame,
    budget: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: lay documents end-to-end in
    ``id_col`` order and cut the token stream every ``budget`` tokens —
    (id, chunk_id, tok_start, tok_end), one row per (document, context
    window) overlap, offsets global.

    A document longer than the budget spans several chunks; a chunk
    boundary mid-document splits it (standard pretraining semantics —
    packing whole documents only is a different operator, bin packing,
    which sacrifices determinism for less truncation).  All arithmetic
    is integer (``div``, not ``/``) so offsets stay exact past 2^53.

    Zero-size documents are dropped (they occupy no tokens).  Chunk
    invariants (tested): per-doc spans are contiguous and sum to the
    doc's size; every chunk except the last is exactly ``budget`` wide.
    """
    off = global_offsets(
        docs.filter(F.col(size_col) > 0),
        id_col,
        size_col,
        num_partitions=num_partitions,
    )
    b = F.lit(budget)
    first = F.expr(f"offset div {budget}")
    last = F.expr(f"(offset + {size_col} - 1) div {budget}")
    return (
        off.withColumn("chunk_id", F.explode(F.sequence(first, last)))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.greatest(F.col("offset"), F.col("chunk_id") * b)
            .cast("bigint")
            .alias("tok_start"),
            F.least(F.col("offset") + F.col(size_col), (F.col("chunk_id") + 1) * b)
            .cast("bigint")
            .alias("tok_end"),
        )
    )


def pack_bins(
    docs: DataFrame,
    budget: int,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_groups: int = 32,
) -> DataFrame:
    """TRUNCATION-FREE whole-document bin packing (VERDICT r11 missing
    #4 — the alternative packing policy to :func:`pack_chunks`): every
    document lands WHOLE in exactly one bin of capacity ``budget``;
    no bin boundary ever splits a document — (id, bin_id, tok_start,
    n_tokens), ``tok_start`` the document's offset within its bin.

    Policy — **grouped next-fit, fully deterministic**: documents
    scatter into ``n_groups`` packing groups by ``pmod(id, n_groups)``
    (a pure id function — no engine hash, so an external SQL oracle
    replays it exactly), each group packs its documents in ascending
    id order with the classic next-fit rule (a document that does not
    fit the open bin closes it and opens a new one), and the global
    ``bin_id = local_bin * n_groups + group`` interleaves groups
    without collisions.  The result is a pure function of (ids, sizes,
    budget, n_groups) — independent of partitioning, engine, and rerun
    (property-tested), unlike samplers or range-partition-dependent
    schemes.

    Next-fit wastes more capacity than first-fit-decreasing (worst
    case 2x optimal vs FFD's 11/9) but is the policy that's both
    streaming-friendly AND deterministic-parallel: each group is an
    independent sequential stream, so there is no cross-group
    coordination and no global sort.  100 TB shape: one narrow
    (id, size) shuffle by group, then ``applyInPandas`` runs one
    sequential pass per group — parallelism = ``n_groups``, so SIZE
    ``n_groups`` ∝ corpus (like every bucket knob here: per-group
    volume stays constant).  The corpus body never moves; callers
    join the assignment back by id.

    Documents larger than ``budget`` cannot be placed whole — that is
    the point of truncation-free packing — and raise a loud
    ``ValueError`` (checked eagerly on a column-pruned pass before any
    shuffle): chunk them first (:func:`pack_chunks` /
    :func:`chunk_windows`), then pack the chunks.  Zero/negative sizes
    are dropped (they occupy no tokens), matching
    :func:`pack_chunks`."""
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_groups < 1:
        raise ValueError(f"n_groups must be >= 1, got {n_groups}")
    mx = docs.agg(F.max(size_col).alias("mx")).collect()[0]["mx"]
    if mx is not None and mx > budget:
        raise ValueError(
            f"pack_bins is truncation-free: a document of {size_col}="
            f"{mx} cannot be placed whole in a bin of budget {budget} — "
            "chunk oversized documents first (pack_chunks / "
            "chunk_windows), then pack the chunks"
        )
    sized = docs.filter(F.col(size_col) > 0).select(
        F.col(id_col), F.col(size_col), F.pmod(F.col(id_col), F.lit(n_groups)).alias("_grp")
    )
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("bin_id", LongType()),
            StructField("tok_start", LongType()),
            StructField(size_col, LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # Sort by (id, size), not id alone: sort_values' default
        # quicksort is UNSTABLE, so duplicate ids with differing sizes
        # would pack in partitioning-dependent order (ADVICE r12).
        # With both keys any remaining ties are identical (id, size)
        # rows, for which every order yields the same bin assignment —
        # the packing is again a pure function of its inputs.
        pdf = pdf.sort_values([id_col, size_col])
        grp = int(pdf["_grp"].iloc[0])
        ids = pdf[id_col].to_numpy()
        sizes = pdf[size_col].to_numpy()
        bin_ids, starts = [], []
        local_bin, fill = 0, 0
        for s in sizes:
            if fill + s > budget:
                local_bin += 1
                fill = 0
            bin_ids.append(local_bin * n_groups + grp)
            starts.append(fill)
            fill += int(s)
        return pd.DataFrame(
            {
                id_col: ids,
                "bin_id": bin_ids,
                "tok_start": starts,
                size_col: sizes,
            }
        )

    return sized.groupBy("_grp").applyInPandas(pack, schema)


def chunk_windows(
    docs,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Sliding token windows with overlap — the inference/RAG-side
    complement to :func:`pack_chunks` (which packs WHOLE documents
    into training contexts; this SPLITS each document into overlapping
    retrieval units): (doc_id, chunk_ix, tok_start, tok_end,
    chunk_text).

    Contract (the HF tokenizer-overflow shape): chunk ``i`` covers
    tokens ``[i*stride, min(i*stride + window, n))``; the last start
    is ``ceil((n - window)/stride)`` clamped at 0, so every token is
    covered, the final window ends exactly at ``n``, and no degenerate
    tail chunk duplicates a fully-covered suffix.  Empty-token
    documents produce no chunks.

    100 TB shape: one narrow projection — tokenize, generate the
    per-row chunk-index sequence (bounded by n/stride), explode,
    slice — all inside whole-stage codegen with ZERO shuffle; output
    partitioning inherits the scan.  Tokenization is the shared
    ``H.words`` template, so chunks can never disagree with the
    dedup/search/packing token arithmetic."""
    from pyspark.sql import functions as F

    from ..functions import hashing as H

    if window < 1 or stride < 1 or stride > window:
        raise ValueError(
            f"chunk_windows needs 1 <= stride <= window, got "
            f"window={window}, stride={stride}"
        )
    w = H.words(text_col)
    toks = (
        docs.select(F.col(id_col), F.expr(w.spark).alias("ws"))
        .withColumn("n", F.size("ws"))
        .filter(F.col("n") > 0)
    )
    return (
        toks.select(
            F.col(id_col),
            "ws",
            "n",
            F.explode(
                F.expr(
                    f"sequence(0, greatest((n - {window} + {stride} - 1) "
                    f"div {stride}, 0))"
                )
            ).alias("chunk_ix"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_ix").cast("bigint").alias("chunk_ix"),
            (F.col("chunk_ix") * stride).cast("bigint").alias("tok_start"),
            F.least(
                F.col("chunk_ix") * stride + window, F.col("n")
            ).cast("bigint").alias("tok_end"),
            F.array_join(
                F.slice(
                    F.col("ws"),
                    F.col("chunk_ix") * F.lit(stride) + F.lit(1),
                    F.lit(window),
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
