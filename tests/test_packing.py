"""Sequence packing: the 2-pass distributed prefix sum must equal the
naive single-partition global window bit-for-bit, and chunk assignments
must tile the token stream exactly."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark.operators import packing as P

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.col("n_chars").alias("sz"))
        .filter(F.col("sz") > 0)
    )


def test_global_offsets_match_naive_window(spark):
    docs = _docs(spark)
    # Force several range partitions so partition bases actually matter
    # (n=1 would degenerate to the naive plan).
    got = {
        r["doc_id"]: r["offset"]
        for r in P.global_offsets(docs, "doc_id", "sz", num_partitions=7).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["doc_id"]: r["offset"]
        for r in docs.withColumn(
            "offset", F.coalesce(F.sum("sz").over(w), F.lit(0)).cast("bigint")
        ).collect()
    }
    spark.catalog.clearCache()
    assert got == want


def test_global_offsets_no_global_window(spark):
    """The scale property itself: no window in the plan runs without a
    partition spec (a global window = whole corpus through one task)."""
    plan = P.global_offsets(
        _docs(spark), "doc_id", "sz", num_partitions=4
    )._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    for line in plan.splitlines():
        if "Window" in line:
            assert "_pid" in line, f"window without partition spec:\n{line}"


def test_violated_checkpoint_contract_fails_with_documented_signature(spark):
    """global_offsets' docstring names the exact error a caller sees
    when acting on the result AFTER a boundary sweep released the
    pinned intermediate (the loud-fail contract, SCALE.md).  Pin that
    signature so the docstring's troubleshooting pointer cannot drift
    across Spark upgrades — if the error class changes, update BOTH."""
    import pytest

    from etl_pulumi_aws_snowflake_spark.cache import release_deferred

    off = P.global_offsets(_docs(spark), "doc_id", "sz", num_partitions=5)
    assert off.count() > 0  # contract honored: act before the boundary
    release_deferred(spark)  # the query-boundary sweep
    with pytest.raises(Exception, match="CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND"):
        off.count()  # contract violated: loud failure, not wrong offsets


def test_pack_chunks_tiles_exactly(spark):
    budget = 256
    docs = _docs(spark)
    rows = P.pack_chunks(
        docs, budget, size_col="sz", id_col="doc_id", num_partitions=5
    ).collect()
    spark.catalog.clearCache()
    total = docs.agg(F.sum("sz")).collect()[0][0]

    # Per-doc spans sum to the doc's size.
    by_doc: dict[int, int] = {}
    for r in rows:
        assert r["tok_start"] < r["tok_end"]
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
    sizes = {r["doc_id"]: r["sz"] for r in docs.collect()}
    assert by_doc == sizes

    # Chunks tile [0, total) with no gaps or overlaps: group spans by
    # chunk, each chunk's span sum is `budget` (last chunk: remainder).
    by_chunk: dict[int, int] = {}
    for r in rows:
        assert r["chunk_id"] * budget <= r["tok_start"]
        assert r["tok_end"] <= (r["chunk_id"] + 1) * budget
        by_chunk[r["chunk_id"]] = by_chunk.get(r["chunk_id"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
    n_chunks = (total + budget - 1) // budget
    assert sorted(by_chunk) == list(range(n_chunks))
    for cid, width in by_chunk.items():
        want = budget if cid < n_chunks - 1 else total - budget * (n_chunks - 1)
        assert width == want, (cid, width, want)


def test_contamination_flags_planted_overlap(spark):
    """A train doc sharing a verbatim 5-word span with a bench doc is
    flagged, with exact collision counts; disjoint docs are not."""
    from etl_pulumi_aws_snowflake_spark.operators.decontam import contamination

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with no overlap at all here"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox jumps over everything")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in contamination(train, bench, k=5).collect()}
    assert set(rows) == {1}
    # "the quick brown fox jumps" and "quick brown fox jumps over"
    # are the two shared 5-gram shingles, from one bench doc.
    assert rows[1]["n_eval_docs"] == 1
    assert rows[1]["n_shared_shingles"] == 2


def test_contamination_bench_side_broadcast(spark):
    """The eval side must join as a broadcast — the train corpus never
    shuffles for the collision check."""
    from etl_pulumi_aws_snowflake_spark.operators.decontam import contamination

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        contamination(docs, docs.limit(10), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chunk_windows_covers_every_token_with_correct_overlap(spark):
    """Sliding-window contract: chunk i = [i*stride, min(i*stride+window, n));
    union of chunks covers [0, n) exactly; consecutive chunks overlap by
    window - stride (except a clamped final window); n <= window yields
    ONE chunk; empty docs yield none; chunk_text is the literal token
    slice."""
    import pytest
    from etl_pulumi_aws_snowflake_spark.operators.packing import chunk_windows

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(100))),  # multi-chunk
            (2, " ".join(f"u{i}" for i in range(40))),   # exactly window
            (3, "a b c"),                                # n < window
            (4, "   "),                                  # empty tokens
            (5, " ".join(f"v{i}" for i in range(41))),   # clamped tail
        ],
        "doc_id long, text string",
    )
    out = chunk_windows(docs, window=40, stride=30)
    rows = {r["doc_id"]: [] for r in out.collect()}
    for r in out.collect():
        rows[r["doc_id"]].append(r)
    assert 4 not in rows
    assert [c["chunk_ix"] for c in sorted(rows[3], key=lambda c: c["chunk_ix"])] == [0]
    assert rows[3][0]["chunk_text"] == "a b c"
    assert len(rows[2]) == 1 and rows[2][0]["tok_end"] == 40

    d1 = sorted(rows[1], key=lambda c: c["chunk_ix"])
    # ceil((100-40)/30) = 2 -> chunk_ix 0..2
    assert [c["chunk_ix"] for c in d1] == [0, 1, 2]
    assert [(c["tok_start"], c["tok_end"]) for c in d1] == [
        (0, 40), (30, 70), (60, 100)
    ]
    assert d1[1]["chunk_text"].split(" ")[0] == "t30"
    assert d1[2]["chunk_text"].split(" ")[-1] == "t99"

    d5 = sorted(rows[5], key=lambda c: c["chunk_ix"])
    assert [(c["tok_start"], c["tok_end"]) for c in d5] == [(0, 40), (30, 41)]
    assert d5[1]["chunk_text"] == "v30 v31 v32 v33 v34 v35 v36 v37 v38 v39 v40"

    with pytest.raises(ValueError, match="stride"):
        chunk_windows(docs, window=10, stride=20)


def test_chunk_windows_plan_is_shuffle_free(spark):
    """The chunker must stay one narrow codegen projection: no
    Exchange, no Python nodes — the zero-shuffle claim in its
    docstring."""
    from etl_pulumi_aws_snowflake_spark.operators.packing import chunk_windows
    from etl_pulumi_aws_snowflake_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        chunk_windows(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "MapInPandas" not in plan


def _pack_bins_reference(rows, budget, n_groups):
    """From-scratch grouped next-fit: the pure-Python spelling of the
    pack_bins contract, shared by the invariant and fuzz tests."""
    out = {}
    groups: dict[int, list] = {}
    for doc_id, n in sorted(rows):
        if n <= 0:
            continue
        groups.setdefault(doc_id % n_groups, []).append((doc_id, n))
    for grp, docs in groups.items():
        local_bin, fill = 0, 0
        for doc_id, n in docs:
            if fill + n > budget:
                local_bin += 1
                fill = 0
            out[doc_id] = (local_bin * n_groups + grp, fill, n)
            fill += n
    return out


def test_pack_bins_matches_reference_and_invariants(spark):
    """pack_bins == the from-scratch grouped next-fit on a mixed-size
    fixture, every bin's total fits the budget, no document is split,
    every positive-size document is placed exactly once, and the
    assignment is partition-invariant (pure function of ids/sizes)."""
    rows = [(i, (i * 37) % 300 + 1) for i in range(200)] + [(500, 7), (501, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["bin_id"], r["tok_start"], r["n_tokens"])
        for r in P.pack_bins(df, 512, n_groups=4).collect()
    }
    assert got == _pack_bins_reference(rows, 512, 4)
    # bin capacity + intra-bin layout: docs in a bin tile contiguously
    by_bin: dict[int, list] = {}
    for doc_id, (b, s, n) in got.items():
        by_bin.setdefault(b, []).append((s, n))
    for b, spans in by_bin.items():
        spans.sort()
        assert sum(n for _, n in spans) <= 512
        off = 0
        for s, n in spans:
            assert s == off
            off += n
    # partition-invariance: same result from a different layout
    got2 = {
        r["doc_id"]: (r["bin_id"], r["tok_start"], r["n_tokens"])
        for r in P.pack_bins(df.repartition(13), 512, n_groups=4).collect()
    }
    assert got2 == got


def test_pack_bins_fuzz_vs_reference(spark):
    """Randomized (seeded) fuzz: grouped next-fit over irregular sizes
    and sparse ids equals the pure-Python reference for several
    (budget, n_groups) shapes."""
    import random

    rnd = random.Random(7)
    rows = [
        (rnd.randrange(0, 100_000), rnd.randrange(1, 97))
        for _ in range(300)
    ]
    rows = list({d: n for d, n in rows}.items())  # unique ids
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    for budget, groups in ((97, 1), (128, 3), (500, 16)):
        got = {
            r["doc_id"]: (r["bin_id"], r["tok_start"], r["n_tokens"])
            for r in P.pack_bins(df, budget, n_groups=groups).collect()
        }
        assert got == _pack_bins_reference(rows, budget, groups), (budget, groups)


def test_pack_bins_oversized_rejected_loudly(spark):
    """Truncation-free means truncation-free: a document larger than
    the budget fails fast with the documented error (before any
    shuffle), pointing at the chunking composition."""
    import pytest

    df = spark.createDataFrame(
        [(1, 10), (2, 600)], "doc_id long, n_tokens long"
    )
    with pytest.raises(ValueError, match="truncation-free"):
        P.pack_bins(df, 512)
    with pytest.raises(ValueError, match="budget must be"):
        P.pack_bins(df, 0)
    with pytest.raises(ValueError, match="n_groups must be"):
        P.pack_bins(df, 512, n_groups=0)


def test_pack_bins_duplicate_ids_partitioning_invariant(spark):
    """ADVICE r12: pandas sort_values on id alone is an UNSTABLE
    quicksort, so duplicate ids with differing sizes packed in
    partitioning-dependent order — contradicting the purity claim.
    The (id, size) two-key sort makes the row order (and therefore
    every bin boundary) fully deterministic; remaining ties are
    identical rows, for which any order packs identically."""
    rows = [(i % 5, s) for i, s in enumerate([300, 100, 250, 200, 50,
                                              400, 150, 350, 120, 80])]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    outs = []
    for nparts in (1, 3, 7):
        got = sorted(
            tuple(r)
            for r in P.pack_bins(
                df.repartition(nparts), 512, n_groups=2
            ).collect()
        )
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
    # every bin respects the budget and every doc appears exactly once
    import collections

    fills = collections.Counter()
    for _id, _bin, _start, n in outs[0]:
        fills[_bin] += n
    assert all(v <= 512 for v in fills.values())
    assert len(outs[0]) == len(rows)
