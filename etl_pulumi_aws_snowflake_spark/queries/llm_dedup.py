"""Deduplication queries (SURVEY.md §2.10) over the documents table,
each with a DuckDB oracle generated from the SAME expression templates
the Spark side uses (functions/hashing.py), so the two dialects cannot
drift.  All hash math is deterministic — even MinHash+LSH is exactly
reproduced by the oracle, not just rows-checked."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import hashing as H
from ..operators import dedup as D
from ._util import t
from .registry import query

# DuckDB-side building blocks over the documents table.
_SHINGLES = H.shingle_hashes(H.word_hashes("text"), k=3).duck
_SIG = H.minhash_signature(H.X("", "shingles"), k=16).duck
_BANDS = H.band_keys(H.X("", "sig"), bands=8, rows=2).duck

_SETS = f"""
sets AS (
    SELECT doc_id, list_distinct({_SHINGLES}) AS shingles
    FROM documents
), sized AS (
    SELECT doc_id, shingles, len(shingles) AS n FROM sets
)"""


@query(
    "dedup_exact",
    oracle="""
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: survivor (min id) + multiplicity per distinct
    content hash.  Shuffles 32-byte digests, never document bodies."""
    return D.exact_dedup(t(spark, sf_dir, "documents"))


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SETS},
    inv AS (SELECT doc_id, unnest(shingles) AS sh FROM sized),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared,
           CAST(n_shared AS DOUBLE)
             / CAST(sa.n + sb.n - n_shared AS DOUBLE) AS jaccard
    FROM shared
    JOIN sized sa ON sa.doc_id = doc_a
    JOIN sized sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE)
            / CAST(sa.n + sb.n - n_shared AS DOUBLE) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Word-3-gram shingle Jaccard ≥ 0.8 via inverted-index self-join
    (finds the corpus's planted near-duplicate pairs)."""
    return D.jaccard_pairs(t(spark, sf_dir, "documents"), k=3, threshold=0.8)


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SETS},
    nonempty AS (SELECT * FROM sized WHERE n > 0),
    sig AS (SELECT doc_id, shingles, n, {_SIG} AS sig FROM nonempty),
    keys AS (SELECT doc_id, shingles, n, {_BANDS} AS bandkeys FROM sig),
    banded AS (
        SELECT doc_id, g.j AS band, bandkeys[g.j + 1] AS key
        FROM keys CROSS JOIN generate_series(0, 7) g(j)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.key = b.key
                     AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             / CAST(sa.n + sb.n
                    - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             AS jaccard
    FROM cand
    JOIN nonempty sa ON sa.doc_id = doc_a
    JOIN nonempty sb ON sb.doc_id = doc_b
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / CAST(sa.n + sb.n
                   - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            >= 0.8
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(16) + LSH(8 bands × 2 rows) candidate generation with
    exact-Jaccard verification — the scale path for near-dup: the join
    runs on 8 uniform band keys per doc instead of ~50 shingles."""
    return D.minhash_lsh_pairs(
        t(spark, sf_dir, "documents"), k=3, num_hashes=16, bands=8, threshold=0.8
    )


@query(
    "dedup_simhash",
    oracle=f"""
    SELECT doc_id, {H.simhash(H.word_hashes("text"), 32).duck} AS simhash
    FROM documents
    """,
)
def dedup_simhash(spark, sf_dir):
    """32-bit SimHash code per document (count-weighted bit votes) —
    one narrow projection; candidates are equal/near codes."""
    return D.simhash_codes(t(spark, sf_dir, "documents"), bits=32)


@query(
    "dedup_fingerprint_groups",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, {H.fingerprint("text").duck} AS fingerprint
        FROM documents
    )
    SELECT fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM fp GROUP BY 1
    """,
)
def dedup_fingerprint_groups(spark, sf_dir):
    """Order-sensitive rolling-hash fingerprint dedup — byte-exact
    dedup without shuffling text (64-bit-ish key instead of a digest
    string; cheapest exact-dup key at scale)."""
    fp = H.fingerprint("text")
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.expr(fp.spark).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


@query(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_SETS},
    nonempty AS (SELECT * FROM sized WHERE n > 0),
    sig AS (SELECT doc_id, shingles, n, {_SIG} AS sig FROM nonempty),
    keys AS (SELECT doc_id, shingles, n, {_BANDS} AS bandkeys FROM sig),
    banded AS (
        SELECT doc_id, g.j AS band, bandkeys[g.j + 1] AS key
        FROM keys CROSS JOIN generate_series(0, 7) g(j)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.key = b.key
                     AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b
        FROM cand
        JOIN nonempty sa ON sa.doc_id = doc_a
        JOIN nonempty sb ON sb.doc_id = doc_b
        WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / CAST(sa.n + sb.n
                       - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                >= 0.8
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM edges)
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (SELECT a AS doc_id, MIN(b) AS keep_id FROM reach GROUP BY a)
    SELECT d.doc_id,
           COALESCE(c.keep_id, d.doc_id) AS keep_id,
           COALESCE(c.keep_id, d.doc_id) != d.doc_id AS is_dup
    FROM documents d LEFT JOIN comp c USING (doc_id)
    """,
)
def dedup_survivors(spark, sf_dir):
    """Keep-one near-dup resolution: MinHash-LSH pairs → connected
    components (iterative min-label propagation, operators/dedup.py)
    → every doc mapped to its component minimum.  The oracle computes
    the same components with a recursive transitive-closure CTE —
    closure is O(component²) and fine for an oracle, the label loop is
    the form that scales."""
    docs = t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, k=3, num_hashes=16, bands=8, threshold=0.8)
    return D.dedup_survivors(docs, pairs)


@query(
    "dedup_spans",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x != '') AS ws
        FROM documents
    ), sp AS (
        SELECT doc_id,
               unnest(range(0, CAST(ceil(len(ws) / 4.0) AS BIGINT))) AS pos,
               ws
        FROM w
    ), sp2 AS (
        SELECT doc_id, pos,
               doc_id * 1048576 + pos AS key,
               array_to_string(ws[pos*4+1 : pos*4+4], ' ') AS span
        FROM sp
    ), g AS (
        SELECT span, COUNT(*) AS n, MIN(key) AS first_key
        FROM sp2 GROUP BY span
    ), kept AS (
        SELECT s.doc_id, s.pos, s.span
        FROM sp2 s JOIN g USING (span)
        WHERE g.n = 1 OR s.key = g.first_key
    ), rebuilt AS (
        SELECT doc_id,
               array_to_string(list(span ORDER BY pos), ' ') AS clean_text,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT w.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           CAST(ceil(len(w.ws) / 4.0) AS BIGINT) AS n_spans,
           COALESCE(r.n_kept, 0) AS n_kept
    FROM w LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def dedup_spans(spark, sf_dir):
    """Duplicated-span removal (C4/RefinedWeb style): 4-word spans,
    every repeated span dropped except its globally-first occurrence
    (packed (doc_id, pos) order), cleaned text rebuilt — the
    sub-document dedup pass that kills boilerplate exact dedup can't
    see.  Span width 4 because the fixture's tiny vocabulary needs it
    to produce real duplicates (~11% of spans at sf0.01 — asserted, so
    the removal path cannot silently stop firing); production uses 8+.
    Document text never shuffles: the duplicate decision moves
    (digest, packed key) pairs and kept POSITIONS, and text is rebuilt
    by re-slicing each doc's own word array (operators/dedup.py
    ``span_dedup``).  The oracle is the relational spelling over span
    TEXT (Spark groups the sha256 digest — identical partition of
    spans)."""
    out = D.span_dedup(t(spark, sf_dir, "documents"), "text", "doc_id", 4)
    agg = out.agg(
        F.sum("n_spans").alias("s"), F.sum("n_kept").alias("k")
    ).first()
    assert 0 < agg["k"] < agg["s"], (
        "span_dedup degenerated: every span kept (no duplicates in "
        "fixture) or every span dropped — the entry stopped testing "
        "both paths"
    )
    return out


def _lsh_inc_oracle(old_pred: str = "od.doc_id % 10 != 0") -> str:
    """New-batch-vs-index oracle, parameterized on the predicate
    describing WHICH docs the index holds at check time — shared by
    the build-then-check, build-append-check, and build-delete-check
    entries, so all three lifecycle paths are certified against the
    same relational recomputation."""
    return f"""
    WITH {_SETS},
    nonempty AS (SELECT * FROM sized WHERE n > 0),
    sig AS (SELECT doc_id, shingles, n, {_SIG} AS sig FROM nonempty),
    keys AS (SELECT doc_id, shingles, n, {_BANDS} AS bandkeys FROM sig),
    banded AS (
        SELECT doc_id, g.j AS band, bandkeys[g.j + 1] AS key
        FROM keys CROSS JOIN generate_series(0, 7) g(j)
    ),
    cand AS (
        SELECT DISTINCT nw.doc_id AS doc_new, od.doc_id AS doc_old
        FROM banded nw
        JOIN banded od ON nw.band = od.band AND nw.key = od.key
                      AND nw.doc_id != od.doc_id
        WHERE nw.doc_id % 10 = 0 AND ({old_pred})
    )
    SELECT doc_new, doc_old,
           CAST(len(list_intersect(sn.shingles, so.shingles)) AS DOUBLE)
             / CAST(sn.n + so.n
                    - len(list_intersect(sn.shingles, so.shingles)) AS DOUBLE)
             AS jaccard
    FROM cand
    JOIN nonempty sn ON sn.doc_id = doc_new
    JOIN nonempty so ON so.doc_id = doc_old
    WHERE CAST(len(list_intersect(sn.shingles, so.shingles)) AS DOUBLE)
            / CAST(sn.n + so.n
                   - len(list_intersect(sn.shingles, so.shingles)) AS DOUBLE)
            >= 0.8
    """


#: Both the build-then-check and the build-append-check entries end
#: with the SAME index content (every doc_id % 10 != 0), so the
#: appended entry certifies the pruned-MERGE append path preserves
#: results exactly — the same round-trip contract as
#: sim_ivf_topk_appended.
_LSH_INC_ORACLE = _lsh_inc_oracle()


#: Bucket count for the persisted-LSH lifecycle entries (VERDICT r18
#: #6): the operator default (16) saturates at the correctness SFs —
#: the batch's band keys (batch . bands = 40 keys at sf0.001, 400 at
#: sf0.01) routed to ALL buckets, so the entries certified a full
#: index read, not a pruned one.  128 keeps routed coverage < 1 at
#: both driver-checked SFs (pruning is the thing these entries exist
#: to certify); candidates depend only on exact band-key equality, so
#: the RESULT set is bucket-count-invariant (the oracle never models
#: buckets).  These entries are not benched; at sf0.1-and-up a real
#: deployment sizes n_buckets with the corpus (scripts/scale_curve.py
#: does exactly that).
_LSH_BUCKETS = 128


@query("dedup_lsh_incremental", oracle=_LSH_INC_ORACLE)
def dedup_lsh_incremental(spark, sf_dir):
    """Dedup-at-ingest against a PERSISTED LSH index: build the index
    from the standing corpus (doc_id % 10 != 0), then check the new
    batch (doc_id % 10 == 0) against it — (doc_new, doc_old, jaccard)
    with exact verification.  The check reads are partition-pruned
    twice (band buckets the batch routes to; doc buckets holding
    candidates) and every driver collect is bounded by the index's
    n_buckets constant — the reason a 100 TB pipeline checks batches
    against an index instead of re-running all-pairs dedup."""
    from .pipeline_e2e import _workdir

    docs = t(spark, sf_dir, "documents")
    root = _workdir(sf_dir, "lsh_index")
    D.lsh_build_index(
        docs.filter(F.col("doc_id") % 10 != 0), root, n_buckets=_LSH_BUCKETS
    )
    return D.lsh_index_check(
        docs.filter(F.col("doc_id") % 10 == 0), root, threshold=0.8
    )


@query("dedup_lsh_appended", oracle=_LSH_INC_ORACLE)
def dedup_lsh_appended(spark, sf_dir):
    """Incremental index maintenance: build on a smaller base
    (doc_id % 10 not in (0, 5)), APPEND the % 10 == 5 batch via
    partition-pruned MERGE (only touched buckets rewrite; the frozen
    meta parameters band the batch identically), then check the
    % 10 == 0 batch.  Final index content equals
    dedup_lsh_incremental's, so the shared oracle certifies the
    append path is exact — including matches against appended docs."""
    from .pipeline_e2e import _workdir

    docs = t(spark, sf_dir, "documents")
    root = _workdir(sf_dir, "lsh_index_app")
    D.lsh_build_index(
        docs.filter((F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 10 != 5)),
        root,
        n_buckets=_LSH_BUCKETS,
    )
    D.lsh_index_append(docs.filter(F.col("doc_id") % 10 == 5), root)
    return D.lsh_index_check(
        docs.filter(F.col("doc_id") % 10 == 0), root, threshold=0.8
    )


@query(
    "dedup_lsh_deleted",
    oracle=_lsh_inc_oracle("od.doc_id % 10 NOT IN (0, 5)"),
)
def dedup_lsh_deleted(spark, sf_dir):
    """Index DELETION under the driver hash — the exact inverse of
    dedup_lsh_appended: build on the standing corpus (doc_id % 10 !=
    0), ``lsh_index_delete`` the % 10 == 5 docs BY ID ALONE (their
    stored shingle sets recompute the band routing, so both deletes
    are partition-pruned MERGEs), then check the % 10 == 0 batch.  The
    oracle recomputes candidates against only the surviving docs, so
    any stale band row or set row left behind by the delete produces
    an extra pair and fails the hash."""
    from .pipeline_e2e import _workdir

    docs = t(spark, sf_dir, "documents")
    root = _workdir(sf_dir, "lsh_index_del")
    D.lsh_build_index(
        docs.filter(F.col("doc_id") % 10 != 0), root, n_buckets=_LSH_BUCKETS
    )
    D.lsh_index_delete(
        docs.filter(F.col("doc_id") % 10 == 5).select("doc_id"), root
    )
    return D.lsh_index_check(
        docs.filter(F.col("doc_id") % 10 == 0), root, threshold=0.8
    )


@query(
    "stream_lsh_ingest_e2e",
    oracle=f"""
    WITH {_SETS},
    nonempty AS (SELECT * FROM sized WHERE n > 0),
    sig AS (SELECT doc_id, shingles, n, {_SIG} AS sig FROM nonempty),
    keys AS (SELECT doc_id, shingles, n, {_BANDS} AS bandkeys FROM sig),
    banded AS (
        SELECT doc_id, g.j AS band, bandkeys[g.j + 1] AS key
        FROM keys CROSS JOIN generate_series(0, 7) g(j)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.key = b.key
                     AND a.doc_id < b.doc_id
        WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
    )
    SELECT doc_a, doc_b,
           CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             / CAST(sa.n + sb.n
                    - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             AS jaccard
    FROM cand
    JOIN nonempty sa ON sa.doc_id = doc_a
    JOIN nonempty sb ON sb.doc_id = doc_b
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / CAST(sa.n + sb.n
                   - len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            >= 0.8
    """,
)
def stream_lsh_ingest_e2e(spark, sf_dir):
    """Streaming dedup-at-ingest end-to-end under the driver hash: the
    standing corpus (doc_id % 10 != 0) seeds a persisted LSH index;
    the % 10 == 0 docs land as THREE parquet files streamed one per
    microbatch (maxFilesPerTrigger=1, AvailableNow, checkpointed);
    each batch is checked against the index-so-far, its canonical
    near-dup pairs land per-epoch, and the batch appends into the
    index.  The accumulated pair set equals "every banding-candidate
    pair with Jaccard ≥ 0.8 touching a streamed doc" REGARDLESS of how
    the source batches the files (streaming/lsh_ingest.py docstring
    has the argument) — which is exactly what the oracle computes
    relationally, so this row hash-certifies the streaming loop, the
    per-batch pruned check, AND the incremental append in one."""
    import os

    from ..streaming.lsh_ingest import stream_lsh_ingest
    from .pipeline_e2e import _workdir

    work = _workdir(sf_dir, "lsh_stream")
    docs = t(spark, sf_dir, "documents")
    root = os.path.join(work, "index")
    D.lsh_build_index(
        docs.filter(F.col("doc_id") % 10 != 0), root, n_buckets=_LSH_BUCKETS
    )

    landing = os.path.join(work, "landing")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    for g in range(3):
        new.filter(F.col("doc_id") % 3 == g).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    stream_lsh_ingest(
        spark,
        landing,
        new.schema,
        root,
        os.path.join(work, "results"),
        os.path.join(work, "ckpt"),
        threshold=0.8,
        max_files_per_trigger=1,
    )
    return spark.read.parquet(os.path.join(work, "results")).select(
        "doc_a", "doc_b", "jaccard"
    )
