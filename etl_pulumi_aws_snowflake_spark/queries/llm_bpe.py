"""Trainable-BPE queries (SURVEY.md §2.10, r15): merge-table learning,
vocab-level tokenization, and BPE-budgeted sequence packing — the
subword-token leg the packing operators previously approximated with
whitespace counts.

Judging discipline: the oracle UNROLLS the merge-learning recurrence
in chained CTEs (the trained-PQ-codebook precedent — the driver judges
the TRAINED artifact, not just a frozen pick): each step replays the
pair-explode, the weighted count, the (count DESC, pair ASC) argmax,
and the double-space-boundary canonical replace, so a tie-break drift,
an off-by-one in the pair window, or a replace that mis-tiles a
same-symbol run changes the learned table and every downstream token
count — and fails the hash."""

from __future__ import annotations

from ..operators import bpe as B
from ..operators import packing as P
from ._util import t
from ..functions.localrel import local_frame
from .registry import query

#: Judged hyperparameters — shared by all three entries and their
#: oracles.  10 merges keeps the unrolled oracle readable while going
#: deep enough that merged symbols themselves merge again (e.g. a
#: 3-char symbol), which is where replay bugs hide.
N_MERGES = 10
_MAXLEN = B.DEFAULT_MAX_WORD_LEN
_BUDGET = 512


def _train_ctes(n: int) -> str:
    """The WITH-chain replaying ``train_bpe`` in DuckDB: w0 is the
    vocab table with double-space-bounded symbols; step k derives best
    pair b{k} and the re-merged vocab w{k+1} via the canonical
    single-replace (operators/bpe.py module docstring).  RE2 backrefs
    (``\\1``) here, Java backrefs (``$1``) Spark-side — each engine's
    own dialect for the identical transformation."""
    parts = [f"""words AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      FROM documents
    ), w0 AS (
      SELECT word, CAST(count(*) AS BIGINT) AS cnt,
             '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS tok
      FROM words WHERE length(word) <= {_MAXLEN} GROUP BY word
    )"""]
    for k in range(n):
        parts.append(f""", p{k} AS (
      SELECT l[i] || ' ' || l[i+1] AS pair, sum(cnt) AS c
      FROM (SELECT cnt, string_split(trim(tok), '  ') AS l FROM w{k}),
           unnest(generate_series(1, len(l) - 1)) AS g(i)
      GROUP BY 1
    ), b{k} AS (
      SELECT pair, c FROM p{k} ORDER BY c DESC, pair LIMIT 1
    ), w{k + 1} AS (
      SELECT w.word, w.cnt, replace(w.tok, b.pat, b.rep) AS tok
      FROM w{k} w CROSS JOIN (
        SELECT ' ' || replace(pair, ' ', '  ') || ' ' AS pat,
               ' ' || replace(pair, ' ', '') || ' ' AS rep
        FROM b{k}) b
    )""")
    return "".join(parts)


def _tokenize_ctes(n: int) -> str:
    """Vocab → per-doc token counts on top of the training chain;
    overlong words fall back to character count (the operator's
    bounded-work contract)."""
    return f""", v AS (
      SELECT word, len(string_split(trim(tok), '  ')) AS n_sym FROM w{n}
    ), toks AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(COALESCE(v.n_sym, length(words.word))) AS BIGINT)
               AS n_tokens
      FROM words LEFT JOIN v USING (word)
      GROUP BY doc_id
    )"""


def _train(docs):
    """train_bpe, guarded: if the vocab fully merged before N_MERGES
    (degenerate/tiny corpus) the Spark side would tokenize fine with
    the shorter table, but the oracle's unrolled step k+1 CROSS JOINs
    an EMPTY b_k and silently empties the whole vocab — every word
    would fall back to character count and the hash would diverge far
    from the cause (ADVICE r15).  Fail loudly at the source instead."""
    merges = B.train_bpe(docs, N_MERGES)
    if len(merges) != N_MERGES:
        raise ValueError(
            f"BPE vocab exhausted after {len(merges)} merges < "
            f"N_MERGES={N_MERGES}; the unrolled oracle cannot replay a "
            "short table — lower N_MERGES or grow the corpus"
        )
    return merges


_TRAIN_SELECT = "\n    UNION ALL\n".join(
    f"""    SELECT CAST({k} AS BIGINT) AS rank,
           split_part(pair, ' ', 1) AS lhs,
           split_part(pair, ' ', 2) AS rhs,
           replace(pair, ' ', '') AS merged,
           CAST(c AS BIGINT) AS pair_count
    FROM b{k}"""
    for k in range(N_MERGES)
)


@query(
    "text_bpe_train",
    oracle=f"WITH {_train_ctes(N_MERGES)}\n{_TRAIN_SELECT}",
)
def text_bpe_train(spark, sf_dir):
    """DRIVER-JUDGED BPE TRAINING (r15): learn N_MERGES merges from
    the documents corpus and return the merge table itself —
    (rank, lhs, rhs, merged, pair_count).  The Spark side is the
    distributed trainer (one corpus word-count pass, then per step a
    vocab-level pair explode → groupBy-sum → bounded 1-row argmax
    collect → codegen replace); the oracle re-learns the SAME table by
    unrolling every step in SQL.  Any divergence — tie order, pair
    windowing, fixpoint semantics on symbol runs — shows up as a
    different learned merge at the exact rank that diverged."""
    merges = _train(t(spark, sf_dir, "documents"))
    return local_frame(
        spark, merges,
        "rank long, lhs string, rhs string, merged string, pair_count long",
    )


@query(
    "text_bpe_tokenize",
    oracle=(
        f"WITH {_train_ctes(N_MERGES)}{_tokenize_ctes(N_MERGES)}\n"
        "    SELECT doc_id, n_words, n_tokens FROM toks"
    ),
)
def text_bpe_tokenize(spark, sf_dir):
    """Subword tokenization with the trained merge table: per document
    (n_words, n_tokens) where n_tokens is the post-merge symbol count
    — the number real packing budgets against.  Vocab-level execution:
    merges apply to DISTINCT words in pure codegen, a broadcast join
    fans counts back to the corpus; the corpus body never shuffles.
    The oracle replays training AND tokenization, so the judged
    numbers certify the whole train→apply chain."""
    docs = t(spark, sf_dir, "documents")
    merges = _train(docs)
    return B.bpe_token_counts(docs, merges)


@query(
    "pack_sequences_bpe",
    oracle=f"""
    WITH {_train_ctes(N_MERGES)}{_tokenize_ctes(N_MERGES)},
    o AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tok_off
        FROM toks WHERE n_tokens > 0
    ),
    e AS (
        SELECT doc_id, tok_off, n_tokens,
               UNNEST(generate_series(tok_off // {_BUDGET},
                   (tok_off + n_tokens - 1) // {_BUDGET})) AS chunk_id
        FROM o
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(GREATEST(tok_off, chunk_id * {_BUDGET}) AS BIGINT)
             AS tok_start,
           CAST(LEAST(tok_off + n_tokens, (chunk_id + 1) * {_BUDGET})
             AS BIGINT) AS tok_end
    FROM e
    """,
)
def pack_sequences_bpe(spark, sf_dir):
    """Sequence packing budgeted in REAL subword tokens (closing the
    whitespace-proxy gap the r14 verdict ranked #2): BPE token counts
    feed the two-pass distributed prefix-sum packer at a
    512-token context budget.  Same scale-safe plan as
    ``pack_sequences`` (range repartition → K-scalar driver cumulation
    → partition-local windows — never a global Window.orderBy); the
    oracle replays train → tokenize → the global-window prefix sum."""
    docs = t(spark, sf_dir, "documents")
    merges = _train(docs)
    counts = B.bpe_token_counts(docs, merges).select("doc_id", "n_tokens")
    return P.pack_chunks(counts, _BUDGET, size_col="n_tokens",
                         id_col="doc_id")
