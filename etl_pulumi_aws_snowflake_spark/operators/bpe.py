"""Trainable byte-pair encoding (BPE), distributed and deterministic.

Production packing/chunking is budgeted in TOKENIZER tokens, which
diverge 1.3-1.5x from whitespace counts — the `n_tokens` every packing
operator here consumes (operators/packing.py) was previously a
whitespace or regex count.  This module closes that gap with a real,
trainable subword tokenizer built from the public BPE algorithm
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"; the same merge-table form GPT-2's tokenizer uses).

Distributed shape (the part that must survive 100 TB):

* Training never touches the corpus row-by-row after ONE initial
  word-count aggregation: the working set is the DISTINCT-WORD
  frequency table (bounded by language vocabulary, ~10^7 rows at web
  scale — millions of times smaller than the corpus).  Each merge
  step is a pair-explode → groupBy-sum over that vocab table plus a
  single 1-row ``collect`` (the argmax pair) — the classic scalable
  BPE trainer.
* Tokenization is vocab-level too: merges apply to DISTINCT words
  (pure codegen string replaces — no UDF), then a broadcast join maps
  every corpus word to its token count.  The corpus body never
  shuffles.

Determinism contract (what makes the result driver-judgeable):

* Words are ``[a-z0-9]+`` runs of the lowercased text; words longer
  than ``max_word_len`` bypass the merge table (character-count
  fallback) so per-word work is bounded.
* A word is represented with DOUBLE-SPACE symbol boundaries,
  including both ends (``"  t  h  e  "``).  Applying merge ``(a, b)``
  is ONE plain string replace ``" a  b " -> " ab "``: the match
  consumes exactly one space from each shared boundary, so
  consecutive occurrences keep a boundary space for the scanner and a
  single left-to-right non-overlapping replace IS the canonical
  simultaneous BPE merge — exhaustively property-tested against the
  reference implementation (tests/test_bpe.py), including the odd
  same-symbol runs (``bbbbb``) where naive single-space encodings
  mis-tile.  The boundary invariant (every boundary exactly two
  spaces) is restored by the replacement's own edge spaces.
  Identical replace semantics exist in DuckDB, so the oracle replays
  training EXACTLY by unrolling the merge steps.
* The best pair is ``max`` by (summed count DESC, pair string ASC) —
  a total order, so ties cannot make two engines (or two
  partitionings) disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_counts", "train_bpe", "bpe_token_counts"]

DEFAULT_MAX_WORD_LEN = 16
_WORD_RE = "[a-z0-9]+"
#: the double-space symbol boundary (see module docstring)
SEP = "  "


def _spaced(word_col: str = "word") -> F.Column:
    """``"  t  h  e  "``: every symbol double-space-bounded on both
    sides — the invariant the single-replace canonical merge needs."""
    return F.concat(
        F.lit(SEP), F.regexp_replace(F.col(word_col), "(.)", f"$1{SEP}")
    )


def _apply_merge(tok: F.Column, a: str, b: str) -> F.Column:
    """One learned merge = one replace (canonical; module docstring)."""
    return F.replace(tok, F.lit(f" {a}{SEP}{b} "), F.lit(f" {a}{b} "))


def _symbols(tok: F.Column) -> F.Column:
    """tok → array of symbols (trim the edge boundaries, split on the
    double-space separator)."""
    return F.split(F.trim(tok), SEP)


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_word_len: int = DEFAULT_MAX_WORD_LEN,
) -> DataFrame:
    """The ONE corpus-wide pass: (word, cnt) frequency table over
    ``[a-z0-9]+`` runs of the lowercased text, overlong words
    excluded.  Everything downstream works on this vocab table."""
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
        ).alias("word")
    )
    return (
        words.filter(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_word_len: int = DEFAULT_MAX_WORD_LEN,
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    ``[(rank, lhs, rhs, merged, pair_count), ...]``.

    Each step: explode the vocab's adjacent symbol pairs, weighted
    groupBy-sum, take the (count DESC, pair ASC) argmax — a bounded
    1-row collect — then apply the merge to the vocab in codegen.
    The vocab is persisted per step (the active working set; tiny
    relative to the corpus) and the previous step's cache released."""
    if n_merges < 1:
        raise ValueError(f"n_merges {n_merges} must be >= 1")
    wc = (
        word_counts(docs, text_col, max_word_len)
        .withColumn("tok", _spaced())
        .persist()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for k in range(n_merges):
            pairs = (
                wc.select("cnt", _symbols(F.col("tok")).alias("l"))
                .where(F.size("l") >= 2)
                .select(
                    "cnt",
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(l) - 2), "
                            "i -> concat(l[i], ' ', l[i + 1]))"
                        )
                    ).alias("pair"),
                )
            )
            best = (
                pairs.groupBy("pair")
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not best:
                break  # vocab fully merged — nothing left to learn
            pair, c = best[0]["pair"], int(best[0]["c"])
            a, b = pair.split(" ")
            merges.append((k, a, b, a + b, c))
            nxt = wc.withColumn(
                "tok", _apply_merge(F.col("tok"), a, b)
            ).persist()
            nxt.count()  # materialize before releasing the parent
            wc.unpersist()
            wc = nxt
    finally:
        wc.unpersist()
    return merges


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    max_word_len: int = DEFAULT_MAX_WORD_LEN,
) -> DataFrame:
    """Tokenize with a learned merge table: (doc_id, n_words,
    n_tokens) per document, where n_tokens is the post-merge symbol
    count summed over the document's words.

    Vocab-level execution: merges run as pure-codegen replaces over
    the DISTINCT words of the input (rank order — BPE's application
    rule), then a broadcast join maps each corpus word to its count.
    Words over ``max_word_len`` fall back to character count (the
    bounded-work contract; at web scale these are URLs/DNA/noise that
    a real tokenizer byte-falls-back on anyway)."""
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{_WORD_RE}', 0)")
        ).alias("word"),
    )
    tok = _spaced()
    for _, a, b, _, _ in merges:
        tok = _apply_merge(tok, a, b)
    vocab = (
        words.select("word")
        .distinct()
        .withColumn(
            "n_sym",
            F.when(
                F.length("word") > max_word_len, F.length("word")
            ).otherwise(F.size(_symbols(tok)))
            .cast("long"),
        )
    )
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_tokens"),
        )
    )
