"""Corpus-LM quality scoring (`operators/lm_score.py`): the two-pass
score must equal a pure-Python reference on a known corpus, handle the
out-of-model and short-document edges, and enforce its bounded-model
contract."""

from __future__ import annotations

from collections import Counter

import pytest

from etl_pulumi_aws_snowflake_spark.operators.lm_score import (
    trigram_frequency_score,
)


def _ref(docs: dict[int, str], top_k: int) -> dict[int, tuple[int, int]]:
    tris = lambda s: [s[i : i + 3] for i in range(len(s) - 2)]
    counts = Counter(tg for s in docs.values() for tg in tris(s))
    model = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    )
    return {
        d: (sum(model.get(tg, 0) for tg in tris(s)), len(tris(s)))
        for d, s in docs.items()
        if len(s) >= 3
    }


def test_scores_match_python_reference_with_oov(spark):
    docs = {
        1: "the cat sat on the mat",
        2: "the the the the",
        3: "zq!xv#pk",  # trigrams the top-k model will mostly exclude
        4: "the dog",
        5: "ab",  # shorter than one trigram — must be dropped
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    k = 5  # far fewer than the distinct trigram count → real OOV mass
    got = {
        r.doc_id: (r.score_raw, r.n_tri)
        for r in trigram_frequency_score(df, "text", "doc_id", top_k=k).collect()
    }
    assert got == _ref(docs, k)
    assert 5 not in got  # short doc carries no evidence
    # the gibberish doc must rank at the naturalness tail
    ranked = sorted(got, key=lambda d: got[d][0] / got[d][1])
    assert ranked[0] == 3


def test_whole_model_when_corpus_is_small(spark):
    """top_k above the distinct-trigram count → no OOV: every doc's
    score is the full corpus count mass of its trigrams."""
    docs = {1: "aaaa", 2: "aaab"}
    df = spark.createDataFrame(list(docs.items()), "doc_id int, text string")
    got = {
        r.doc_id: (r.score_raw, r.n_tri)
        for r in trigram_frequency_score(df, "text", "doc_id", top_k=100).collect()
    }
    assert got == _ref(docs, 100)


def test_rejects_unbounded_model_and_empty_corpus(spark):
    df = spark.createDataFrame([(1, "abcd")], "doc_id int, text string")
    with pytest.raises(ValueError, match="top_k"):
        trigram_frequency_score(df, "text", "doc_id", top_k=0)
    with pytest.raises(ValueError, match="top_k"):
        trigram_frequency_score(df, "text", "doc_id", top_k=10**9)
    short = spark.createDataFrame([(1, "ab"), (2, "")], "doc_id int, text string")
    with pytest.raises(ValueError, match="shorter than 3"):
        trigram_frequency_score(short, "text", "doc_id")
