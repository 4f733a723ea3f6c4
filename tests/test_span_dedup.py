"""Span-level dedup (`operators/dedup.py::span_dedup`): known-corpus
semantics (first occurrence survives, later repeats vanish, clean text
rebuilds in order), the short/empty-document edges, and the packed-key
guard."""

from __future__ import annotations

import pytest

from etl_pulumi_aws_snowflake_spark.operators.dedup import span_dedup


def test_known_corpus_first_occurrence_survives(spark):
    docs = spark.createDataFrame(
        [
            # doc 1: two spans; span "a b" also opens doc 2 and sits
            # mid-doc 3 — only THIS one (smallest packed key) survives
            (1, "a b c d"),
            (2, "a b x y"),
            (3, "p q a b"),
            (4, "u v"),  # unique span — untouched
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_spans, r.n_kept)
        for r in span_dedup(docs, "text", "doc_id", span_words=2).collect()
    }
    assert got == {
        1: ("a b c d", 2, 2),   # first occurrence of "a b" kept
        2: ("x y", 2, 1),       # later repeat dropped
        3: ("p q", 2, 1),       # repeat dropped mid-document too
        4: ("u v", 1, 1),
    }


def test_short_and_empty_documents(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_spans, r.n_kept)
        for r in span_dedup(docs, "text", "doc_id", span_words=4).collect()
    }
    # empty doc: zero spans, present with empty text; the ragged final
    # span ("solo", shorter than span_words) still dedups exactly
    assert got == {1: ("", 0, 0), 2: ("solo", 1, 1), 3: ("", 1, 0)}


def test_negative_id_fails_loudly(spark):
    docs = spark.createDataFrame(
        [(-1, "a b c d")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="packed-key overflow"):
        span_dedup(docs, "text", "doc_id", span_words=2).collect()


def test_oversized_id_fails_loudly(spark):
    """id * 2^20 wraps BIGINT silently for id >= 2^43 in non-ANSI
    Spark, corrupting the min-key first-occurrence order — the packed
    key must range-check the id side too, not just pos (ADVICE r06)."""
    docs = spark.createDataFrame(
        [(1 << 43, "a b c d")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="packed-key overflow"):
        span_dedup(docs, "text", "doc_id", span_words=2).collect()
    # one below the bound still packs fine
    ok = spark.createDataFrame(
        [((1 << 43) - 1, "a b c d")], "doc_id long, text string"
    )
    rows = span_dedup(ok, "text", "doc_id", span_words=2).collect()
    assert len(rows) == 1 and rows[0]["n_kept"] == 2


def test_rejects_bad_span_width(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="span_words"):
        span_dedup(docs, "text", "doc_id", span_words=0)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SPROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


def _py_span_dedup(rows, k):
    """Pure-Python reference of the documented rule: split on single
    spaces dropping empties, tile into k-word spans, keep each span
    text's first occurrence by (doc_id, pos), rebuild in order."""
    spans = []  # (doc_id, pos, span_text)
    per_doc = {}
    for doc_id, text in rows:
        words = [w for w in text.split(" ") if w]
        doc_spans = [
            " ".join(words[p * k:(p + 1) * k])
            for p in range((len(words) + k - 1) // k)
        ]
        per_doc[doc_id] = doc_spans
        spans.extend((doc_id, p, s) for p, s in enumerate(doc_spans))
    first = {}
    for doc_id, p, s in sorted(spans):
        first.setdefault(s, (doc_id, p))
    out = {}
    for doc_id, doc_spans in per_doc.items():
        kept = [
            s for p, s in enumerate(doc_spans) if first[s] == (doc_id, p)
        ]
        out[doc_id] = (" ".join(kept), len(doc_spans), len(kept))
    return out


@_SPROP
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("a b c d e".split()), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_span_dedup_fuzz_matches_pure_python(spark, texts, k):
    """Randomized semantics over a tiny alphabet (forcing heavy span
    collisions, ragged tails, empty docs): the distributed
    digest-groupBy/min-key plan must equal the rule computed naively in
    Python — the same assurance class that caught the exact-quota bug."""
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_spans, r.n_kept)
        for r in span_dedup(df, "text", "doc_id", span_words=k).collect()
    }
    assert got == _py_span_dedup(rows, k)
