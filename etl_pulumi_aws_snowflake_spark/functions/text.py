"""Text-analysis expressions (SURVEY.md §2.10): quality metrics,
token counting, language-ID heuristic.  Each builder returns a
Spark/DuckDB pair so the operators stay oracle-checked.

All are per-row narrow projections — at 100 TB they vectorize inside
whole-stage codegen with zero shuffle; aggregation on top is ordinary
partial+final hash agg.
"""

from __future__ import annotations

from .hashing import X, words

# Stopword list for quality scoring — deliberately tiny and inlined so
# both dialects share one literal (a real deployment broadcasts a
# per-language list and uses array_contains against it).
STOPWORDS = ("a", "the", "of", "and", "in")

# Character-trigram markers per language for the n-gram language-ID
# heuristic: a document votes for the language whose marker trigrams
# occur most often (count-weighted), ties broken by marker order.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "ow "),
    "es": ("que", "ión", "os "),
    "fr": ("les", "ent", "eau"),
    "de": ("der", "sch", "ein"),
    "zh": ("de ", "shi", "zh"),
}


def n_words(text: str = "text") -> X:
    w = words(text)
    return X(f"size({w.spark})", f"len({w.duck})")


def avg_word_len(text: str = "text") -> X:
    """Mean token length, double division (identical IEEE result)."""
    w = words(text)
    return X(
        f"cast(aggregate({w.spark}, 0L, (acc, x) -> acc + length(x)) as double)"
        f" / cast(size({w.spark}) as double)",
        f"CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({w.duck}, x -> CAST(length(x) AS BIGINT))), "
        f"(acc, x) -> acc + x) AS DOUBLE) / CAST(len({w.duck}) AS DOUBLE)",
    )


def stopword_ratio(text: str = "text") -> X:
    w = words(text)
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    return X(
        f"cast(size(filter({w.spark}, x -> x in ({stops}))) as double)"
        f" / cast(size({w.spark}) as double)",
        f"CAST(len(list_filter({w.duck}, x -> x IN ({stops}))) AS DOUBLE)"
        f" / CAST(len({w.duck}) AS DOUBLE)",
    )


def distinct_ratio(text: str = "text") -> X:
    """Unique-token fraction — low values flag boilerplate/spam."""
    w = words(text)
    return X(
        f"cast(size(array_distinct({w.spark})) as double)"
        f" / cast(size({w.spark}) as double)",
        f"CAST(len(list_distinct({w.duck})) AS DOUBLE)"
        f" / CAST(len({w.duck}) AS DOUBLE)",
    )


def punct_ratio(text: str = "text") -> X:
    """Non-alphanumeric-non-space character fraction of the raw text."""
    return X(
        f"cast(length(regexp_replace({text}, '[a-zA-Z0-9 ]', '')) as double)"
        f" / cast(length({text}) as double)",
        f"CAST(length(regexp_replace({text}, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)"
        f" / CAST(length({text}) AS DOUBLE)",
    )


def token_count_regex(text: str = "text", pattern: str = "[a-z]+|[0-9]+") -> X:
    """BPE-ish token count: maximal alpha runs + digit runs (a cheap
    stand-in for subword tokenization; the count drives cost planning)."""
    return X(
        f"size(regexp_extract_all({text}, '{pattern}', 0))",
        f"len(regexp_extract_all({text}, '{pattern}'))",
    )


def lang_scores(text: str = "text") -> X:
    """Array of per-language marker-trigram counts, in LANG_MARKERS
    order.  Occurrences counted via length delta under removal —
    stays regex-free and engine-agnostic."""

    def count_marker(m: str, dialect: str) -> str:
        # occurrences = (len(text) - len(replace(text, m, ''))) / len(m)
        return (
            f"(length({text}) - length(replace({text}, '{m}', ''))) // {len(m)}"
            if dialect == "duck"
            else f"(length({text}) - length(replace({text}, '{m}', ''))) div {len(m)}"
        )

    def score(markers: tuple[str, ...], dialect: str) -> str:
        return " + ".join(count_marker(m, dialect) for m in markers)

    spark = "array(" + ", ".join(
        score(LANG_MARKERS[lang], "spark") for lang in LANG_MARKERS
    ) + ")"
    duck = "[" + ", ".join(
        score(LANG_MARKERS[lang], "duck") for lang in LANG_MARKERS
    ) + "]"
    return X(spark, duck)


def lang_id(text: str = "text") -> X:
    """Argmax over lang_scores: first language (in LANG_MARKERS order)
    whose marker count equals the maximum — chained CASE keeps the
    tie-break deterministic in both dialects."""
    langs = list(LANG_MARKERS)
    scores = lang_scores(text)
    spark_cases = " ".join(
        f"when element_at({scores.spark}, {i + 1}) = array_max({scores.spark})"
        f" then '{lang}'"
        for i, lang in enumerate(langs)
    )
    duck_cases = " ".join(
        f"WHEN ({scores.duck})[{i + 1}] = list_max({scores.duck}) THEN '{lang}'"
        for i, lang in enumerate(langs)
    )
    return X(f"case {spark_cases} end", f"CASE {duck_cases} END")
