"""Text-analysis expressions (SURVEY.md §2.10): quality metrics,
token counting, language-ID heuristic.  Each builder returns a
Spark/DuckDB pair so the operators stay oracle-checked.

All are per-row narrow projections — at 100 TB they vectorize inside
whole-stage codegen with zero shuffle; aggregation on top is ordinary
partial+final hash agg.
"""

from __future__ import annotations

from .hashing import X, let, words

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


def top_word_frac(text: str = "text") -> X:
    """Most-frequent-token fraction (Gopher-style repetition signal):
    modal word count / total words.  Exact integer counts divided once
    as doubles — a single IEEE division, identical in both engines.

    O(distinct·n) per row via array functions instead of the
    explode+groupBy form: the quadratic term is bounded by document
    length while explode would shuffle every token of a 100 TB corpus
    through an aggregation exchange.  Zero shuffle, stays in codegen."""
    w = words(text)
    body = X(
        "cast(array_max(transform(array_distinct(ws), "
        "d -> size(filter(ws, x -> x = d)))) as double)"
        " / cast(size(ws) as double)",
        "CAST(list_max(list_transform(list_distinct(ws), "
        "d -> len(list_filter(ws, x -> x = d)))) AS DOUBLE)"
        " / CAST(len(ws) AS DOUBLE)",
    )
    return let(w, "ws", body)


def dup_bigram_frac(text: str = "text") -> X:
    """Duplicate-bigram fraction (1 − distinct bigrams / bigrams) —
    the other standard repetition filter.  Empty/one-word docs score
    0.  Distinctness via array_distinct on the per-row bigram array:
    narrow, no shuffle (the CASE guards Spark's sequence(1, -1), which
    would count DOWN for size < 2)."""
    w = words(text)
    bg_spark = (
        "transform(sequence(1, size(ws) - 1), "
        "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
    )
    bg_duck = (
        "list_transform(generate_series(1, len(ws) - 1), "
        "i -> ws[i] || ' ' || ws[i + 1])"
    )
    body = X(
        f"case when size(ws) < 2 then 0D else "
        f"1D - cast(size(array_distinct({bg_spark})) as double)"
        f" / cast(size(ws) - 1 as double) end",
        f"CASE WHEN len(ws) < 2 THEN 0.0 ELSE "
        f"1.0 - CAST(len(list_distinct({bg_duck})) AS DOUBLE)"
        f" / CAST(len(ws) - 1 AS DOUBLE) END",
    )
    return let(w, "ws", body)


#: PII patterns — escape-free (character classes only) so the same
#: literal parses identically under Java regex and RE2, with no
#: backslash to be eaten by SQL string-literal rules.
PII_EMAIL = "[a-z0-9.]+@[a-z0-9]+[.][a-z]+"
PII_PHONE = "555-[0-9]{4}"


def pii_inject(text: str = "text", id_col: str = "doc_id") -> X:
    """Deterministically append a synthetic email + phone to each doc
    (the corpus itself is PII-free), so the redaction operator has
    known ground truth in both engines."""
    return X(
        f"concat({text}, ' reach user', cast({id_col} as string), "
        f"'@mail', cast({id_col} % 7 as string), '.com or call 555-', "
        f"lpad(cast({id_col} % 10000 as string), 4, '0'))",
        f"{text} || ' reach user' || CAST({id_col} AS VARCHAR) || "
        f"'@mail' || CAST({id_col} % 7 AS VARCHAR) || '.com or call 555-' || "
        f"lpad(CAST({id_col} % 10000 AS VARCHAR), 4, '0')",
    )


def pii_count(expr: X, pattern: str) -> X:
    return X(
        f"size(regexp_extract_all({expr.spark}, '{pattern}', 0))",
        f"len(regexp_extract_all({expr.duck}, '{pattern}'))",
    )


def pii_redact(expr: X) -> X:
    """Replace every email then phone occurrence with typed tags.
    Spark's regexp_replace is global by default; DuckDB needs 'g'."""
    return X(
        f"regexp_replace(regexp_replace({expr.spark}, "
        f"'{PII_EMAIL}', '<EMAIL>'), '{PII_PHONE}', '<PHONE>')",
        f"regexp_replace(regexp_replace({expr.duck}, "
        f"'{PII_EMAIL}', '<EMAIL>', 'g'), '{PII_PHONE}', '<PHONE>', 'g')",
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


# ---------------------------------------------------------------------------
# Integer per-mille quality features (r18, VERDICT r17 #6): the trained
# quality classifier's inputs.  Everything BIGINT — same scale (0..1000),
# exact in both engines and under any partitioning, so the one training
# aggregation pass is bit-stable (a ratio-of-doubles feature would make
# the class sums order-dependent).  Non-negative operands make Spark's
# `div` (truncate) and DuckDB's `//` (floor) the same function.
# ---------------------------------------------------------------------------


def vowel_permille(text: str = "text") -> X:
    """‰ of characters that are vowels — gibberish/transliteration
    signal (real prose sits near 300‰; vowel-stripped junk at 0)."""
    return X(
        f"case when length({text}) = 0 then 0L else "
        f"cast(length(regexp_replace({text}, '[^aeiou]', '')) * 1000 "
        f"div length({text}) as bigint) end",
        f"CASE WHEN length({text}) = 0 THEN 0 ELSE "
        f"CAST(length(regexp_replace({text}, '[^aeiou]', '', 'g')) * 1000 "
        f"// length({text}) AS BIGINT) END",
    )


def stopword_permille(text: str = "text") -> X:
    """‰ of tokens that are stopwords (the Gopher stop-token filter as
    an integer feature)."""
    w = words(text)
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    body = X(
        f"case when size(ws) = 0 then 0L else "
        f"cast(size(filter(ws, x -> x in ({stops}))) * 1000 "
        f"div size(ws) as bigint) end",
        f"CASE WHEN len(ws) = 0 THEN 0 ELSE "
        f"CAST(len(list_filter(ws, x -> x IN ({stops}))) * 1000 "
        f"// len(ws) AS BIGINT) END",
    )
    return let(w, "ws", body)


def distinct_permille(text: str = "text") -> X:
    """‰ of tokens that are distinct — the diversity signal whose
    collapse flags boilerplate."""
    w = words(text)
    body = X(
        f"case when size(ws) = 0 then 0L else "
        f"cast(size(array_distinct(ws)) * 1000 div size(ws) as bigint) end",
        f"CASE WHEN len(ws) = 0 THEN 0 ELSE "
        f"CAST(len(list_distinct(ws)) * 1000 // len(ws) AS BIGINT) END",
    )
    return let(w, "ws", body)


def dup_bigram_permille(text: str = "text") -> X:
    """‰ of adjacent bigrams that are duplicates (integer twin of
    :func:`dup_bigram_frac`)."""
    w = words(text)
    bg_spark = (
        "transform(sequence(1, size(ws) - 1), "
        "i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
    )
    bg_duck = (
        "list_transform(generate_series(1, len(ws) - 1), "
        "i -> ws[i] || ' ' || ws[i + 1])"
    )
    body = X(
        f"case when size(ws) < 2 then 0L else "
        f"cast((size(ws) - 1 - size(array_distinct({bg_spark}))) * 1000 "
        f"div (size(ws) - 1) as bigint) end",
        f"CASE WHEN len(ws) < 2 THEN 0 ELSE "
        f"CAST((len(ws) - 1 - len(list_distinct({bg_duck}))) * 1000 "
        f"// (len(ws) - 1) AS BIGINT) END",
    )
    return let(w, "ws", body)


# ---------------------------------------------------------------------------
# Deterministic corruption lanes (r18): synthetic NEGATIVES for the
# trained quality filter — the pii_inject recipe (synthesize the defect,
# then learn to catch it) applied to document quality.  Lane by doc_id
# parity so ground truth exists in both engines; a production deployment
# feeds a real known-good/known-bad corpus pair instead.
# ---------------------------------------------------------------------------


def corrupt_text(text: str = "text", id_col: str = "doc_id") -> X:
    """Two corruption lanes: even ids lose every vowel (gibberish /
    mojibake-like — kills the vowel and stopword features), odd ids
    collapse to their first two words repeated (boilerplate/spam —
    kills diversity, saturates duplicate bigrams)."""
    w = words(text)
    boiler_spark = (
        "case when size(ws) = 0 then '' else "
        "trim(repeat(concat(element_at(ws, 1), ' ', "
        "element_at(ws, least(2, size(ws))), ' '), "
        "greatest(size(ws) div 2, 1))) end"
    )
    boiler_duck = (
        "CASE WHEN len(ws) = 0 THEN '' ELSE "
        "trim(repeat(ws[1] || ' ' || ws[least(2, len(ws))] || ' ', "
        "greatest(len(ws) // 2, 1))) END"
    )
    body = X(boiler_spark, boiler_duck)
    boiler = let(w, "ws", body)
    return X(
        f"case when {id_col} % 2 = 0 then "
        f"regexp_replace({text}, '[aeiou]', 'z') else {boiler.spark} end",
        f"CASE WHEN {id_col} % 2 = 0 THEN "
        f"regexp_replace({text}, '[aeiou]', 'z', 'g') ELSE {boiler.duck} END",
    )


def char_trigrams(text: str = "text") -> X:
    """Array of all character trigrams, in position order.  The Spark
    side guards ``length < 3`` explicitly: ``sequence(1, 0)`` counts
    DOWN in Spark (step defaults to -1 when start > stop), which would
    fabricate positions for short strings; DuckDB's half-open
    ``range`` is naturally empty there."""
    return X(
        f"if(length({text}) < 3, array(), "
        f"transform(sequence(1, length({text}) - 2), "
        f"i -> substring({text}, i, 3)))",
        f"list_transform(range(1, length({text}) - 1), "
        f"i -> substring({text}, i, 3))",
    )
