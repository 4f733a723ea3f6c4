"""Exact-quota stratified sampling (`operators/sampling.py`): the
threshold-gated two-phase selection must equal the naive full-sort
selection row-for-row, hit every quota exactly, and fail loudly —
never return a short sample — when the gate under-catches."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark.operators.sampling import (
    exact_quota_sample,
    hash60_spark,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )


def test_quotas_exact_and_equal_to_naive_sort(spark):
    docs = _docs(spark)
    k = 75
    got = exact_quota_sample(docs, "lang", "doc_id", k)
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    per = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per == {lang: min(k, n) for lang, n in sizes.items()}
    # both quota-limited (en=193>75) and whole-stratum (de=71<75)
    # strata must be exercised, or the fixture stopped testing the op
    assert any(n > k for n in sizes.values())
    assert any(n < k for n in sizes.values())

    w = Window.partitionBy("lang").orderBy(
        F.expr(hash60_spark("doc_id")), "doc_id"
    )
    naive = docs.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    assert {(r.doc_id, r.lang) for r in got.collect()} == {
        (r.doc_id, r.lang) for r in naive.collect()
    }


def test_under_caught_gate_fails_loudly(spark):
    """A deliberately insufficient oversample (0.1 => the gate expects
    to catch ~0.1k rows against a quota of k) must raise with the
    short strata named — a short sample is an error, never a result."""
    with pytest.raises(ValueError, match="under-caught"):
        exact_quota_sample(_docs(spark), "lang", "doc_id", 75, oversample=0.1)


def test_rejects_nonpositive_quota(spark):
    with pytest.raises(ValueError, match="k must be >= 1"):
        exact_quota_sample(_docs(spark), "lang", "doc_id", 0)


import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_QPROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _py_hash60(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


@_QPROP
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)),
        min_size=1,
        max_size=25,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_exact_quota_fuzz_matches_pure_python_selection(spark, rows, k):
    """Randomized semantics: tiny adversarial strata (duplicates, empty
    strata, quotas straddling stratum sizes) — the two-phase selection
    must equal the rule computed in pure Python: per stratum, the k
    smallest (md5-60bit(key), key) pairs."""
    df = spark.createDataFrame(rows, "lang int, doc_id int")
    got = sorted(
        (r.lang, r.doc_id)
        for r in exact_quota_sample(df, "lang", "doc_id", k).collect()
    )
    want = []
    by_stratum: dict[int, list[int]] = {}
    for lang, doc in rows:
        by_stratum.setdefault(lang, []).append(doc)
    for lang, docs in by_stratum.items():
        docs.sort(key=lambda d: (_py_hash60(d), d))
        want.extend((lang, d) for d in docs[:k])
    assert got == sorted(want)
