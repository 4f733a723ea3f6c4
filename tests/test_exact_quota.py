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


def test_rejects_null_stratum(spark):
    """NULL strata would silently vanish through the equi-join gate —
    the operator must refuse them loudly instead."""
    df = spark.createDataFrame(
        [(None, 1), ("en", 2), ("en", 3)], "lang string, doc_id int"
    )
    with pytest.raises(ValueError, match="NULL"):
        exact_quota_sample(df, "lang", "doc_id", 1)


def test_rejects_null_key(spark):
    """A NULL key hashes to NULL and would silently fall out of the
    gate while still counting toward the stratum size — the quota
    arithmetic is undefined for it, so the call must refuse."""
    df = spark.createDataFrame(
        [("en", None), ("en", 2), ("en", 3)], "lang string, doc_id int"
    )
    with pytest.raises(ValueError, match="NULL"):
        exact_quota_sample(df, "lang", "doc_id", 2)


def test_zero_caught_stratum_fails_loudly_not_empty(spark):
    """The round-6 bug: duplicate keys share one md5 value, so a
    3-duplicate stratum whose single hash sits above the gate caught
    ZERO rows and silently returned an empty stratum.  With the
    distinct-key gate floor all rows now survive (frac >= 1); force
    the under-gate with oversample<1 and a key whose hash is high to
    prove the zero-caught case raises instead of vanishing."""
    import hashlib

    # find a key whose 60-bit md5 is in the top half -> a 0.1 gate
    # with d=1 distinct key catches nothing
    key = next(
        i
        for i in range(100)
        if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        > (1 << 59)
    )
    df = spark.createDataFrame(
        [(0, key)] * 3, "lang int, doc_id int"
    )
    with pytest.raises(ValueError, match="caught 0 < quota"):
        exact_quota_sample(df, "lang", "doc_id", 1, oversample=0.1)


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


def test_duplicate_key_boundary_pick_is_content_deterministic(spark):
    """ADVICE r07: rows sharing a key tie completely on (hash, key);
    the full-row xxhash64 tiebreaker must make the boundary pick a
    pure function of row CONTENT — identical selected (key, payload)
    multisets across physically different layouts."""
    rows = [
        ("en", kid, f"payload-{kid}-{j}")
        for kid in range(4)
        for j in range(5)  # 5 distinct-payload rows per duplicate key
    ]
    df = spark.createDataFrame(rows, "lang string, kid int, payload string")
    picks = []
    for layout in (
        df.repartition(1),
        df.repartition(7, "payload"),
        df.orderBy(F.desc("payload")).coalesce(2),
    ):
        got = exact_quota_sample(layout, "lang", "kid", 7)
        picks.append(sorted((r.kid, r.payload) for r in got.collect()))
    assert picks[0] == picks[1] == picks[2]
    assert len(picks[0]) == 7
    # key multiset is the first 7 in (hash, key) order with multiplicity
    order = sorted(range(4), key=lambda kid: (_py_hash60(kid), kid))
    want_keys = []
    for kid in order:
        want_keys.extend([kid] * 5)
    assert sorted(k for k, _ in picks[0]) == sorted(want_keys[:7])


def test_dupkeys_driver_fixture_stays_adversarial(spark, sf_smoke):
    """The sample_exact_quota_dupkeys driver entry is only a regression
    proof while its fixture keeps the r06-killing shape: the shared
    'dup' key must hash into the top of the range (so a rows-based
    gate fraction of 2k/30 catches ZERO of it), the dup stratum must
    be 30 rows of ONE key, and 'tiny' must sit under the quota."""
    assert _py_hash60("dupkey-5") / (1 << 60) > 0.99
    from etl_pulumi_aws_snowflake_spark.queries import all_queries

    got = all_queries()["sample_exact_quota_dupkeys"](spark, sf_smoke)
    rows = got.collect()
    by_stratum: dict[str, list[str]] = {}
    for r in rows:
        by_stratum.setdefault(r.stratum, []).append(r.skey)
    assert by_stratum["dup"] == ["dupkey-5"] * 5
    assert len(by_stratum["tiny"]) == 3  # whole stratum, under quota
    assert all(len(v) == 5 for s, v in by_stratum.items() if s != "tiny")
    # the dupkeys fixture derivation AND the fail_loud NULL injections
    # assume doc_ids 0..32 exist contiguously — pin that so regenerated
    # test data cannot silently defang either driver entry
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    present = {
        r.doc_id for r in docs.filter(F.col("doc_id") < 33).collect()
    }
    assert present == set(range(33)), sorted(present)


# ----------------------------------------- temperature mixture


def test_temperature_mixture_quotas_and_flattening(spark, sf_smoke):
    """alpha=0.5 must produce exactly the floor(budget*sqrt(n)/sum+0.5)
    per-stratum quotas AND actually flatten: the head stratum's sample
    share must sit strictly below its corpus share, every tail stratum
    at-or-above (the effect alpha-mixing exists for)."""
    import math

    from etl_pulumi_aws_snowflake_spark.operators.sampling import (
        sample_temperature_mixture,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    n_by = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = sample_temperature_mixture(docs, "lang", "doc_id", 150, alpha=0.5)
    got_by = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = sum(float(n) ** 0.5 for _, n in sorted(n_by.items()))
    want = {
        lang: min(n, int(math.floor(150 * float(n) ** 0.5 / tot + 0.5)))
        for lang, n in n_by.items()
    }
    assert got_by == {k: v for k, v in want.items() if v > 0}
    corpus_total, sample_total = sum(n_by.values()), sum(got_by.values())
    head = max(n_by, key=n_by.get)
    for lang in n_by:
        corpus_share = n_by[lang] / corpus_total
        sample_share = got_by.get(lang, 0) / sample_total
        if lang == head:
            assert sample_share < corpus_share
        else:
            assert sample_share >= corpus_share * 0.95  # tail not squeezed


def test_temperature_mixture_alpha_one_is_proportional(spark):
    """alpha=1 degenerates to natural proportions: quotas are
    floor(budget*n/N+0.5), no flattening."""
    import math

    from etl_pulumi_aws_snowflake_spark.operators.sampling import (
        sample_temperature_mixture,
    )

    rows = [("a", i) for i in range(80)] + [("b", 1000 + i) for i in range(20)]
    df = spark.createDataFrame(rows, "lang string, doc_id int")
    got = sample_temperature_mixture(df, "lang", "doc_id", 50, alpha=1.0)
    by = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by == {"a": math.floor(50 * 0.8 + 0.5), "b": math.floor(50 * 0.2 + 0.5)}


def test_temperature_mixture_clamps_and_excludes(spark):
    """A stratum smaller than its share contributes whole (no
    replication); a stratum whose share rounds to 0 is excluded."""
    rows = (
        [("big", i) for i in range(400)]
        + [("small", 1000 + i) for i in range(3)]
        + [("dust", 2000)]
    )
    df = spark.createDataFrame(rows, "lang string, doc_id int")
    got = sample_temperature_mixture_import()(df, "lang", "doc_id", 12, alpha=0.5)
    by = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # sqrt weights: 20, 1.732, 1 (sum 22.73); shares of 12: 10.6, 0.91, 0.53
    assert by["big"] == 11
    assert by["small"] == 1
    assert by["dust"] == 1
    # budget 11 drops dust's share to 11/22.73 = 0.484 -> quota 0: the
    # q==0 exclusion branch (zero gate threshold, 0>=0 under-catch
    # pass) deterministically exercised — the stratum must vanish
    got = sample_temperature_mixture_import()(df, "lang", "doc_id", 11, alpha=0.5)
    by = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "dust" not in by
    assert by == {"big": 10, "small": 1}
    # validations
    with pytest.raises(ValueError, match="budget"):
        sample_temperature_mixture_import()(df, "lang", "doc_id", 0)
    with pytest.raises(ValueError, match="alpha"):
        sample_temperature_mixture_import()(df, "lang", "doc_id", 5, alpha=0.0)
    with pytest.raises(ValueError, match="internal working columns"):
        sample_temperature_mixture_import()(
            df.withColumn("_tb", F.lit(1)), "lang", "doc_id", 5
        )


def sample_temperature_mixture_import():
    from etl_pulumi_aws_snowflake_spark.operators.sampling import (
        sample_temperature_mixture,
    )

    return sample_temperature_mixture


@_QPROP
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40)),
        min_size=1,
        max_size=25,
    ),
    budget=st.integers(min_value=1, max_value=12),
)
def test_temperature_mixture_fuzz_matches_pure_python_selection(
    spark, rows, budget
):
    """Randomized semantics vs the rule computed in pure Python: per
    stratum, the floor(budget*sqrt(n)/sum+0.5) smallest
    (md5-60bit(key), key) pairs (duplicates included — the key
    multiset is deterministic)."""
    import math

    df = spark.createDataFrame(rows, "lang int, doc_id int")
    got = sorted(
        (r.lang, r.doc_id)
        for r in sample_temperature_mixture_import()(
            df, "lang", "doc_id", budget, alpha=0.5
        ).collect()
    )
    by_stratum: dict[int, list[int]] = {}
    for lang, doc in rows:
        by_stratum.setdefault(lang, []).append(doc)
    tot = sum(
        float(len(v)) ** 0.5 for _, v in sorted(by_stratum.items())
    )
    want = []
    for lang, docs in by_stratum.items():
        q = min(
            len(docs),
            int(math.floor(budget * float(len(docs)) ** 0.5 / tot + 0.5)),
        )
        docs.sort(key=lambda d: (_py_hash60(d), d))
        want.extend((lang, d) for d in docs[:q])
    assert got == sorted(want)


def test_temperature_mixture_oracle_quota_parity_and_boundary_margin(
    sf_smoke,
):
    """The driver entry's quotas must come out IDENTICAL when computed
    by DuckDB's own SQL (its SUM order, its sqrt) and by the
    operator's Python math (sorted-order sum, ** 0.5) — AND every
    rounding input must sit >= 0.01 from a floor(x+0.5) boundary, the
    margin that makes a 1-ulp cross-engine float divergence unable to
    flip a quota.  Fails loudly if regenerated test data ever lands a
    language share on a boundary (which would make the driver row
    flaky instead of red/green)."""
    import math

    import duckdb

    for sf_dir in (sf_smoke, "/root/testdata/sf0.01"):
        con = duckdb.connect()
        duck = dict(
            con.execute(
                f"""
            WITH counts AS (
                SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
                FROM read_parquet('{sf_dir}/documents.parquet') GROUP BY lang
            )
            SELECT lang, CAST(FLOOR(150 * sqrt(n) /
                (SELECT SUM(sqrt(n)) FROM counts) + 0.5) AS BIGINT)
            FROM counts
            """
            ).fetchall()
        )
        ns = dict(
            con.execute(
                f"SELECT lang, COUNT(*) FROM read_parquet("
                f"'{sf_dir}/documents.parquet') GROUP BY lang"
            ).fetchall()
        )
        tot = sum(float(n) ** 0.5 for _, n in sorted(ns.items()))
        for lang, n in ns.items():
            x = 150 * float(n) ** 0.5 / tot
            assert int(math.floor(x + 0.5)) == duck[lang], (sf_dir, lang)
            frac = (x + 0.5) % 1.0
            assert min(frac, 1.0 - frac) >= 0.01, (
                f"{sf_dir} {lang}: rounding input {x} is within 0.01 of a "
                "floor(x+0.5) boundary — the oracle comparison is ulp-flaky"
            )


def test_fail_loud_driver_needles_match_actual_messages(spark):
    """VERDICT r08 #6: the driver entry sample_exact_quota_fail_loud
    keys its boolean rows on error-message SUBSTRINGS.  Pin each needle
    to the actually-raised message here, so a future message reword
    flips this pytest (loudly, in CI) instead of silently flipping the
    driver row to red."""
    docs = _docs(spark)
    needles = {
        "under_catch": (
            "under-caught",
            lambda: exact_quota_sample(
                docs, "lang", "doc_id", 5, oversample=1e-6
            ),
        ),
        "null_stratum": (
            "contains NULL",
            lambda: exact_quota_sample(
                docs.withColumn(
                    "lang", F.when(F.col("doc_id") != 0, F.col("lang"))
                ),
                "lang",
                "doc_id",
                5,
            ),
        ),
        "null_key": (
            "is NULL",
            lambda: exact_quota_sample(
                docs.withColumn(
                    "doc_id",
                    F.when(F.col("doc_id") != 0, F.col("doc_id")),
                ),
                "lang",
                "doc_id",
                5,
            ),
        ),
        "bad_quota": (
            "quota k must be",
            lambda: exact_quota_sample(docs, "lang", "doc_id", 0),
        ),
    }
    for contract, (needle, fn) in needles.items():
        with pytest.raises(ValueError, match=".*") as exc:
            fn()
        assert needle in str(exc.value), (
            f"{contract}: driver needle {needle!r} no longer appears in "
            f"the raised message {str(exc.value)!r} — update "
            "queries/llm_sampling.py's fail_loud entry to match"
        )


def test_temperature_mixture_huge_alpha_fails_loudly(spark):
    """ADVICE r08: alpha=400 with n in the thousands overflows
    n**alpha to inf; the operator must raise its own descriptive
    ValueError, not 'cannot convert float NaN to integer'."""
    from etl_pulumi_aws_snowflake_spark.operators.sampling import (
        sample_temperature_mixture,
    )

    docs = _docs(spark)
    with pytest.raises(ValueError, match="overflows"):
        sample_temperature_mixture(docs, "lang", "doc_id", 100, alpha=400.0)


def test_all_map_columns_rejected_loudly(spark):
    """ADVICE r08: if every input column nests a MapType the content
    tiebreaker has nothing hashable; the shared core must raise its
    loud ValueError before any job runs, not a zero-arg xxhash64
    AnalysisException deep in the plan."""
    from etl_pulumi_aws_snowflake_spark.operators.sampling import (
        _take_exact,
    )

    df = spark.createDataFrame(
        [({"a": 1},)], "m map<string,int>"
    )
    with pytest.raises(ValueError, match="MapType"):
        _take_exact(df, "m", "m", [], {}, 2.0, "test_op")


def test_high_cardinality_strata_rejected_loudly(spark):
    """VERDICT r11 #5: stratifying on a key-like column would collect
    one driver row per distinct value — the guard caps the collect
    (LIMIT max_strata+1, so the driver never holds more) and raises
    the operator's own descriptive error instead of OOMing."""
    from etl_pulumi_aws_snowflake_spark.operators.sampling import (
        exact_quota_sample,
        sample_temperature_mixture,
    )

    df = spark.range(50).select(
        F.col("id").alias("doc_id"), F.col("id").alias("stratum")
    )
    with pytest.raises(ValueError, match="max_strata"):
        exact_quota_sample(df, "stratum", "doc_id", 2, max_strata=10)
    with pytest.raises(ValueError, match="max_strata"):
        sample_temperature_mixture(
            df, "stratum", "doc_id", 20, max_strata=10
        )
    # a bounded stratum column under the same cap still works
    ok = exact_quota_sample(
        df.withColumn("stratum", F.col("doc_id") % 5),
        "stratum",
        "doc_id",
        2,
        max_strata=10,
    )
    assert ok.count() == 10
