"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 (fast loop; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from etl_pulumi_aws_snowflake_spark.queries import all_oracles, all_queries

from .oracle_check import compare, duckdb_con

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_smoke, name):
    result = compare(spark, sf_smoke, QUERIES[name], ORACLES[name])
    assert result["ok"], f"{name}: {result}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_no_hugeint(sf_smoke, name):
    """No oracle may emit HUGEINT/UHUGEINT (DuckDB's uncast integer-SUM
    type): pandas renders it float64 ("123.0") while Spark emits BIGINT
    ("123"), which hash-mismatches in the driver even when values agree
    — the sole root cause of the r02 reds.  Wrap integer SUMs in
    CAST(... AS BIGINT)."""
    con = duckdb_con(sf_smoke)
    try:
        cols = con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    finally:
        con.close()
    bad = [(c[0], c[1]) for c in cols if "HUGEINT" in str(c[1]).upper()]
    assert not bad, (
        f"{name}: oracle emits HUGEINT column(s) {bad}; "
        "add CAST(... AS BIGINT) around the aggregate"
    )


def test_mirror_detects_hugeint_dtype_divergence(spark, sf_smoke):
    """The failure class behind every r01/r02 driver red must FAIL the
    local mirror: an uncast DuckDB integer SUM (HUGEINT → pandas
    float64, \"123.0\") against Spark's BIGINT (\"123\") diverges at the
    dtype level even though the values are equal.  If this test ever
    passes with `bad[\"ok\"] is True`, the mirror has drifted lax again."""

    def fn(spark, _sf_dir):
        return spark.sql("SELECT CAST(123 AS BIGINT) AS s")

    bad = compare(
        spark, sf_smoke, fn, "SELECT SUM(x) AS s FROM (SELECT CAST(123 AS BIGINT) AS x)"
    )
    assert not bad["ok"], "mirror failed to catch HUGEINT dtype divergence"
    good = compare(
        spark,
        sf_smoke,
        fn,
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT CAST(123 AS BIGINT) AS x)",
    )
    assert good["ok"], f"cast oracle should match: {good}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_smoke, name):
    df = QUERIES[name](spark, sf_smoke)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.queries()) >= set(e.oracle_sql())
