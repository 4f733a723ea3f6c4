"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 (fast loop; the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from etl_pulumi_aws_snowflake_spark.queries import all_oracles, all_queries

from .oracle_check import compare

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, sf_smoke, name):
    result = compare(spark, sf_smoke, QUERIES[name], ORACLES[name])
    assert result["ok"], f"{name}: {result}"


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
