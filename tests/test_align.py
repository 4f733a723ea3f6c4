"""CI-align operator — the reference's MATCH_BY_COLUMN_NAME=CASE_INSENSITIVE
load semantics (modules/snowflake.py:150): case-insensitive match,
missing target column -> NULL, extra source column dropped, casts applied."""

from __future__ import annotations

from pyspark.sql import types as T

from etl_pulumi_aws_snowflake_spark.operators import align

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_case_insensitive_match_and_cast(spark):
    df = spark.createDataFrame([("7", "a", "2005-08-01 00:00:00")], ["ID", "Name", "TS"])
    out = align(df, TARGET)
    assert out.columns == ["id", "name", "ts"]
    row = out.collect()[0]
    assert row.id == 7 and row.name == "a"
    assert row.ts.year == 2005
    assert [f.dataType for f in out.schema.fields] == [
        T.LongType(),
        T.StringType(),
        T.TimestampType(),
    ]


def test_missing_becomes_null_extra_dropped(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "EXTRA"])
    out = align(df, TARGET)
    assert out.columns == ["id", "name", "ts"]
    row = out.collect()[0]
    assert row.id == 1 and row.name is None and row.ts is None


def test_duplicate_case_variants_first_wins(spark):
    df = spark.createDataFrame([("first", "second", 1)], ["Name", "NAME", "id"])
    out = align(df, TARGET)
    assert out.collect()[0].name == "first"


def test_uncastable_is_null_not_error(spark):
    df = spark.createDataFrame([("not-a-number",)], ["id"])
    assert align(df, TARGET).collect()[0].id is None


def test_strict_mode_raises_on_uncastable(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("not-a-number",)], ["id"])
    with _pytest.raises(Exception):
        align(df, TARGET, strict=True).collect()
