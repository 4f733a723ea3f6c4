"""MERGE and SCD2 edge semantics on tiny frames where every case is
enumerable by hand."""

from __future__ import annotations

import datetime as dt

import pytest

from etl_pulumi_aws_snowflake_spark.operators import warehouse as W


def test_merge_update_insert_delete_passthrough(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, name string, bal double",
    )
    source = spark.createDataFrame(
        [
            (2, "b2", 99.0, False),  # update
            (3, "c", 0.0, True),  # delete
            (9, "z", 1.0, False),  # insert
        ],
        "k bigint, name string, bal double, is_delete boolean",
    )
    got = {
        r["k"]: (r["name"], r["bal"])
        for r in W.merge_upsert(target, source, ["k"], "is_delete").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 9: ("z", 1.0)}


def test_merge_without_delete_col_keeps_all_matches(spark):
    target = spark.createDataFrame([(1, "a")], "k bigint, v string")
    source = spark.createDataFrame([(1, "A"), (2, "B")], "k bigint, v string")
    got = {r["k"]: r["v"] for r in W.merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: "A", 2: "B"}


def test_scd2_collapses_noop_changes_and_orders_intervals(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    changes = spark.createDataFrame(
        [
            (1, ts(0), "bronze"),
            (1, ts(1), "bronze"),  # no-op: collapsed
            (1, ts(2), "gold"),
            (2, ts(0), "silver"),
        ],
        "user_id bigint, ts timestamp, tier string",
    )
    rows = sorted(
        W.scd2_history(changes, ["user_id"], "ts", ["tier"]).collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    as_tuples = [
        (r["user_id"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in rows
    ]
    assert as_tuples == [
        (1, "bronze", ts(0), ts(2), False),
        (1, "gold", ts(2), None, True),
        (2, "silver", ts(0), None, True),
    ]


def test_merge_upsert_rejects_missing_source_column(spark):
    """Schema drift fails loudly: a CDC source that lost a target
    column raises with the column named, not an unresolved-attribute
    analysis error deep in the join plan."""
    target = spark.createDataFrame([(1, "a", 1.0)], "k bigint, name string, bal double")
    source = spark.createDataFrame([(1, "a2")], "k bigint, name string")
    with pytest.raises(ValueError, match=r"missing target column.*bal"):
        W.merge_upsert(target, source, key=["k"])


def test_merge_upsert_rejects_dtype_drift(spark):
    """A source column with a drifted dtype raises instead of silently
    retyping the snapshot column through the when/otherwise coalesce."""
    target = spark.createDataFrame([(1, 10)], "k bigint, n int")
    source = spark.createDataFrame([(1, "11")], "k bigint, n string")
    with pytest.raises(ValueError, match=r"dtypes differ.*'n'"):
        W.merge_upsert(target, source, key=["k"])


def test_merge_upsert_matches_source_columns_case_insensitively(spark):
    """Spark's default analyzer resolves columns case-insensitively, so
    a CDC feed differing only in column case must still merge (the
    drift guard may not regress that); two source columns differing
    only in case are ambiguous and raise."""
    target = spark.createDataFrame([(1, "a", 1.0)], "k bigint, name string, bal double")
    source = spark.createDataFrame([(1, "a2", 2.0)], "k bigint, NAME string, Bal double")
    rows = W.merge_upsert(target, source, key=["k"]).collect()
    assert [(r.k, r.name, r.bal) for r in rows] == [(1, "a2", 2.0)]

    dup = source.select("*", source.Bal.alias("BAL"))
    with pytest.raises(ValueError, match="ambiguous case-variant"):
        W.merge_upsert(target, dup, key=["k"])


def test_merge_upsert_requires_delete_col_in_source(spark):
    """delete_col gets the same pre-join presence check as target
    columns — a feed that dropped its delete flag fails loudly, not
    with an unresolved-column error inside the filter."""
    target = spark.createDataFrame([(1, "a")], "k bigint, name string")
    source = spark.createDataFrame([(1, "a2")], "k bigint, name string")
    with pytest.raises(ValueError, match="delete_col 'is_delete'"):
        W.merge_upsert(target, source, key=["k"], delete_col="is_delete")


def test_merge_schema_evolution_appends_new_columns(spark):
    """allow_new_columns=True: source-only columns are appended in
    source order — matched/inserted rows take the source value,
    passthrough rows null-fill; the default drops them."""
    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k bigint, name string"
    )
    source = spark.createDataFrame(
        [(2, "b2", "feed-x", 9), (3, "c", "feed-y", 8)],
        "k bigint, name string, feed string, score bigint",
    )
    out = W.merge_upsert(target, source, key=["k"], allow_new_columns=True)
    assert out.columns == ["k", "name", "feed", "score"]
    rows = {r.k: (r.name, r.feed, r.score) for r in out.collect()}
    assert rows == {
        1: ("a", None, None),        # passthrough null-fills
        2: ("b2", "feed-x", 9),      # update carries the new columns
        3: ("c", "feed-y", 8),       # insert carries the new columns
    }
    # default: extra source columns are not part of the target schema
    assert W.merge_upsert(target, source, key=["k"]).columns == ["k", "name"]


def test_merge_schema_evolution_rejects_case_variant_new_columns(spark):
    """Two NEW source columns folding to one name cannot evolve."""
    target = spark.createDataFrame([(1, "a")], "k bigint, name string")
    source = spark.createDataFrame(
        [(1, "a2", "x", "y")], "k bigint, name string, feed string, FEED string"
    )
    with pytest.raises(ValueError, match="case-variant NEW columns"):
        W.merge_upsert(target, source, key=["k"], allow_new_columns=True)


def test_merge_schema_evolution_excludes_delete_col(spark):
    """The delete flag is merge metadata, never an evolved column."""
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, name string")
    source = spark.createDataFrame(
        [(2, "b2", False, "f")], "k bigint, name string, is_delete boolean, feed string"
    )
    out = W.merge_upsert(
        target, source, key=["k"], delete_col="is_delete", allow_new_columns=True
    )
    assert out.columns == ["k", "name", "feed"]
