"""Sorts/limits (SURVEY.md §2.6) and set operations (§2.7).

Every LIMIT rides on a total order with a unique tiebreaker — a LIMIT
over ties returns engine-dependent rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import t
from .registry import query


@query(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_topn(spark, sf_dir):
    """Global top-N: Spark's TakeOrderedAndProject — each partition
    keeps its local top-25, only 25·|partitions| rows reach the driver;
    no full sort, no full shuffle."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    ORDER BY n_regionkey DESC, n_name
    """,
)
def sort_multi_key(spark, sf_dir):
    return (
        t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy(F.col("n_regionkey").desc(), F.col("n_name"))
    )


@query(
    "set_union_all",
    oracle="""
    SELECT c_custkey AS custkey, 'BUILDING' AS segment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey AS custkey, 'MACHINERY' AS segment FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def set_union_all(spark, sf_dir):
    customer = t(spark, sf_dir, "customer")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"), F.lit("BUILDING").alias("segment")
    )
    machinery = customer.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey"), F.lit("MACHINERY").alias("segment")
    )
    return building.union(machinery)


@query(
    "set_union_by_name",
    oracle="""
    SELECT s_suppkey AS acct_key, s_acctbal AS balance, 'supplier' AS side FROM supplier
    UNION ALL
    SELECT c_custkey AS acct_key, c_acctbal AS balance, 'customer' AS side FROM customer
    """,
)
def set_union_by_name(spark, sf_dir):
    """unionByName — the set-op mirror of the by-name CI load (S6):
    columns align by name, not position."""
    suppliers = t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("acct_key"),
        F.col("s_acctbal").alias("balance"),
        F.lit("supplier").alias("side"),
    )
    customers = t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"),
        F.col("c_acctbal").alias("balance"),
        F.col("c_custkey").alias("acct_key"),
    )
    return suppliers.unionByName(customers)


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_intersect(spark, sf_dir):
    events = t(spark, sf_dir, "events")
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = events.filter(F.col("event_type") == "error").select("user_id")
    return purchasers.intersect(erroring)


@query(
    "set_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'
    """,
)
def set_except(spark, sf_dir):
    events = t(spark, sf_dir, "events")
    signed_up = events.filter(F.col("event_type") == "signup").select("user_id")
    purchased = events.filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp"))
    ).select("user_id")
    # subtract == SQL EXCEPT (distinct); exceptAll would be multiset
    # difference, which keeps a key that appears more often left than right.
    return signed_up.subtract(purchased)


@query(
    "set_distinct_rows",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
)
def set_distinct_rows(spark, sf_dir):
    """dropDuplicates == DISTINCT when applied to the projected key
    set (on a subset of columns it keeps an arbitrary row — never use
    that form where determinism matters)."""
    return t(spark, sf_dir, "events").select("user_id", "event_type").dropDuplicates()
