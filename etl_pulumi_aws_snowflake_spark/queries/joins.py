"""Join surface (SURVEY.md §2.3) — all eight forms plus range and as-of.

Dimension tables (region/nation/part/supplier at these scales) are
explicitly broadcast where Catalyst's size estimate might not; fact-fact
joins shuffle on their keys and rely on AQE for skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.joins import asof_join, range_join
from ._util import scaled_sum, ints, sql_ints, sql_scaled_sum, t
from ..functions.localrel import local_frame
from .registry import query


@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner(spark, sf_dir):
    """Plain equi-join; Catalyst picks broadcast vs sort-merge from
    stats (customer ≪ orders here → broadcast)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    customer = t(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_broadcast",
    oracle=f"""
    SELECT p.p_brand,
           {sql_scaled_sum(f"{sql_ints('l.l_extendedprice')} * (100 - {sql_ints('l.l_discount')})", 'revenue', 100 * 100)},
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_broadcast(spark, sf_dir):
    """Fact ⋈ broadcast(dim): no shuffle of the fact table for the
    join — the 100 TB-safe shape for star-schema rollups."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    rev_i = ints("l_extendedprice") * (F.lit(100) - ints("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            scaled_sum(rev_i, "revenue", 100 * 100),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark, sf_dir):
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal < 0
    """,
)
def join_right_outer(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "right").select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT n.n_name, s.s_suppkey, s.s_name
    FROM (SELECT * FROM nation WHERE n_regionkey <= 1) n
    FULL JOIN (SELECT * FROM supplier WHERE s_acctbal > 5000) s
      ON s.s_nationkey = n.n_nationkey
    """,
)
def join_full_outer(spark, sf_dir):
    nation = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") <= 1)
    supplier = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    return nation.join(supplier, supplier.s_nationkey == nation.n_nationkey, "full").select(
        "n_name", "s_suppkey", "s_name"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi(spark, sf_dir):
    """Left-semi: existence check without duplicating or widening rows
    — the join's build side carries no payload columns."""
    customer = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return customer.join(
        big, big.o_custkey == customer.c_custkey, "semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
    """,
)
def join_anti(spark, sf_dir):
    customer = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return customer.join(
        big, big.o_custkey == customer.c_custkey, "anti"
    ).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark, sf_dir):
    region = t(spark, sf_dir, "region")
    nation = t(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@query(
    "join_theta",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    WHERE c.c_acctbal > 9000
    """,
)
def join_theta(spark, sf_dir):
    """Equi key + non-equi residual: stays a hash/sort-merge join on
    the equi part with the theta predicate as post-filter — NOT a
    nested loop."""
    supplier = t(spark, sf_dir, "supplier")
    customer = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return supplier.join(
        customer,
        (supplier.s_nationkey == customer.c_nationkey)
        & (supplier.s_acctbal > customer.c_acctbal),
    ).select("s_suppkey", "c_custkey")


@query(
    "join_range",
    oracle="""
    SELECT b.band_name, COUNT(*) AS n_items
    FROM lineitem l
    JOIN (VALUES ('low', 0.0, 20.0), ('mid', 20.0, 35.0), ('high', 35.0, 100.0))
         b(band_name, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band_name
    """,
)
def join_range(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    bands = local_frame(
        spark,
        [("low", 0.0, 20.0), ("mid", 20.0, 35.0), ("high", 35.0, 100.0)],
        "band_name string, lo double, hi double",
    )
    joined = range_join(li, bands, "l_quantity")
    return (
        joined.filter(F.col("band_name").isNotNull())
        .groupBy("band_name")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           v.event_id AS view_event_id, v.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def join_asof(spark, sf_dir):
    """For every purchase, the most recent prior (or simultaneous) view
    by the same user — single shuffle on user_id (operator docs:
    operators/joins.py:asof_join)."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(purchases, views, on="ts", by=["user_id"], right_cols=["event_id", "value"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_right").alias("view_event_id"),
        F.col("value_right").alias("view_value"),
    )


@query(
    "join_salted",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_salted(spark, sf_dir):
    """Skew-salted equi-join (operators/skew.salted_join) judged
    against the PLAIN JOIN oracle — the probe side (orders) gets a
    deterministic row salt, the build side (customer) replicates once
    per salt, and the (key, salt) join returns exactly the unsalted
    result.  This is the escape hatch for a hot key whose matches
    exceed one task even after AQE skew-splitting."""
    from ..operators.skew import salted_join

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return salted_join(
        orders,
        cust,
        on=["o_custkey"],
        n=8,
        probe_id_cols=["o_orderkey"],
        how="inner",
    ).select("o_orderkey", "o_custkey", "c_mktsegment")
