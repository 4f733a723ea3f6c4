"""Window-function surface (SURVEY.md §2.5-§2.6): ranking, analytic,
frames, top-k per group.

Every ORDER BY inside a window carries a unique tiebreaker key — window
results over ties are otherwise nondeterministic and can't be
oracle-compared (or trusted in production).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import ints, t
from .registry import query


@query(
    "win_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
    WHERE rn <= 3
    """,
)
def win_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer. At scale this is the right top-k
    shape: rank is computed after one shuffle on the partition key and
    the filter prunes before anything else moves."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS price_dense_rank,
           NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS price_quartile
    FROM part
    """,
)
def win_rank_dense(spark, sf_dir):
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    wt = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.ntile(4).over(wt).alias("price_quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts, event_type,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           LAG(value, 1, 0.0) OVER w AS prev_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("value", 1, 0.0).over(w).alias("prev_value"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(100 AS DOUBLE) AS running_spend,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey) AS first_order
    FROM orders
    """,
)
def win_running_sum(spark, sf_dir):
    """Cumulative spend per customer (rows frame) + first_value."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(ints("o_totalprice")).over(cum).cast("double")
            / F.lit(100.0)
        ).alias("running_spend"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, qi,
           COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY qi
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within_5
    FROM (SELECT l_returnflag, l_orderkey, l_linenumber,
                 CAST(ROUND(l_quantity) AS BIGINT) AS qi
          FROM lineitem)
    """,
)
def win_range_frame(spark, sf_dir):
    """RANGE frame over a value axis (count of items within 5 quantity
    units below) — value-based frames need a numeric sort key."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", ints("l_quantity", 1).alias("qi")
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("qi")
        .rangeBetween(-5, Window.currentRow)
    )
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        "qi",
        F.count(F.lit(1)).over(w).alias("n_within_5"),
    )
