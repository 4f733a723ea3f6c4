"""Aggregation surface (SURVEY.md §2.4): hash aggs, distinct,
rollup/cube/grouping-sets, percentiles, stats, collect.

Stats (stddev/corr) are computed from exact integer moment sums rather
than the engines' native accumulators — Spark's parallel partial
aggregation and DuckDB's sequential one produce different FP rounding,
while integer moments + one fixed double expression are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources import register_views
from ._util import davg, dsum, ints, sql_davg, sql_dsum, t
from .registry import query


@query(
    "agg_groupby_basic",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'total_revenue')},
           {sql_davg('o_totalprice', 'avg_revenue')},
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_groupby_basic(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_revenue"),
            davg("o_totalprice", "avg_revenue"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """Hierarchical subtotals; NULL grouping keys relabeled 'ALL' so the
    oracle comparison never depends on NULL-vs-NULL semantics."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
        )
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           COUNT(*) AS n, {sql_dsum('o_totalprice', 'revenue')}
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "revenue"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "revenue",
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Exercises the SQL API path (spark.sql over registered views) —
    grouping sets have no DataFrame-method spelling."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           CAST(median(l_quantity) AS DOUBLE) AS median_qty,
           CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE) AS p90_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median(spark, sf_dir):
    """Exact percentiles (Spark's ``median``/``percentile``); the
    interpolation (a+b)/2 etc. is one IEEE expression, identical in
    both engines.  At 100 TB swap for percentile_approx."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.median("l_quantity").alias("median_qty"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        )
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           SQRT((CAST(SUM(qi*qi) AS DOUBLE) - CAST(SUM(qi) AS DOUBLE) * SUM(qi) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_qty,
           (CAST(SUM(qi*pi) AS DOUBLE) - CAST(SUM(qi) AS DOUBLE) * SUM(pi) / COUNT(*))
           / (SQRT(CAST(SUM(qi*qi) AS DOUBLE) - CAST(SUM(qi) AS DOUBLE) * SUM(qi) / COUNT(*))
              * SQRT(CAST(SUM(pi*pi) AS DOUBLE) - CAST(SUM(pi) AS DOUBLE) * SUM(pi) / COUNT(*)))
           AS corr_qty_price
    FROM (SELECT l_returnflag,
                 CAST(ROUND(l_quantity) AS BIGINT) AS qi,
                 CAST(ROUND(l_extendedprice) AS BIGINT) AS pi
          FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """Sample stddev + Pearson corr from exact integer moments (prices
    rounded to whole units so squared sums stay far from int64 range
    even at sf ≫ 1)."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        ints("l_quantity", 1).alias("qi"),
        ints("l_extendedprice", 1).alias("pi"),
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qi").alias("sq"),
        F.sum(F.col("qi") * F.col("qi")).alias("sqq"),
        F.sum("pi").alias("sp"),
        F.sum(F.col("pi") * F.col("pi")).alias("spp"),
        F.sum(F.col("qi") * F.col("pi")).alias("sqp"),
    )
    n = F.col("n")
    var_q = F.col("sqq").cast("double") - F.col("sq").cast("double") * F.col("sq") / n
    var_p = F.col("spp").cast("double") - F.col("sp").cast("double") * F.col("sp") / n
    cov = F.col("sqp").cast("double") - F.col("sq").cast("double") * F.col("sp") / n
    return agg.select(
        "l_returnflag",
        "n",
        F.sqrt(var_q / (n - 1)).alias("stddev_qty"),
        (cov / (F.sqrt(var_q) * F.sqrt(var_p))).alias("corr_qty_price"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           COUNT(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_collect(spark, sf_dir):
    """collect_set → sorted → joined: deterministic string encoding of
    a set aggregate (raw arrays hash differently across engines)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus"))).alias(
                "statuses"
            ),
            F.countDistinct("l_linestatus").alias("n_statuses"),
        )
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END", 'open_revenue')}
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_conditional(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            dsum(
                F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).otherwise(
                    F.lit(0.0)
                ),
                "open_revenue",
            ),
        )
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """HLL-sketch distinct count — the 100 TB default for exploratory
    cardinality (exact distinct forces a full shuffle of the keys).

    The HLL estimate itself is engine-specific, so it is not emitted
    raw; instead the query emits the exact count plus a deterministic
    ``within_5pct`` assertion that the sketch (rsd=0.02) landed within
    5 % of exact — hash-checkable against an oracle that emits exact +
    TRUE, and it actually asserts the estimate is sane."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                < F.lit(0.05)
            ).alias("within_5pct"),
        )
    )


@query(
    "agg_salted_groupby",
    oracle="""
    SELECT l_suppkey,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def agg_salted_groupby(spark, sf_dir):
    """Skew-proof two-stage aggregation (operators/skew.salted_groupby)
    judged against the PLAIN GROUP BY oracle — proving the salt is
    result-invariant: partial sum/count per (key, salt), final combine
    per key.  This is the shape for the null-key / hot-default pile-up
    AQE can't split (a single group bigger than one task's memory);
    cost is one extra narrow agg stage, result is bit-identical for any
    algebraic aggregate."""
    from ..operators.skew import salted_groupby

    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", F.col("l_quantity").cast("bigint").alias("qty")
    )
    return salted_groupby(
        li,
        ["l_suppkey"],
        aggs={"s": F.sum("qty"), "c": F.count(F.lit(1))},
        finals={"total_qty": F.sum("s"), "n_items": F.sum("c")},
        n=8,
    )


@query(
    "agg_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(MEDIAN(l_extendedprice) * 100) AS BIGINT)
               AS exact_median_cents,
           TRUE AS within_1pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_quantile(spark, sf_dir):
    """Greenwald-Khanna sketch quantile (percentile_approx) — the
    100 TB default for percentiles (exact median sorts every group).
    Like agg_approx_distinct, the sketch value is engine-specific, so
    the judged output is the exact median plus a deterministic
    within-1% assertion on the sketch (accuracy 10000 => error well
    inside 1% on this data) — hash-checkable, and it actually bounds
    the estimate."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("approx"),
            F.expr("median(l_extendedprice)").alias("exact"),
        )
        .select(
            "l_returnflag",
            F.expr("CAST(ROUND(exact * 100) AS BIGINT)").alias(
                "exact_median_cents"
            ),
            (F.abs(F.col("approx") - F.col("exact")) / F.col("exact") < 0.01).alias(
                "within_1pct"
            ),
        )
    )
