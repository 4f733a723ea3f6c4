"""Multi-join analytical queries (TPC-H Q3/Q5-shaped) over the star
schema — the bench headliners exercising join ordering, broadcast
selection, and partial aggregation together.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import ints, scaled_sum, sql_ints, sql_scaled_sum, t
from .registry import query

_REV_I = f"{sql_ints('l_extendedprice')} * (100 - {sql_ints('l_discount')})"

# Shared by the DataFrame-built q5 (as its oracle) and the verbatim
# SQL-entry sql_api_q5 (as both the Spark SQL text AND the oracle).
_Q5_ANSI = f"""
    SELECT n.n_name,
           {sql_scaled_sum(_REV_I, 'revenue', 100 * 100)}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_scaled_sum(_REV_I, 'revenue', 100 * 100)},
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. customer is filtered then broadcast; lineitem
    (the 100 TB table) is filtered at the scan and shuffles once for
    the orderkey join/agg."""
    customer = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev_i = ints("l_extendedprice") * (F.lit(100) - ints("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(scaled_sum(rev_i, "revenue", 100 * 100))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=_Q5_ANSI,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: six-table join. All dimensions broadcast; the
    only shuffles are fact-fact (lineitem⋈orders) and the final agg."""
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation")
    supplier = t(spark, sf_dir, "supplier")
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    rev_i = ints("l_extendedprice") * (F.lit(100) - ints("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(scaled_sum(rev_i, "revenue", 100 * 100))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_scaled_sum(_REV_I, 'revenue', 100 * 100)}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-item revenue per customer, top 20).
    lineitem filters at the scan (returnflag pushed to parquet), joins
    once on orderkey; customer and nation broadcast.  Tie-break on
    c_custkey makes the LIMIT deterministic."""
    nation = t(spark, sf_dir, "nation")
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev_i = ints("l_extendedprice") * (F.lit(100) - ints("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(scaled_sum(rev_i, "revenue", 100 * 100))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT CAST(SUM({sql_ints('l.l_extendedprice')}) AS DOUBLE)
             / 100.0 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_size < 25
      AND l.l_quantity < a.qty_thresh
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape — correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate + equi-join, the standard
    Spark rewrite (Catalyst performs the same one for SQL-form
    correlated subqueries).  The per-part aggregate shuffles (partkey,
    sum, count) only; the part filter broadcasts.  AVG over integral
    quantities is order-exact, so the 0.2× threshold compares
    identically in both engines."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 25)
    )
    li = t(spark, sf_dir, "lineitem")
    thresh = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresh, li.l_partkey == thresh.a_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(ints("l_extendedprice")).cast("double") / 100.0 / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, SUM(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18 shape — IN-subquery with HAVING, rewritten as the
    aggregate → left-semi join Spark plan.  The HAVING aggregate and
    the outer aggregate both shuffle on orderkey, so with AQE the
    exchange is reused rather than repeated; quantity sums are integral
    → exact."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "b_orderkey"),
                li.l_orderkey == F.col("b_orderkey"), "semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape — EXISTS subquery as a left-semi join (the plan
    Catalyst produces for the SQL form too).  The lineitem side is
    filtered then deduplicated BY THE JOIN (semi joins stop at first
    match — no distinct needed, no row explosion)."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape — left outer join with a non-key condition
    (COUNT(col) ignores the nulls unmatched customers produce), then a
    second aggregation over the first's result.  Both aggs are
    algebraic: shuffle 1 is on custkey, shuffle 2 on the (tiny)
    count domain."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH threshold AS (
        SELECT CAST(SUM({sql_ints('c_acctbal')}) AS DOUBLE) / 100.0 / COUNT(*)
                 AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           {sql_scaled_sum(sql_ints('c.c_acctbal'), 'totacctbal', 100)}
    FROM customer c, threshold
    WHERE c.c_acctbal > threshold.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape — scalar aggregate subquery (broadcast 1-row
    cross join, the decorrelated plan) + NOT EXISTS as a left-anti
    join (customers with above-average balance and no urgent orders).
    The average is computed over exact scaled integers so the
    threshold comparison is bit-identical across engines."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    threshold = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(ints("c_acctbal")).cast("double") / 100.0 / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        customer.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            customer.c_custkey == orders.o_custkey,
            "anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            scaled_sum(ints("c_acctbal"), "totacctbal", 100),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_scaled_sum(f"{sql_ints('l_extendedprice')} * {sql_ints('l_discount')}",
                           'revenue', 100 * 100)}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape — pure scan-side filter + global sum, the
    pushdown litmus test: all three predicates reach the parquet
    reader, zero shuffle before the single-row final agg."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        scaled_sum(ints("l_extendedprice") * ints("l_discount"), "revenue", 100 * 100)
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                               THEN {_REV_I} ELSE 0 END) AS DOUBLE)
                 / CAST(SUM({_REV_I}) AS DOUBLE) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-03-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape — conditional aggregation over a join: promo
    revenue share.  part broadcasts; the integer revenue ratio divides
    once at the end so the percentage is bit-exact."""
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-03-01 00:00:00").cast("timestamp"))
    )
    rev_i = ints("l_extendedprice") * (F.lit(100) - ints("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev_i).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(rev_i).cast("double")
            ).alias("promo_pct")
        )
    )


_Q3_ANSI = f"""
    SELECT l.l_orderkey,
           {sql_scaled_sum(_REV_I, 'revenue', 100 * 100)},
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """


@query("sql_api_q3", oracle=_Q3_ANSI)
def sql_api_q3(spark, sf_dir):
    """The SQL entry path (SURVEY.md §2.1 S1: catalog-name access):
    register the testdata tables as views and execute the SAME ANSI
    SQL string the DuckDB oracle runs — one text, two engines,
    identical values.  Shows the engine's SQL surface is the shared
    dialect, with Catalyst doing exactly what it does for the
    DataFrame form of Q3 (same optimized plan)."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q3_ANSI)


@query("sql_api_q5", oracle=_Q5_ANSI)
def sql_api_q5(spark, sf_dir):
    """Verbatim-SQL entry #2 — the six-table Q5 star join as ONE ANSI
    string executed by both Spark SQL and the DuckDB oracle.  Catalyst
    plans it exactly like the DataFrame form (dimension broadcasts,
    single fact-fact shuffle), proving the ``register_views`` +
    ``spark.sql`` path handles multi-join analytical SQL, not just the
    Q3 shape."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_Q5_ANSI)


# Window functions in the shared dialect: running sums are kept exact
# by accumulating scaled-integer cents (float running sums are
# accumulation-order-dependent and engines disagree); rn <= 5 keeps
# output bounded at any SF.  NOTE the shared text must use
# CAST(ROUND(..)), not the `+ 0.5` truncation trick — CAST(double AS
# BIGINT) truncates in Spark but rounds in DuckDB, so the same string
# would differ by one cent on half-fraction values.
_WINDOW_ANSI = """
    SELECT o_custkey, o_orderkey, rn, run_cents
    FROM (
        SELECT o_custkey,
               o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS rn,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS run_cents
        FROM orders
    ) w
    WHERE rn <= 5
    """


@query("sql_api_window", oracle=_WINDOW_ANSI)
def sql_api_window(spark, sf_dir):
    """Verbatim-SQL entry #3 — analytic window functions (ROW_NUMBER +
    running SUM over an explicit ROWS frame) as one ANSI string on both
    engines.  The window partitions by customer, so Spark executes it
    with a single hash-partition exchange on o_custkey — no global
    sort."""
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_WINDOW_ANSI)


_DDL_DML_ORACLE = """
    WITH seed AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_custkey
    ),
    delta AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_custkey
    )
    SELECT COALESCE(d.o_custkey, s.o_custkey) AS c_custkey,
           COALESCE(d.total_cents, s.total_cents) AS total_cents,
           COALESCE(d.n_orders, s.n_orders) AS n_orders
    FROM seed s FULL OUTER JOIN delta d ON s.o_custkey = d.o_custkey
    """


@query("sql_api_ddl_dml", oracle=_DDL_DML_ORACLE)
def sql_api_ddl_dml(spark, sf_dir):
    """DDL + DML through the SQL surface (r14, VERDICT r13 #8 — the
    catalog isn't read-only): ``CREATE TABLE … USING parquet LOCATION``
    registers a physical table in the session catalog, two ``INSERT
    INTO … SELECT`` statements append batch-stamped per-customer order
    totals (seed: orders before 1997; delta: the rest), and a ``CREATE
    TABLE … AS SELECT`` materializes the upsert — latest batch wins per
    key, the MERGE-shaped last-write-wins resolved by a window over the
    catalog table.  (True ``MERGE INTO`` needs a row-level-operations
    v2 source — Delta/Iceberg territory; over plain parquet the
    engine's MERGE lives in ``operators/warehouse.py`` — so the SQL
    surface expresses the same upsert as INSERT + CTAS.)  The oracle
    computes the identical final state relationally; cents stay in
    BIGINT through the shared CAST(ROUND(..)) dialect.  Table names are
    pid- and sf-keyed so concurrent sessions never collide; locations
    live under the per-entry scratch workdir."""
    import os

    from ..sources.tables import register_views
    from .pipeline_e2e import _workdir

    register_views(spark, sf_dir)
    sfid = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t1 = f"sql_dml_target_pid{os.getpid()}_{sfid}"
    t2 = f"sql_dml_merged_pid{os.getpid()}_{sfid}"
    work = _workdir(sf_dir, "sql_ddl_dml")
    spark.sql(f"DROP TABLE IF EXISTS {t1}")
    spark.sql(f"DROP TABLE IF EXISTS {t2}")
    spark.sql(
        f"""CREATE TABLE {t1} (
              c_custkey BIGINT, total_cents BIGINT, n_orders BIGINT,
              batch INT)
            USING parquet LOCATION '{os.path.join(work, "target")}'"""
    )
    for batch, pred in ((1, "<"), (2, ">=")):
        spark.sql(
            f"""INSERT INTO {t1}
                SELECT o_custkey,
                       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                            AS BIGINT),
                       CAST(COUNT(*) AS BIGINT),
                       {batch}
                FROM orders
                WHERE o_orderdate {pred} TIMESTAMP '1997-01-01 00:00:00'
                GROUP BY o_custkey"""
        )
    spark.sql(
        f"""CREATE TABLE {t2}
            USING parquet LOCATION '{os.path.join(work, "merged")}'
            AS SELECT c_custkey, total_cents, n_orders FROM (
                 SELECT c_custkey, total_cents, n_orders,
                        ROW_NUMBER() OVER (PARTITION BY c_custkey
                                           ORDER BY batch DESC) AS rn
                 FROM {t1}) w
               WHERE rn = 1"""
    )
    return spark.sql(f"SELECT c_custkey, total_cents, n_orders FROM {t2}")
