"""Relational operator surface (SURVEY.md §2.2-§2.8).

The reference implements none of these itself (it delegates to
Spark/Snowflake — SURVEY.md §2.3-§2.8 mark them ABSENT/EXT); they are the
north-star analytics surface, expressed as plain declarative DataFrame
programs so Catalyst owns pushdown, pruning and join selection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import (
    davg,
    dsum,
    ints,
    scaled_sum,
    sql_davg,
    sql_dsum,
    sql_ints,
    sql_scaled_sum,
    t,
)
from .registry import query

# ---------------------------------------------------------------------------
# §2.4/§2.6 — flagship: TPC-H Q1-shaped pricing summary
# (filter → groupBy → 8 aggs → sort; the reference's whole-row passthrough
# glue/glue_job.py:29-32 has no analogue, so this is the SURVEY §7.1 slice)
# ---------------------------------------------------------------------------

_PRICE_I = sql_ints("l_extendedprice")  # cents
_DISC_I = sql_ints("l_discount")  # percent points
_TAX_I = sql_ints("l_tax")


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty', scale=1)},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_scaled_sum(f'{_PRICE_I} * (100 - {_DISC_I})', 'sum_disc_price', 100 * 100)},
           {sql_scaled_sum(f'{_PRICE_I} * (100 - {_DISC_I}) * (100 + {_TAX_I})', 'sum_charge', 100 * 100 * 100)},
           {sql_davg('l_quantity', 'avg_qty', scale=1)},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Filter is pushed to the parquet scan; partial aggregation happens
    map-side (hash agg) so the shuffle carries ≤ |groups|·|partitions|
    rows — the plan that survives 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    price_i = ints("l_extendedprice")
    disc_i = ints("l_discount")
    tax_i = ints("l_tax")
    disc_price_i = price_i * (F.lit(100) - disc_i)
    charge_i = disc_price_i * (F.lit(100) + tax_i)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty", scale=1),
            dsum("l_extendedprice", "sum_base_price"),
            scaled_sum(disc_price_i, "sum_disc_price", 100 * 100),
            scaled_sum(charge_i, "sum_charge", 100 * 100 * 100),
            davg("l_quantity", "avg_qty", scale=1),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "align_by_name_ci",
    oracle="""
    SELECT doc_id,
           text AS BODY,
           lang AS language_code,
           CAST(NULL AS BIGINT) AS quality_score
    FROM documents
    """,
)
def align_by_name_ci(spark, sf_dir):
    """The reference's load semantic as a query: by-name
    case-insensitive schema alignment (Snowpipe ``MATCH_BY_COLUMN_NAME
    = CASE_INSENSITIVE``, /root/reference/modules/snowflake.py:150) —
    matched columns case-folded and cast, missing target columns NULL,
    extra source columns (source, n_chars) dropped.  Pure projection:
    free at any scale."""
    from pyspark.sql import types as T_

    from ..operators import align

    target = T_.StructType(
        [
            T_.StructField("DOC_ID", T_.LongType()),       # case-varied match
            T_.StructField("BODY", T_.StringType()),       # no match by name...
            T_.StructField("language_code", T_.StringType()),
            T_.StructField("quality_score", T_.LongType()),  # missing -> NULL
        ]
    )
    src = (
        t(spark, sf_dir, "documents")
        .withColumnRenamed("text", "Body")
        .withColumnRenamed("lang", "LANGUAGE_CODE")
    )
    return align(src, target).withColumnRenamed("DOC_ID", "doc_id")
