"""Warehouse-load semantics as judged queries: MERGE (upsert+delete),
SCD2 dimension build, and a data-quality audit — the maintenance
operations behind the reference's Snowflake warehouse
(`modules/snowflake.py`), oracle-checked like every other operator.

The MERGE source is a deterministic CDC batch derived from the customer
table itself (hash-gated updates/deletes + synthetic inserts), so both
engines construct bit-identical input without fixtures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import warehouse as W
from ._util import t
from .llm_sampling import hash_gate_duck, hash_gate_spark
from .registry import query


@query(
    "merge_upsert_customers",
    oracle=f"""
    WITH src AS (
        SELECT c_custkey,
               'UPD-' || CAST(c_custkey AS VARCHAR) AS c_name,
               c_nationkey,
               0.0 AS c_acctbal,
               c_mktsegment,
               {hash_gate_duck("c_custkey", 5)} AS is_delete
        FROM customer
        WHERE {hash_gate_duck("c_custkey", 20)}
        UNION ALL
        SELECT c_custkey + 1000000,
               'NEW-' || CAST(c_custkey AS VARCHAR),
               c_nationkey,
               100.0,
               'BUILDING',
               FALSE
        FROM customer
        WHERE {hash_gate_duck("c_custkey + 41", 10)}
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name
                ELSE t.c_name END AS c_name,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_nationkey
                ELSE t.c_nationkey END AS c_nationkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                ELSE t.c_acctbal END AS c_acctbal,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment
                ELSE t.c_mktsegment END AS c_mktsegment
    FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    WHERE NOT (s.c_custkey IS NOT NULL AND COALESCE(s.is_delete, FALSE))
    """,
)
def merge_upsert_customers(spark, sf_dir):
    """MERGE a CDC batch into the customer dimension: 20% of keys
    arrive as updates (5% of those flagged delete), plus a 10% slice
    re-keyed +1,000,000 as inserts.  One full-outer hash join on the
    key — the copy-on-write snapshot rewrite Delta/Iceberg MERGE
    compiles to, here over plain Parquet."""
    cust = t(spark, sf_dir, "customer")
    updates = (
        cust.filter(F.expr(hash_gate_spark("c_custkey", 20)))
        .select(
            "c_custkey",
            F.concat(F.lit("UPD-"), F.col("c_custkey").cast("string")).alias(
                "c_name"
            ),
            "c_nationkey",
            F.lit(0.0).alias("c_acctbal"),
            "c_mktsegment",
            F.expr(hash_gate_spark("c_custkey", 5)).alias("is_delete"),
        )
    )
    inserts = cust.filter(F.expr(hash_gate_spark("c_custkey + 41", 10))).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_custkey").cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(100.0).alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
        F.lit(False).alias("is_delete"),
    )
    return W.merge_upsert(
        cust, updates.unionByName(inserts), key=["c_custkey"], delete_col="is_delete"
    )


@query(
    "merge_schema_evolution",
    oracle=f"""
    WITH src AS (
        SELECT c_custkey,
               'UPD-' || CAST(c_custkey AS VARCHAR) AS c_name,
               c_nationkey,
               0.0 AS c_acctbal,
               c_mktsegment,
               'feed-' || CAST(c_custkey % 3 AS VARCHAR) AS c_feed
        FROM customer
        WHERE {hash_gate_duck("c_custkey", 20)}
        UNION ALL
        SELECT c_custkey + 1000000,
               'NEW-' || CAST(c_custkey AS VARCHAR),
               c_nationkey,
               100.0,
               'BUILDING',
               'feed-new'
        FROM customer
        WHERE {hash_gate_duck("c_custkey + 41", 10)}
    )
    SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_name
                ELSE t.c_name END AS c_name,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_nationkey
                ELSE t.c_nationkey END AS c_nationkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal
                ELSE t.c_acctbal END AS c_acctbal,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_mktsegment
                ELSE t.c_mktsegment END AS c_mktsegment,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_feed
                ELSE CAST(NULL AS VARCHAR) END AS c_feed
    FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
    """,
)
def merge_schema_evolution(spark, sf_dir):
    """Additive schema evolution through MERGE (Delta ``mergeSchema``
    semantics, ``merge_upsert(allow_new_columns=True)``): the CDC batch
    carries a NEW ``c_feed`` column absent from the customer dimension.
    Matched/inserted rows take the source value; passthrough rows
    null-fill — the widened schema under the driver hash against the
    explicit full-outer SQL expansion."""
    cust = t(spark, sf_dir, "customer")
    updates = cust.filter(F.expr(hash_gate_spark("c_custkey", 20))).select(
        "c_custkey",
        F.concat(F.lit("UPD-"), F.col("c_custkey").cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
        F.concat(F.lit("feed-"), (F.col("c_custkey") % 3).cast("string")).alias(
            "c_feed"
        ),
    )
    inserts = cust.filter(F.expr(hash_gate_spark("c_custkey + 41", 10))).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_custkey").cast("string")).alias("c_name"),
        "c_nationkey",
        F.lit(100.0).alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
        F.lit("feed-new").alias("c_feed"),
    )
    return W.merge_upsert(
        cust,
        updates.unionByName(inserts),
        key=["c_custkey"],
        allow_new_columns=True,
    )


@query(
    "scd2_user_state",
    oracle="""
    WITH ch AS (
        SELECT user_id, ts, event_type, value FROM events
    ),
    marked AS (
        SELECT user_id, ts, event_type, value,
               LAG(ts) OVER w AS pts,
               LAG(event_type) OVER w AS ptype,
               LAG(value) OVER w AS pvalue
        FROM ch
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    versions AS (
        SELECT user_id, ts, event_type, value FROM marked
        WHERE pts IS NULL OR event_type != ptype OR value != pvalue
    )
    SELECT user_id, event_type, value,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts)) IS NULL
               AS is_current
    FROM versions
    """,
)
def scd2_user_state(spark, sf_dir):
    """SCD type-2 build from the events change log: per-user versioned
    (event_type, value) state with half-open validity intervals,
    no-op changes collapsed.  Both windows partition by user — the
    100 TB plan is one shuffle on the key, zero global sorts."""
    return W.scd2_history(
        t(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value"),
        key=["user_id"],
        ts_col="ts",
        attr_cols=["event_type", "value"],
    )


@query(
    "dq_audit",
    oracle="""
    SELECT 'orders_custkey_fk' AS check_name,
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
               AS n_violations
    UNION ALL
    SELECT 'customer_key_unique',
           (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
    UNION ALL
    SELECT 'lineitem_qty_positive',
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
    UNION ALL
    SELECT 'orders_totalprice_nonnull',
           (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL)
    UNION ALL
    SELECT 'events_props_json',
           (SELECT COUNT(*) FROM events
            WHERE json_valid(props) = FALSE)
    """,
)
def dq_audit(spark, sf_dir):
    """Constraint audit (the dbt-test layer a warehouse load runs
    before publish): referential integrity, key uniqueness, domain and
    null checks, JSON validity — one row per check with its violation
    count.  Each check is a scan-side aggregate or broadcast anti-join;
    the union is 5 scalar rows."""
    orders, cust = t(spark, sf_dir, "orders"), t(spark, sf_dir, "customer")
    li, events = t(spark, sf_dir, "lineitem"), t(spark, sf_dir, "events")

    def one(name: str, df):
        return df.select(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
        )

    fk = one(
        "orders_custkey_fk",
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_anti"
        ),
    )
    uniq = cust.select(
        F.lit("customer_key_unique").alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey"))
        .cast("bigint")
        .alias("n_violations"),
    )
    qty = one("lineitem_qty_positive", li.filter(F.col("l_quantity") <= 0))
    price = one(
        "orders_totalprice_nonnull", orders.filter(F.col("o_totalprice").isNull())
    )
    js = one(
        "events_props_json",
        events.filter(F.expr("get_json_object(props, '$') IS NULL")),
    )
    return fk.unionByName(uniq).unionByName(qty).unionByName(price).unionByName(js)
