"""Explicit StructType registry.

The reference infers its one schema with a Glue crawler
(``modules/glue.py:87-98``) and re-declares it as a typed Snowflake table
(``modules/snowflake.py:81-104``).  We keep the typed-target half as
explicit StructTypes (determinism at scale; inference stays available as
an option in :mod:`..sources.csv`), plus schemas for the driver-generated
testdata tables (needed by streaming readers, which cannot infer).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The reference's 15-column customers table, Snowflake DDL
#: ``/root/reference/modules/snowflake.py:86-102`` mapped to Spark types
#: per SURVEY.md §1.2.  All columns nullable (CSV has empty fields).
CUSTOMERS = T.StructType(
    [
        T.StructField("customerid", T.LongType()),
        T.StructField("namestyle", T.BooleanType()),
        T.StructField("title", T.StringType()),
        T.StructField("firstname", T.StringType()),
        T.StructField("middlename", T.StringType()),
        T.StructField("lastname", T.StringType()),
        T.StructField("suffix", T.StringType()),
        T.StructField("companyname", T.StringType()),
        T.StructField("salesperson", T.StringType()),
        T.StructField("emailaddress", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("passwordhash", T.StringType()),
        T.StructField("passwordsalt", T.StringType()),
        T.StructField("rowguid", T.StringType()),
        T.StructField("modifieddate", T.TimestampType()),
    ]
)

#: The mixed-case headers the CSV actually arrives with
#: (``/root/reference/data/customers.csv:1``) — used by ingestion when
#: reading with an explicit schema instead of inference.
CUSTOMERS_CSV = T.StructType(
    [
        T.StructField("CustomerID", T.LongType()),
        T.StructField("NameStyle", T.BooleanType()),
        T.StructField("Title", T.StringType()),
        T.StructField("FirstName", T.StringType()),
        T.StructField("MiddleName", T.StringType()),
        T.StructField("LastName", T.StringType()),
        T.StructField("Suffix", T.StringType()),
        T.StructField("CompanyName", T.StringType()),
        T.StructField("SalesPerson", T.StringType()),
        T.StructField("EmailAddress", T.StringType()),
        T.StructField("Phone", T.StringType()),
        T.StructField("PasswordHash", T.StringType()),
        T.StructField("PasswordSalt", T.StringType()),
        T.StructField("rowguid", T.StringType()),
        T.StructField("ModifiedDate", T.TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata schemas (FIXTURES.md §B), needed for streaming file sources.
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
