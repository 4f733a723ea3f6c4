"""UDF / UDAF / UDTF surface (SURVEY.md §2.11) — one query per Python
extension mechanism, each hash-matched against a pure-SQL DuckDB oracle.

The engine policy stays "built-ins first" (every one of these results
is *also* expressible with built-ins, and the docstrings say how); the
queries exist because §2.11 is part of the judged operator inventory
and because each mechanism's distributed contract — Arrow batch shape,
grouped shuffle, per-row pickling — deserves a tested reference use.

Determinism notes (why these hash-match despite Python in the loop):
- vectorized arithmetic in numpy/pandas performs the same IEEE-754
  operation sequence per element as the SQL expression it mirrors;
- grouped stats are computed over integral-valued doubles (l_quantity
  is 1..50), whose sums are exact in float64 in any order, so
  pandas' pairwise summation equals DuckDB's sequential sum.

Cost ranking at 100 TB (docstring of each query repeats this): plain
column expr < pandas_udf (Arrow batches, ~10-100× over row UDF) <
applyInPandas (adds a full shuffle) < row ``F.udf`` (per-row pickling —
never in a hot path; included here on the 150-row-per-sf customer dim).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ._util import t
from .registry import query


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized scalar ``pandas_udf``: per-row charge over Arrow
    batches.  numpy evaluates ext*(1-disc) then *(1+tax) — the same
    left-associated IEEE sequence as the SQL — so values are
    bit-identical.  (Production path for this particular expression is
    the plain column expr, which stays in codegen and never crosses
    Arrow; the UDF form is the template for math with no built-in.)"""

    @F.pandas_udf("double")
    def charge(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ext * (1.0 - disc) * (1.0 + tax)

    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           MAX(l_quantity) - MIN(l_quantity) AS qty_range
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark, sf_dir):
    """Grouped-aggregate ``pandas_udf`` (UDAF): per-group quantity
    range.  The UDAF receives each group's values as one pandas Series
    — no partial aggregation, so unlike built-in MAX/MIN the full
    column shuffles; at 100 TB prefer built-ins whenever one exists."""

    @F.pandas_udf("double")
    def qty_range(q: pd.Series) -> float:
        return float(q.max() - q.min())

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        qty_range("l_quantity").alias("qty_range")
    )


@query(
    "udf_grouped_map",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           l_quantity - AVG(l_quantity) OVER (PARTITION BY l_returnflag)
             AS qty_dev
    FROM lineitem
    """,
)
def udf_grouped_map(spark, sf_dir):
    """Grouped-map ``applyInPandas`` (UDTF-shaped): demean quantity
    within each return flag, whole group as one DataFrame in Python.
    l_quantity is integral so the group mean is exact and matches the
    window-AVG oracle bit-for-bit.  Scale contract: one shuffle on the
    group key and each GROUP must fit in one worker's memory — fine for
    bounded keys (3 flags), wrong for skewed/unbounded ones; the window
    function form is the production path."""

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["l_orderkey", "l_linenumber", "l_returnflag"]].copy()
        out["qty_dev"] = pdf["l_quantity"] - pdf["l_quantity"].mean()
        return out

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").applyInPandas(
        demean,
        "l_orderkey long, l_linenumber int, l_returnflag string, qty_dev double",
    )


@query(
    "udf_row_scalar",
    oracle="""
    SELECT c_custkey,
           c_mktsegment || ':' || CAST(LENGTH(c_name) AS VARCHAR) AS seg_label
    FROM customer
    """,
)
def udf_row_scalar(spark, sf_dir):
    """Row-at-a-time ``F.udf`` — the slow path (per-row serialization,
    no codegen, ~10-100× behind the pandas form).  Registered on the
    smallest dimension table only; any hot-path use should be a column
    expression (here: ``concat_ws`` + ``length``)."""

    @F.udf("string")
    def seg_label(seg: str, name: str) -> str:
        return f"{seg}:{len(name)}"

    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey", seg_label("c_mktsegment", "c_name").alias("seg_label")
    )


@query(
    "udf_table_function",
    oracle="""
    SELECT u.doc_id, u.pos, u.word
    FROM (
        SELECT doc_id,
               unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        FROM documents WHERE doc_id % 10 = 0
    ) u(doc_id, word, pos)
    """,
)
def udf_table_function(spark, sf_dir):
    """True Python UDTF (SURVEY.md §2.11, ``pyspark.sql.functions.udtf``
    — the 1-row→N-rows mechanism; completes the inventory next to the
    UDTF-shaped ``applyInPandas`` form in ``udf_grouped_map``): a
    lateral word tokenizer emitting (pos, word) per document, matched
    against DuckDB's zip-unnest with subscripts.

    Determinism: ``str.split(' ')`` and DuckDB ``string_split(_, ' ')``
    implement the same single-delimiter split (both keep empties on
    consecutive separators), NULL text yields zero rows on BOTH sides
    (``unnest`` of NULL emits nothing — the nullable-schema edge that
    ``scalar_array_explode`` also honors), and ``pos`` pins
    intra-document order so the hash cannot depend on row order.

    100 TB: a Python UDTF streams Arrow batches through one worker per
    partition like a pandas UDF but can expand rows; the built-in
    equivalent (``posexplode(split(...))``, used by
    ``scalar_array_explode``) stays fully codegen'd and is the
    production spelling — this entry exists to test the MECHANISM."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, word: string")
    class WordsWithPos:
        def eval(self, text: str):
            if text is None:
                return  # match SQL: splitting NULL emits no rows
            for i, w in enumerate(text.split(" ")):
                yield (i, w)

    spark.udtf.register("words_with_pos", WordsWithPos)
    docs = t(spark, sf_dir, "documents").filter("doc_id % 10 = 0")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, w.pos, w.word
        FROM _udtf_docs d, LATERAL words_with_pos(d.text) w
        """
    )
