"""Arrow-backed local relations for small driver-side tables.

``spark.createDataFrame(list_of_rows, schema)`` compiles to
``applySchemaToPythonRDD`` — a pickled Python RDD whose plan node is
``Scan ExistingRDD``.  EVERY execution of a plan containing that node
round-trips through Python workers: measured ~0.5 s per action for a
40-row frame on this host (scripts/ab_ivf_seed_frame.py — the r18
``sim_ivf_topk`` serve regression, VERDICT r18 #1, was exactly this
cost).  The pandas/Arrow construction path instead lands a pure JVM
``LocalTableScan`` (~0.06 s per action for the same frame): no Python
at execution, broadcast-able without a job, constant-foldable.

:func:`local_frame` is the shared spelling for every operator-internal
small table (seed rows, prefix-sum bases, query-term routing rows,
codebooks, metas).  Rows are transposed into object-dtype pandas
columns so ``None`` survives as null and int64 values stay exact
(a value-typed pandas column would coerce ints with nulls to float).
Arrow conversion failures fall back to Spark's own non-Arrow pandas
path (Spark warns), which still yields a LocalTableScan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def local_frame(spark, rows: Sequence, schema) -> DataFrame:
    """A LocalTableScan-backed DataFrame from driver-side ``rows``
    (sequence of tuples/lists, column order matching ``schema`` — a
    DDL string or a ``StructType``).

    Intended for SMALL tables (the callers' collects are all bounded —
    seed tables by MAX_CLOSURE_SEEDS, bases by the partition count,
    terms by the query): the whole relation lives in the plan/driver.
    An EMPTY ``rows`` is also worth routing here: an empty
    LocalTableScan lets Catalyst prune the branch statically
    (PropagateEmptyRelation), which an RDD-backed scan of unknown
    emptiness never can.
    """
    import pandas as pd

    if not len(rows):
        # Spark's Arrow conversion skips EMPTY pandas frames (falling
        # back to the RDD path), so build the empty relation through
        # the JVM list API: a true empty LocalRelation with the EXACT
        # target schema (names, types, nullability — ``.to`` would
        # reject nullable→non-nullable), statically prunable by
        # PropagateEmptyRelation.  Any py4j surprise falls back to the
        # classic (RDD-backed) spelling, which is merely slower.
        from pyspark.sql import types as T

        dt = (
            T._parse_datatype_string(schema)
            if isinstance(schema, str)
            else schema
        )
        try:
            jvm = spark._jvm
            jschema = jvm.org.apache.spark.sql.types.DataType.fromJson(
                dt.json()
            )
            jdf = spark._jsparkSession.createDataFrame(
                jvm.java.util.ArrayList(), jschema
            )
            return DataFrame(jdf, spark)
        except Exception:
            return spark.createDataFrame([], dt)

    if isinstance(schema, str):
        names = [f.split()[0] for f in _split_fields(schema)]
    else:
        names = list(schema.names)
    data = {
        name: pd.Series([r[i] for r in rows], dtype=object)
        for i, name in enumerate(names)
    }
    pdf = pd.DataFrame(data, columns=names)
    return spark.createDataFrame(pdf, schema)


def _split_fields(schema: str) -> list[str]:
    """Split a DDL schema string on TOP-LEVEL commas only (nested
    ``array<...>`` / ``struct<...>`` / ``decimal(...)`` commas stay
    put)."""
    fields: list[str] = []
    depth = 0
    cur = []
    for ch in schema:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        fields.append(tail)
    return fields
