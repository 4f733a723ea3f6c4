"""Local mirror of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, then compares row count, sorted column names/types, and an
order-insensitive value hash (rows sorted by their full string repr,
columns sorted by name) — the same signal CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(rows: list[tuple], cols: list[str]) -> list[str]:
    """Mirror the DRIVER's canonicalization, not a laxer one: build a
    pandas frame, ``sort_values`` over all (name-sorted) columns, then
    stringify per-column via ``astype(str)``.  Dtype class survives —
    a float64 SUM renders "123.0" even when Spark's BIGINT says "123"
    (the r02 HUGEINT reds), while an all-midnight datetime64 column
    renders date-only, matching Spark's ``datetime.date`` objects (why
    ``scalar_datetime`` is driver-green).  ``sort_values`` on the RAW
    frame intentionally RAISES ``TypeError: unhashable type`` when a
    query emits array/map/struct cells — exactly as the external gate
    does (CORRECTNESS_r01 ``scalar_map``) — so the failure class is
    caught by pytest instead of first appearing in the driver run."""
    import pandas as pd

    if not rows:
        return []
    order = sorted(cols)
    df = pd.DataFrame(rows, columns=cols)[order].sort_values(by=order)
    return ["|".join(r) for r in df.astype(str).itertuples(index=False, name=None)]


def compare(spark, sf_dir: str, fn, sql: str) -> dict:
    sdf = fn(spark, sf_dir)
    # Spark side ALSO goes through pandas (driver-faithful): a nullable
    # int64 column becomes float64 on both engines symmetrically instead
    # of collect()'s Python ints on one side only.
    pdf = sdf.toPandas()
    spark_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    spark_cols = list(pdf.columns)

    con = duckdb_con(sf_dir)
    # Fetch via pandas (.df()), NOT fetchall(): the driver canonicalizes
    # through pandas, where DuckDB HUGEINT becomes float64 ("123.0") while
    # fetchall() yields Python ints ("123") and masks the divergence —
    # the exact class behind the r01 scalar_map and r02 q12/sql_api_window/
    # agg_salted_groupby/corpus_split reds.
    res = con.execute(sql)
    ddf = res.df()
    duck_cols = list(ddf.columns)
    duck_rows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]
    con.close()

    result = {
        "rows_match": len(spark_rows) == len(duck_rows),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
    }
    if result["rows_match"] and result["cols_match"]:
        s = _canon(spark_rows, spark_cols)
        d = _canon(duck_rows, duck_cols)
        result["values_match"] = s == d
        if not result["values_match"]:
            diff = [(a, b) for a, b in zip(s, d) if a != b]
            result["first_diffs"] = diff[:3]
    else:
        result["values_match"] = False
    result["ok"] = result["rows_match"] and result["cols_match"] and result["values_match"]
    return result
