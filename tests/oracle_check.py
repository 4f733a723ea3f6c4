"""Local mirror of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, then compares row count, sorted column names/types, and an
order-insensitive value hash (rows sorted by their full string repr,
columns sorted by name) — the same signal CORRECTNESS_r{N}.json records.
"""

from __future__ import annotations

import math
from typing import Any

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


def _norm(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _canon(rows: list[tuple], cols: list[str]) -> list[str]:
    """Mirror the DRIVER's canonicalization, not a laxer one: build a
    pandas frame and ``sort_values`` over all (name-sorted) columns.
    This intentionally RAISES ``TypeError: unhashable type`` when a
    query emits array/map/struct cells — exactly as the external gate
    does (CORRECTNESS_r01 ``scalar_map``) — so the failure class is
    caught by pytest instead of first appearing in the driver run."""
    import pandas as pd

    order = sorted(cols)
    idx = list(range(len(rows)))
    if rows:
        df = pd.DataFrame(rows, columns=cols)[order]
        idx = list(df.sort_values(by=order).index)
    pos = {c: i for i, c in enumerate(cols)}
    return ["|".join(_norm(rows[i][pos[c]]) for c in order) for i in idx]


def compare(spark, sf_dir: str, fn, sql: str) -> dict:
    sdf = fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = duckdb_con(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
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
