"""Shared helpers for oracle-matched queries.

Floating-point aggregation order differs between Spark (parallel partial
aggs) and DuckDB, so raw ``SUM(double)`` is not hash-stable, and
double→decimal casts round ties differently between the engines.  The
testdata's money-like doubles are exact to 2 decimals (verified: max
deviation of ``x*100`` from an integer is ~1e-9), so the policy is exact
integer scaling: ``CAST(ROUND(x * scale) AS BIGINT)``, integer-exact sum,
then ONE double division by the scale at the end.  Both engines produce
bit-identical doubles.  SQL builders mirror each Spark helper exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..sources import load_table

t = load_table  # short alias: t(spark, sf_dir, "lineitem")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ints(col: Column | str, scale: int = 100) -> Column:
    """Scaled-integer view of a k-decimal double column (exact).

    SQL mirror: ``CAST(ROUND((x) * scale) AS BIGINT)`` (scale=1 → no mul).
    Implemented as ``cast(x*scale + 0.5 as long)`` — value-identical to
    ROUND-half-up for the NON-NEGATIVE money/quantity columns it is used
    on (cast truncates toward zero), but stays a two-op codegen
    expression instead of Spark's BigDecimal-backed ``round`` (measured
    ~30% of TPC-H Q1's runtime before the switch).  Do not use on
    columns that can go negative.
    """
    c = _c(col)
    if scale != 1:
        c = c * F.lit(scale)
    return (c + F.lit(0.5)).cast("long")


def scaled_sum(int_col: Column, alias: str, scale: int) -> Column:
    """Exact integer sum → one double division by the total scale.

    SQL mirror: ``CAST(SUM(i) AS DOUBLE) / CAST(scale AS DOUBLE)``.
    """
    return (F.sum(int_col).cast("double") / F.lit(float(scale))).alias(alias)


def scaled_avg(int_col: Column, alias: str, scale: int) -> Column:
    """Exact integer sum → double / scale / COUNT(*).

    SQL mirror:
    ``CAST(SUM(i) AS DOUBLE) / CAST(scale AS DOUBLE) / COUNT(*)``.
    """
    return (
        F.sum(int_col).cast("double") / F.lit(float(scale)) / F.count(F.lit(1))
    ).alias(alias)


# --- SQL mirrors ----------------------------------------------------------


def sql_ints(expr: str, scale: int = 100) -> str:
    mul = f"({expr}) * {scale}" if scale != 1 else f"({expr})"
    return f"CAST(ROUND({mul}) AS BIGINT)"


def sql_scaled_sum(int_expr: str, alias: str, scale: int) -> str:
    return f"CAST(SUM({int_expr}) AS DOUBLE) / CAST({scale} AS DOUBLE) AS {alias}"


def sql_scaled_avg(int_expr: str, alias: str, scale: int) -> str:
    return (
        f"CAST(SUM({int_expr}) AS DOUBLE) / CAST({scale} AS DOUBLE)"
        f" / COUNT(*) AS {alias}"
    )


# Convenience one-liners for plain k-decimal columns.


def dsum(col: Column | str, alias: str, scale: int = 100) -> Column:
    return scaled_sum(ints(col, scale), alias, scale)


def davg(col: Column | str, alias: str, scale: int = 100) -> Column:
    return scaled_avg(ints(col, scale), alias, scale)


def sql_dsum(expr: str, alias: str, scale: int = 100) -> str:
    return sql_scaled_sum(sql_ints(expr, scale), alias, scale)


def sql_davg(expr: str, alias: str, scale: int = 100) -> str:
    return sql_scaled_avg(sql_ints(expr, scale), alias, scale)
