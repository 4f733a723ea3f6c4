"""Registry mapping query names to Spark callables and DuckDB oracles."""

from __future__ import annotations

from collections.abc import Callable
from functools import wraps

from pyspark.sql import DataFrame, SparkSession

from ..cache import query_boundary
from ..session import configure

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the equivalent DuckDB SQL (column
    names must match exactly — the driver sorts columns by name and
    hashes values).  Omit ``oracle`` only for non-SQL-expressible ops."""

    def deco(fn: QueryFn) -> QueryFn:
        @wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The correctness driver hands us its own session; pin the
            # runtime-settable conf (UTC tz, AQE) it may not have set.
            configure(spark)
            # A DIFFERENT query starting means the previous query's
            # operator-internal persists and localCheckpoints have
            # served their materialization (sequential runs) — release
            # them so storage never accumulates across queries.
            # Same-name reps share their plan cache (see cache.py).
            query_boundary(spark, name)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco
