"""Skew mitigation helpers (SURVEY.md §7 scale posture).

AQE's skew-join splitting (on in this engine's session defaults) is the
first line of defense — it splits oversized SHUFFLE partitions at
runtime.  These helpers cover the two cases AQE cannot fix:

- ``salted_join``: a hot build-side key whose matching rows exceed one
  task even after splitting, or a broadcast-too-big dimension with hot
  keys.  The probe side gets a deterministic per-row salt in
  ``[0, n)``; the build side is replicated n× (one copy per salt), and
  the join key becomes (key, salt) — a single hot key now lands on n
  tasks.  Cost: build side shuffles n× its size, so pick the smallest
  n that drains the hot key (8-32 in practice at 1000 executors).
- ``salted_groupby``: aggregation where one group dominates (the
  classic null-key / default-value pile-up).  Two-stage: partial agg on
  (keys, salt), final agg on keys.  Works for any algebraic aggregate
  (sum/count/min/max); for avg carry (sum, count) and divide at the
  end.

Salts are ``pmod(xxhash64(<row id cols>), n)`` — deterministic, so task
retries and speculative execution see stable assignments (a rand() salt
would break exactly-once sinks on retry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, n: int, id_cols: list[str] | None = None, col_name: str = "_salt"
) -> DataFrame:
    """Deterministic row salt in [0, n) from ``id_cols`` (default: all
    columns).  The salt must DISTINGUISH rows that share a hot key, so
    the columns hashed must vary within a key — a row id is ideal;
    hashing only the group key would put the whole hot key in one salt
    and change nothing."""
    id_cols = id_cols or df.columns
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(n))
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    n: int = 16,
    probe_id_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the build side replicated across ``n`` salts.

    ``probe_id_cols`` defaults to all probe columns; pass the probe's
    row-unique key columns when hashing every column is too wide.

    Only probe-side-preserving join types are accepted: replicating the
    build side n× means an UNMATCHED build row would survive once per
    salt under 'right'/'full', returning n duplicates — so those modes
    are rejected rather than silently wrong.
    """
    safe = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
            "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join supports probe-preserving joins {sorted(safe)}; "
            f"got how={how!r} (unmatched build rows would duplicate n×)"
        )
    salted_probe = with_salt(probe, n, probe_id_cols)
    replicated = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)).cast("array<bigint>"))
    )
    joined = salted_probe.join(replicated, on=[*on, "_salt"], how=how)
    return joined.drop("_salt")


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    finals: dict[str, Column],
    n: int = 16,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation over a salt: ``aggs`` are the partial
    per-(keys, salt) aggregates, ``finals`` combine the partials per
    keys (referencing the partial alias names).

    Example — skew-proof sum + count::

        salted_groupby(
            events, ["user_id"],
            aggs={"s": F.sum("value"), "c": F.count(F.lit(1))},
            finals={"total": F.sum("s"), "n": F.sum("c")},
        )
    """
    partial = (
        with_salt(df, n, id_cols)
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(a) for a, c in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(a) for a, c in finals.items()]
    )
