"""Measured curve choice for multi-dimension layout maintenance, as
API (VERDICT r08 #3): SCALE.md's Hilbert-vs-Morton row-group pruning
measurement ends in a decision rule that callers previously had to
rediscover by reading docs.  :func:`cluster_key` encodes it.

The dispatch is pinned to the measured table (SCALE.md "Hilbert vs
Morton row-group pruning", reproduced by ``scripts/hilbert_vs_morton.py``
through the engine's own ``snapshot_compact(cluster_by=…)`` →
``skip_by`` → parquet-footer path):

- ``probe_shape="box"`` (range predicates on BOTH dimensions — the
  default and dominant case): **Hilbert**, which touched as-few-or-fewer
  row groups on every measured square probe (6 vs 12 at 3% selectivity,
  20 vs 35 at 25%, 64 KB groups) and dominated the non-leading band
  (25 vs 45).  2-D only — with 3+ dimensions this falls back to Morton,
  which generalizes (``functions/hilbert.py`` is deliberately 2-D).
- ``probe_shape="leading_band"`` (probes are narrow bands in dimension
  0): **Morton** — its measured best case; a leading-dimension band is
  nearly contiguous under Morton and Hilbert only matched it to ≤1
  group.
- ``probe_shape="cheap_encode"`` (the key must stay a pure codegen SQL
  expression — e.g. computed at read/ingest time, or needed in the
  DuckDB oracle dialect): **Morton** — ``zorder_key`` is plain
  arithmetic both engines fold; the Hilbert scale path is an
  Arrow-vectorized pandas UDF (Python workers on the maintenance pass
  only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import zorder as Z
from .hilbert import hilbert_key_pandas

PROBE_SHAPES = ("box", "leading_band", "cheap_encode")


def cluster_key(
    dims: list[tuple[str, int, int]],
    *,
    bits: int = 8,
    probe_shape: str = "box",
) -> Column:
    """The space-filling-curve key for ``cluster_by`` layout
    maintenance, chosen by the measured decision rule above.

    ``dims`` is ``[(col, lo, hi), ...]`` — each dimension's column
    (integer expression) and value bounds, quantized onto a
    ``2^bits``-cell grid by :func:`.zorder.bucket` (outliers clamp to
    the edge cells).  Returns a pyspark ``Column`` to pass directly::

        from etl_pulumi_aws_snowflake_spark.functions.layout import cluster_key
        snapshot_compact(
            spark, root,
            cluster_by=[cluster_key([("user_id", 0, 10_000),
                                     ("event_id", 0, 1_000_000)])],
        )

    Key values are identical to composing ``bucket`` + the underlying
    curve by hand (pinned in tests/test_layout.py); this helper only
    removes the which-curve decision from the caller."""
    if probe_shape not in PROBE_SHAPES:
        raise ValueError(
            f"probe_shape must be one of {PROBE_SHAPES}, got {probe_shape!r}"
        )
    if len(dims) < 2:
        raise ValueError(
            "cluster_key needs >= 2 dimensions; 1-D layout wants no "
            "curve — pass the column itself to cluster_by (sorted files "
            "are already monotone in it)"
        )
    buckets = [Z.bucket(col, lo, hi, bits) for col, lo, hi in dims]
    if probe_shape == "box" and len(dims) == 2:
        return hilbert_key_pandas(
            F.expr(buckets[0].spark), F.expr(buckets[1].spark), bits=bits
        )
    return F.expr(Z.zorder_key(buckets, bits=bits).spark)
