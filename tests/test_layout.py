"""`functions/layout.py` — the measured curve-choice decision rule as
API (VERDICT r08 #3).  The dispatch must match SCALE.md's measured
table exactly: Hilbert for 2-D box probes, Morton for leading-dimension
bands, cheap-encode requests, and 3+ dimensions; and the emitted key
values must be bit-identical to composing bucket() + the underlying
curve by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pulumi_aws_snowflake_spark.functions import zorder as Z
from etl_pulumi_aws_snowflake_spark.functions.hilbert import hilbert_key
from etl_pulumi_aws_snowflake_spark.functions.layout import cluster_key

DIMS = [("x", 0, 1000), ("y", 0, 5000)]


def _grid(spark):
    return spark.range(0, 400).select(
        ((F.col("id") * 37) % 1100 - 50).alias("x"),
        ((F.col("id") * 101) % 5500 - 250).alias("y"),
        ((F.col("id") * 13) % 900).alias("z"),
    )


def _vals(df, col):
    return [r["k"] for r in df.select(col.alias("k")).collect()]


def test_box_2d_dispatches_to_hilbert(spark):
    df = _grid(spark)
    got = _vals(df, cluster_key(DIMS, bits=6, probe_shape="box"))
    bx = Z.bucket("x", 0, 1000, 6)
    by = Z.bucket("y", 0, 5000, 6)
    want = _vals(df, F.expr(hilbert_key(bx, by, bits=6).spark))
    assert got == want


@pytest.mark.parametrize("shape", ["leading_band", "cheap_encode"])
def test_band_and_cheap_encode_dispatch_to_morton(spark, shape):
    df = _grid(spark)
    got = _vals(df, cluster_key(DIMS, bits=6, probe_shape=shape))
    bx = Z.bucket("x", 0, 1000, 6)
    by = Z.bucket("y", 0, 5000, 6)
    want = _vals(df, F.expr(Z.zorder_key([bx, by], bits=6).spark))
    assert got == want


def test_3d_box_falls_back_to_morton(spark):
    df = _grid(spark)
    dims3 = DIMS + [("z", 0, 900)]
    got = _vals(df, cluster_key(dims3, bits=5, probe_shape="box"))
    bs = [Z.bucket(c, lo, hi, 5) for c, lo, hi in dims3]
    want = _vals(df, F.expr(Z.zorder_key(bs, bits=5).spark))
    assert got == want


def test_cheap_encode_stays_a_pure_sql_expression(spark):
    """The cheap_encode contract is 'no Python worker': the returned
    Column must be a plain expression (usable in F.expr contexts /
    oracle SQL), i.e. its plan contains no BatchEvalPython/ArrowEval
    node, while the box path IS the Arrow-vectorized UDF."""
    df = _grid(spark)
    cheap = df.select(
        cluster_key(DIMS, bits=6, probe_shape="cheap_encode").alias("k")
    )
    box = df.select(cluster_key(DIMS, bits=6, probe_shape="box").alias("k"))
    assert "Python" not in cheap._jdf.queryExecution().executedPlan().toString()
    assert "Python" in box._jdf.queryExecution().executedPlan().toString()


def test_invalid_inputs_fail_loudly():
    with pytest.raises(ValueError, match="probe_shape"):
        cluster_key(DIMS, probe_shape="sphere")
    with pytest.raises(ValueError, match=">= 2 dimensions"):
        cluster_key([("x", 0, 1000)])
