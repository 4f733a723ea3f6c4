"""End-to-end reference pipeline replay (SURVEY.md §5): CSV with the
customers schema -> JSON intermediate -> typed warehouse table; batch
and streaming (file-arrival) variants."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import types as T

from etl_pulumi_aws_snowflake_spark import schemas
from etl_pulumi_aws_snowflake_spark.pipeline import run_reference_pipeline
from etl_pulumi_aws_snowflake_spark.streaming import stream_csv_to_warehouse

REFERENCE_CSV = "/root/reference/data/customers.csv"


@pytest.fixture()
def workdir(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


def test_batch_pipeline_replay(spark, workdir):
    result = run_reference_pipeline(spark, REFERENCE_CSV, workdir)
    assert result.rows == 847
    wh = spark.read.parquet(result.warehouse_path)
    assert wh.columns == [f.name for f in schemas.CUSTOMERS.fields]
    assert dict(wh.dtypes)["customerid"] == "bigint"
    assert dict(wh.dtypes)["namestyle"] == "boolean"
    assert dict(wh.dtypes)["modifieddate"] == "timestamp"
    # spot-check a typed value survived CSV -> JSON -> align -> parquet
    row = wh.filter("customerid = 1").collect()[0]
    assert row.firstname == "Orlando" and row.modifieddate.year == 2005


def test_streaming_pipeline_replay(spark, workdir):
    indir = f"{workdir}/landing"
    import os

    os.makedirs(indir)
    shutil.copy(REFERENCE_CSV, f"{indir}/batch1.csv")
    wh = f"{workdir}/warehouse"
    ckpt = f"{workdir}/ckpt"

    stream_csv_to_warehouse(
        spark, indir, schemas.CUSTOMERS_CSV, schemas.CUSTOMERS, wh, ckpt
    )
    assert spark.read.parquet(wh).count() == 847

    # second file arrives -> only the new file is processed (checkpointed
    # exactly-once, the crawler-idempotence semantics)
    shutil.copy(REFERENCE_CSV, f"{indir}/batch2.csv")
    stream_csv_to_warehouse(
        spark, indir, schemas.CUSTOMERS_CSV, schemas.CUSTOMERS, wh, ckpt
    )
    assert spark.read.parquet(wh).count() == 2 * 847

    # replay with same checkpoint and no new files -> no duplicates
    stream_csv_to_warehouse(
        spark, indir, schemas.CUSTOMERS_CSV, schemas.CUSTOMERS, wh, ckpt
    )
    assert spark.read.parquet(wh).count() == 2 * 847


def test_e2e_workdirs_are_process_scoped():
    """Two concurrent processes running the e2e registry queries over
    the same sf dir must not clobber each other's scratch dirs: the
    root is keyed by PID, and re-entering one leaf never touches a
    sibling leaf's content."""
    import os

    from etl_pulumi_aws_snowflake_spark.queries.pipeline_e2e import _workdir

    a = _workdir("/root/testdata/sf0.001", "batch")
    assert f"pid{os.getpid()}" in a

    b = _workdir("/root/testdata/sf0.001", "stream")
    marker = os.path.join(b, "marker.txt")
    with open(marker, "w") as f:
        f.write("x")
    # re-entering the batch leaf rmtree's ONLY its own subtree
    _workdir("/root/testdata/sf0.001", "batch")
    assert os.path.exists(marker)
    # a different process (different pid) would get a disjoint root
    assert a != b and os.path.dirname(a) == os.path.dirname(b)


def test_json_intermediate_is_lines(spark, workdir):
    result = run_reference_pipeline(spark, REFERENCE_CSV, workdir)
    js = spark.read.json(result.json_path)
    assert js.count() == 847


def test_warehouse_writer_seam(spark, workdir):
    """The WarehouseWriter protocol: the same aligned frame goes to (a)
    the default Parquet stand-in and (b) a ConnectorWarehouseWriter —
    here with a built-in format, in production a warehouse connector
    format — producing identical rows.  Proves the prod swap is one
    writer object, zero changes to align/cast semantics."""
    from etl_pulumi_aws_snowflake_spark.pipeline import (
        ConnectorWarehouseWriter,
        load_warehouse,
    )

    src = spark.read.option("header", True).csv(REFERENCE_CSV)

    pq_path = f"{workdir}/wh_parquet"
    load_warehouse(src, schemas.CUSTOMERS, pq_path, mode="overwrite")

    json_path = f"{workdir}/wh_connector"
    load_warehouse(
        src,
        schemas.CUSTOMERS,
        mode="overwrite",
        writer=ConnectorWarehouseWriter("json", {"path": json_path}),
    )

    a = spark.read.parquet(pq_path)
    b = spark.read.schema(a.schema).json(json_path)
    assert a.count() == b.count() == 847
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_warehouse_writer_contract_with_recording_fake(spark):
    """The seam contract, proven with a recording fake (VERDICT r12 #4
    — same discipline as the LocalFilesystem/CommitLogPointer seams):
    load_warehouse hands the writer an ALREADY-ALIGNED typed frame
    (by-name CI align + cast happen engine-side, never in the writer —
    the reference's MATCH_BY_COLUMN_NAME=CASE_INSENSITIVE semantics,
    modules/snowflake.py:150), passes the mode through verbatim, and
    touches no filesystem path when an explicit writer is given."""
    from etl_pulumi_aws_snowflake_spark.pipeline import load_warehouse

    class RecordingWriter:
        def __init__(self):
            self.calls = []

        def write(self, df, mode):
            self.calls.append((df, mode))

    # messy source: wrong column case, wrong order, string-typed ints
    src = spark.createDataFrame(
        [("9", "alice", "11"), ("8", "bob", "22")],
        "INDEX string, Customer_Id string, zip_code string",
    )
    target = T.StructType(
        [
            T.StructField("index", T.LongType()),
            T.StructField("customer_id", T.StringType()),
            T.StructField("zip_code", T.LongType()),
        ]
    )
    rec = RecordingWriter()
    load_warehouse(src, target, mode="append", writer=rec)
    assert len(rec.calls) == 1
    df, mode = rec.calls[0]
    assert mode == "append"
    # the writer saw the aligned+cast frame, not the raw source
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in target.fields
    ]
    rows = sorted(map(tuple, df.collect()))
    assert rows == [(8, "bob", 22), (9, "alice", 11)]
    # mode passthrough is verbatim, not normalized
    load_warehouse(src, target, mode="overwrite", writer=rec)
    assert rec.calls[-1][1] == "overwrite"
    # no writer and no path: loud error, not a silent default
    with pytest.raises(ValueError, match="path or an explicit writer"):
        load_warehouse(src, target)
