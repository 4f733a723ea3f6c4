"""The reference ELT pipeline replayed as one linear Spark program.

Reference shape (SURVEY.md §3): CSV lands in a data-lake bucket → S3
event → Lambda starts crawler + Glue job (``lambda/trigger_glue.py``) →
job rewrites CSV as JSON-lines (``glue/glue_job.py:22-32``) → Snowpipe
``COPY INTO`` loads the JSON by-name/case-insensitively into a typed
table (``modules/snowflake.py:145-156``).

Here the same dataflow is one SparkSession-linear program, which
structurally removes the reference's crawler race (the job could start
before the crawl finished — ``trigger_glue.py:31-37``'s wait loop is
unreachable on the happy path, SURVEY.md §3.1 step 3).  The streaming
variant in :mod:`.streaming` reproduces the event-driven trigger.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .operators import align
from .sources.csv import ingest_csv


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines overwrite sink — the Glue job's exact output contract
    (``glue/glue_job.py:32``: mode("overwrite"), format("json"))."""
    df.write.mode("overwrite").json(path)


def load_warehouse(
    df: DataFrame,
    target: T.StructType,
    path: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Typed warehouse load: by-name CI align + cast, then a columnar
    (Parquet) table write.

    Locally this is the stand-in for the Snowflake table; in production
    the aligned DataFrame would go through the spark-snowflake
    connector instead — the align/cast semantics are the part the
    engine owns (``modules/snowflake.py:150``).
    """
    writer = align(df, target).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


@dataclass
class PipelineResult:
    rows: int
    json_path: str
    warehouse_path: str


def run_reference_pipeline(
    spark: SparkSession,
    input_csv: str,
    workdir: str,
    source_schema: T.StructType | None = None,
    target_schema: T.StructType | None = None,
    infer: bool = True,
) -> PipelineResult:
    """Batch replay of the whole reference pipeline on local paths:
    ingest CSV (inferred, crawler-parity) → JSON-lines intermediate →
    by-name CI typed load."""
    from . import schemas

    target_schema = target_schema or schemas.CUSTOMERS
    df = ingest_csv(
        spark, input_csv, schema=source_schema, infer=infer and source_schema is None
    )
    json_path = f"{workdir}/output_json"
    write_json(df, json_path)
    # Load from the JSON intermediate (not the in-memory df) so the
    # warehouse sees exactly what the sink wrote, like Snowpipe does.
    loaded = spark.read.json(json_path)
    warehouse_path = f"{workdir}/warehouse/customers"
    load_warehouse(loaded, target_schema, warehouse_path, mode="overwrite")
    rows = spark.read.parquet(warehouse_path).count()
    return PipelineResult(rows=rows, json_path=json_path, warehouse_path=warehouse_path)
