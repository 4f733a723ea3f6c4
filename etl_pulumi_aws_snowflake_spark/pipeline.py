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

from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .operators import align
from .sources.csv import ingest_csv


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines overwrite sink — the Glue job's exact output contract
    (``glue/glue_job.py:32``: mode("overwrite"), format("json"))."""
    df.write.mode("overwrite").json(path)


class WarehouseWriter(Protocol):
    """The narrow seam between the engine-owned load semantics (by-name
    CI align + cast — ``operators/align.py``) and the physical table
    sink.  The reference's Snowpipe ``COPY INTO``
    (``modules/snowflake.py:145-156``) is one implementation of this
    seam; locally it's a Parquet directory.  Swapping to a real
    warehouse is exactly one :class:`ConnectorWarehouseWriter` — the
    align/cast stays byte-identical."""

    def write(self, df: DataFrame, mode: str) -> None: ...


@dataclass
class ParquetWarehouseWriter:
    """Local/lake table sink (the sandbox stand-in for the warehouse)."""

    path: str
    partition_by: tuple[str, ...] = ()

    def write(self, df: DataFrame, mode: str) -> None:
        writer = df.write.mode(mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)


@dataclass
class ConnectorWarehouseWriter:
    """Generic DataSource connector sink: ``format(fmt)`` + options.

    In production ``fmt`` is a warehouse connector format (e.g. the
    spark-snowflake connector's source name with its table/account
    options, or ``jdbc`` with url/dbtable) — none of those jars exist
    in this sandbox, so tests exercise the seam with a built-in format;
    the code path is identical either way."""

    fmt: str
    options: dict[str, str] = field(default_factory=dict)

    def write(self, df: DataFrame, mode: str) -> None:
        df.write.format(self.fmt).options(**self.options).mode(mode).save()


def load_warehouse(
    df: DataFrame,
    target: T.StructType,
    path: str | None = None,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
    writer: WarehouseWriter | None = None,
) -> None:
    """Typed warehouse load: by-name CI align + cast (the engine-owned
    semantics, ``modules/snowflake.py:150``), then hand the ALIGNED
    frame to the :class:`WarehouseWriter` seam — default a Parquet
    table at ``path``."""
    if writer is None:
        if path is None:
            raise ValueError("load_warehouse needs a path or an explicit writer")
        writer = ParquetWarehouseWriter(path, partition_by)
    writer.write(align(df, target), mode)


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
