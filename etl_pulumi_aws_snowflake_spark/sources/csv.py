"""CSV ingestion (the reference's landing format).

The reference's crawler infers CSV schema and registers a catalog table
(``/root/reference/modules/glue.py:87-98``); the Glue job then reads it
by name (``glue/glue_job.py:22-26``).  Here ingestion is one declarative
read: explicit schema by default (deterministic at 100 TB — inference
reads the data twice and can flip types between loads), inference kept
as an option for crawler parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def ingest_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
    register_as: str | None = None,
    glob: str = "*.csv",
) -> DataFrame:
    """Read a CSV directory/file; optionally register as a catalog view.

    ``glob`` mirrors the reference's S3-notification suffix filter
    (``__main__.py:68`` filters ``.csv``) at the scan level.
    """
    reader = (
        spark.read.option("header", True)
        .option("pathGlobFilter", glob)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if register_as:
        # Catalog registration stands in for crawler → Glue catalog table.
        df.createOrReplaceTempView(register_as)
    return df
