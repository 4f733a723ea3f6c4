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
    persist_table: bool = False,
    glob: str = "*.csv",
) -> DataFrame:
    """Read a CSV directory/file; optionally register in the catalog.

    ``glob`` mirrors the reference's S3-notification suffix filter
    (``__main__.py:68`` filters ``.csv``) at the scan level.

    ``register_as`` alone registers a session-scoped temp view;
    ``persist_table=True`` instead writes a PERSISTENT catalog table
    (``saveAsTable``, parquet in the warehouse dir) — full parity with
    the reference's crawler, whose Glue catalog table
    (``modules/glue.py:87-98``) outlives the writing job and is read by
    name from a different process (``glue/glue_job.py:22-26``).  A
    fresh session over the same warehouse/metastore sees the table by
    qualified name with the ingested schema.
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
        if persist_table:
            # Crawler → persistent catalog table (not a temp view): the
            # registration survives the session, like a Glue table.
            df.write.mode("overwrite").format("parquet").saveAsTable(register_as)
            return spark.table(register_as)
        df.createOrReplaceTempView(register_as)
    return df
