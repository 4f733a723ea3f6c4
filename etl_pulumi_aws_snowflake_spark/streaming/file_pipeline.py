"""Event-driven ingestion as Structured Streaming.

The reference's trigger chain — S3 ``ObjectCreated:*`` + ``.csv`` suffix
filter → Lambda → crawler/job (``/root/reference/__main__.py:61-72``,
``lambda/trigger_glue.py``) → Snowpipe auto-ingest
(``modules/snowflake.py:158-178``) — is exactly Spark's streaming file
source contract:

- new-file detection        → ``readStream`` file source
- ``.csv`` suffix filter    → ``pathGlobFilter="*.csv"``
- crawler idempotence guard → checkpointed exactly-once file tracking
  (``trigger_glue.py:19-23``'s don't-start-if-RUNNING check, subsumed)
- "process what landed, then stop" → ``Trigger.AvailableNow``
- Snowpipe by-name CI load  → ``foreachBatch`` + :func:`..operators.align`

At scale the same program runs continuously (drop ``availableNow``) with
thousands of arriving files; checkpointing makes restarts exactly-once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..operators import align


def stream_csv_to_warehouse(
    spark: SparkSession,
    input_dir: str,
    source_schema: T.StructType,
    target_schema: T.StructType,
    warehouse_path: str,
    checkpoint: str,
    await_termination: bool = True,
):
    """Watch ``input_dir`` for new CSVs; load each batch by-name/CI into
    the typed warehouse table. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("header", True)
        .option("pathGlobFilter", "*.csv")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(input_dir)
    )

    def load_batch(batch_df, _epoch_id: int) -> None:
        align(batch_df, target_schema).write.mode("append").parquet(warehouse_path)

    query = (
        stream.writeStream.foreachBatch(load_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query
