"""Parquet-backed testdata tables (the engine's canonical format).

The reference's scan path is catalog-name based (Glue crawler → catalog
table → ``create_dynamic_frame.from_catalog``, ``glue/glue_job.py:22-26``).
Here the canonical store is partition-prunable Parquet read straight into
DataFrames; :func:`register_views` provides the catalog-name access path
(``spark.table(name)``) the reference relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Column pruning + predicate pushdown reach
    the parquet reader because this stays a plain declarative scan.

    DataFrames are immutable logical plans, so the scan for a given
    (session, dir, table) is built once and reused — avoids repeated
    file-listing/footer reads when many queries touch the same table.
    The cache lives on the session object so it dies with the session
    (a global keyed by id() could alias a new session after restart).
    """
    cache = getattr(spark, "_etl_scan_cache", None)
    if cache is None:
        cache = {}
        spark._etl_scan_cache = cache
    key = (sf_dir, name)
    df = cache.get(key)
    if df is None:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df = _normalize_nanos(df)
        cache[key] = df
    return df


def _normalize_nanos(df: DataFrame) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) columns arrive as int64 nanos (the
    ``nanosAsLong`` escape hatch for Spark 4's PARQUET_TYPE_ILLEGAL);
    convert to µs-precision timestamps with integer division — a double
    round-trip would lose precision at 1.7e18 ns."""
    from pyspark.sql import functions as F

    out = df
    for field in df.schema.fields:
        md = field.metadata or {}
        if md.get("__is_nanos", False) or (
            field.name == "ts" and field.dataType.simpleString() == "bigint"
        ):
            out = out.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` DIV 1000")),
            )
    return out


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by join/agg
    keys — the co-located-join primitive for keys joined REPEATEDLY.

    Two tables bucketed on the same keys with the same bucket count
    sort-merge-join with ZERO exchange on either side (each task reads
    matching bucket files); a bucketed fact table likewise aggregates
    on the bucket key without a shuffle.  At 100 TB this converts the
    dominant recurring shuffle into a one-time write cost.  Bucket
    count rule of thumb: total size / bucket ≲ executor task memory;
    too few buckets caps parallelism, too many makes small files."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        # external table — bucketing metadata lives in the catalog, the
        # data wherever the caller puts it
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)
