"""Source/sink helpers (SURVEY §2 #24).

Readers return lazy scans so Catalyst pushes filters/projections into
the source. Writers expose the two layout levers that matter at
100 TB: partitionBy (directory pruning for predicate-aligned reads)
and bucketBy (pre-shuffled layout so later joins/aggs on the bucket
key skip their exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    schema=None,
    **options,
) -> DataFrame:
    r = spark.read.options(header=header, **options)
    if schema is not None:
        r = r.schema(schema)  # explicit schema: no inference scan
    elif infer_schema:
        r = r.option("inferSchema", True)
    return r.csv(path)


def read_json(
    spark: SparkSession, path: str, schema=None, **options
) -> DataFrame:
    """JSON / JSONL reader (Spark's json source is line-delimited by
    default; pass multiLine=True for document-per-file)."""
    r = spark.read.options(**options)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
):
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    partition_by: list[str] | None = None,
):
    w = df.write.mode(mode).option("header", header)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
):
    """Persist as a bucketed managed table: joins/aggregations on
    bucket_cols against another table bucketed the same way run
    shuffle-free (Spark reuses the on-disk hash layout)."""
    w = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .format("parquet")
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (vectorized + filter pushdown, like parquet)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
):
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
):
    """JSONL sink (Spark's json source IS line-delimited) — the
    interchange format training pipelines consume. Optional zstd/gzip
    per-file compression."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-file ingestion for multimodal corpora: Spark's built-in
    ``binaryFile`` source yields (path, modificationTime, length,
    content binary) — the schema
    :mod:`prql_spark.operators.multimodal` consumes. Files are read
    ON THE EXECUTORS (the driver only lists paths), so a 100 TB image
    dump parallelizes by file; ``glob`` filters server-side via
    pathGlobFilter (never listed, never opened) and ``max_bytes``
    prunes oversized payloads by the LENGTH metadata column — before
    any content is read when the source can push it down.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    if max_bytes is not None:
        df = df.where(f"length <= {int(max_bytes)}")
    return df


def read_text_files(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """Raw-text ingestion: one row per line (default) or per file
    (``whole_file`` — document-per-file corpora). Adds ``doc_path``
    via the metadata column so downstream ops get a stable doc key
    without a second listing."""
    from pyspark.sql import functions as F

    r = spark.read
    if line_sep:
        r = r.option("lineSep", line_sep)
    df = r.text(path, wholetext=whole_file)
    return df.select(
        F.col("_metadata.file_path").alias("doc_path"),
        F.col("value").alias("text"),
    )
