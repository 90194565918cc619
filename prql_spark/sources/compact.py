"""Small-file compaction for parquet datasets.

The operational lever every long-lived lake needs: streaming sinks,
frequent upserts and over-parallel writers leave datasets as
thousands of KB-sized files, and at 100 TB that kills both the
driver (file listing, footer reads dominate planning) and the scan
(each file is at least one task; row-group-sized reads lose all
sequential-IO benefit). Compaction rewrites a dataset's files to a
target size without changing a single row.

Spark-first shape: sizes come from Hadoop's FileSystem API (so
s3:// / hdfs:// / file: all work), the rewrite is a plain
``coalesce`` — a NARROW repacking that moves no rows between
executors when shrinking the file count (``repartition`` would
shuffle the whole dataset to achieve the same file count) — and
partitioned datasets compact ONLY the partitions whose file layout
is actually bad, through the same dynamic-overwrite pattern
upsert_parquet uses (untouched partitions are never read or
rewritten).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from prql_spark.sources.upsert import _dataset_exists


def _leaf_files(fs, jvm, p) -> list:
    """All data-file statuses under ``p`` (recursive; skips _ and .
    metadata entries the way Spark's own listing does)."""
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append(st)
    return out


def dataset_layout(spark: SparkSession, path: str) -> dict:
    """File-layout stats for the dataset at ``path``: n_files,
    total_bytes, avg_file_bytes — the numbers that decide whether a
    compaction is worth a rewrite. One driver-side FS listing, no
    Spark job."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    files = _leaf_files(fs, jvm, p)
    total = sum(st.getLen() for st in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "avg_file_bytes": total // len(files) if files else 0,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 256,
    partition_col: str | None = None,
    min_files: int = 2,
) -> dict:
    """Rewrite the parquet dataset at ``path`` into
    ``ceil(total_bytes / target_mb)`` files (at least one), leaving
    every row byte-identical. No-op (returns ``{"compacted":
    False}``) when the dataset already has fewer than ``min_files``
    files or already meets the target count — an idempotent
    maintenance job can run on a schedule without rewriting healthy
    datasets.

    With ``partition_col`` the dataset must be hive-partitioned by
    it; each partition directory is assessed independently and ONLY
    partitions with too many files are rewritten (pruned scan +
    dynamic partition overwrite — the same isolation contract as
    ``upsert_parquet``). At 100 TB this is the only viable shape:
    yesterday's streaming partitions compact while the other 10k
    partitions are untouched.

    The rewrite itself is ``coalesce`` (narrow — no shuffle: tasks
    concatenate input splits instead of re-hashing rows) through an
    eager localCheckpoint that breaks lineage from ``path`` before
    the overwrite, so the job never reads a file it is deleting.
    """
    if not _dataset_exists(spark, path):
        raise ValueError(f"compact_parquet: no dataset at {path!r}")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    target = target_mb * 1024 * 1024

    def n_out(total_bytes: int) -> int:
        return max(1, math.ceil(total_bytes / target))

    if partition_col is None:
        stats = dataset_layout(spark, path)
        want = n_out(stats["total_bytes"])
        if stats["n_files"] < min_files or stats["n_files"] <= want:
            return {"compacted": False, **stats}
        df = spark.read.parquet(path).coalesce(want)
        df = df.localCheckpoint(eager=True)
        df.write.mode("overwrite").parquet(path)
        return {
            "compacted": True,
            "n_files_before": stats["n_files"],
            "n_files_after": want,
            "total_bytes": stats["total_bytes"],
        }

    # partitioned: assess each partition directory independently
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    todo: list[tuple[str, int]] = []  # (partition value, n files)
    before = 0
    prefix = f"{partition_col}="
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        files = _leaf_files(fs, jvm, st.getPath())
        want = n_out(sum(f.getLen() for f in files))
        if len(files) >= min_files and len(files) > want:
            todo.append((name[len(prefix):], want))
            before += len(files)
    if not todo:
        return {"compacted": False, "partitions": 0}
    vals = [v for v, _ in todo]
    # one pruned scan of the bad partitions. A bare coalesce(N)
    # would let EVERY partition value appear in every task (up to N
    # files per partition — potentially no improvement), so rows
    # are re-hashed on (partition value, salt) where the salt range
    # is that partition's target file count: each value lands in
    # exactly `want` tasks → exactly `want` output files. The
    # shuffle only moves the bad partitions' rows — the cost model
    # a 10k-partition lake needs. The when-chain keeps partition
    # values out of SQL text (directory names are user data).
    total_want = sum(w for _, w in todo)
    want_col = F.lit(1)
    for v, w in todo:
        want_col = F.when(
            F.col(partition_col).cast("string") == v, F.lit(w)
        ).otherwise(want_col)
    df = (
        spark.read.parquet(path)
        .where(F.col(partition_col).cast("string").isin(vals))
        .withColumn(
            "__salt",
            F.pmod(F.hash(F.monotonically_increasing_id()), want_col),
        )
        .repartition(total_want, F.col(partition_col), F.col("__salt"))
        .drop("__salt")
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    try:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        df.write.mode("overwrite").partitionBy(partition_col).parquet(
            path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "compacted": True,
        "partitions": len(todo),
        "n_files_before": before,
        "n_files_after": total_want,
    }
