"""Partition-scoped parquet upsert (merge-into for a plain lake).

Without a table format (Delta/Iceberg aren't in this container), an
upsert into parquet is a partition-level rewrite. This implements the
scale-sane version:

1. find the partitions the updates touch (distinct partition values
   of the update set — small);
2. read ONLY those partitions of the existing data (partition
   pruning keeps this proportional to touched data, not table size);
3. anti-join away rows being replaced, union the updates;
4. write with ``partitionOverwriteMode=dynamic`` so Spark replaces
   exactly the touched partitions and leaves the rest of the table's
   files untouched.

Cost at 100 TB: proportional to the touched partitions, never the
whole table. The merged frame is locally checkpointed before the
write because Spark refuses to overwrite a path it is concurrently
reading (the classic self-overwrite hazard); the checkpoint bounds
that materialization to the touched partitions too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def upsert_parquet(
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    partition_col: str | None = None,
) -> dict:
    """Merge ``updates`` into the parquet dataset at ``path`` by
    ``key_cols`` (update-or-insert). Returns {"touched_partitions",
    "rows_written"} for observability.

    With ``partition_col``, the dataset must be partitioned by it and
    only touched partitions are rewritten; without it, the whole
    dataset is rewritten (correct but full-cost — prefer partitioned
    tables for upsert workloads).
    """
    spark = updates.sparkSession
    import os

    exists = os.path.exists(path) and any(
        not e.startswith(("_", ".")) for e in os.listdir(path)
    )
    if not exists:
        w = updates.write.mode("overwrite")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(path)
        return {
            "touched_partitions": None,
            "rows_written": updates.count(),
        }

    existing = spark.read.parquet(path)
    touched = None
    if partition_col:
        touched = [
            r[0]
            for r in updates.select(partition_col).distinct().collect()
        ]
        # partition-pruned scan: only touched partitions are read
        existing = existing.where(F.col(partition_col).isin(touched))
    kept = existing.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    merged = kept.unionByName(updates.select(existing.columns))
    # break lineage from `path` before overwriting it; bounded by the
    # touched partitions thanks to the pruned scan above
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        w = merged.write.mode("overwrite")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "touched_partitions": touched,
        "rows_written": merged.count(),
    }
