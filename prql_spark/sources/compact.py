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
is actually bad (pruned scan, per-partition directory swap:
untouched partitions are never read or rewritten).

Durability contract: the rewrite lands in a TEMP SIBLING directory
first and is swapped into place with renames, so a complete copy of
the data exists on durable storage at every instant — a failed job
leaves either the original or (transiently) an orphan
``__compact_tmp__`` / ``__compact_bak__`` directory to clean up,
never a dataset whose only copy was executor memory.
"""

from __future__ import annotations

import math
from urllib.parse import unquote

from pyspark.sql import SparkSession, functions as F

from prql_spark.sources.upsert import _dataset_exists

# Spark/Hive's directory name for a NULL partition value
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _leaf_files(fs, jvm, p) -> list:
    """All data-file statuses under ``p``, skipping hidden entries
    the way Spark's InMemoryFileIndex does: ANY path component below
    ``p`` starting with ``_`` or ``.`` hides the file — so an
    in-flight writer's ``_temporary/.../part-*.parquet`` never
    inflates layout stats or triggers a compaction."""
    root = p.toUri().getPath().rstrip("/")
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        rel = st.getPath().toUri().getPath()[len(root):].lstrip("/")
        if any(c.startswith(("_", ".")) for c in rel.split("/")):
            continue
        out.append(st)
    return out


def _swap_dirs(fs, jvm, src: str, dst: str) -> None:
    """Replace directory ``dst`` with ``src`` via renames. The old
    data is renamed to a ``__compact_bak__`` sibling BEFORE the new
    data moves in and deleted only after, so a durable copy exists
    throughout; a rename failure rolls the original back."""
    Path = jvm.org.apache.hadoop.fs.Path
    src_p, dst_p = Path(src), Path(dst)
    bak_p = Path(dst.rstrip("/") + "__compact_bak__")
    if fs.exists(bak_p):
        fs.delete(bak_p, True)
    if not fs.rename(dst_p, bak_p):
        raise IOError(f"compact: could not move {dst} aside")
    if not fs.rename(src_p, dst_p):
        fs.rename(bak_p, dst_p)  # roll back — original restored
        raise IOError(f"compact: could not move {src} into place")
    fs.delete(bak_p, True)


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
    partitions with too many files are rewritten (pruned scan, then
    a per-partition directory swap — untouched partitions are never
    read, written, or renamed). Directory names are URI-unescaped
    before matching rows (Spark escapes e.g. ``:`` and control
    chars when writing) and ``__HIVE_DEFAULT_PARTITION__`` matches
    via IS NULL, so every partition a writer can produce is
    reachable. At 100 TB this is the only viable shape: yesterday's
    streaming partitions compact while the other 10k partitions are
    untouched.

    The rewrite is ``coalesce`` (narrow — no shuffle when flat) into
    a ``__compact_tmp__`` sibling, then a rename swap (original
    parked at ``__compact_bak__`` until the new files are in place).
    The job never deletes data that is not already durably rewritten
    on storage.
    """
    if not _dataset_exists(spark, path):
        raise ValueError(f"compact_parquet: no dataset at {path!r}")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    target = target_mb * 1024 * 1024
    base = path.rstrip("/")
    tmp = base + "__compact_tmp__"

    def n_out(total_bytes: int) -> int:
        return max(1, math.ceil(total_bytes / target))

    if partition_col is None:
        stats = dataset_layout(spark, path)
        want = n_out(stats["total_bytes"])
        if stats["n_files"] < min_files or stats["n_files"] <= want:
            return {"compacted": False, **stats}
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(hconf)
        spark.read.parquet(path).coalesce(want).write.mode(
            "overwrite"
        ).parquet(tmp)
        _swap_dirs(fs, jvm, tmp, base)
        return {
            "compacted": True,
            "n_files_before": stats["n_files"],
            "n_files_after": want,
            "total_bytes": stats["total_bytes"],
        }

    # partitioned: assess each partition directory independently.
    # (dirname, unescaped value or None for the hive NULL dir, want)
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    todo: list[tuple[str, str | None, int]] = []
    before = 0
    prefix = f"{partition_col}="
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        files = _leaf_files(fs, jvm, st.getPath())
        want = n_out(sum(f.getLen() for f in files))
        if len(files) >= min_files and len(files) > want:
            raw = name[len(prefix):]
            val = None if raw == _HIVE_NULL else unquote(raw)
            todo.append((name, val, want))
            before += len(files)
    if not todo:
        return {"compacted": False, "partitions": 0}

    # one pruned scan of the bad partitions. A bare coalesce(N)
    # would let EVERY partition value appear in every task (up to N
    # files per partition — potentially no improvement), so rows
    # are re-hashed on (partition value, salt) where the salt range
    # is that partition's target file count: each value lands in
    # exactly `want` tasks → exactly `want` output files. The
    # shuffle only moves the bad partitions' rows — the cost model
    # a 10k-partition lake needs. The when-chain keeps partition
    # values out of SQL text (directory names are user data).
    pc = F.col(partition_col)
    strs = [v for _, v, _ in todo if v is not None]
    cond = pc.cast("string").isin(strs) if strs else F.lit(False)
    if any(v is None for _, v, _ in todo):
        cond = cond | pc.isNull()
    total_want = sum(w for _, _, w in todo)
    want_col = F.lit(1)
    for _, v, w in todo:
        m = pc.isNull() if v is None else (pc.cast("string") == v)
        want_col = F.when(m, F.lit(w)).otherwise(want_col)
    (
        spark.read.parquet(path)
        .where(cond)
        .withColumn(
            "__salt",
            F.pmod(F.hash(F.monotonically_increasing_id()), want_col),
        )
        .repartition(total_want, pc, F.col("__salt"))
        .drop("__salt")
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(tmp)
    )
    # Spark escapes partition values identically on the rewrite, so
    # the tmp dataset's directory names line up with the originals.
    # Verify EVERY swap source exists before touching anything — a
    # missing one (e.g. a partition whose files hold zero rows)
    # aborts with the original dataset fully intact.
    Path = jvm.org.apache.hadoop.fs.Path
    for name, _, _ in todo:
        if not fs.exists(Path(f"{tmp}/{name}")):
            fs.delete(Path(tmp), True)
            raise IOError(
                f"compact: rewrite produced no directory for {name!r};"
                " original dataset left untouched"
            )
    for name, _, _ in todo:
        _swap_dirs(fs, jvm, f"{tmp}/{name}", f"{base}/{name}")
    fs.delete(Path(tmp), True)
    return {
        "compacted": True,
        "partitions": len(todo),
        "n_files_before": before,
        "n_files_after": total_want,
    }
