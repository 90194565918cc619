"""SparkSession factory with scale-appropriate defaults.

Single place where execution knobs live: AQE (runtime re-planning,
skew-join splitting, partition coalescing), shuffle partition count,
Arrow for any pandas-UDF path, and scan split size. On a real
cluster only master/shuffle-partitions change; the rest holds.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_heap() -> str:
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        gib = total // (1 << 30)
    except (ValueError, OSError, AttributeError):
        gib = 24  # unknown host: a conservative middle
    return f"{max(4, min(32, gib // 3))}g"


def build_spark(app: str = "prql_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (
            os.cpu_count() or 4
        )
    # one shuffle partition per core: 2× over-partitioning doubled
    # task-scheduling overhead at bench scale (measured 10.5s→5.7s on
    # the hot queries); on a real cluster this is set per-deployment
    # and AQE coalesces the read side regardless
    shuffle = max(32, cpus)
    return (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is BYTE-driven and blind to downstream
        # compute: with parallelismFirst (default true) the coalesce
        # floor is minPartitionSize = 1 MB, so any byte-light but
        # CPU-heavy stage collapses to ~total_bytes/1MB tasks. The
        # corpus scoring chains are exactly that shape (sf0.1: the
        # 1.5 MB post-dedup-window corpus coalesced to ONE partition
        # and the entire 4.5 s regex/fold scoring stage ran as a
        # single task — also why those rows showed flat 8-vs-32-core
        # scaling). Lowering the floor lets parallelismFirst reach
        # the session's parallelism on such stages. Scale-adaptive
        # by construction: the coalesce target is
        # max(stage_bytes / parallelism, this floor), so on any
        # stage with real bytes the ratio term dominates and the
        # floor never binds — it only matters when stage_bytes <
        # cores × 1 MB, which is precisely when per-row compute, not
        # shuffle I/O, is the cost.
        # 64k, not lower: fresh-JVM per-query A/B (3 reps each)
        # showed 16k taxes every tiny exchange ~5-10% in extra tasks
        # (dedup_lines 0.88→0.81 s, q13 0.95→0.87, docs_clean
        # 1.28→1.15 steady at 64k) while 64k keeps the full scoring
        # parallelism (1.5 MB stage / 64k ≈ 24 tasks; prepare corpus
        # 3.67-3.75 s steady at 64k vs 3.25-4.53 s at 16k — same
        # mean, half the variance). Parameterized (env) like the
        # core count so deployments with a different compute/byte
        # balance can retune without a code edit.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom-filter join pruning: at cluster scale a
        # selective dim-side predicate row-filters the fact scan
        # before the shuffle (no effect at local bench sizes — the
        # 10 MB creation threshold gates it — but it is the 100 TB
        # posture and costs nothing here)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(256 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Many threads sharing one local JVM: a small heap GC-thrashes
        # as a long session accumulates broadcasts/codegen state
        # (bench A/B: 30.1s total at 8g vs 13.5s at 32g, same
        # queries). Default to ~1/3 of physical RAM, capped at 32g,
        # floored at 4g — never a fixed number bigger than the host.
        # On a real cluster this is per-executor memory, set by
        # deployment; override locally with SPARK_DRIVER_MEM.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", _default_heap()),
        )
        .config("spark.ui.enabled", "false")
        # stage-progress \r spam glues onto captured stdout lines
        # (BENCH_r06's tail lost the headline value and six TPC-H
        # rows to it) — nothing in this repo reads the progress bar
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
