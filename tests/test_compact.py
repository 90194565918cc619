"""Small-file compaction (sources/compact.py): row-identical
rewrite, no-op on healthy datasets, partitioned isolation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from prql_spark.sources.compact import compact_parquet, dataset_layout


def _n_files(path):
    out = 0
    for root, _dirs, files in os.walk(path):
        out += sum(
            1 for f in files
            if not f.startswith(("_", ".")) and f.endswith(".parquet")
        )
    return out


def test_compact_flat_dataset(spark, tmp_path):
    path = str(tmp_path / "flat")
    df = spark.range(10000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    assert _n_files(path) == 64
    before = spark.read.parquet(path).orderBy("id").collect()

    res = compact_parquet(spark, path, target_mb=256)
    assert res["compacted"] and res["n_files_before"] == 64
    assert _n_files(path) == res["n_files_after"] == 1
    after = spark.read.parquet(path).orderBy("id").collect()
    assert after == before  # byte-identical rows

    # idempotent: second run is a no-op
    res2 = compact_parquet(spark, path, target_mb=256)
    assert not res2["compacted"]


def test_compact_respects_target_size(spark, tmp_path):
    path = str(tmp_path / "sized")
    spark.range(50000).withColumn(
        "pad", F.expr("repeat(uuid(), 20)")
    ).repartition(32).write.parquet(path)
    stats = dataset_layout(spark, path)
    # pick a target that wants ~4 files
    target_mb = max(1, stats["total_bytes"] // (4 * 1024 * 1024))
    res = compact_parquet(spark, path, target_mb=target_mb)
    assert res["compacted"]
    assert 1 <= _n_files(path) < 32


def test_compact_partitioned_touches_only_bad_partitions(spark, tmp_path):
    path = str(tmp_path / "parts")
    df = spark.range(4000).withColumn("part", F.col("id") % 2)
    # part=0 fragmented into 16 files; part=1 healthy (1 file)
    df.where("part = 0").repartition(16).write.mode("append") \
        .partitionBy("part").parquet(path)
    df.where("part = 1").coalesce(1).write.mode("append") \
        .partitionBy("part").parquet(path)
    healthy_files = sorted(os.listdir(os.path.join(path, "part=1")))
    assert _n_files(os.path.join(path, "part=0")) == 16
    before = spark.read.parquet(path).orderBy("id").collect()

    res = compact_parquet(spark, path, target_mb=256, partition_col="part")
    assert res["compacted"] and res["partitions"] == 1
    assert _n_files(os.path.join(path, "part=0")) == 1
    # the healthy partition's files are untouched (same names)
    assert sorted(os.listdir(os.path.join(path, "part=1"))) == healthy_files
    assert spark.read.parquet(path).orderBy("id").collect() == before


def test_compact_partitioned_noop_when_healthy(spark, tmp_path):
    path = str(tmp_path / "healthy")
    spark.range(100).withColumn("part", F.col("id") % 2) \
        .coalesce(1).write.partitionBy("part").parquet(path)
    res = compact_parquet(spark, path, target_mb=256, partition_col="part")
    assert not res["compacted"]


def test_compact_missing_dataset_raises(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="no dataset"):
        compact_parquet(spark, str(tmp_path / "nope"))


def test_layout_ignores_hidden_directories(spark, tmp_path):
    # files under _temporary/.hidden dirs must not count (Spark's
    # InMemoryFileIndex hidden-path rule) — an in-flight writer
    # would otherwise inflate stats / trigger compaction
    path = str(tmp_path / "hid")
    spark.range(100).coalesce(1).write.parquet(path)
    staging = os.path.join(path, "_temporary", "0")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-inflight.parquet"), "wb") as f:
        f.write(b"x" * 1024)
    stats = dataset_layout(spark, path)
    assert stats["n_files"] == 1
    res = compact_parquet(spark, path, target_mb=256)
    assert not res["compacted"]  # healthy: 1 visible file


def test_compact_partitioned_escaped_and_null_values(spark, tmp_path):
    # partition values Spark URI-escapes in directory names (':')
    # and the NULL partition must both be matched and rewritten
    path = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [(i, "a:b" if i % 2 == 0 else None) for i in range(2000)],
        "id long, part string",
    )
    df.repartition(8).write.partitionBy("part").parquet(path)
    names = sorted(n for n in os.listdir(path) if n.startswith("part="))
    assert any("%3A" in n for n in names), names  # ':' escaped
    assert any("__HIVE_DEFAULT_PARTITION__" in n for n in names)
    before = spark.read.parquet(path).orderBy("id").collect()

    res = compact_parquet(spark, path, target_mb=256, partition_col="part")
    assert res["compacted"] and res["partitions"] == 2
    for n in names:
        assert _n_files(os.path.join(path, n)) == 1, n
    assert spark.read.parquet(path).orderBy("id").collect() == before


def test_compact_leaves_no_tmp_or_bak(spark, tmp_path):
    # durability plumbing must clean up after itself on success
    path = str(tmp_path / "clean")
    spark.range(5000).repartition(16).write.parquet(path)
    compact_parquet(spark, path, target_mb=256)
    leftovers = [
        n for n in os.listdir(tmp_path)
        if "__compact_tmp__" in n or "__compact_bak__" in n
    ]
    assert leftovers == []
