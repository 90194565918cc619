"""Z-order layout writer: clustering quality measured from parquet
footer stats (the same min/max metadata engines prune with)."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from prql_spark.sources.catalog import Catalog
from prql_spark.sources.layout import write_zorder

from .conftest import SF_DIR


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        out.append((min(mins), max(maxs)))
    return out


def _avg_coverage(ranges, lo, hi) -> float:
    span = hi - lo
    return sum((b - a) / span for a, b in ranges) / len(ranges)


def test_zorder_clusters_both_columns(spark, tmp_path):
    orders = Catalog(spark, SF_DIR).load("orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lo_c, hi_c, lo_p, hi_p, n, total = orders.selectExpr(
        "min(o_custkey)", "max(o_custkey)",
        "min(o_totalprice)", "max(o_totalprice)",
        "count(*)", "round(sum(o_totalprice), 2)",
    ).first()

    zdir = str(tmp_path / "z")
    write_zorder(orders, zdir, ["o_custkey", "o_totalprice"], n_files=16)

    # baseline: plain range-sort by custkey only
    bdir = str(tmp_path / "b")
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(bdir)
    )

    z_cust = _avg_coverage(_file_ranges(zdir, "o_custkey"), lo_c, hi_c)
    z_price = _avg_coverage(_file_ranges(zdir, "o_totalprice"), lo_p, hi_p)
    b_cust = _avg_coverage(_file_ranges(bdir, "o_custkey"), lo_c, hi_c)
    b_price = _avg_coverage(_file_ranges(bdir, "o_totalprice"), lo_p, hi_p)

    # single-column sort: perfect on its column, useless on the other
    assert b_cust < 0.15 and b_price > 0.85
    # z-order: BOTH columns' per-file ranges are fractions of global
    assert z_cust < 0.6 and z_price < 0.6, (z_cust, z_price)

    # and the rewrite is lossless
    rn, rtotal = (
        spark.read.parquet(zdir)
        .selectExpr("count(*)", "round(sum(o_totalprice), 2)")
        .first()
    )
    assert (rn, rtotal) == (n, total)
    shutil.rmtree(zdir, ignore_errors=True)
    shutil.rmtree(bdir, ignore_errors=True)


def test_zorder_skewed_and_timestamp(spark, tmp_path):
    # quantile bucketing must spread a heavily-skewed column; ts
    # column exercises the timestamp cast path
    ev = Catalog(spark, SF_DIR).load("events").select(
        "event_id", "ts", "user_id"
    ).withColumn(
        "user_id",
        F.expr("CASE WHEN user_id % 10 < 8 THEN 1 ELSE user_id END"),
    )
    zdir = str(tmp_path / "zs")
    write_zorder(ev, zdir, ["ts", "user_id"], n_files=8)
    files = glob.glob(os.path.join(zdir, "*.parquet"))
    assert len(files) >= 4
    assert spark.read.parquet(zdir).count() == ev.count()
    shutil.rmtree(zdir, ignore_errors=True)


def test_upsert_parquet_partition_scoped(spark, tmp_path):
    from pyspark.sql import Row

    from prql_spark.sources.upsert import upsert_parquet

    d = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [Row(k=i, part=f"p{i % 3}", v=float(i)) for i in range(30)]
    )
    upsert_parquet(base, d, ["k"], partition_col="part")
    files_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(d, "part=*/*.parquet"))
    }

    # update two rows in p0, insert one new row in p0
    updates = spark.createDataFrame(
        [
            Row(k=0, part="p0", v=100.0),
            Row(k=3, part="p0", v=103.0),
            Row(k=999, part="p0", v=999.0),
        ]
    )
    res = upsert_parquet(updates, d, ["k"], partition_col="part")
    assert res["touched_partitions"] == ["p0"]

    back = spark.read.parquet(d)
    assert back.count() == 31
    got = {r.k: r.v for r in back.where("part = 'p0'").collect()}
    assert got[0] == 100.0 and got[3] == 103.0 and got[999] == 999.0
    assert got[6] == 6.0  # untouched row in touched partition survives
    # untouched partitions: same files, same mtimes
    for f, m in files_before.items():
        if "part=p0" not in f:
            assert os.path.exists(f) and os.path.getmtime(f) == m
    # p0 was rewritten
    assert any(
        f not in files_before
        for f in glob.glob(os.path.join(d, "part=p0/*.parquet"))
    )
    # keyed replace is idempotent
    res2 = upsert_parquet(updates, d, ["k"], partition_col="part")
    assert spark.read.parquet(d).count() == 31


def test_upsert_null_partition_and_strict_move(spark, tmp_path):
    import pytest
    from pyspark.sql import Row

    from prql_spark.sources.upsert import upsert_parquet

    d = str(tmp_path / "lake2")
    base = spark.createDataFrame(
        [Row(k=1, part="p0", v=1.0), Row(k=2, part="p1", v=2.0)]
    )
    upsert_parquet(base, d, ["k"], partition_col="part")

    # NULL partition values are rejected (pruning can't cover them)
    nulls = spark.createDataFrame(
        [(9, None, 9.0)], "k LONG, part STRING, v DOUBLE"
    )
    with pytest.raises(ValueError, match="NULL partition"):
        upsert_parquet(nulls, d, ["k"], partition_col="part")

    # strict mode catches a key moving partitions (stale-copy hazard)
    mover = spark.createDataFrame([Row(k=2, part="p0", v=20.0)])
    with pytest.raises(ValueError, match="across"):
        upsert_parquet(mover, d, ["k"], partition_col="part", strict=True)
    # same-partition updates pass the strict check
    ok = spark.createDataFrame([Row(k=1, part="p0", v=10.0)])
    res = upsert_parquet(ok, d, ["k"], partition_col="part", strict=True)
    assert res["touched_partitions"] == ["p0"]
    got = {r.k: r.v for r in spark.read.parquet(d).collect()}
    assert got == {1: 10.0, 2: 2.0}


def test_bucketed_join_elides_exchanges(spark):
    """The bucketing contract at 100 TB: two tables written with the
    SAME bucket key and count join WITHOUT any Exchange (both scans
    carry the on-disk hash partitioning), sortBy additionally lets
    the join skip its sorts; an equality filter on the bucket column
    prunes the scan to ONE bucket; a MISMATCHED bucket count falls
    back to shuffling (the guarantee is conditional, and the test
    proves both directions)."""
    from prql_spark.sources.bucketing import (
        drop_bucketed,
        read_bucketed,
        write_bucketed,
    )

    cat = Catalog(spark, SF_DIR)
    orders = cat.load("orders").select("o_orderkey", "o_totalprice")
    lineitem = cat.load("lineitem").select("l_orderkey", "l_quantity")
    tables = ["t_bkt_o", "t_bkt_l", "t_bkt_l6"]
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for t in tables:  # clear orphans from any crashed prior run
            drop_bucketed(spark, t)
        write_bucketed(orders, "t_bkt_o", "o_orderkey", 4,
                       sort_cols="o_orderkey")
        write_bucketed(lineitem, "t_bkt_l", "l_orderkey", 4,
                       sort_cols="l_orderkey")
        write_bucketed(lineitem, "t_bkt_l6", "l_orderkey", 6)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = read_bucketed(spark, "t_bkt_o")
        li = read_bucketed(spark, "t_bkt_l")
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # BOTH shuffles elided
        # row parity with the plain-parquet join (layout is lossless)
        plain = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert j.count() == plain.count()
        # equality filter on the bucket key prunes to one bucket —
        # the planner's autoBucketedScan would otherwise drop the
        # bucketed read entirely for a plain filter (no join/agg
        # needing the partitioning), so pin it on for the assertion
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled",
            "false",
        )
        try:
            fplan = (
                o.where(F.col("o_orderkey") == 42)
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "SelectedBucketsCount: 1 out of 4" in fplan, fplan
        finally:
            spark.conf.unset(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled"
            )
        # mismatched bucket counts cannot co-locate: exchange is back
        l6 = read_bucketed(spark, "t_bkt_l6")
        mplan = (
            l6.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in mplan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", old_thresh
        )
        for t in tables:
            drop_bucketed(spark, t)


def test_drop_bucketed_rejects_unsafe_names(spark):
    """A table name must never steer rmtree outside the warehouse
    dir — path-bearing names are rejected BEFORE any FS action
    (r6 VERDICT #8 / ADVICE), and valid names resolve through the
    managed-table layout (lowercased; db-qualified → <db>.db/)."""
    import os

    import pytest

    from prql_spark.sources.bucketing import drop_bucketed

    for bad in ("../evil", "a/b", "x..y", "", "a.b.c", "t;drop"):
        with pytest.raises(ValueError, match="unsafe table name"):
            drop_bucketed(spark, bad)
    # db-qualified + mixed case: the fallback path targets the
    # lowercased <db>.db/<tbl> layout, so the orphan is removed even
    # when the catalog has never heard of the table
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    orphan = os.path.join(wh, "mydb.db", "mytbl")
    os.makedirs(orphan, exist_ok=True)
    drop_bucketed(spark, "MyDb.MyTbl")
    assert not os.path.exists(orphan)
