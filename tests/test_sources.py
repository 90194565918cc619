"""Source/sink round-trips + catalog behavior (SURVEY §2 #24/#25)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from prql_spark import Catalog, compile_prql
from prql_spark.sources import io as pio


def test_csv_roundtrip(spark, catalog, tmp_path):
    d = str(tmp_path / "nation_csv")
    nation = catalog.load("nation")
    pio.write_csv(nation, d)
    back = pio.read_csv(spark, d)
    assert back.count() == 25
    assert set(back.columns) == set(nation.columns)


def test_json_roundtrip(spark, catalog, tmp_path):
    d = str(tmp_path / "region_json")
    region = catalog.load("region")
    region.write.mode("overwrite").json(d)
    back = pio.read_json(spark, d)
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in region.collect()
    }


def test_partitioned_parquet_prunes(spark, catalog, tmp_path):
    d = str(tmp_path / "orders_part")
    orders = catalog.load("orders")
    pio.write_parquet(orders, d, partition_by=["o_orderstatus"])
    # partition dirs exist
    assert glob.glob(os.path.join(d, "o_orderstatus=*"))
    back = spark.read.parquet(d)
    sub = back.where(F.col("o_orderstatus") == "F")
    plan = sub._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan (pruned read, no data filter)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    want = orders.where("o_orderstatus = 'F'").count()
    assert sub.count() == want


def test_catalog_over_csv_dir(spark, catalog, tmp_path):
    """The PRQL front-end runs unchanged over a csv-backed catalog."""
    d = str(tmp_path / "csvdata")
    os.makedirs(d, exist_ok=True)
    for t in ("nation", "region"):
        catalog.load(t).coalesce(1).write.mode("overwrite").option(
            "header", True
        ).csv(os.path.join(d, f"{t}.csv"))
    csv_cat = Catalog(spark, d, fmt="csv")
    df = compile_prql(
        "from nation\njoin region [r_regionkey == n_regionkey]\n"
        "group [r_name] (aggregate [n = count])\nsort [r_name]",
        csv_cat,
    )
    rows = df.collect()
    assert len(rows) == 5 and all(r.n == 5 for r in rows)


def test_catalog_register_and_broadcast_flag(spark, catalog):
    df = catalog.load("region")
    cat = Catalog(spark, None if False else "/root/testdata/sf0.001")
    cat.register("dim", df, broadcast=True)
    assert cat.is_broadcast("dim")
    assert cat.load("dim") is df


def test_bucketed_tables_join_without_shuffle(spark, catalog, tmp_path):
    """bucketBy layout lets a same-key join skip both exchanges."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # forbid broadcast so the join exercises the bucketed exchange path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = catalog.load("orders")
    lineitem = catalog.load("lineitem")
    pio.write_bucketed_table(
        orders.withColumnRenamed("o_orderkey", "k"), "b_orders", ["k"], 8
    )
    pio.write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "k"), "b_lineitem", ["k"], 8
    )
    j = spark.table("b_orders").join(spark.table("b_lineitem"), "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # bucket layout reused
    assert j.count() == lineitem.count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_orc_roundtrip_with_pushdown(spark, catalog, tmp_path):
    d = str(tmp_path / "orders_orc")
    orders = catalog.load("orders").limit(2000)
    pio.write_orc(orders, d, partition_by=["o_orderstatus"])
    back = pio.read_orc(spark, d)
    want = {r.o_orderkey for r in orders.collect()}
    assert {r.o_orderkey for r in back.collect()} == want
    # partition pruning: a status filter must not scan other dirs
    pruned = back.where(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_write_jsonl_roundtrip(spark, catalog, tmp_path):
    from prql_spark.sources import io as pio

    nation = catalog.load("nation")
    d = str(tmp_path / "nation_jsonl")
    pio.write_jsonl(nation, d)
    import glob as g

    files = g.glob(d + "/*.json")
    assert files  # line-delimited json part files
    with open(files[0]) as f:
        first = f.readline()
    assert first.strip().startswith("{")
    back = pio.read_json(spark, d)
    assert back.count() == nation.count()
    a = {r.n_nationkey for r in back.collect()}
    assert a == {r.n_nationkey for r in nation.collect()}


def test_read_binary_files(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.ppm").write_bytes(b"P6\n2 1\n255\n" + bytes(6))
    (d / "b.ppm").write_bytes(b"P6\n1 1\n255\n" + bytes(300))
    (d / "skip.txt").write_bytes(b"not media")
    df = pio.read_binary_files(spark, str(d), glob="*.ppm")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.ppm", "b.ppm"}
    assert bytes(rows["a.ppm"].content)[:2] == b"P6"
    assert rows["a.ppm"].length == 17
    # metadata-column pruning by size
    small = pio.read_binary_files(spark, str(d), glob="*.ppm", max_bytes=100)
    assert [r.path.rsplit("/", 1)[-1] for r in small.collect()] == ["a.ppm"]
    # feeds the multimodal decode path end-to-end
    from prql_spark.operators.multimodal import NetpbmCodec, decode_features

    media = df.select(
        F.expr("xxhash64(path)").alias("media_id"),
        F.col("content").alias("media"),
        F.lit("image/x-portable-pixmap").alias("media_type"),
    )
    decoded = decode_features(media, NetpbmCodec()).collect()
    assert {(r.width, r.height) for r in decoded} == {(2, 1), (1, 1)}


def test_read_text_files(spark, tmp_path):
    d = tmp_path / "texts"
    d.mkdir()
    (d / "x.txt").write_text("line one\nline two\n")
    (d / "y.txt").write_text("single doc body\n")
    lines = pio.read_text_files(spark, str(d))
    got = {(r.doc_path.rsplit("/", 1)[-1], r.text) for r in lines.collect()}
    assert ("x.txt", "line one") in got and ("x.txt", "line two") in got
    docs = pio.read_text_files(spark, str(d), whole_file=True)
    by_file = {r.doc_path.rsplit("/", 1)[-1]: r.text for r in docs.collect()}
    assert by_file["y.txt"].strip() == "single doc body"
    assert "line one\nline two" in by_file["x.txt"]


def test_diff_datasets(spark):
    from prql_spark.sources.diff import diff_datasets

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (5, "e", 50), (4, None, 40)],
        "k int, s string, v int",
    )
    got = {
        (r.k, r.change) for r in diff_datasets(old, new, ["k"]).collect()
    }
    assert got == {(2, "changed"), (3, "removed"), (5, "added")}
    # NULL values inside compared columns are hashed, not skipped
    n2 = spark.createDataFrame([(4, "x", 40)], "k int, s string, v int")
    got2 = {
        (r.k, r.change)
        for r in diff_datasets(old.where("k = 4"), n2, ["k"]).collect()
    }
    assert got2 == {(4, "changed")}
    # concat ambiguity guard: ('ab','') vs ('a','b') must differ
    a = spark.createDataFrame([(1, "ab", "")], "k int, x string, y string")
    b = spark.createDataFrame([(1, "a", "b")], "k int, x string, y string")
    assert {(r.k, r.change) for r in diff_datasets(a, b, ["k"]).collect()} == {
        (1, "changed")
    }
    # compare_cols narrows the comparison
    assert diff_datasets(old, new, ["k"], compare_cols=["v"]).where(
        "k = 2"
    ).count() == 0


def test_read_text_files_linesep(spark, tmp_path):
    d = tmp_path / "recsep"
    d.mkdir()
    (d / "r.rec").write_text("alpha|beta|gamma")
    rows = {
        r.text
        for r in pio.read_text_files(spark, str(d), line_sep="|").collect()
    }
    assert rows == {"alpha", "beta", "gamma"}


def _warc_record(wtype, uri, body, crlf=True, extra=""):
    nl = "\r\n" if crlf else "\n"
    hdr = (
        f"WARC/1.0{nl}"
        f"WARC-Type: {wtype}{nl}"
        + (f"WARC-Target-URI: {uri}{nl}" if uri else "")
        + f"WARC-Date: 2024-01-01T00:00:00Z{nl}"
        + extra
        + f"Content-Length: {len(body)}{nl}{nl}"
    )
    return hdr.encode() + body + (nl + nl).encode()


def test_read_warc(spark, tmp_path):
    import gzip

    d = tmp_path / "warc"
    d.mkdir()
    # plain WARC: warcinfo (skipped) + response + conversion; one
    # bare-LF record in the middle
    blob = (
        _warc_record("warcinfo", None, b"software: test")
        + _warc_record("response", "http://a.example/x",
                       b"HTTP/1.1 200 OK\r\n\r\n<html>A</html>",
                       extra="Content-Type: application/http\r\n")
        + _warc_record("conversion", "http://a.example/x",
                       b"plain text A", crlf=False)
    )
    (d / "shard0.warc").write_bytes(blob)
    # gzip member-concatenated shard (the Common Crawl layout)
    gz = gzip.compress(
        _warc_record("response", "http://b.example/y", b"<html>B</html>")
    ) + gzip.compress(
        _warc_record("conversion", "http://b.example/y", b"plain text B")
    )
    (d / "shard1.warc.gz").write_bytes(gz)
    # truncated record must be dropped, not mis-sliced
    trunc = _warc_record("response", "http://c.example/z", b"full body")
    (d / "shard2.warc").write_bytes(trunc[: len(trunc) - 18])

    out = pio.read_warc(spark, str(d)).collect()
    by_uri = {}
    for r in out:
        by_uri.setdefault(r.target_uri, []).append(r)
    assert set(by_uri) == {"http://a.example/x", "http://b.example/y"}
    types_a = {r.warc_type for r in by_uri["http://a.example/x"]}
    assert types_a == {"response", "conversion"}
    conv_a = next(r for r in by_uri["http://a.example/x"]
                  if r.warc_type == "conversion")
    assert bytes(conv_a.payload) == b"plain text A"
    assert bytes(
        next(r for r in by_uri["http://b.example/y"]
             if r.warc_type == "response").payload
    ) == b"<html>B</html>"
    # record_types filter
    only_conv = pio.read_warc(
        spark, str(d), record_types=("conversion",)
    ).collect()
    assert {r.warc_type for r in only_conv} == {"conversion"}
    assert all(r.record_offset >= 0 for r in out)


def test_warc_to_documents(spark, tmp_path):
    d = tmp_path / "warc2"
    d.mkdir()
    (d / "s.warc").write_bytes(
        _warc_record("response", "http://a.example/p",
                     b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                     b"<html>hello</html>")
        + _warc_record("conversion", "http://a.example/p", b"hello text")
    )
    docs = pio.warc_to_documents(pio.read_warc(spark, str(d))).collect()
    by_url = {}
    for r in docs:
        by_url.setdefault(r.url, []).append(r)
    texts = {r.text for r in by_url["http://a.example/p"]}
    # response: HTTP headers stripped; conversion: verbatim
    assert texts == {"<html>hello</html>", "hello text"}
    assert all("#" in r.doc_id for r in docs)


def test_warc_to_documents_charset(spark, tmp_path):
    d = tmp_path / "warc3"
    d.mkdir()
    latin = "caf\xe9 r\xe9sum\xe9".encode("iso-8859-1")
    (d / "s.warc").write_bytes(
        _warc_record(
            "conversion", "http://l.example/", latin,
            extra="Content-Type: text/plain; charset=ISO-8859-1\r\n",
        )
        + _warc_record("conversion", "http://u.example/",
                       "caf\xe9 utf8".encode("utf-8"))
    )
    docs = {r.url: r.text
            for r in pio.warc_to_documents(
                pio.read_warc(spark, str(d))).collect()}
    # declared latin-1 decodes correctly; undeclared stays utf-8
    assert docs["http://l.example/"] == "caf\xe9 r\xe9sum\xe9"
    assert docs["http://u.example/"] == "caf\xe9 utf8"
