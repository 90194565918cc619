"""As-of join + deterministic splits + cleaning (SURVEY §2 #40-42)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from prql_spark.operators import asof, splits


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(key="a", t=_ts(5), lid=1),
            Row(key="a", t=_ts(10), lid=2),
            Row(key="a", t=_ts(2), lid=3),   # before any right row
            Row(key="b", t=_ts(30), lid=4),
            Row(key="c", t=_ts(30), lid=5),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(key="a", t=_ts(4), price=100.0),
            Row(key="a", t=_ts(10), price=200.0),  # tie with left t=10
            Row(key="a", t=_ts(11), price=300.0),  # after left rows
            Row(key="b", t=_ts(1), price=999.0),
        ]
    )
    out = {
        r.lid: r.price
        for r in asof.asof_join(
            left, right, on="t", by="key", value_cols=["price"]
        ).collect()
    }
    assert out[1] == 100.0  # t=5 → latest right at t=4
    assert out[2] == 200.0  # tie: right row AT the timestamp included
    assert out[3] is None   # nothing at or before t=2
    assert out[4] == 999.0  # backward across a long gap
    assert out[5] is None   # key never seen on the right


def test_asof_join_null_in_latest_right_row(spark):
    # the latest matching right row's values are taken VERBATIM: a
    # NULL value there must stay NULL, not fall back to an older
    # non-null row (DuckDB ASOF JOIN semantics; was last_value-per-
    # column IGNORE NULLS, which skipped it)
    left = spark.createDataFrame([Row(key="a", t=_ts(20), lid=1)])
    right = spark.createDataFrame(
        [
            Row(key="a", t=_ts(5), price=100.0, qty=7),
            Row(key="a", t=_ts(10), price=None, qty=8),
        ]
    )
    row = asof.asof_join(
        left, right, on="t", by="key", value_cols=["price", "qty"]
    ).collect()[0]
    assert row.price is None  # latest row's NULL carried verbatim
    assert row.qty == 8


def test_asof_join_keeps_left_rowcount(spark, catalog):
    ev = catalog.load("events")
    clicks = ev.where(F.col("event_type") == "click")
    logins = ev.where(F.col("event_type") == "login").select(
        "user_id", "ts", F.col("event_id").alias("login_id")
    )
    out = asof.asof_join(
        clicks, logins, on="ts", by="user_id", value_cols=["login_id"]
    )
    assert out.count() == clicks.count()
    assert set(out.columns) == set(clicks.columns) | {"login_id"}


def test_split_by_hash_deterministic_and_disjoint(spark, catalog):
    docs = catalog.load("documents")
    a = splits.split_by_hash(docs, "doc_id").select("doc_id", "split")
    b = splits.split_by_hash(docs, "doc_id").select("doc_id", "split")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    counts = dict(
        (r.split, r.n)
        for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / total - 0.8) < 0.08
    assert abs(counts["val"] / total - 0.1) < 0.06


def test_split_salt_changes_assignment(spark, catalog):
    docs = catalog.load("documents")
    a = splits.split_by_hash(docs, "doc_id", salt="x").collect()
    b = splits.split_by_hash(docs, "doc_id", salt="y").collect()
    diffs = sum(
        1 for ra, rb in zip(a, b) if ra.split != rb.split
    )
    assert diffs > 0


def test_sample_by_hash_subset_stability(spark, catalog):
    docs = catalog.load("documents")
    s10 = {r.doc_id for r in splits.sample_by_hash(docs, "doc_id", 0.10).collect()}
    s25 = {r.doc_id for r in splits.sample_by_hash(docs, "doc_id", 0.25).collect()}
    assert s10 <= s25  # nested samples: smaller fraction is a subset
    assert 0.03 < len(s10) / 500 < 0.20


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text="see https://ex.com/p?q=1 mail bob.smith@corp.io id 123456789 ok",
            )
        ]
    )
    out = splits.redact_pii(df).collect()[0].text_redacted
    assert out == "see <URL> mail <EMAIL> id <NUM> ok"


def test_strip_boilerplate(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="  hello\t\tworld\x00\x07 café  ")]
    )
    out = splits.strip_boilerplate(df).collect()[0].text_clean
    assert out == "hello world caf"


def test_asof_join_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [
            Row(key="a", t=_ts(5), lid=1),   # next right at t=10
            Row(key="a", t=_ts(10), lid=2),  # tie: right AT t=10
            Row(key="a", t=_ts(12), lid=3),  # next right at t=40
            Row(key="b", t=_ts(30), lid=4),  # no right rows for b
        ]
    )
    right = spark.createDataFrame(
        [
            Row(key="a", t=_ts(4), price=100.0),
            Row(key="a", t=_ts(10), price=200.0),
            Row(key="a", t=_ts(40), price=300.0),
        ]
    )
    out = asof.asof_join(
        left, right, on="t", by="key", value_cols=["price"],
        direction="forward",
    )
    got = {r.lid: r.price for r in out.collect()}
    assert got == {1: 200.0, 2: 200.0, 3: 300.0, 4: None}

    # 10-minute tolerance nulls lid=3's match (gap = 28 min)
    out = asof.asof_join(
        left, right, on="t", by="key", value_cols=["price"],
        direction="forward", tolerance_seconds=600,
    )
    got = {r.lid: r.price for r in out.collect()}
    assert got == {1: 200.0, 2: 200.0, 3: None, 4: None}

    # tolerance on backward too: lid=3 (t=12) matched right t=10 → ok
    out = asof.asof_join(
        left, right, on="t", by="key", value_cols=["price"],
        tolerance_seconds=150,
    )
    got = {r.lid: r.price for r in out.collect()}
    assert got == {1: 100.0, 2: 200.0, 3: 200.0, 4: None}


def test_asof_tolerance_timestamp_ntz(spark):
    # parquet written with isAdjustedToUTC=false loads as
    # TIMESTAMP_NTZ (e.g. the driver's events table at sf>=0.01);
    # unix_micros rejects NTZ, so the tolerance path must not use it
    ntz = "CAST(timestamp_micros(CAST({} AS LONG) * 1000000) AS TIMESTAMP_NTZ)"
    left = spark.createDataFrame(
        [Row(key="a", s=300, lid=1), Row(key="a", s=2000, lid=2)]
    ).select("key", "lid", F.expr(ntz.format("s")).alias("t"))
    right = spark.createDataFrame(
        [Row(key="a", s=250, price=1.0)]
    ).select("key", "price", F.expr(ntz.format("s")).alias("t"))
    assert dict(left.dtypes)["t"] == "timestamp_ntz"
    out = asof.asof_join(
        left, right, on="t", by="key", value_cols=["price"],
        tolerance_seconds=600,
    )
    got = {r.lid: r.price for r in out.collect()}
    assert got == {1: 1.0, 2: None}  # lid=2 gap 1750s > 600s


def test_stratified_sample_by_hash(spark, catalog):
    ev = catalog.load("events")
    frac = {"view": 0.1, "purchase": 1.0}
    out = splits.stratified_sample_by_hash(
        ev, "event_id", "event_type", frac, default_fraction=0.25
    )
    got = {r.event_type: r.n for r in
           out.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    base = {r.event_type: r.n for r in
            ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    assert got["purchase"] == base["purchase"]          # keep-all stratum
    assert 0.02 < got["view"] / base["view"] < 0.25     # ~10%
    for k in base:
        if k not in frac:
            assert 0.1 < got.get(k, 0) / base[k] < 0.45  # default ~25%
    # nested: raising a fraction only adds rows
    bigger = splits.stratified_sample_by_hash(
        ev, "event_id", "event_type", {"view": 0.5, "purchase": 1.0},
        default_fraction=0.25,
    )
    small_ids = {r.event_id for r in out.where("event_type = 'view'").collect()}
    big_ids = {r.event_id for r in bigger.where("event_type = 'view'").collect()}
    assert small_ids <= big_ids


def test_stratified_sample_null_stratum_and_quoting(spark):
    from pyspark.sql import Row

    # NULL strata must take default_fraction, not be silently dropped;
    # keys with quotes must not break the generated expression
    df = spark.createDataFrame(
        [Row(k=i, src=None if i % 2 else "o'reilly") for i in range(200)],
        "k LONG, src STRING",
    )
    out = splits.stratified_sample_by_hash(
        df, "k", "src", {"o'reilly": 1.0}, default_fraction=1.0
    )
    assert out.count() == 200  # keep-all everywhere, including NULLs
    half = splits.stratified_sample_by_hash(
        df, "k", "src", {"o'reilly": 1.0}, default_fraction=0.5
    )
    null_kept = half.where("src IS NULL").count()
    assert 20 <= null_kept <= 80  # ~50% of the 100 NULL-stratum rows
    assert half.where("src IS NOT NULL").count() == 100
    # default_fraction=0 still drops NULL strata (explicitly, not by
    # the NULL-comparison accident)
    none = splits.stratified_sample_by_hash(
        df, "k", "src", {"o'reilly": 1.0}, default_fraction=0.0
    )
    assert none.where("src IS NULL").count() == 0


def test_split_leakage_exact_and_near(spark):
    """Leakage audit: planted same-text docs across splits surface
    with the right group stats; whitespace/case variants collapse to
    one group; clean corpora return empty; and the NEAR composition
    (minhash pairs filtered to cross-split) catches a paraphrase-free
    near-dup the exact audit misses."""
    from pyspark.sql import Row, functions as F

    from prql_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from prql_spark.operators.splits import split_leakage

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    rows = [
        Row(doc_id=1, split="train", text=base),
        Row(doc_id=2, split="test", text="  THE quick  brown fox "
            "jumps over the lazy dog and then runs far away into "
            "the deep dark forest tonight "),  # exact after norm
        Row(doc_id=3, split="train", text="totally different text"),
        Row(doc_id=4, split="val", text="another unrelated doc"),
        # near-dup of base, one word changed — NOT exact
        Row(doc_id=5, split="test", text=base.replace("dog", "cat")),
    ]
    df = spark.createDataFrame(rows)
    leaks = split_leakage(df).collect()
    assert len(leaks) == 1
    lk = leaks[0]
    assert lk.n_docs == 2 and lk.n_splits == 2
    assert lk.splits == "test,train"
    assert (lk.min_doc_id, lk.max_doc_id) == (1, 2)
    # clean frame → empty
    clean = df.where("doc_id in (1, 3, 4)")
    assert split_leakage(clean).count() == 0
    # near leakage: minhash pairs whose sides sit in different splits
    sigs = minhash_signatures(df, "text", "doc_id")
    pairs = minhash_lsh_pairs(sigs, "doc_id", threshold=0.5)
    sp = df.select("doc_id", "split")
    near = (
        pairs.join(sp.withColumnRenamed("doc_id", "id_a")
                     .withColumnRenamed("split", "split_a"), "id_a")
        .join(sp.withColumnRenamed("doc_id", "id_b")
                .withColumnRenamed("split", "split_b"), "id_b")
        .where(F.col("split_a") != F.col("split_b"))
    )
    got = {(r.id_a, r.id_b) for r in near.collect()}
    assert (1, 5) in got  # the paraphrase leak the exact audit missed
    # the composition is also a named API (near_split_leakage):
    # same pair, splits attached, estimated jaccard carried
    from prql_spark.operators.splits import near_split_leakage

    api = {(r.id_a, r.id_b): (r.split_a, r.split_b, r.est_jaccard)
           for r in near_split_leakage(df).collect()}
    assert (1, 5) in api
    sa, sb, j = api[(1, 5)]
    assert {sa, sb} == {"train", "test"} and j >= 0.5
