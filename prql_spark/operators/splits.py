"""Deterministic dataset splits + corpus cleaning (SURVEY §2 #41/#42).

Train/val/test assignment must be a pure function of content — stable
across runs, cluster sizes, and engines — so it hashes a key column
(md5, available and identical in Spark and DuckDB) and compares the
hex prefix against quantile cut-points. No shuffle: a narrow map.

Cleaning ops are regex projections (JVM-side, oracle-able).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 4-hex-digit space = 65536 buckets; cut-points as hex strings keep
# the comparison purely lexicographic (identical in any engine).
_HEX_SPACE = 1 << 16


def _cut(frac: float) -> str:
    n = int(frac * _HEX_SPACE)
    if n >= _HEX_SPACE:
        # 'g' sorts after every hex digit, so `prefix < 'g'` is
        # always true — a frac of 1.0 captures everything (a 5-char
        # '10000' cut would lexicographically LOSE to 'ffff').
        return "g"
    return format(max(n, 0), "04x")


def split_by_hash(
    df: DataFrame,
    key_col: str,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = "",
) -> DataFrame:
    """Adds a ``split`` column: train/val/test by md5(salt+key) hex
    prefix — deterministic, content-addressed, engine-agnostic."""
    h = f"substr(md5(concat('{salt}', CAST({key_col} AS STRING))), 1, 4)"
    c1, c2 = _cut(train), _cut(train + val)
    return df.withColumn(
        "split",
        F.expr(
            f"CASE WHEN {h} < '{c1}' THEN 'train' "
            f"WHEN {h} < '{c2}' THEN 'val' ELSE 'test' END"
        ),
    )


def sample_by_hash(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic content-hash sample (repeatable across runs and
    engines, unlike df.sample)."""
    h = f"substr(md5(concat('{salt}', CAST({key_col} AS STRING))), 1, 4)"
    return df.where(F.expr(f"{h} < '{_cut(fraction)}'"))


# --- corpus cleaning -------------------------------------------------

URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DIGIT_RUN_RE = r"[0-9]{6,}"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace URLs / emails / long digit runs with typed tags."""
    # double the backslashes for Spark SQL literal parsing
    def sp(p: str) -> str:
        return p.replace("\\", "\\\\")

    expr = (
        f"regexp_replace(regexp_replace(regexp_replace({text_col}, "
        f"'{sp(URL_RE)}', '<URL>'), "
        f"'{sp(EMAIL_RE)}', '<EMAIL>'), "
        f"'{sp(DIGIT_RUN_RE)}', '<NUM>')"
    )
    return df.withColumn("text_redacted", F.expr(expr))


def strip_boilerplate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse whitespace, drop non-printable chars, trim — the
    cheap normalization pass before dedup/quality scoring."""
    expr = (
        f"trim(regexp_replace(regexp_replace({text_col}, "
        f"'[^\\\\x20-\\\\x7E\\\\n\\\\t]', ''), '\\\\s+', ' '))"
    )
    return df.withColumn("text_clean", F.expr(expr))


def sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Exactly-k-per-group deterministic sample (eval-set building:
    "give me 50 docs per (lang, source) cell, the same 50 every run").

    Rank within each group by md5(salt + key) — a content-addressed
    shuffle order, stable across runs, engines, and cluster sizes
    (df.sample can't promise any of that) — and keep the first k.
    One hash exchange on the group key; the rank-filter compiles to
    Spark's two-stage WindowGroupLimit (partial top-k before the
    exchange, SPARK-37099), so each input partition forwards at most
    k rows per group — the same plan shape as ann's top-k.
    """
    from prql_spark.compiler import _esc_str

    h = (
        f"md5(concat({_esc_str(salt)}, CAST({key_col} AS STRING)))"
    )
    part = ", ".join(group_cols)
    return (
        df.withColumn(
            "__rk",
            F.expr(
                f"row_number() OVER (PARTITION BY {part} "
                f"ORDER BY {h}, {key_col})"
            ),
        )
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def stratified_sample_by_hash(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum value gets its
    own keep-fraction (e.g. downsample boilerplate-heavy sources,
    keep all rare ones). The stratum value participates in the hash,
    so per-stratum samples stay independent AND nested (raising one
    stratum's fraction only ADDS rows). Narrow map, no shuffle —
    the standard shape for source-mix rebalancing at corpus scale.
    """
    from prql_spark.compiler import _esc_str

    # coalesce the stratum into the hash: a NULL stratum would null
    # the md5, null every comparison, and silently DROP the row no
    # matter what default_fraction says. NULL strata hash as '' and
    # take the default fraction via the explicit IS NULL branch.
    h = (
        f"substr(md5(concat({_esc_str(salt)}, "
        f"coalesce(CAST({strata_col} AS STRING), ''), "
        f"'#', CAST({key_col} AS STRING))), 1, 4)"
    )
    branches = " ".join(
        f"WHEN CAST({strata_col} AS STRING) = {_esc_str(str(k))} "
        f"THEN {h} < '{_cut(v)}'"
        for k, v in fractions.items()
    )
    return df.where(
        F.expr(
            f"CASE WHEN {strata_col} IS NULL "
            f"THEN {h} < '{_cut(default_fraction)}' "
            f"{branches} ELSE {h} < '{_cut(default_fraction)}' END"
        )
    )


def mix_fractions(
    counts: dict[str, int], targets: dict[str, float]
) -> dict[str, float]:
    """Per-stratum keep fractions that reach the target mix by
    DOWNSAMPLING ONLY, at the largest total the targets allow:
    scale = min over strata of count_s / share_s, keep_s =
    share_s × scale / count_s. Driver-side arithmetic over the tiny
    per-stratum count dict (the deterministic piece an oracle can
    replay). Strata missing from ``targets`` get fraction 0; a
    target stratum missing from the corpus is ignored."""
    total_share = sum(targets.values())
    if total_share <= 0:
        raise ValueError("mix_fractions: target shares sum to 0")
    shares = {k: v / total_share for k, v in targets.items()}
    present = [
        counts[k] / s for k, s in shares.items() if s > 0 and k in counts
    ]
    if not present:
        raise ValueError(
            "mix_fractions: no target stratum present in corpus counts "
            f"(targets={sorted(targets)}, corpus strata="
            f"{sorted(counts)[:20]})"
        )
    scale = min(present)
    return {
        k: min(1.0, (shares[k] * scale) / counts[k])
        for k in shares
        if k in counts and counts[k] > 0
    }


def rebalance_to_mix(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Rebalance the corpus to a target domain mix (the static
    source-mixing step of training-data pipelines — pick web/books/
    code proportions, then downsample the over-represented domains;
    cf. the mixture-weight literature, e.g. DoReMi, Xie et al. 2023,
    which LEARNS the target weights this operator then applies).

    One tiny per-stratum count aggregate (map-side combined, result
    is #domains rows on the driver) derives the keep fractions
    (:func:`mix_fractions`), and the cut itself is the deterministic
    stratified hash filter — a narrow map, corpus never shuffled.
    Strata not in ``targets`` are dropped.
    """
    rows = (
        df.groupBy(F.col(strata_col).cast("string").alias("__s"))
        .count()
        .collect()
    )
    counts = {r["__s"]: r["count"] for r in rows if r["__s"] is not None}
    fracs = mix_fractions(counts, targets)
    return stratified_sample_by_hash(
        df, key_col, strata_col, fracs, default_fraction=0.0, salt=salt
    )


def split_leakage(
    df: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-split LEAKAGE audit — the check a training pipeline runs
    after splitting: text that appears (near-exactly: lowercased,
    whitespace-collapsed) in MORE than one split leaks evaluation
    data into training. Document-level dedup before splitting
    prevents this for surviving docs, but leakage re-enters through
    later unions, per-source re-splits, or augmentation — so the
    audit is its own operator, run on the FINAL pre-training frame.

    One row per leaked text group: ``text_key`` (md5 hex of the
    normalized text — the group identity, stable across engines),
    ``n_docs``, ``n_splits``, ``splits`` (sorted comma-joined
    distinct split labels), ``min_doc_id``/``max_doc_id`` (exemplars
    to pull). Empty result = no leakage.

    Shape at scale: a narrow normalize+hash map, ONE 16-byte-key
    exchange (map-side-combined counts + distinct-split sets), a
    HAVING-style filter — linear, and the exchange carries hashes
    and ids only, never text. For NEAR-duplicate leakage, run
    ``minhash_lsh_pairs`` on the frame and keep pairs whose two
    sides' splits differ (tests pin that composition).
    """
    key = (
        f"md5(lower(trim(regexp_replace({text_col}, '\\\\s+', ' '))))"
    )
    return (
        df.select(
            F.expr(key).alias("text_key"),
            F.col(split_col).cast("string").alias("__sp"),
            F.col(id_col),
        )
        .groupBy("text_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "CAST(size(collect_set(__sp)) AS INT)"
            ).alias("n_splits"),
            F.expr(
                "concat_ws(',', array_sort(collect_set(__sp)))"
            ).alias("splits"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
        .where(F.col("n_splits") >= 2)
    )


def near_split_leakage(
    df: DataFrame,
    split_col: str = "split",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    star_cap: int = 64,
) -> DataFrame:
    """NEAR-duplicate cross-split leakage — :func:`split_leakage`'s
    paraphrase-aware sibling: minhash near-dup pairs whose two sides
    sit in DIFFERENT splits (an eval doc lightly rewritten into
    training data passes the exact audit but lands here). One row
    per leaked pair: ids, their splits, and the estimated jaccard
    (``est_jaccard``).
    Cost is the minhash signature pass + the banded bucket-combine —
    the same budget as corpus near-dup detection, reusing its
    exact machinery and scale posture."""
    from prql_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(df, text_col, id_col)
    pairs = minhash_lsh_pairs(
        sigs, id_col, threshold=threshold, star_cap=star_cap
    )
    sp = df.select(F.col(id_col), F.col(split_col).cast("string"))
    a = sp.withColumnRenamed(id_col, "id_a").withColumnRenamed(
        split_col, "split_a"
    )
    b = sp.withColumnRenamed(id_col, "id_b").withColumnRenamed(
        split_col, "split_b"
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "est_jaccard")
    )


def shuffle_for_training(
    df: DataFrame,
    seed: int = 0,
    key_cols: list[str] | None = None,
    partitions: int | None = None,
    keep_key: bool = False,
) -> DataFrame:
    """Deterministic global shuffle for training-data writes.

    Training runs need the corpus in a random-but-REPRODUCIBLE order
    (same seed -> same order, different seed -> independent order),
    decided without any single-node step. The shuffle key is
    ``md5(seed || key_cols)`` — a keyed hash, so the order is stable
    across runs, cluster sizes, and input file layouts; changing
    ``seed`` re-deals the whole corpus.

    Spark-first scale shape: ``repartitionByRange`` on the hash
    (range exchange driven by a sampled boundary sketch — each
    output partition gets a contiguous hash range) followed by
    ``sortWithinPartitions`` gives a TOTAL global order across
    output files without ever sorting on one node; writing the
    result preserves per-file order, so downstream sequential
    readers see the shuffled order exactly. One exchange, same cost
    class as any repartition — not a ``orderBy`` (which would plan
    the same range exchange but is commonly mis-written as
    ``coalesce(1)`` + sort in naive pipelines).

    ``key_cols`` defaults to all columns (content-keyed); pass the
    stable id column(s) for speed. ``keep_key=True`` retains
    ``__shuffle_key`` for order audits.
    """
    cols = key_cols or df.columns
    key = F.concat_ws(
        "\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in cols]
    )
    out = df.withColumn("__shuffle_key", F.md5(key))
    n = partitions or out.sparkSession.sparkContext.defaultParallelism
    out = out.repartitionByRange(n, "__shuffle_key").sortWithinPartitions(
        "__shuffle_key"
    )
    return out if keep_key else out.drop("__shuffle_key")
