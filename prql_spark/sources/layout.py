"""Z-order-style multi-column layout writer (SURVEY §2 #63).

Sorting a table by one column clusters file/row-group min-max stats
for THAT column only — predicates on a second column prune nothing.
Z-ordering interleaves the bits of several columns' bucket ids into
one clustering key, so per-file value ranges stay narrow on EVERY
participating column and parquet footer stats prune scans for
predicates on any of them. This is the same layout idea production
lakehouse writers use for multi-dimensional pruning.

Design choices (100 TB posture):
- Bucket ids come from QUANTILE cut points (one multi-column
  ``approxQuantile`` action — a single Greenwald-Khanna pass over
  the table for ALL z columns), not linear min-max scaling — skewed
  columns still spread across all buckets.
- The z-value is a pure unrolled Spark SQL expression (bit shifts
  over compile-time constants) — JVM-side, codegen, no UDF.
- Layout = ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``:
  one range shuffle (with Spark's built-in sampling), then each
  output file covers a contiguous z-range, i.e. a small hyper-cube
  of the value space.

Cost model: one stats pass + one shuffle — identical stage count to
a plain sorted write; the benefit is multi-column pruning instead
of single-column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _numeric_src(col: str, dtype: str) -> str:
    """Order-preserving DOUBLE rank source for a column."""
    if dtype in ("timestamp", "timestamp_ntz"):
        return f"CAST(CAST(`{col}` AS TIMESTAMP) AS DOUBLE)"
    if dtype == "string":
        # order-preserving 8-byte prefix rank, then quantile-cut
        return (
            f"CAST(conv(substr(hex(CAST(substr(`{col}`, 1, 8) "
            f"AS BINARY)), 1, 15), 16, 10) AS DOUBLE)"
        )
    return f"CAST(`{col}` AS DOUBLE)"


def _bucket_expr(col: str, src: str, cuts: list[float]) -> str:
    """Bucket id in [0, len(cuts)] = #cut-points <= value (quantile
    rank). Unrolled constant array + higher-order filter: runs
    JVM-side; cuts are plan constants. ``src`` is the column's
    order-preserving DOUBLE rank expression."""
    arr = ", ".join(f"CAST({c!r} AS DOUBLE)" for c in cuts)
    return (
        f"CASE WHEN `{col}` IS NULL THEN 0 ELSE "
        f"size(filter(array({arr}), c -> c <= {src})) END"
    )


def zorder_expr(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int | None = None,
    relative_error: float = 0.001,
) -> str:
    """Spark SQL expression for the z-value of ``cols``.

    Numeric, string, and timestamp columns supported. Runs ONE
    approxQuantile action covering every column (a single
    Greenwald-Khanna pass over the table) to learn the cut points;
    everything else is lazy column math.
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits_per_col is None:
        bits_per_col = min(8, 63 // (len(cols) or 1))
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]

    dtypes = dict(df.dtypes)
    srcs = {c: _numeric_src(c, dtypes[c]) for c in cols}
    # one multi-column approxQuantile = one scan for ALL columns
    num_names = [f"__z{i}" for i in range(len(cols))]
    num_df = df.selectExpr(
        *[f"{srcs[c]} AS {n}" for c, n in zip(cols, num_names)]
    )
    all_cuts = num_df.approxQuantile(num_names, probs, relative_error)
    bucket_exprs = [
        _bucket_expr(c, srcs[c], cuts)
        for c, cuts in zip(cols, all_cuts)
    ]

    # clamp (quantile dupes can push the count to n_buckets) and
    # interleave: output bit (i*n + j) takes bit i of column j
    terms = []
    for j, be in enumerate(bucket_exprs):
        b = f"least(CAST(({be}) AS BIGINT), {n_buckets - 1})"
        for i in range(bits_per_col):
            terms.append(
                f"shiftleft(shiftright({b}, {i}) & 1, "
                f"{i * len(cols) + j})"
            )
    return " + ".join(terms)


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    n_files: int = 16,
    bits_per_col: int | None = None,
) -> DataFrame:
    """``df`` clustered by z-order over ``cols`` into ``n_files``
    partitions — each output partition covers a contiguous z-range
    (a hyper-cube of the value space), so per-file min-max stats
    prune on EVERY z column. Feed to any writer: plain parquet
    (:func:`write_zorder`) or a manifest snapshot commit
    (``snapshot_write`` + ``attach_stats`` + ``snapshot_scan``)."""
    z = zorder_expr(df, cols, bits_per_col)
    return (
        df.withColumn("__z", F.expr(z))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def write_zorder(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
    bits_per_col: int | None = None,
    compression: str = "zstd",
) -> None:
    """Write parquet laid out by z-order over ``cols`` (see
    :func:`zorder_frame`)."""
    (
        zorder_frame(df, cols, n_files, bits_per_col)
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )
