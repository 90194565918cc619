"""Approximate sketches for 100 TB-scale profiling.

At full scale, exact COUNT(DISTINCT) over a high-cardinality key is a
full shuffle of every distinct value; HyperLogLog++ collapses it to a
fixed-size (~kB) sketch per partition merged map-side, and
percentile_approx keeps a bounded KLL-style summary instead of a full
sort. Both are Spark JVM built-ins — partial-aggregable, no Python.

Cross-engine checking: DuckDB's estimators differ, so sketch VALUES
can't be hash-compared. The entries instead emit the exact answer
(cross-checkable) plus a within-bound boolean for the sketch — the
accuracy contract itself is what the oracle verifies. Both engines'
sketches are hash-based and deterministic given the data, so the
boolean is stable, not flaky.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_distinct(
    df: DataFrame,
    col: str,
    group_by: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """HLL++ distinct count per group (relative std dev ``rsd``)."""
    agg = F.approx_count_distinct(col, rsd).alias(f"approx_{col}")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.groupBy().agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    group_by: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate quantiles (rank error <= 1/accuracy) per group."""
    arr = "array(" + ", ".join(str(p) for p in probs) + ")"
    agg = F.expr(
        f"percentile_approx({value_col}, {arr}, {accuracy})"
    ).alias("quantiles")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.groupBy().agg(agg)


def distinct_accuracy_check(
    df: DataFrame,
    col: str,
    group_by: str,
    rsd: float = 0.05,
    bound_factor: float = 4.0,
) -> DataFrame:
    """Per group: exact distinct count + whether the HLL estimate is
    within ``bound_factor * rsd`` of it (the checkable contract)."""
    return (
        df.groupBy(group_by)
        .agg(
            F.countDistinct(col).alias("exact_distinct"),
            F.approx_count_distinct(col, rsd).alias("__approx"),
        )
        .select(
            group_by,
            "exact_distinct",
            F.expr(
                "abs(CAST(__approx AS DOUBLE) - exact_distinct) "
                f"/ exact_distinct <= {bound_factor * rsd}"
            ).alias("within_bound"),
        )
        .orderBy(group_by)
    )


def quantile_rank_check(
    df: DataFrame,
    value_col: str,
    group_by: str,
    prob: float = 0.5,
    accuracy: int = 10000,
    rank_eps: float = 0.01,
) -> DataFrame:
    """Per group: n rows + whether the approximate ``prob``-quantile
    lands within ``rank_eps`` of that rank — the KLL guarantee stated
    in rank space, which is what percentile_approx actually promises
    (value-space error is unbounded on skewed data)."""
    approx = df.groupBy(group_by).agg(
        F.expr(
            f"percentile_approx({value_col}, {prob}, {accuracy})"
        ).alias("__qv"),
        F.count(F.lit(1)).alias("__n_all"),
    )
    ranked = (
        df.join(approx, on=group_by)
        .groupBy(group_by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.expr(
                    f"CASE WHEN {value_col} <= __qv THEN 1 ELSE 0 END"
                )
            ).alias("__le"),
            F.sum(
                F.expr(
                    f"CASE WHEN {value_col} < __qv THEN 1 ELSE 0 END"
                )
            ).alias("__lt"),
            F.sum(
                F.expr(
                    f"CASE WHEN {value_col} IS NULL THEN 1 ELSE 0 END"
                )
            ).alias("__nulls"),
        )
    )
    # tie-safe rank check: rows-below must not overshoot, rows-at-or-
    # below must reach the target rank
    return ranked.select(
        group_by,
        "n",
        F.expr(
            "CAST(__le AS DOUBLE) / (n - __nulls) "
            f">= {prob} - {rank_eps} AND "
            "CAST(__lt AS DOUBLE) / (n - __nulls) "
            f"<= {prob} + {rank_eps}"
        ).alias("within_rank_eps"),
    ).orderBy(group_by)


def top_items(
    df: DataFrame,
    col: str,
    k: int = 10,
    max_tracked: int = 100_000,
) -> DataFrame:
    """Approximate heavy hitters (frequent items): the top ``k``
    values of ``col`` with estimated counts, via Spark 4's
    ``approx_top_k`` aggregate — a bounded-memory sketch that
    partial-aggregates map-side (each partition keeps at most
    ``max_tracked`` counters) and merges JVM-side, so a 100 TB
    frequency profile never shuffles raw values: one sketch per
    partition moves, not the column.

    Accuracy contract: counts are EXACT whenever the column's
    distinct count is <= ``max_tracked`` (nothing is evicted); above
    that, items with frequency > n/max_tracked are still surfaced
    with near-exact counts (space-saving guarantee). Rows are
    returned sorted (count desc, item asc) so equal-count ties are
    deterministic.

    Output: ``item`` (string), ``cnt``.
    """
    return (
        df.select(F.col(col).cast("string").alias("__it"))
        .select(
            F.expr(f"approx_top_k(__it, {k}, {max_tracked})").alias("tk")
        )
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").alias("cnt"),
        )
        .orderBy(F.desc("cnt"), "item")
    )


def top_items_by_group(
    df: DataFrame,
    col: str,
    group_by: str,
    k: int = 10,
    max_tracked: int = 100_000,
) -> DataFrame:
    """Per-group heavy hitters: ``top_items`` keyed by ``group_by``
    (e.g. top tokens per language, top domains per source). One
    sketch per (partition, group) partial-aggregates map-side and
    merges per group — the shuffle carries sketches, never raw
    values. Output: ``group_by``, ``item``, ``cnt``, ``rank`` (1 =
    most frequent; count-desc, item-asc within a group)."""
    from pyspark.sql import Window

    exploded = (
        df.select(
            F.col(group_by),
            F.col(col).cast("string").alias("__it"),
        )
        .groupBy(group_by)
        .agg(F.expr(f"approx_top_k(__it, {k}, {max_tracked})").alias("tk"))
        .select(group_by, F.explode("tk").alias("e"))
        .select(
            group_by,
            F.col("e.item").alias("item"),
            F.col("e.count").alias("cnt"),
        )
    )
    w = Window.partitionBy(group_by).orderBy(F.desc("cnt"), "item")
    return exploded.withColumn("rank", F.row_number().over(w)).orderBy(
        group_by, "rank"
    )
