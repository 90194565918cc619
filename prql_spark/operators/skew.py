"""Skew-mitigation helpers (SURVEY §4).

AQE's skew-join splitting covers joins; a heavily-skewed groupBy
still funnels each hot key through one reducer. ``salted_aggregate``
does the classic two-stage trick for algebraic aggregates:

    stage 1: group by (key, salt) — hot keys spread over N reducers
    stage 2: group by key — merge the N partials

Results are bit-identical to the direct aggregation for sum/count/
min/max (associative+commutative merges), and avg is derived as
sum/count at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MERGEABLE = {"sum", "count", "min", "max"}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """aggs: output_name -> (fn, column), fn in sum|count|min|max|avg.

    count uses the column only for naming (COUNT(*) semantics).
    """
    derived_avg = {
        name: col for name, (fn, col) in aggs.items() if fn == "avg"
    }
    stage1_aggs = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            stage1_aggs.append(F.expr(f"sum({col})").alias(f"__s_{name}"))
            stage1_aggs.append(F.expr(f"count({col})").alias(f"__c_{name}"))
        elif fn == "count":
            stage1_aggs.append(F.expr("count(*)").alias(f"__p_{name}"))
        elif fn in _MERGEABLE:
            stage1_aggs.append(F.expr(f"{fn}({col})").alias(f"__p_{name}"))
        else:
            raise ValueError(f"salted_aggregate: non-algebraic fn {fn!r}")

    salted = df.withColumn(
        "__salt", F.expr(f"pmod(xxhash64(monotonically_increasing_id()), {salt_buckets})")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*stage1_aggs)

    stage2_aggs = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            stage2_aggs.append(
                F.expr(f"sum(__s_{name}) / sum(__c_{name})").alias(name)
            )
        elif fn in ("count", "sum"):
            stage2_aggs.append(F.expr(f"sum(__p_{name})").alias(name))
        else:  # min/max merge with themselves
            stage2_aggs.append(F.expr(f"{fn}(__p_{name})").alias(name))
    return partial.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: spread each hot LEFT key over
    ``salt_buckets`` reducers by salting the join key; the RIGHT side
    is replicated once per salt value (explode of a plan-constant
    sequence — a narrow map, NOT a shuffle multiplier: the exchange
    moves salt_buckets× right-side rows, which is the price of
    splitting a hot key).

    AQE's skew-join handles most cases by splitting oversized
    partitions post-shuffle; salting is the explicit fallback when a
    SINGLE key exceeds what one task can hold (AQE cannot split one
    key) or when AQE is disabled. Use when the right side is too big
    to broadcast and the left key histogram is pathological.

    The left salt hashes ``monotonically_increasing_id()`` — unique
    per physical row, so even fully-duplicate rows of a hot key (the
    raw-event-log case) spread across all buckets; a row-content hash
    would send byte-identical duplicates to ONE bucket and leave the
    hot key unsplit. The salt value itself is not stable across
    retries, but the join RESULT is salt-invariant for inner/left
    (every salt value has its matching right replica), so
    recomputation is harmless. Join semantics equal the unsalted
    join exactly.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports inner/left joins (a right/full "
            "join's unmatched RIGHT rows would appear once per salt)"
        )
    lcols, rcols = left.columns, right.columns
    clash = [c for c in rcols if c in set(lcols) and c not in set(on)]
    if clash:
        raise ValueError(
            f"salted_join: column(s) {clash} exist on both sides "
            "outside the join keys — the output projection would be "
            "ambiguous. Rename or drop them on one side first "
            "(the plain join has the same ambiguity, deferred to "
            "first access)."
        )
    l = left.withColumn(
        "__salt",
        F.expr(
            f"pmod(xxhash64(monotonically_increasing_id()), {salt_buckets})"
        ).cast("int"),
    )
    r = right.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {salt_buckets - 1})"))
    )
    joined = l.join(r, on=on + ["__salt"], how=how)
    out_cols = lcols + [c for c in rcols if c not in set(lcols)]
    return joined.select(*out_cols)
