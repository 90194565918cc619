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
