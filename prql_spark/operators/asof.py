"""As-of join — an operator Spark lacks natively (SURVEY §2 #40).

Implemented as a composition of built-in DataFrame ops (the union
trick): tag both sides, union on (key, time), and carry the most
recent right-side value forward with last_value(... IGNORE NULLS)
over (PARTITION BY key ORDER BY time). One shuffle on the join key —
the same exchange a regular join would need — and no range-explosion,
so it scales to arbitrarily dense time series.

DuckDB has native ASOF JOIN, which the entry oracle uses — a strong
cross-engine semantic check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    right_on: str | None = None,
    right_by: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.time <= left.time within the same `by` group (backward
    as-of, strict ties included).

    on/by: left time + group columns; right_on/right_by default to
    the same names. value_cols: right columns to carry (default: all
    except its time/group columns).
    """
    right_on = right_on or on
    right_by = right_by or by
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (right_on, right_by)
        ]

    lcols = left.columns
    carried = {c: f"__r_{c}" for c in value_cols}

    l_tagged = left.select(
        F.col(by).alias("__key"),
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(v)
          for c, v in carried.items()],
    )
    r_tagged = right.select(
        F.col(right_by).alias("__key"),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(v) for c, v in carried.items()],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal times (__is_left asc),
    # so a right row AT the left timestamp is visible to it.
    filled = unioned.withColumns(
        {
            v: F.expr(
                f"last_value({v}, true) OVER ("
                f"PARTITION BY __key ORDER BY __t, __is_left "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            )
            for v in carried.values()
        }
    )
    out = filled.where(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[
            F.col(v).alias(c if c not in lcols else f"{c}{suffix}")
            for c, v in carried.items()
        ],
    )
    return out
