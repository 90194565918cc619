"""As-of join — an operator Spark lacks natively (SURVEY §2 #40).

Implemented as a composition of built-in DataFrame ops (the union
trick): tag both sides, union on (key, time), and carry the most
recent right-side ROW forward as one struct with
last_value(struct, IGNORE NULLS) over (PARTITION BY key ORDER BY
time) — struct-level, so NULL fields inside the matched row are
carried verbatim. One shuffle on the join key —
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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the
    same ``by`` group: the latest with right.time <= left.time
    (``direction="backward"``, ties included) or the earliest with
    right.time >= left.time (``"forward"``).

    on/by: left time + group columns; right_on/right_by default to
    the same names. value_cols: right columns to carry (default: all
    except its time/group columns). ``tolerance_seconds`` nulls the
    match when the time gap exceeds it (pandas merge_asof parity).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    right_on = right_on or on
    right_by = right_by or by
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (right_on, right_by)
        ]

    lcols = left.columns

    from pyspark.sql.types import StructField, StructType

    # The carried values travel as ONE nullable struct: the window's
    # last_value(..., IGNORE NULLS) then skips rows where the struct
    # itself is null (all left rows) but takes the matched right row's
    # fields verbatim — a genuinely NULL value inside the latest right
    # row stays NULL instead of falling back to an older non-null one
    # (DuckDB ASOF JOIN semantics). The matched row's own time rides
    # along as __rt for the tolerance cut.
    r_type = StructType(
        [StructField("__rt", right.schema[right_on].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tagged = left.select(
        F.col(by).alias("__key"),
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_type).alias("__r"),
    )
    r_tagged = right.select(
        F.col(right_by).alias("__key"),
        F.col(right_on).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(
            F.col(right_on).alias("__rt"),
            *[F.col(c) for c in value_cols],
        ).alias("__r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        # right rows sort before left rows at equal times (__is_left
        # asc), so a right row AT the left timestamp is visible to it.
        fill = (
            "last_value(__r, true) OVER ("
            "PARTITION BY __key ORDER BY __t, __is_left "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    else:
        # forward: left rows sort before right rows at equal times
        # (__is_left DESC), so an equal-time right row is in the
        # following frame and still matches.
        fill = (
            "first_value(__r, true) OVER ("
            "PARTITION BY __key ORDER BY __t, __is_left DESC "
            "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
        )
    filled = unioned.withColumn("__r", F.expr(fill))
    if tolerance_seconds is not None:
        t_type = left.schema[on].dataType.typeName()
        if t_type in ("timestamp", "timestamp_ntz"):
            # timestampdiff accepts both TIMESTAMP and TIMESTAMP_NTZ
            # (unix_micros rejects NTZ, which parquet files written
            # with isAdjustedToUTC=false produce)
            gap = "abs(timestampdiff(MICROSECOND, __r.__rt, __t)) / 1e6"
        else:
            gap = "abs(__t - __r.__rt)"
        filled = filled.withColumn(
            "__r",
            F.expr(f"IF({gap} <= {tolerance_seconds}, __r, NULL)"),
        )
    out = filled.where(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[
            F.col(f"__r.{c}").alias(c if c not in lcols else f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return out
