"""PRQL stdlib → Spark SQL expression templates.

Parity target: /root/reference/prql-compiler/src/sql/stdlib.prql
(all 19 functions), plus a curated set of extra scalar passthroughs
that exist in both Spark SQL and DuckDB (safe for the oracle).

Kinds:
- ``agg``    — aggregate functions; compiled plain inside an
  ``aggregate`` transform, window-wrapped (``OVER (...)``) inside
  ``derive``/``filter``.
- ``win``    — pure window functions (require ORDER BY, no frame).
- ``scalar`` — ordinary row-wise expressions.
"""

from __future__ import annotations

# name -> (template, min_args)  — template uses {0},{1},...
AGG_TEMPLATES = {
    "min": "MIN({0})",
    "max": "MAX({0})",
    "sum": "SUM({0})",
    "avg": "AVG({0})",
    "average": "AVG({0})",
    "stddev": "STDDEV({0})",
    "count_distinct": "COUNT(DISTINCT {0})",
}

# pure window functions: name -> template over compiled args
WIN_TEMPLATES = {
    "rank": "RANK()",
    "rank_dense": "DENSE_RANK()",
    "row_number": "ROW_NUMBER()",
}

# zero-arg-callable names (a bare ident resolves to a call)
ZERO_ARG = {"count", "rank", "rank_dense", "row_number"}

# `first`/`last` take (offset?, column) in the v0 stdlib; offset is
# vestigial (FIRST_VALUE has no offset arg in real SQL) — ignored.
FIRST_LAST = {"first": "FIRST_VALUE", "last": "LAST_VALUE"}

# scalar passthroughs valid in BOTH Spark SQL and DuckDB, so the
# same PRQL works against the engine and the oracle.
EXTRA_SCALAR = {
    "abs": "ABS",
    "lower": "LOWER",
    "upper": "UPPER",
    "length": "LENGTH",
    "trim": "TRIM",
    "ltrim": "LTRIM",
    "rtrim": "RTRIM",
    "floor": "FLOOR",
    "ceil": "CEIL",
    "sqrt": "SQRT",
    "exp": "EXP",
    "ln": "LN",
    "log10": "LOG10",
    "sin": "SIN",
    "cos": "COS",
    "substr": "SUBSTR",
    "left": "LEFT",
    "right": "RIGHT",
    "replace": "REPLACE",
    "concat": "CONCAT",
    "greatest": "GREATEST",
    "least": "LEAST",
    "nullif": "NULLIF",
    "year": "YEAR",
    "month": "MONTH",
    "day": "DAY",
}

SQL_TYPE_NAMES = {
    "int",
    "integer",
    "bigint",
    "smallint",
    "tinyint",
    "float",
    "real",
    "double",
    "decimal",
    "numeric",
    "varchar",
    "char",
    "text",
    "string",
    "date",
    "timestamp",
    "boolean",
    "bool",
}
