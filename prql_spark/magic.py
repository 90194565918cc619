"""IPython / Jupyter integration: the ``%%prql`` cell magic.

Parity target: the reference documents a ``%%prql`` magic via the
pyprql project (reference book/src/integrations/jupyter.md — a thin
wrapper compiling PRQL to SQL for ipython-sql). This is the
Spark-first equivalent: the cell compiles through the SAME
``compile_prql`` path the library exposes and runs on the session's
:class:`~prql_spark.sources.catalog.Catalog`, returning a Spark
DataFrame (lazily planned by Catalyst; only the notebook display
materializes rows).

Usage::

    %load_ext prql_spark.magic
    %prql_connect /path/to/tables      # builds/reuses the session
    %%prql result_df
    from orders
    filter o_totalprice > 100
    take 10

Flags on the cell line:

- ``<name>`` — also bind the result DataFrame to ``name`` in the
  user namespace.
- ``--sql [dialect]`` — print the generated SQL (any of the 12
  supported dialects; default ``spark``) instead of running.
- ``--pandas`` — return ``df.limit(max_rows).toPandas()`` instead of
  the Spark DataFrame (``--max-rows N``, default 1000, bounds the
  driver transfer — a notebook display never needs the full corpus).
- ``--explain`` — print the formatted physical plan instead of rows.
"""

from __future__ import annotations

from typing import Any

try:  # IPython is optional: the library must import without it
    from IPython.core.magic import Magics, cell_magic, line_magic, magics_class
except ImportError:  # pragma: no cover - exercised only sans IPython
    Magics = object  # type: ignore[assignment,misc]

    def _noop(f):
        return f

    cell_magic = line_magic = _noop

    def magics_class(cls):
        return cls


@magics_class
class PrqlMagics(Magics):
    """``%prql_connect`` + ``%%prql`` over a prql_spark Catalog."""

    def __init__(self, shell):
        super().__init__(shell)
        self._catalog = None

    # ---------------------------------------------------- connect
    @line_magic
    def prql_connect(self, line: str):
        """``%prql_connect <tables_dir> [app_name]`` — build (or
        reuse) the SparkSession and point the PRQL catalog at a
        directory of parquet tables."""
        from prql_spark import Catalog, build_spark

        parts = line.split()
        if not parts:
            raise ValueError(
                "usage: %prql_connect <tables_dir> [app_name]"
            )
        sf_dir = parts[0]
        app = parts[1] if len(parts) > 1 else "prql_spark-notebook"
        spark = build_spark(app)
        self._catalog = Catalog(spark, sf_dir)
        self.shell.user_ns.setdefault("spark", spark)
        return self._catalog

    def _require_catalog(self):
        if self._catalog is None:
            # fall back to a `catalog` the user built by hand
            cat = self.shell.user_ns.get("catalog")
            if cat is not None:
                self._catalog = cat
        if self._catalog is None:
            raise RuntimeError(
                "no catalog — run `%prql_connect <tables_dir>` first "
                "(or put a prql_spark.Catalog in the `catalog` "
                "variable)"
            )
        return self._catalog

    # ------------------------------------------------------- cell
    @cell_magic
    def prql(self, line: str, cell: str) -> Any:
        args = line.split()
        sql_dialect = None
        to_pandas = False
        explain = False
        max_rows = 1000
        bind_name = None
        i = 0
        while i < len(args):
            a = args[i]
            if a == "--sql":
                sql_dialect = "spark"
                if i + 1 < len(args) and not args[i + 1].startswith("-"):
                    sql_dialect = args[i + 1]
                    i += 1
            elif a == "--pandas":
                to_pandas = True
            elif a == "--explain":
                explain = True
            elif a == "--max-rows":
                max_rows = int(args[i + 1])
                i += 1
            elif not a.startswith("-") and bind_name is None:
                bind_name = a
            else:
                raise ValueError(f"unknown %%prql flag: {a}")
            i += 1

        if sql_dialect is not None:
            from prql_spark.sql_backend import to_sql

            sql = to_sql(cell, self._require_catalog(), dialect=sql_dialect)
            print(sql)
            return sql

        from prql_spark import compile_prql

        df = compile_prql(cell, self._require_catalog())
        if explain:
            df.explain("formatted")
            return df
        result = df.limit(max_rows).toPandas() if to_pandas else df
        if bind_name is not None:
            self.shell.user_ns[bind_name] = result
        return result


def load_ipython_extension(ipython) -> None:
    """`%load_ext prql_spark.magic` entry point."""
    ipython.register_magics(PrqlMagics)
